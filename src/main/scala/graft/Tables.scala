package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  * One parquet file per table under `dir` (an sf directory).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  /** `events.ts` is written as Parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright. Read it as raw nanos
    * (`nanosAsLong`, set at SESSION CONSTRUCTION by every entry point —
    * see [[sessionDefaults]] — not mutated here: a loader that flips a
    * session-global legacy flag as a side effect would silently turn any
    * later nanos-timestamp read in the same session into BIGINT) and
    * floor-convert to a microsecond timestamp — the same truncation
    * DuckDB applies when it reads the nanos column as a microsecond
    * TIMESTAMP, so oracle values agree exactly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at session construction " +
        "(Tables.sessionDefaults) before reading events")
    apply(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Session configs every graft entry point needs; apply at builder
    * time: `Tables.sessionDefaults.foldLeft(builder)((b, kv) =>
    * b.config(kv._1, kv._2))`.
    */
  val sessionDefaults: Seq[(String, String)] = Seq(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
