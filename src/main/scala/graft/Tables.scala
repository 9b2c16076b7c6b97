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
  /** `events.ts` normalized to session-TZ `TimestampType` regardless of how
    * the generator wrote it. Generators have shipped the column three ways
    * across rounds, so the loader branches on the READ schema instead of
    * assuming one encoding:
    *
    *   - Parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it
    *     unless `spark.sql.legacy.parquet.nanosAsLong=true` (set at session
    *     construction — see [[sessionDefaults]] — never mutated here, since
    *     flipping a session-global legacy flag as a loader side effect would
    *     silently turn any later nanos read into BIGINT). It then arrives as
    *     `LongType` raw nanos; floor-divide to micros — the same truncation
    *     DuckDB applies reading nanos as a microsecond TIMESTAMP, so oracle
    *     values agree exactly.
    *   - Parquet timestamp[us] (isAdjustedToUTC=false): arrives as
    *     `TimestampNTZType`; cast to `TimestampType`. The session runs in
    *     UTC, so the cast is an identity on the wall-clock value and matches
    *     DuckDB's naive-TIMESTAMP read.
    *   - `TimestampType` (isAdjustedToUTC=true): passthrough.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
          "events.ts read as BIGINT implies a nanos-timestamp file: set " +
            "spark.sql.legacy.parquet.nanosAsLong=true at session construction " +
            "(Tables.sessionDefaults) before reading events")
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(s"events.ts has unsupported type $other")
    }
  }

  /** Session configs every graft entry point needs; apply at builder
    * time: `Tables.sessionDefaults.foldLeft(builder)((b, kv) =>
    * b.config(kv._1, kv._2))`. The `nanosAsLong` flag is harmless when the
    * testdata carries micro-precision timestamps (current generator) and
    * required when it carries TIMESTAMP(NANOS) (older generators).
    */
  val sessionDefaults: Seq[(String, String)] = Seq(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
