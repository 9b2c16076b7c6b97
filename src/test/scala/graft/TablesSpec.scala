package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Regression guard for the `events.ts` loader: the testdata generator has
  * shipped the column as Parquet TIMESTAMP(NANOS), as timestamp[us]
  * (TIMESTAMP_NTZ), and could ship plain TIMESTAMP — `Tables.events` must
  * normalize all three to session-TZ `TimestampType` with identical
  * wall-clock values. A generator change should break THIS spec with a clear
  * message, not 15 downstream queries (round-7 postmortem).
  *
  * The nanos fixture is written as raw INT64 (Spark cannot author Parquet
  * TIMESTAMP(NANOS)); with `nanosAsLong=true` a real nanos file reads back
  * as the same `LongType` column, so the loader sees an identical input.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val wall = LocalDateTime.of(2024, 3, 15, 10, 30, 45, 123456000)
  private val micros = 1710498645123456L // 2024-03-15T10:30:45.123456Z

  private def dir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("events: raw INT64 nanos reads as TimestampType with micro truncation") {
    val d = dir("graft-ev-nanos")
    // 789 trailing nanos must floor away, matching DuckDB's micros read.
    Seq((1L, micros * 1000 + 789, "view")).toDF("user_id", "ts", "etype")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = Tables.events(spark, d)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.select(col("ts").cast("string")).as[String].head()
    assert(got === "2024-03-15 10:30:45.123456")
  }

  test("events: TIMESTAMP_NTZ (timestamp[us]) reads as TimestampType, identity wall-clock") {
    val d = dir("graft-ev-ntz")
    Seq((1L, wall, "view")).toDF("user_id", "ts", "etype")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = Tables.events(spark, d)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.select(col("ts").cast("string")).as[String].head()
    assert(got === "2024-03-15 10:30:45.123456")
  }

  test("events: TimestampType passes through unchanged") {
    val d = dir("graft-ev-ts")
    Seq((1L, Timestamp.valueOf("2024-03-15 10:30:45.123456"), "view"))
      .toDF("user_id", "ts", "etype")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = Tables.events(spark, d)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.select(col("ts").cast("string")).as[String].head()
    assert(got === "2024-03-15 10:30:45.123456")
  }

  test("events: loader handles the live testdata schema") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if (Files.exists(java.nio.file.Paths.get(s"$sfDir/events.parquet"))) {
      val out = Tables.events(spark, sfDir)
      assert(out.schema("ts").dataType === TimestampType)
      assert(out.limit(1).count() === 1L)
    }
  }
}
