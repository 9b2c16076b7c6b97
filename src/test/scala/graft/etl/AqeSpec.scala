package graft.etl

import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanHelper, AQEShuffleReadExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ADAPTIVE QUERY EXECUTION evidence — the engine's runtime re-planner
  * is load-bearing for the 100 TB story (right-sized shuffles without
  * per-query tuning), so pin that it actually fires rather than assume
  * the conf line works. Coalescing: a kilobyte aggregate shuffled into
  * the session's 4 partitions should be read back as fewer, fused
  * post-shuffle partitions.
  */
class AqeSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("AQE coalesces a tiny shuffle's post-shuffle partitions") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true",
      "AQE must be on (Spark 4 default) for the engine's shuffle story")
    val df = spark.range(1000)
      .select((col("id") % 7).as("k"), col("id").as("v"))
      .groupBy("k").agg(sum("v").as("s"))
    assert(df.collect().length === 7)
    val reads = collect(df.queryExecution.executedPlan) {
      case r: AQEShuffleReadExec => r
    }
    assert(reads.nonEmpty, "expected an AQEShuffleRead in the final plan")
    val parts = reads.head.partitionSpecs.length
    assert(parts < spark.conf.get("spark.sql.shuffle.partitions").toInt,
      s"expected coalescing below the static ${spark.conf.get("spark.sql.shuffle.partitions")}, got $parts")
  }
}
