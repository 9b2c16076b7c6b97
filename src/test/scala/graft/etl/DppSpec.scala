package graft.etl

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DYNAMIC PARTITION PRUNING — the runtime face of S3's static pruning:
  * when the partition filter is only known by joining a dim (the
  * reference's date-partitioned raw zone joined to a processing-date
  * control table, `dags/retail_pipeline_dag.py:19-41`), Catalyst plants
  * a DynamicPruningExpression in the fact scan's PARTITION filters and
  * the scan skips whole partition directories using the dim-side join
  * keys computed at runtime. At 100 TB this is the difference between
  * scanning one day and scanning seven years — and it needs no code,
  * only a partitioned layout and a declarative join, which is the point
  * of proving it fires here.
  */
class DppSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("a dim-side filter prunes fact partitions at runtime") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    spark.range(1000)
      .select((col("id") % 10).cast("int").as("day"), col("id").as("v"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val fact = spark.read.parquet(dir)
    // The dim must be a REAL relation: a Seq.toDF dim constant-folds
    // into a LocalRelation (filter absorbed), and the pruning rule then
    // sees no selective predicate on the filtering side — a genuinely
    // easy way to lose DPP in tests that real parquet dims don't hit.
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    Seq((3, "keep"), (7, "drop")).toDF("d_day", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(broadcast(dim).where(col("tag") === "keep"),
      col("day") === col("d_day"))
    // collect() (not count()) so the metrics we read below belong to
    // THIS QueryExecution — count() plans its own aggregate query.
    assert(joined.collect().length === 100)
    val scans = collect(joined.queryExecution.executedPlan) {
      case f: FileSourceScanExec if f.output.exists(_.name == "v") => f
    }
    assert(scans.nonEmpty, "fact scan not found in executed plan")
    val pf = scans.head.partitionFilters.mkString("; ").toLowerCase
    assert(pf.contains("dynamicpruning"),
      s"expected a DynamicPruningExpression in partition filters, got: $pf")
    // Runtime effect: the scan touched 1 of the 10 day partitions.
    val partsRead = scans.head.metrics.get("numPartitions").map(_.value)
    assert(partsRead.forall(_ === 1L),
      s"expected 1 partition read, metrics said: $partsRead")
  }

  test("without the join the same filter prunes statically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp2").toString
    spark.range(1000)
      .select((col("id") % 10).cast("int").as("day"), col("id").as("v"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val q = spark.read.parquet(dir).where(col("day") === 3)
    assert(q.count() === 100L)
    val scans = collect(q.queryExecution.executedPlan) {
      case f: FileSourceScanExec => f
    }
    val pf = scans.head.partitionFilters.mkString("; ")
    assert(pf.contains("(day"), s"static partition filter missing: $pf")
    assert(!pf.toLowerCase.contains("dynamicpruning"))
  }
}
