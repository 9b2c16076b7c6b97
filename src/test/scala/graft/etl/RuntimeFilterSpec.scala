package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Built-in RUNTIME BLOOM FILTER injection (InjectRuntimeFilter) — the
  * engine-native sibling of `graft.ext.BloomJoin`: on a shuffled join
  * with a selective creation side, Catalyst plants a
  * `might_contain(bloom_filter_agg(...))` semi-filter on the
  * application side so the big scan discards non-joining rows BEFORE
  * the exchange. At 100 TB this is most of BloomJoin's win with zero
  * code — the explicit operator remains for when the planner's
  * size/selectivity heuristics decline (its scaladoc documents the
  * trade); this spec pins that the built-in actually fires on the
  * canonical selective-dim shape so the engine's shuffle story doesn't
  * silently rest on a disabled conf.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConfs[A](kvs: (String, String)*)(body: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a selective dim side injects might_contain into the fact side") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rbf").toString
    spark.range(200000).select(col("id").as("fk"), (col("id") * 7).as("v"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(200000).select(col("id").as("pk"), (col("id") % 97).as("attr"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    withConfs(
      // Force the shuffled-join path (broadcast joins get no bloom) and
      // drop the size gates to test-fixture scale.
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").where(col("attr") === 5)
      val j = fact.join(dim, col("fk") === col("pk"))
      assert(j.collect().length === 2062) // ids ≡ 5 (mod 97) in [0, 200000)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        "runtime bloom filter not injected on the fact side")
      assert(p.contains("bloom_filter_agg"),
        "bloom creation aggregate missing from the dim side")
    }
  }

  test("without a selective predicate no filter is injected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rbf2").toString
    spark.range(50000).select(col("id").as("fk")).write
      .mode("overwrite").parquet(s"$dir/fact")
    spark.range(50000).select(col("id").as("pk")).write
      .mode("overwrite").parquet(s"$dir/dim")
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true") {
      val j = spark.read.parquet(s"$dir/fact")
        .join(spark.read.parquet(s"$dir/dim"), col("fk") === col("pk"))
      assert(j.count() === 50000L)
      assert(!j.queryExecution.executedPlan.toString.contains("might_contain"),
        "bloom filter injected with nothing to gain — heuristic regressed")
    }
  }
}
