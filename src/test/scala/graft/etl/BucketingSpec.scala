package graft.etl

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  /** saveAsTable refuses a managed-table LOCATION left on disk by a
    * previous JVM (the in-memory catalog forgot the table but the
    * warehouse dir persists) — drop both before writing.
    */
  private def fresh(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val root = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(root, table))
  }

  test("same-key bucketed tables join with zero shuffle exchange") {
    val sales = spark.range(1000).select(col("id").as("sku_id"),
      (col("id") % 7).as("qty"))
    val inv = spark.range(1000).select(col("id").as("sku_id"),
      (col("id") % 5).as("on_hand"))
    fresh("b_sales"); fresh("b_inv")
    Bucketing.writeBucketed(sales, "b_sales", "sku_id", 4)
    Bucketing.writeBucketed(inv, "b_inv", "sku_id", 4)
    // Force the sort-merge path so the assertion is about bucketing, not
    // about a broadcast having hidden the shuffle.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.read(spark, "b_sales")
        .join(Bucketing.read(spark, "b_inv"), "sku_id")
      val n = joined.count()
      assert(n === 1000)
      val shuffles = collect(joined.queryExecution.executedPlan) {
        case s: ShuffleExchangeLike => s
      }
      assert(shuffles.isEmpty,
        s"bucketed co-located join must not shuffle, found: $shuffles")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed readback preserves rows") {
    val df = spark.range(100).select(col("id").as("sku_id"), (col("id") * 2).as("v"))
    fresh("b_round")
    Bucketing.writeBucketed(df, "b_round", "sku_id", 2)
    assert(Bucketing.read(spark, "b_round").as[(Long, Long)].collect().sorted
      === (0L until 100L).map(i => (i, i * 2)))
  }
}
