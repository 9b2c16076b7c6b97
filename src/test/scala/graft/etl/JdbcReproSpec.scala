package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class JdbcReproSpec extends SparkSpec {
  test("PipelineScale JDBC day reproduces at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val d = RetailMapping.Day
    val dbDir = java.nio.file.Files.createTempDirectory("graft-jdbcrepro")
    val sink = new JdbcWarehouseSink(s"jdbc:derby:$dbDir/wh;create=true")
    val productCols = graft.Tables.part(spark, dir).select(
      RetailMapping.skuCol(col("p_partkey")).as("sku"),
      col("p_name").as("product_name"),
      col("p_type").as("category"))
    val sales = RetailMapping.rawSales(spark, dir, d)
    val open = RetailMapping.snapshot(spark, dir, d.minusDays(1), "stock_on_hand")
    val close = RetailMapping.snapshot(spark, dir, d, "stock_on_hand")
      .join(productCols, Seq("sku"), "left")
    Pipeline.run(spark, sales, open, close, d, sink)
    assert(sink.read(spark, "fact_inventory_reconciliation").count() > 0)
  }
}
