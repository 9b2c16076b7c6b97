package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, IntegerType}

import graft.Tables

/** Expresses the reference's retail entities over the driver testdata
  * (FIXTURES.md §C): sku ≈ l_partkey, quantity ≈ l_quantity, sales day ≈
  * date(l_shipdate), product dim ≈ part, inventory snapshots ≈ per-date
  * aggregates of lineitem.
  *
  * sku is rendered as a zero-padded string ("SKU-000042") so the string
  * sort order used by the oracle compare equals numeric order, and so the
  * upper(trim()) normalization path (glue_job_1_stage_sales.py:45) is
  * exercised in-plan on every query.
  */
object RetailMapping {

  /** The flagship processing date — present at every scale factor. */
  val Day: LocalDate = LocalDate.parse("1995-06-15")

  def skuCol(partkey: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    StageSales.normalizeSku(concat(lit("SKU-"), lpad(partkey.cast("string"), 6, "0")))

  /** Raw "POS sales" rows for one day: (sku, quantity) from lineitem. */
  def rawSales(spark: SparkSession, dir: String, day: LocalDate): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate").cast(DateType) === lit(day.toString).cast(DateType))
      .select(
        skuCol(col("l_partkey")).as("sku"),
        col("l_quantity").cast(IntegerType).as("quantity"))

  /** Staged daily sales for one day (StageSales over the mapping). */
  def stagedSales(spark: SparkSession, dir: String, day: LocalDate): DataFrame =
    StageSales.stage(rawSales(spark, dir, day), day)

  /** Inventory "snapshot" at a date: per-sku quantity aggregate of that
    * day's lineitem rows, under the given stock column name.
    */
  def snapshot(spark: SparkSession, dir: String, day: LocalDate, stockCol: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate").cast(DateType) === lit(day.toString).cast(DateType))
      .select(skuCol(col("l_partkey")).as("sku"), col("l_quantity").cast(IntegerType).as("q"))
      .groupBy("sku")
      .agg(sum("q").as(stockCol))

  /** Product dimension from `part` (sku, product_name=p_name, category=p_type),
    * via the deterministic dedup.
    */
  def dimProducts(spark: SparkSession, dir: String): DataFrame =
    DimProducts.build(
      Tables.part(spark, dir).select(
        skuCol(col("p_partkey")).as("sku"),
        col("p_name").as("product_name"),
        col("p_type").as("category")))

  /** The flagship reconciliation: opening = day-1 snapshot, closing = day
    * snapshot, sales = day staged sales, dim = part.
    */
  def reconciliation(spark: SparkSession, dir: String, day: LocalDate = Day): DataFrame = {
    val opening = snapshot(spark, dir, day.minusDays(1), "opening_stock")
    val closing = snapshot(spark, dir, day, "actual_closing_stock")
    val sales = stagedSales(spark, dir, day).select("sku", "total_quantity_sold")
    Reconcile.reconcile(opening, closing, sales, dimProducts(spark, dir), day)
  }
}
