package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, IntegerType, TimestampType}

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

  def skuCol(partkey: Column): Column =
    StageSales.normalizeSku(concat(lit("SKU-"), lpad(partkey.cast("string"), 6, "0")))

  /** Half-open shipdate range predicate `[from 00:00, until 00:00)`.
    *
    * The comparison is raw-timestamp-attribute vs literal (the cast sits on
    * the literal side, constant-folded by Catalyst), so it reaches the
    * Parquet scan as PushedFilters GreaterThanOrEqual/LessThan on
    * l_shipdate → row-group min/max skipping. A `cast(l_shipdate as date)`
    * on the attribute side would defeat pushdown and force a full scan of
    * lineitem per query at scale.
    */
  def shipdateIn(from: LocalDate, until: LocalDate): Column =
    col("l_shipdate") >= lit(from.toString).cast(TimestampType) &&
      col("l_shipdate") < lit(until.toString).cast(TimestampType)

  /** Raw "POS sales" rows for one day: (sku, quantity) from lineitem. */
  def rawSales(spark: SparkSession, dir: String, day: LocalDate): DataFrame =
    Tables.lineitem(spark, dir)
      .where(shipdateIn(day, day.plusDays(1)))
      .select(
        skuCol(col("l_partkey")).as("sku"),
        col("l_quantity").cast(IntegerType).as("quantity"))

  /** Staged daily sales for one day (StageSales over the mapping). */
  def stagedSales(spark: SparkSession, dir: String, day: LocalDate): DataFrame =
    StageSales.stage(rawSales(spark, dir, day), day)

  /** Per-(day, sku) quantity aggregate of lineitem over `[from, until)` —
    * the shared scan that snapshots and staged sales derive from.
    */
  def dailyQty(spark: SparkSession, dir: String, from: LocalDate, until: LocalDate): DataFrame =
    Tables.lineitem(spark, dir)
      .where(shipdateIn(from, until))
      .select(
        col("l_shipdate").cast(DateType).as("d"),
        skuCol(col("l_partkey")).as("sku"),
        col("l_quantity").cast(IntegerType).as("q"))
      .groupBy("d", "sku")
      .agg(sum("q").as("qty"))

  /** Inventory "snapshot" at a date: per-sku quantity aggregate of that
    * day's lineitem rows, under the given stock column name.
    */
  def snapshot(spark: SparkSession, dir: String, day: LocalDate, stockCol: String): DataFrame =
    dailyQty(spark, dir, day, day.plusDays(1))
      .select(col("sku"), col("qty").as(stockCol))

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
    *
    * Scale shape: opening/closing/sales all derive from ONE `dailyQty`
    * aggregate over `[day-1, day+1)` — the partial-aggregate Exchange on
    * (d, sku) is identical in all three branches, so Catalyst's
    * ReuseExchange runs the lineitem scan + map-side combine once (vs the
    * reference's three independent scans, glue_job_2_reconcile.py:50-72).
    */
  def reconciliation(spark: SparkSession, dir: String, day: LocalDate = Day): DataFrame = {
    val daily = dailyQty(spark, dir, day.minusDays(1), day.plusDays(1))
    val dPrev = lit(day.minusDays(1).toString).cast(DateType)
    val dCur = lit(day.toString).cast(DateType)
    val opening = daily.where(col("d") === dPrev)
      .select(col("sku"), col("qty").as("opening_stock"))
    val closing = daily.where(col("d") === dCur)
      .select(col("sku"), col("qty").as("actual_closing_stock"))
    // sales is a RENAME of the closing frame, not a third filter of
    // `daily`: the day filters push below the aggregate to the scan, so
    // an independently-derived sales branch would plan its own scan +
    // aggregate of day d with no structural relationship to closing's.
    // With identical subplans, whenever the planner keeps J2 as a
    // shuffle join (any realistic scale — the per-sku aggregate exceeds
    // autoBroadcastJoinThreshold), ReuseExchange serves J2 from J1's
    // closing exchange: one scan+aggregate of day d instead of two. At
    // toy scale the estimator broadcasts the sales side, which
    // re-executes only the cheap pruned one-day scan.
    val sales = closing.select(col("sku"), col("actual_closing_stock").as("total_quantity_sold"))
    Reconcile.reconcile(opening, closing, sales, dimProducts(spark, dir), day)
  }
}
