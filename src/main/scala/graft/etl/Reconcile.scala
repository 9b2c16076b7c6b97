package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Inventory reconciliation — the flagship query.
  *
  * Reference semantics: glue-scripts/glue_job_2_reconcile.py:79-108 —
  *   opening ⟗ closing FULL OUTER on sku      (keep new + delisted SKUs)
  *     ⟕ daily sales LEFT on sku              (no sales → 0 sold)
  *     ⟕ dim.select(sku, product_name) LEFT   (name enrichment)
  *   fillna(0) on the three stock/sales columns   ← must run AFTER the
  *   joins (SURVEY.md §7.4 risk 3) or one-sided SKUs compute wrong
  *   expected = opening - sold
  *   discrepancy = actual - expected
  *
  * Scale notes (100 TB):
  *  - J1/J2 are fact-to-fact equi-joins on sku → sort-merge after an
  *    exchange each side; both inputs arrive pre-aggregated per sku so
  *    their size is bounded by |SKU universe|, not raw row count.
  *  - The dim join broadcasts when the dim is small (the reference
  *    replicates it with DISTSTYLE ALL, sql/create_redshift_tables.sql:25)
  *    — via autoBroadcastJoinThreshold/AQE by default, or an explicit
  *    caller opt-in hint (see `broadcastDim` param): no shuffle.
  *  - All three join inputs share hashpartitioning(sku) so Catalyst
  *    reuses the exchange; AQE coalesces post-shuffle partitions and
  *    splits skewed SKUs.
  */
object Reconcile {

  /** opening(sku, opening_stock) ⟗ closing(sku, actual_closing_stock)
    * ⟕ sales(sku, total_quantity_sold) ⟕ dim(sku, product_name, ...)
    * → reconciliation fact (Schemas.reconciliation).
    *
    * @param broadcastDim force a broadcast hint on the dim join. Default
    *   false: plan selection is left to `autoBroadcastJoinThreshold` + AQE
    *   (which converts to broadcast at runtime when the built side is
    *   actually small). Pass true only when the caller KNOWS the dim is
    *   bounded (reference's DISTSTYLE ALL intent) — an unconditional hint
    *   on an unbounded dim is an executor OOM at 100 TB, not a plan choice.
    */
  def reconcile(
      opening: DataFrame,
      closing: DataFrame,
      sales: DataFrame,
      dimProducts: DataFrame,
      processingDate: LocalDate,
      broadcastDim: Boolean = false): DataFrame = {
    val dimSlim = dimProducts.select("sku", "product_name")
    val dim = if (broadcastDim) broadcast(dimSlim) else dimSlim
    val joined = opening
      .join(closing, Seq("sku"), "full_outer")
      .join(sales, Seq("sku"), "left")
      .join(dim, Seq("sku"), "left")
      .na.fill(0L, Seq("opening_stock", "actual_closing_stock", "total_quantity_sold"))
    joined
      .withColumn("expected_closing_stock", col("opening_stock") - col("total_quantity_sold"))
      .withColumn("discrepancy_amount", col("actual_closing_stock") - col("expected_closing_stock"))
      .select(
        lit(processingDate.toString).cast(DateType).as("date_key"),
        col("sku"),
        col("product_name"),
        col("opening_stock"),
        col("total_quantity_sold").as("quantity_sold"),
        col("expected_closing_stock"),
        col("actual_closing_stock"),
        col("discrepancy_amount"))
  }
}
