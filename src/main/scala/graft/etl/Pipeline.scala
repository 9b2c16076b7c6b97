package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** In-process orchestrator replacing the reference's Airflow DAG
  * (dags/retail_pipeline_dag.py:65-100; SURVEY.md §3.3).
  *
  * The DAG's cross-service hops (Airflow → Glue → Redshift DELETE+COPY)
  * collapse to three function calls in dependency order; idempotent daily
  * re-runs use dynamic partition overwrite instead of DELETE-by-date
  * (SURVEY.md §4.1): re-running a date replaces exactly that date's
  * partition and nothing else. The overwrite mode is set per-write (an
  * .option on the writer), not on the session, so it cannot leak into
  * unrelated writes later in the same SparkSession.
  */
object Pipeline {

  final case class Result(
      stagedSalesPath: String,
      dimProductsPath: String,
      reconciliationPath: String,
      alert: Option[Alerts.AlertReport])

  /** Runs stage-sales ∥ build-dims → reconcile → alert for one date.
    *
    * @param rawSales     raw POS sales rows (sku, quantity) for `date`
    * @param rawInventoryOpen  inventory snapshot rows at date-1
    * @param rawInventoryClose inventory snapshot rows at date
    * @param outputRoot   warehouse root; facts written date-partitioned
    */
  def run(
      spark: SparkSession,
      rawSales: DataFrame,
      rawInventoryOpen: DataFrame,
      rawInventoryClose: DataFrame,
      date: LocalDate,
      outputRoot: String): Result = {
    val salesPath = s"$outputRoot/fact_daily_sales"
    val dimPath = s"$outputRoot/dim_products"
    val reconPath = s"$outputRoot/fact_inventory_reconciliation"

    // Job 1 — stage sales (K1: overwrite exactly this date's partition).
    val staged = StageSales.stage(rawSales, date)
    staged.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("date_key").parquet(salesPath)

    // Dim job — full refresh (K4). Small by construction; single file kept
    // deliberately (reference's coalesce(1), glue_job_create_dims.py:56) —
    // acceptable for dims only, never for facts (SURVEY.md §7.5).
    val dim = DimProducts.build(rawInventoryClose)
    dim.coalesce(1).write.mode(SaveMode.Overwrite).parquet(dimPath)

    // Job 2 — reconcile (reads back the staged outputs like the reference
    // reads its staging zone, glue_job_2_reconcile.py:50,74).
    val openingStock = rawInventoryOpen
      .select(
        StageSales.normalizeSku(col("sku")).as("sku"),
        col("stock_on_hand").cast("long").as("opening_stock"))
    val closingStock = rawInventoryClose
      .select(
        StageSales.normalizeSku(col("sku")).as("sku"),
        col("stock_on_hand").cast("long").as("actual_closing_stock"))
    val sales = spark.read.parquet(salesPath)
      .where(col("date_key") === date.toString)
      .select("sku", "total_quantity_sold")
    val dimRead = spark.read.parquet(dimPath)

    // Dim read-back is a bounded single file (coalesce(1) above) → safe to
    // hint broadcast, matching the reference's DISTSTYLE ALL intent.
    val recon = Reconcile.reconcile(
      openingStock, closingStock, sales, dimRead, date, broadcastDim = true)
    recon.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("date_key").parquet(reconPath)

    // Alert actions run on the written fact (read-back, not a 3rd recompute
    // of the join tree — fixes the reference's triple replay, SURVEY.md
    // §3.2), restricted to THIS run's partition: the reference alerts only
    // on the current processing date (glue_job_2_reconcile.py:118-133), and
    // the date_key filter is a partition-pruned read, not a full-fact scan.
    val alert = Alerts.build(
      spark.read.parquet(reconPath).where(col("date_key") === date.toString))
    Result(salesPath, dimPath, reconPath, alert)
  }
}
