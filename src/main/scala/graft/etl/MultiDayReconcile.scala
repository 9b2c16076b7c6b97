package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** All-days reconciliation — the shape the flagship query takes at 100 TB.
  *
  * The reference runs one Glue job per processing date (re-invoked by the
  * Airflow DAG, dags/retail_pipeline_dag.py:19,35). At scale that is a full
  * input rescan per day; the set-oriented form below reconciles every date
  * in one pass:
  *
  *   daily(sku, d, qty)                      one aggregate over the fact
  *   opening  = daily shifted to d+1         (yesterday's stock opens today)
  *   closing  = sales = daily
  *   full-outer join on (date_key, sku)      composite-key shuffle
  *
  * One scan, one aggregate exchange on (d, sku), one join exchange — vs.
  * O(days) jobs. Both join inputs derive from the same aggregate, so the
  * physical plan reuses the exchange. This generalizes SURVEY.md §2.1 S4
  * (snapshot-pair scan) into a shifted self-join.
  *
  * Boundary semantics: the aggregate covers `[from-1, to]` so that
  * `date_key = from` sees its true opening stock (day from-1), and the
  * joined output is filtered back to `[from, to]` so the opening shift
  * does not fabricate an all-zero-closing day at to+1. Each retained
  * date_key then agrees exactly with the single-day
  * `RetailMapping.reconciliation` for that date.
  */
object MultiDayReconcile {

  /** Per-(day, sku) quantity aggregate of lineitem over `[from, to]`
    * (inclusive), via the pushdown-safe half-open shipdate range.
    */
  private def daily(spark: SparkSession, dir: String, from: LocalDate, to: LocalDate): DataFrame =
    RetailMapping.dailyQty(spark, dir, from, to.plusDays(1))

  /** Reconciliation rows for every date in `[from, to]`, ordered output
    * left to the caller.
    */
  def reconcileRange(spark: SparkSession, dir: String, from: LocalDate, to: LocalDate): DataFrame = {
    val base = daily(spark, dir, from.minusDays(1), to)
    val opening = base.select(
      date_add(col("d"), 1).as("date_key"), col("sku"), col("qty").as("opening_stock"))
    val closing = base.select(
      col("d").as("date_key"), col("sku"),
      col("qty").as("actual_closing_stock"), col("qty").as("quantity_sold"))
    opening
      .join(closing, Seq("date_key", "sku"), "full_outer")
      .where(col("date_key").between(
        lit(from.toString).cast(DateType), lit(to.toString).cast(DateType)))
      .na.fill(0L, Seq("opening_stock", "actual_closing_stock", "quantity_sold"))
      .withColumn("expected_closing_stock", col("opening_stock") - col("quantity_sold"))
      .withColumn("discrepancy_amount", col("actual_closing_stock") - col("expected_closing_stock"))
      .select(
        col("date_key"), col("sku"), col("opening_stock"), col("quantity_sold"),
        col("expected_closing_stock"), col("actual_closing_stock"), col("discrepancy_amount"))
  }

  /** Shrinkage TREND detection over a reconciled range: per sku, the
    * SIGN of the least-squares slope of |discrepancy| against the day
    * index — "is this sku's reconciliation getting worse?". Everything
    * stays in exact integer arithmetic: with x = day index and y =
    * |discrepancy|, slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), and only
    * the sign is reported, so no division ever happens — numerator and
    * denominator are BIGINT-exact on both engines and the denominator
    * is positive whenever a sku has ≥ 2 distinct days.
    *
    * Scale: one sku-keyed aggregate over the reconciled frame (five
    * map-side-combinable sums); the classification is a pure
    * projection. Nothing beyond the reconciliation's own exchanges.
    */
  def discrepancyTrend(recon: DataFrame, from: LocalDate): DataFrame =
    recon
      .select(col("sku"),
        datediff(col("date_key"), lit(from.toString).cast(DateType))
          .cast("long").as("x"),
        abs(col("discrepancy_amount")).cast("long").as("y"))
      .groupBy("sku")
      .agg(count(lit(1)).as("n_days"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .withColumn("slope_num", col("n_days") * col("sxy") - col("sx") * col("sy"))
      .withColumn("slope_den", col("n_days") * col("sxx") - col("sx") * col("sx"))
      .where(col("slope_den") > 0)
      .withColumn("trend",
        when(col("slope_num") > 0, "worsening")
          .when(col("slope_num") < 0, "improving")
          .otherwise("flat"))
      .select("sku", "n_days", "slope_num", "slope_den", "trend")
}
