package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, IntegerType}

/** Stage & aggregate one day of raw POS sales.
  *
  * Reference semantics: glue-scripts/glue_job_1_stage_sales.py:32-66 —
  * read raw CSV, canonicalize `sku` with upper(trim()), cast `quantity`
  * to int (bad rows → null, ignored by sum), groupBy(sku).agg(sum),
  * stamp the processing date, emit (date_key, sku, total_quantity_sold).
  *
  * Pure DataFrame => DataFrame (no reads/writes), so the same function
  * serves unit tests, SparkEntry.queries and the Pipeline runner.
  *
  * Scale: a single hash aggregate — partial (map-side) + final after one
  * exchange on sku. No other shuffle. sum(int) widens to long, matching
  * the reference's BIGINT fact column (sql/create_redshift_tables.sql:35).
  */
object StageSales {

  /** Canonical join-key normalization used across the whole pipeline —
    * glue_job_1_stage_sales.py:45, glue_job_create_dims.py:45,
    * glue_job_2_reconcile.py:58,69.
    */
  def normalizeSku(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    upper(trim(c))

  /** raw(sku: string, quantity: string|int, ...) → staged daily sales.
    *
    * `try_cast` (not `cast`): the reference runs non-ANSI Spark where a
    * malformed quantity silently becomes null and is ignored by sum
    * (glue_job_1_stage_sales.py:46); under Spark 4's default ANSI mode a
    * plain cast would instead fail the whole job on one bad row.
    */
  def stage(raw: DataFrame, processingDate: LocalDate): DataFrame =
    raw
      .select(
        normalizeSku(col("sku")).as("sku"),
        expr("try_cast(quantity AS int)").as("quantity"))
      .groupBy("sku")
      .agg(sum("quantity").as("total_quantity_sold"))
      .select(
        lit(processingDate.toString).cast(DateType).as("date_key"),
        col("sku"),
        col("total_quantity_sold"))
}
