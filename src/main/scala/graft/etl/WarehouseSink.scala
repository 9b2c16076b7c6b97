package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Warehouse load contract — the typed seam for the reference's Redshift
  * loads (dags/retail_pipeline_dag.py:19-41: DELETE-by-date + COPY for
  * facts, TRUNCATE + COPY for dims; sql/create_redshift_tables.sql:4-38).
  *
  * The pipeline depends only on this trait, so a JDBC/warehouse binding
  * (DELETE+COPY in a transaction) can replace the Parquet one without
  * touching job logic. The contract every binding must honor:
  *  - [[loadFact]] is IDEMPOTENT per (table, date): re-running a date
  *    replaces exactly that date's rows and nothing else.
  *  - [[loadDim]] is a full refresh: the table afterwards contains
  *    exactly `df`'s rows.
  */
trait WarehouseSink {

  /** Where `table` lives, for read-back and reporting. */
  def location(table: String): String

  /** Idempotent daily fact load: replace exactly `date`'s rows. The frame
    * must carry a `date_key` column equal to `date`.
    */
  def loadFact(df: DataFrame, table: String, date: LocalDate): Unit

  /** Full-refresh dimension load (TRUNCATE + COPY analogue). */
  def loadDim(df: DataFrame, table: String): Unit

  /** Read a loaded table back. */
  def read(spark: SparkSession, table: String): DataFrame
}

/** Parquet binding: date-partitioned layout with dynamic partition
  * overwrite as the DELETE-by-date+COPY analogue (SURVEY.md §4.1). The
  * overwrite mode is a per-write option, never session state.
  */
final class ParquetWarehouseSink(root: String) extends WarehouseSink {

  override def location(table: String): String = s"$root/$table"

  override def loadFact(df: DataFrame, table: String, date: LocalDate): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("date_key").parquet(location(table))

  /** Small by construction; single file kept deliberately (reference's
    * coalesce(1), glue_job_create_dims.py:56) — acceptable for dims only,
    * never for facts (SURVEY.md §7.5).
    */
  override def loadDim(df: DataFrame, table: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(location(table))

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(location(table))
}
