package graft.etl

import java.sql.{Connection, DriverManager}
import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

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

/** JDBC binding: the reference's ACTUAL warehouse-load semantics
  * (dags/retail_pipeline_dag.py:20-42) over any JDBC database — facts
  * load as DELETE-by-date then COPY (bulk append), dims as TRUNCATE then
  * COPY, exactly the DAG's SQL pairs. Tested against embedded Derby
  * (on the Spark classpath); a Redshift/Postgres URL drops in unchanged.
  *
  * Tables are created on first load with explicit portable DDL (VARCHAR,
  * not the Derby dialect's CLOB default — mirroring
  * sql/create_redshift_tables.sql:4-38's typed columns) so warehouse-side
  * predicates and joins work on every column.
  *
  * Scale notes: the DELETE runs once on the driver (pruned by the
  * warehouse's date_key sort/dist key, per the reference DDL); the COPY
  * is Spark's distributed JDBC append — each partition writes its own
  * batch, which is the reference's parallel S3 COPY analogue. Like the
  * reference's DELETE-then-COPY pair, the two steps are not one
  * transaction: a failed COPY leaves the date partially loaded until the
  * (idempotent) re-run — the standard warehouse pattern; a
  * staging-table + transactional swap binding would slot behind the same
  * trait if stronger atomicity were needed.
  */
/** @param props optional JDBC connection properties (user/password,
  *   driver options) threaded through BOTH the driver-side statements
  *   and Spark's distributed read/write — so a warehouse needing
  *   credentials works without embedding them in the URL string.
  *   Defensively copied: later caller mutation cannot change the sink.
  */
final class JdbcWarehouseSink(url: String,
    props: java.util.Properties = new java.util.Properties) extends WarehouseSink {

  private val connProps: java.util.Properties = {
    val p = new java.util.Properties()
    p.putAll(props)
    p
  }

  override def location(table: String): String = s"$url#$table"

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url, connProps)
    try f(c) finally c.close()
  }

  /** Reference-DDL-shaped portable column types (VARCHAR over the JDBC
    * dialect's CLOB mapping for strings — CLOBs cannot be compared or
    * grouped warehouse-side; DOUBLE PRECISION because bare DOUBLE is
    * not a PostgreSQL/Redshift type, while every major warehouse and
    * Derby accept the SQL-standard spelling).
    */
  private def sqlType(dt: DataType): String = dt match {
    case StringType => "VARCHAR(255)"
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case DoubleType => "DOUBLE PRECISION"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(
      s"no warehouse mapping for column type $other")
  }

  /** Existence via JDBC metadata, not by catching a vendor-specific
    * duplicate-table SQLState (Derby says X0Y32, PostgreSQL/Redshift
    * 42P07, …) — the steady-state second load must take the
    * already-exists path on EVERY backend. Case-insensitive compare:
    * case-folding databases store the unquoted table name folded.
    * Scoped to the connection's CURRENT schema: a same-named table in
    * another schema/catalog must not satisfy the check while the
    * subsequent DELETE/TRUNCATE/INSERT resolve against the default
    * schema where it does not exist. (Drivers predating
    * Connection.getSchema fall back to the unscoped listing.)
    */
  private def tableExists(c: Connection, table: String): Boolean = {
    val schemaPattern =
      try Option(c.getSchema).filter(_.nonEmpty).orNull
      catch { case _: java.sql.SQLException | _: AbstractMethodError => null }
    val rs = c.getMetaData.getTables(null, schemaPattern, null, Array("TABLE"))
    try {
      var found = false
      while (!found && rs.next())
        found = table.equalsIgnoreCase(rs.getString("TABLE_NAME"))
      found
    } finally rs.close()
  }

  private def ensureTable(df: DataFrame, table: String): Unit = {
    // Column identifiers are QUOTED so the warehouse stores the frame's
    // exact (lowercase) names — unquoted DDL would be uppercased by
    // case-folding databases (Derby/Oracle style) and read back as a
    // DIFFERENT schema than was written; Spark's JDBC writer quotes its
    // INSERT column lists, so quoting here keeps the two consistent.
    val cols = df.schema.fields
      .map(f => s""""${f.name}" ${sqlType(f.dataType)}""").mkString(", ")
    withConn { c =>
      if (!tableExists(c, table))
        c.createStatement().executeUpdate(s"CREATE TABLE $table ($cols)")
    }
  }

  /** DELETE-by-date + COPY (dags/retail_pipeline_dag.py:20,35):
    * re-running a date replaces exactly that date's rows.
    */
  override def loadFact(df: DataFrame, table: String, date: LocalDate): Unit = {
    ensureTable(df, table)
    withConn { c =>
      val del = c.prepareStatement(s"""DELETE FROM $table WHERE "date_key" = ?""")
      del.setDate(1, java.sql.Date.valueOf(date))
      del.executeUpdate()
    }
    df.write.mode(SaveMode.Append).jdbc(url, table, connProps)
  }

  /** TRUNCATE + COPY (dags/retail_pipeline_dag.py:28-33): the table
    * afterwards holds exactly `df`'s rows.
    */
  override def loadDim(df: DataFrame, table: String): Unit = {
    ensureTable(df, table)
    withConn(_.createStatement().executeUpdate(s"TRUNCATE TABLE $table"))
    df.write.mode(SaveMode.Append).jdbc(url, table, connProps)
  }

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.jdbc(url, table, connProps)
}
