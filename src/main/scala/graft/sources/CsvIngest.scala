package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Raw-zone CSV ingest — the reference's primary source
  * (glue_job_1_stage_sales.py:32-37, glue_job_create_dims.py:32-37,
  * glue_job_2_reconcile.py:52-56,63-67).
  *
  * The default PINS the schema (SURVEY.md §7.4 risk 2): inference reads
  * the data to guess types, so the same logical column can land as INT on
  * one day's file and DOUBLE on the next (one "2.5" flips it), silently
  * changing downstream arithmetic and join/cast behavior across re-runs —
  * and at 100 TB the inference pre-pass is also a second full read of the
  * raw zone. `inferSchema = true` is the reference-compatibility mode
  * (the reference infers on every read, glue_job_1_stage_sales.py:35),
  * for sources whose files are already trusted to be type-stable; the
  * drift hazard it re-introduces is pinned by CsvIngestSpec.
  */
object CsvIngest {

  /** Read a header'd CSV zone with the pinned `schema` — the default
    * (and only) typed path. The reference-compatibility inference mode
    * lives in [[readInferred]], a separate method with no schema
    * parameter, so a carefully pinned schema can never be silently
    * ignored by a stray flag (the r5 `inferSchema = true` overload
    * accepted — and discarded — the schema argument).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Reference-compatibility mode: infer the schema from the data on
    * every read, exactly like the reference's reader
    * (glue_job_1_stage_sales.py:35). Only for sources whose files are
    * already trusted to be type-stable — the drift hazard (and the
    * second full read the inference pre-pass costs at scale) is pinned
    * by CsvIngestSpec.
    */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** Audited permissive read: pinned schema plus a `_corrupt_record`
    * column capturing each malformed line verbatim (type-mismatched
    * fields, wrong arity). The reference's reader silently nulls bad
    * fields; a 100 TB raw zone ALWAYS contains some — this is the ingest
    * that lets the DQ gate count and quarantine them instead of letting
    * nulls leak into fillna(0) arithmetic downstream. Returns the frame
    * with `_corrupt_record` last: `where(col("_corrupt_record").isNull)`
    * is the clean stream, `.isNotNull` the quarantine stream — one read
    * serves both (no second pass; the column is populated by the SAME
    * parse). Spark caveat baked in: a query that selects ONLY
    * `_corrupt_record` is disallowed by the parser (it would require
    * re-parsing); keep at least one data column in downstream plans.
    */
  def readAudited(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType, nullable = true))
    spark.read.schema(withCorrupt)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
  }
}
