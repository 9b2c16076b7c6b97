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
}
