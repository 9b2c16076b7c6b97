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

  /** Read a header'd CSV zone with the pinned `schema`, or with the
    * reference's inference when `inferSchema` is set (the pinned schema
    * is ignored in that mode, exactly like the reference's reader).
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      inferSchema: Boolean = false): DataFrame =
    if (inferSchema)
      spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    else
      spark.read.schema(schema).option("header", "true").csv(path)
}
