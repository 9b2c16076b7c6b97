package graft.schemas

import org.apache.spark.sql.types._

/** Explicit StructTypes for every entity the engine touches.
  *
  * The reference infers schemas on all raw CSV reads
  * (glue-scripts/glue_job_1_stage_sales.py:35, glue_job_create_dims.py:35,
  * glue_job_2_reconcile.py:55,66). Inference is nondeterministic across
  * inputs, so this engine pins schemas by construction (SURVEY.md §7.4) and
  * treats inference as a non-default option.
  */
object Schemas {

  /** Raw POS sales CSV — glue_job_1_stage_sales.py:26,32-47.
    * `quantity` arrives as string and is cast to int in-plan (bad rows → null).
    */
  val posSalesRaw: StructType = StructType(Seq(
    StructField("sku", StringType, nullable = true),
    StructField("quantity", StringType, nullable = true)
  ))

  /** Raw warehouse inventory snapshot CSV — glue_job_2_reconcile.py:52-72,
    * glue_job_create_dims.py:42-48.
    */
  val warehouseInventoryRaw: StructType = StructType(Seq(
    StructField("sku", StringType, nullable = true),
    StructField("stock_on_hand", IntegerType, nullable = true),
    StructField("product_name", StringType, nullable = true),
    StructField("category", StringType, nullable = true)
  ))

  /** Staged daily sales — glue_job_1_stage_sales.py:62-66,
    * sql/create_redshift_tables.sql:31-38. sum(int) widens to bigint.
    */
  val stagedSales: StructType = StructType(Seq(
    StructField("date_key", DateType, nullable = false),
    StructField("sku", StringType, nullable = true),
    StructField("total_quantity_sold", LongType, nullable = true)
  ))

  /** Product dimension — glue_job_create_dims.py:43-50,
    * sql/create_redshift_tables.sql:20-26. Unique on sku.
    */
  val dimProducts: StructType = StructType(Seq(
    StructField("sku", StringType, nullable = true),
    StructField("product_name", StringType, nullable = true),
    StructField("category", StringType, nullable = true)
  ))

  /** Reconciliation fact — glue_job_2_reconcile.py:99-108,
    * sql/create_redshift_tables.sql:4-15. Stock columns widened int→long:
    * at 100 TB a per-SKU aggregate can exceed Int.MaxValue, and Spark
    * sum(int) yields long anyway.
    */
  val reconciliation: StructType = StructType(Seq(
    StructField("date_key", DateType, nullable = false),
    StructField("sku", StringType, nullable = true),
    StructField("product_name", StringType, nullable = true),
    StructField("opening_stock", LongType, nullable = false),
    StructField("quantity_sold", LongType, nullable = false),
    StructField("expected_closing_stock", LongType, nullable = false),
    StructField("actual_closing_stock", LongType, nullable = false),
    StructField("discrepancy_amount", LongType, nullable = false)
  ))
}
