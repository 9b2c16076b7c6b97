package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Build the product dimension: one row per sku.
  *
  * Reference semantics: glue-scripts/glue_job_create_dims.py:42-50 —
  * normalize sku, trim name/category, dropDuplicates(["sku"]).
  *
  * Deviation (SURVEY.md §2.5 A2): the reference's dropDuplicates keeps a
  * nondeterministic row per key. We rank with row_number over a total
  * ordering of the non-key columns so re-runs (and the DuckDB oracle)
  * agree bit-for-bit. Cost is identical: one shuffle on sku either way.
  */
object DimProducts {

  /** raw(sku, product_name, category, ...) → deduped dimension. */
  def build(raw: DataFrame): DataFrame = {
    val cleaned = raw.select(
      StageSales.normalizeSku(col("sku")).as("sku"),
      trim(col("product_name")).as("product_name"),
      trim(col("category")).as("category"))
    val w = Window.partitionBy("sku").orderBy("product_name", "category")
    cleaned
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
  }
}
