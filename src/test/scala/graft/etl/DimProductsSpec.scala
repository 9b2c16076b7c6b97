package graft.etl

import graft.SparkSpec

/** DimProducts — glue_job_create_dims.py:42-50 with the deterministic
  * dedup deviation (SURVEY.md §2.5 A2).
  */
class DimProductsSpec extends SparkSpec {
  import spark.implicits._

  test("keeps exactly one row per sku") {
    val raw = Seq(
      ("s1", "apple", "fruit"), ("s1", "banana", "fruit"), ("s2", "carrot", "veg"))
      .toDF("sku", "product_name", "category")
    val out = DimProducts.build(raw)
    assert(out.count() === 2)
    assert(out.select("sku").distinct().count() === 2)
  }

  test("dedup is deterministic regardless of input order") {
    val rows = Seq(("s1", "zeta", "z"), ("s1", "alpha", "a"), ("s1", "mid", "m"))
    val a = DimProducts.build(rows.toDF("sku", "product_name", "category")).collect()
    val b = DimProducts.build(rows.reverse.toDF("sku", "product_name", "category")).collect()
    assert(a === b)
    assert(a.head.getString(1) === "alpha") // min by (product_name, category)
  }

  test("trims product_name and category, normalizes sku") {
    val raw = Seq((" s1 ", "  apple  ", " fruit ")).toDF("sku", "product_name", "category")
    val out = DimProducts.build(raw).collect().head
    assert((out.getString(0), out.getString(1), out.getString(2)) === (("S1", "apple", "fruit")))
  }
}
