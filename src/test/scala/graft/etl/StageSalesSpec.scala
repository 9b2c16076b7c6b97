package graft.etl

import java.time.LocalDate

import graft.SparkSpec

/** StageSales — glue_job_1_stage_sales.py:32-66 semantics. */
class StageSalesSpec extends SparkSpec {
  import spark.implicits._

  private val d = LocalDate.parse("2024-01-02")

  test("normalizes sku with upper(trim) and aggregates per sku") {
    val raw = Seq(("  a1 ", "2"), ("A1", "3"), ("b2", "5")).toDF("sku", "quantity")
    val out = StageSales.stage(raw, d).orderBy("sku").collect()
    assert(out.map(r => (r.getString(1), r.getLong(2))).toSeq ===
      Seq(("A1", 5L), ("B2", 5L)))
  }

  test("stamps the processing date as a DateType column") {
    val raw = Seq(("x", "1")).toDF("sku", "quantity")
    val out = StageSales.stage(raw, d).collect().head
    assert(out.getDate(0).toString === "2024-01-02")
  }

  test("cast-failure quantity rows become null and are ignored by sum") {
    val raw = Seq(("a", "2"), ("a", "oops"), ("a", "")).toDF("sku", "quantity")
    val out = StageSales.stage(raw, d).collect()
    assert(out.length === 1)
    assert(out.head.getLong(2) === 2L)
  }

  test("sum(int) widens to long (BIGINT fact column)") {
    val raw = Seq(("a", Int.MaxValue.toString), ("a", Int.MaxValue.toString))
      .toDF("sku", "quantity")
    val out = StageSales.stage(raw, d).collect().head
    assert(out.getLong(2) === 2L * Int.MaxValue)
  }
}
