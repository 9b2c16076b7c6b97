package graft.etl

import java.time.LocalDate

import graft.SparkSpec

/** MultiDayReconcile — the set-oriented form must agree exactly with the
  * single-day flagship on every date inside the range, including the first
  * (ADVICE r1: boundary day needs the from-1 opening).
  */
class MultiDayReconcileSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("range form agrees with single-day form on interior AND first date") {
    val from = LocalDate.parse("1995-06-14")
    val to = LocalDate.parse("1995-06-16")
    val range = MultiDayReconcile.reconcileRange(spark, dir, from, to)
    Seq(from, from.plusDays(1)).foreach { day =>
      import org.apache.spark.sql.functions.col
      val fromRange = range.where(col("date_key") === day.toString)
        .select("sku", "opening_stock", "quantity_sold", "expected_closing_stock",
          "actual_closing_stock", "discrepancy_amount")
        .orderBy("sku").collect()
      val single = RetailMapping.reconciliation(spark, dir, day)
        .select("sku", "opening_stock", "quantity_sold", "expected_closing_stock",
          "actual_closing_stock", "discrepancy_amount")
        .orderBy("sku").collect()
      assert(fromRange === single, s"mismatch for $day")
    }
  }

  test("no fabricated rows outside [from, to]") {
    import org.apache.spark.sql.functions.{col, max, min}
    val from = LocalDate.parse("1995-06-14")
    val to = LocalDate.parse("1995-06-15")
    val r = MultiDayReconcile.reconcileRange(spark, dir, from, to)
      .agg(min(col("date_key")), max(col("date_key"))).collect().head
    assert(r.getDate(0).toString === "1995-06-14")
    assert(r.getDate(1).toString === "1995-06-15")
  }
}
