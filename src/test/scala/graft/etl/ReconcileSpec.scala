package graft.etl

import java.time.LocalDate

import graft.SparkSpec

/** Reconcile — the flagship join tree, glue_job_2_reconcile.py:79-108.
  * Edge semantics per FIXTURES/SURVEY §7.4 risk 3: fillna(0) must run
  * after ALL joins so one-sided SKUs compute correct discrepancies.
  */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private val d = LocalDate.parse("2024-01-02")

  private def run(broadcastDim: Boolean = false) = {
    val opening = Seq(("A", 10L), ("B", 5L)).toDF("sku", "opening_stock")
    val closing = Seq(("A", 7L), ("C", 4L)).toDF("sku", "actual_closing_stock")
    val sales = Seq(("A", 2L), ("D", 9L)).toDF("sku", "total_quantity_sold")
    val dim = Seq(("A", "apple", "f"), ("B", "beet", "v"))
      .toDF("sku", "product_name", "category")
    Reconcile.reconcile(opening, closing, sales, dim, d, broadcastDim)
      .orderBy("sku").collect()
      .map(r => (r.getString(1), Option(r.getString(2)),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
  }

  test("full-outer keeps SKUs from either snapshot; left joins keep all") {
    // D appears only in sales — the reference's J1 full-outer is on
    // opening/closing only, then sales LEFT: D is dropped. A,B,C survive.
    assert(run().map(_._1).toSeq === Seq("A", "B", "C"))
  }

  test("sku only in opening: closing/sales null→0, discrepancy = -expected") {
    val b = run().find(_._1 == "B").get
    // opening=5, sold=0, expected=5, actual=0, discrepancy=-5
    assert((b._3, b._4, b._5, b._6, b._7) === ((5L, 0L, 5L, 0L, -5L)))
  }

  test("sku only in closing: opening/sales null→0, discrepancy = actual") {
    val c = run().find(_._1 == "C").get
    assert((c._3, c._4, c._5, c._6, c._7) === ((0L, 0L, 0L, 4L, 4L)))
  }

  test("fully matched sku computes expected = opening - sold") {
    val a = run().find(_._1 == "A").get
    // opening=10, sold=2, expected=8, actual=7, discrepancy=-1
    assert((a._3, a._4, a._5, a._6, a._7) === ((10L, 2L, 8L, 7L, -1L)))
  }

  test("dim miss leaves product_name null (N/A lift happens in Alerts)") {
    assert(run().find(_._1 == "C").get._2 === None)
  }

  test("broadcastDim=true produces identical results") {
    assert(run(broadcastDim = true) === run(broadcastDim = false))
  }
}
