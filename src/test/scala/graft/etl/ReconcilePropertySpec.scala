package graft.etl

import java.time.LocalDate

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Property tests of the reconciliation algebra (SURVEY.md §5.3), via raw
  * scalacheck (scalatestplus bridge not available offline).
  */
class ReconcilePropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val d = LocalDate.parse("2024-01-02")

  private val skuGen = Gen.oneOf("A", "B", "C", "D", "E")
  private val snapGen: Gen[Map[String, Long]] =
    Gen.mapOf(Gen.zip(skuGen, Gen.chooseNum(0L, 100L)))

  test("discrepancy = actual - opening + sold; rows = |open ∪ close| (20 cases)") {
    val prop = Prop.forAll(snapGen, snapGen, snapGen) {
      (open: Map[String, Long], close: Map[String, Long], sold: Map[String, Long]) =>
        val out = Reconcile.reconcile(
          open.toSeq.toDF("sku", "opening_stock"),
          close.toSeq.toDF("sku", "actual_closing_stock"),
          sold.toSeq.toDF("sku", "total_quantity_sold"),
          Seq(("A", "apple", "f")).toDF("sku", "product_name", "category"),
          d).collect()
        val rowsOk = out.length == (open.keySet ++ close.keySet).size
        val discOk = out.forall { r =>
          val sku = r.getString(1)
          r.getLong(7) ==
            close.getOrElse(sku, 0L) - open.getOrElse(sku, 0L) + sold.getOrElse(sku, 0L)
        }
        rowsOk && discOk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("re-running the same inputs is idempotent (bit-identical rows)") {
    val prop = Prop.forAll(snapGen, snapGen) { (open: Map[String, Long], close: Map[String, Long]) =>
      def run() = Reconcile.reconcile(
        open.toSeq.toDF("sku", "opening_stock"),
        close.toSeq.toDF("sku", "actual_closing_stock"),
        Seq.empty[(String, Long)].toDF("sku", "total_quantity_sold"),
        Seq(("A", "apple", "f")).toDF("sku", "product_name", "category"),
        d).orderBy("sku").collect().toSeq
      run() == run()
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
