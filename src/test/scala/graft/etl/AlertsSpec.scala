package graft.etl

import java.sql.Date

import graft.SparkSpec

/** Alerts — glue_job_2_reconcile.py:118-141 as a pure function. */
class AlertsSpec extends SparkSpec {
  import spark.implicits._

  private def recon(rows: Seq[(String, java.lang.Long)]) =
    rows.map { case (sku, disc) =>
      (Date.valueOf("2024-01-02"), sku, if (sku < "M") "name-" + sku else null,
        0L, 0L, 0L, 0L, disc)
    }.toDF("date_key", "sku", "product_name", "opening_stock", "quantity_sold",
      "expected_closing_stock", "actual_closing_stock", "discrepancy_amount")

  test("no discrepancies → None (empty-day alert gate)") {
    assert(Alerts.build(recon(Seq("A" -> 0L, "B" -> 0L))) === None)
  }

  test("alert carries total count and worst-k examples") {
    val r = Alerts.build(recon(Seq("A" -> 3L, "B" -> -10L, "C" -> 0L, "D" -> 7L)), k = 2).get
    assert(r.count === 3)
    assert(r.examples.size === 2)
    assert(r.examples.head === "- SKU: B, Product: name-B, Discrepancy: -10") // |−10| largest
    assert(r.message.contains("Total items with discrepancies: 3"))
  }

  test("alertBody builds the reference-format message fully in-plan") {
    val row = Alerts.alertBody(
      recon(Seq("A" -> 3L, "B" -> -10L, "C" -> 0L)),
      k = 2, reportPath = Some("s3://bucket/processed/")).collect().head
    assert(row.getAs[Long]("n_discrepancies") === 2L)
    assert(row.getAs[String]("example_lines") ===
      "- SKU: B, Product: name-B, Discrepancy: -10\n- SKU: A, Product: name-A, Discrepancy: 3")
    val body = row.getAs[String]("body")
    assert(body.startsWith(
      "Inventory reconciliation for date 2024-01-02 found discrepancies.\n\n" +
        "Total items with discrepancies: 2\n\nExample Discrepancies:\n- SKU: B"))
    assert(body.endsWith("\n\nFull report available at: s3://bucket/processed/"))
  }

  test("topOffenders orders by |discrepancy| desc with sku tie-break") {
    val top = Alerts.topOffenders(
      Alerts.discrepancies(recon(Seq("B" -> -5L, "A" -> 5L, "C" -> 9L))), 3)
      .collect().map(_.getString(1)).toSeq
    assert(top === Seq("C", "A", "B"))
  }

  test("notify publishes through the sink iff a report exists (K5 effect leg)") {
    val seen = scala.collection.mutable.ListBuffer.empty[(String, Alerts.AlertReport)]
    val sink = new Alerts.AlertSink {
      override def publish(subject: String, report: Alerts.AlertReport): Unit =
        seen += ((subject, report))
    }
    assert(!Alerts.notify(Alerts.build(recon(Seq("A" -> 0L))), sink))
    assert(seen.isEmpty)
    assert(Alerts.notify(Alerts.build(recon(Seq("A" -> 4L))), sink))
    assert(seen.size === 1)
    assert(seen.head._1 === "Inventory discrepancies found")
    assert(seen.head._2.message.contains("Total items with discrepancies: 1"))
  }

  test("null product_name is coalesced to N/A in-plan") {
    val top = Alerts.topOffenders(
      Alerts.discrepancies(recon(Seq("Z" -> 1L))), 1).collect().head
    assert(top.getString(2) === "N/A")
  }
}
