package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Discrepancy alerting — glue-scripts/glue_job_2_reconcile.py:118-141.
  *
  * The reference filters discrepancy != 0, counts, collects 5 sample rows
  * and publishes an SNS message — recomputing the whole join tree for each
  * action (SURVEY.md §3.2). We model the message build as a pure function
  * DataFrame → Option[AlertReport] so the side effect (notify) is injected
  * by the caller, and we cache the filtered frame so count + top-k share
  * one computation.
  *
  * Deviation (SURVEY.md §2.7 L1): the reference's bare limit(5) samples
  * nondeterministically; we take a deterministic top-k by |discrepancy|
  * (worst offenders first, sku tie-break) → TakeOrderedAndProject, which
  * never materializes more than k rows per partition.
  */
object Alerts {

  final case class AlertReport(count: Long, examples: Seq[String], message: String)

  /** Notification channel — the seam for the reference's SNS publish
    * (glue_job_2_reconcile.py:136-139: topic + subject + message). The
    * effect stays OUTSIDE the query plan: `build` is pure, `notify` is
    * the only place a side effect happens, so retries/re-runs of the
    * plan can never double-publish.
    */
  trait AlertSink {
    def publish(subject: String, report: AlertReport): Unit
  }

  /** Example binding: stderr (driver log), standing in for SNS. */
  object LogAlertSink extends AlertSink {
    override def publish(subject: String, report: AlertReport): Unit =
      Console.err.println(s"[ALERT] $subject\n${report.message}")
  }

  /** K5's effect leg: publish iff a report exists (the reference's
    * "only when discrepancies are found" conditional, mirrored here as
    * Option.foreach). Returns whether a publish happened.
    */
  def notify(report: Option[AlertReport], sink: AlertSink,
      subject: String = "Inventory discrepancies found"): Boolean = {
    report.foreach(sink.publish(subject, _))
    report.isDefined
  }

  /** F1 — mismatch predicate. Null-safe only because fillna(0) already ran
    * inside Reconcile.reconcile (reference ordering preserved).
    */
  def discrepancies(recon: DataFrame): DataFrame =
    recon.where(col("discrepancy_amount") =!= 0)

  /** L1 (deterministic) — worst k offenders. F2's null→"N/A" display
    * fallback (glue_job_2_reconcile.py:132, driver-side in the reference)
    * is lifted into the plan as a coalesce, so it distributes and is
    * oracle-checkable.
    */
  def topOffenders(disc: DataFrame, k: Int): DataFrame =
    disc
      .withColumn("product_name", coalesce(col("product_name"), lit("N/A")))
      .orderBy(abs(col("discrepancy_amount")).desc, col("sku"))
      .limit(k)

  /** Builds the alert iff any discrepancy exists — returns None otherwise.
    * One pass: cache → count → bounded collect(k).
    */
  def build(recon: DataFrame, k: Int = 5): Option[AlertReport] = {
    val disc = discrepancies(recon).cache()
    try {
      val n = disc.count()
      if (n == 0) None
      else {
        val rows: Array[Row] = topOffenders(disc, k).collect()
        val examples = rows.toSeq.map { r =>
          val name = r.getAs[String]("product_name") // "N/A"-coalesced in-plan
          val sku = r.getAs[String]("sku")
          val amt = r.getAs[Long]("discrepancy_amount")
          s"SKU $sku ($name): discrepancy $amt"
        }
        val msg =
          s"""Inventory reconciliation found $n discrepancies.
             |Top ${examples.size} by magnitude:
             |${examples.mkString("\n")}""".stripMargin
        Some(AlertReport(n, examples, msg))
      }
    } finally disc.unpersist()
  }
}
