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

  /** The alert MESSAGE BODY as a one-row DataFrame — the reference
    * builds this string driver-side in a Python loop over collected rows
    * (glue_job_2_reconcile.py:127-135); here the whole message is
    * format_string/concat column work (SURVEY.md §2.9), so it
    * distributes, is oracle-checkable, and [[build]]'s driver-side work
    * shrinks to ONE bounded single-row collect. Output columns:
    * n_discrepancies, example_lines (the top-k "- SKU: …" lines,
    * newline-joined, worst-first with sku tie-break — the reference's
    * nondeterministic limit(5) made deterministic exactly like
    * [[topOffenders]]), body (the full reference-format message, date
    * taken in-plan from the frame's date_key).
    *
    * `reportPath` appends the reference's "Full report available at:"
    * footer when the caller has a processed-zone location to point at.
    */
  def alertBody(recon: DataFrame, k: Int = 5,
      reportPath: Option[String] = None): DataFrame =
    // The count branch and the top-k branch both consume disc; it is
    // filter output (bounded by the mismatch rate), so materialize once.
    alertBodyOfDisc(discrepancies(recon).localCheckpoint(), k, reportPath)

  /** [[alertBody]] over an already-filtered (and caller-materialized)
    * discrepancy frame — the form [[build]] uses so its cache is shared.
    */
  private[etl] def alertBodyOfDisc(disc: DataFrame, k: Int,
      reportPath: Option[String] = None): DataFrame = {
    // Each example line pre-sorted into a struct whose natural order is
    // (|amount| desc, sku asc) — array_sort after collect_list gives a
    // deterministic aggregation order without a window.
    val ex = topOffenders(disc, k).select(
      struct((-abs(col("discrepancy_amount"))).as("neg_mag"),
        col("sku").as("s"),
        format_string("- SKU: %s, Product: %s, Discrepancy: %d",
          col("sku"), col("product_name"), col("discrepancy_amount")).as("line"))
        .as("e"))
      .agg(array_join(
        transform(array_sort(collect_list(col("e"))), e => e.getField("line")),
        "\n").as("example_lines"))
    val counts = disc.agg(count(lit(1)).as("n_discrepancies"),
      max(col("date_key")).as("d"))
    counts.crossJoin(ex) // 1 × 1
      .select(col("n_discrepancies"), col("example_lines"),
        concat(
          lit("Inventory reconciliation for date "),
          coalesce(col("d").cast("string"), lit("?")),
          lit(" found discrepancies.\n\nTotal items with discrepancies: "),
          col("n_discrepancies"),
          lit("\n\nExample Discrepancies:\n"),
          col("example_lines"),
          lit(reportPath.fold("")(p => s"\n\nFull report available at: $p")))
          .as("body"))
  }

  /** Builds the alert iff any discrepancy exists — returns None otherwise.
    * One pass: cache → ONE single-row collect of the in-plan
    * [[alertBody]] (count + examples + message all computed in the
    * cluster; the reference collected 5 whole rows and looped
    * driver-side).
    */
  def build(recon: DataFrame, k: Int = 5,
      reportPath: Option[String] = None): Option[AlertReport] = {
    val disc = discrepancies(recon).cache()
    try {
      val row: Row = alertBodyOfDisc(disc, k, reportPath).collect().head
      val n = row.getAs[Long]("n_discrepancies")
      if (n == 0) None
      else Some(AlertReport(n,
        row.getAs[String]("example_lines").split("\n").toSeq,
        row.getAs[String]("body")))
    } finally disc.unpersist()
  }
}
