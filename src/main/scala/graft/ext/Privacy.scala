package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction over a text column — the privacy-scrub pass
  * every LLM-training-data pipeline runs before a corpus ships (the
  * reference pipeline has no analogue; this is part of the additive
  * extension surface alongside dedup and quality scoring).
  *
  * Four regex classes (emails, NANP-style phone numbers, SSN-shaped ids,
  * IPv4 addresses), each written in the Java-regex / RE2 COMMON SUBSET so
  * the DuckDB oracle evaluates the identical pattern: no lookarounds, no
  * backreferences, no `\b` anchors (RE2 and Java agree on `\b`, but the
  * unanchored forms below are what production scrubbers run — a phone
  * number glued to a word is still a leak). Detection counts each class
  * independently on the ORIGINAL text; redaction applies the classes in
  * a fixed order (email, phone, SSN, IPv4) so an earlier replacement
  * cannot manufacture a later match: every sentinel token is digit-free.
  *
  * Scale: both operators are pure per-row projections of codegen'd
  * built-ins (`regexp_count` / `regexp_replace`) — zero shuffle, no UDFs,
  * embarrassingly parallel over a 100 TB corpus. The redaction pass fuses
  * all four classes into one projection, so the text is deserialized once
  * per row regardless of class count.
  */
object Privacy {

  /** (class name, pattern, sentinel) — ordered as redaction applies them.
    * Patterns are deliberately unanchored (see object scaladoc); the SSN
    * and phone shapes cannot overlap (`\d{2}` vs `\d{3}` middle group
    * makes any shared prefix fail on the second separator).
    */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\d{3}-\\d{3}-\\d{4}", "<PHONE>"),
    ("ssn", "\\d{3}-\\d{2}-\\d{4}", "<SSN>"),
    ("ipv4", "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}", "<IP>"))

  /** Per-document PII counts, one column per class plus the total.
    * Output: doc_id, n_email, n_phone, n_ssn, n_ipv4, n_pii.
    */
  def piiStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val counts = Patterns.map { case (name, re, _) =>
      regexp_count(col(textCol), lit(re)).as(s"n_$name")
    }
    docs
      .select(col("doc_id") +: counts: _*)
      .withColumn("n_pii",
        Patterns.map(p => col(s"n_${p._1}")).reduce(_ + _))
  }

  /** Redacted text: every match of every class replaced by its sentinel,
    * in [[Patterns]] order, in ONE projection. Output: doc_id, redacted,
    * n_redacted (total matches scrubbed, counted pre-redaction).
    */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val redacted = Patterns.foldLeft(col(textCol)) {
      case (c, (_, re, token)) => regexp_replace(c, lit(re), lit(token))
    }
    val total = Patterns
      .map { case (_, re, _) => regexp_count(col(textCol), lit(re)) }
      .reduce(_ + _)
    docs.select(col("doc_id"), redacted.as("redacted"),
      total.as("n_redacted"))
  }

  /** K-ANONYMITY audit over a set of quasi-identifier columns: a row is
    * k-anonymous when at least k−1 OTHER rows share its full
    * quasi-identifier tuple, so any equivalence class smaller than k is
    * a re-identification risk and a suppression candidate. Reports the
    * risk surface, not the rows: number of violating classes, rows
    * inside them, the worst (smallest) class size, and the total class
    * count — bounded output at any scale.
    *
    * Scale: ONE hash aggregate on the quasi-identifier tuple (map-side
    * partials collapse the fact), then two 1-row aggregates over the
    * |classes| frame. The class frame itself (for suppression joins)
    * is the same aggregate un-summarized — callers reuse it without a
    * second scan.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      sum(when(col("class_size") < k, 1L).otherwise(0L)).as("n_violating_classes"),
      sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
        .as("n_rows_at_risk"),
      min("class_size").as("min_class_size"))
  }
}
