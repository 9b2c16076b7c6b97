package graft.etl

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SLOWLY-CHANGING DIMENSION Type 2 merge — the warehouse-history twin
  * of the reference's TRUNCATE-and-reload dim job (glue-scripts/
  * glue_job_create_dims.py:42-50 keeps only the latest row per sku;
  * SCD2 keeps every version with validity intervals, the standard
  * Kimball layout a Redshift warehouse would use for as-of reporting).
  *
  * Versioned layout: the natural key plus `valid_from` / `valid_to` /
  * `is_current` — the open version has `valid_to = null`. An incoming
  * day-d snapshot closes the open version of every key whose tracked
  * attributes changed (sets `valid_to = d`) and opens a new version
  * (`valid_from = d`); unchanged keys and already-closed history pass
  * through untouched. Keys absent from the update batch stay open —
  * updates are a delta, not a full snapshot contract.
  *
  * Scale design: ONE equi-join of the open versions against the update
  * batch on the natural key (the closed-history partition of the dim is
  * never joined at all — it unions straight through), null-safe `<=>`
  * attribute comparison in the join projection, no windows, no
  * collect. At 100 TB dim scale this is a key-shuffled join sized by
  * the UPDATE batch plus a pass-through of history; with the dim
  * bucketed on the key (etl/Bucketing) even that shuffle amortizes to
  * zero. The merge is deterministic: same inputs → same versions, so
  * re-running a day is idempotent (a second identical batch changes
  * nothing — attributes compare equal).
  */
object Scd2 {

  /** Initial load: every row becomes the open version as of `from`. */
  def init(dim: DataFrame, from: Date): DataFrame =
    dim.withColumn("valid_from", lit(from))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))

  /** Merge the `updates` delta (natural key `key`, tracked columns
    * `attrs`) into the versioned `current` table as of `asOf`. Output:
    * the full new versioned table.
    */
  def merge(current: DataFrame, updates: DataFrame, key: String,
      attrs: Seq[String], asOf: Date): DataFrame = {
    val closed = current.where(!col("is_current"))
    val open = current.where(col("is_current"))
    val upd = updates.select(
      (col(key).as("u_key") +: attrs.map(a => col(a).as(s"u_$a"))): _*)
    // Open versions, each annotated with its matching update (if any):
    // changed → close it; unchanged or unmatched → pass through.
    val joined = open.join(upd, col(key) === col("u_key"), "left")
    val attrChanged = attrs.map(a => !(col(a) <=> col(s"u_$a")))
      .reduce(_ || _)
    val stillOpen = joined.where(col("u_key").isNull || !attrChanged)
      .select(current.columns.map(col): _*)
    val nowClosed = joined.where(col("u_key").isNotNull && attrChanged)
      .select(current.columns.map(col): _*)
      .withColumn("valid_to", lit(asOf))
      .withColumn("is_current", lit(false))
    // New versions: changed keys re-open at asOf, brand-new keys open
    // their first version. One anti-ish derivation from the same join.
    val changedKeys = joined.where(col("u_key").isNotNull && attrChanged)
      .select(col("u_key"))
    val newKeys = upd.join(open.select(col(key).as("u_key")), Seq("u_key"),
      "left_anti").select(col("u_key"))
    val opened = upd.join(changedKeys.unionByName(newKeys).distinct(), Seq("u_key"))
      .select((col("u_key").as(key) +: attrs.map(a => col(s"u_$a").as(a))): _*)
      .withColumn("valid_from", lit(asOf))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    closed.unionByName(stillOpen).unionByName(nowClosed).unionByName(opened)
  }

  /** The dimension as of `date`: the version whose validity interval
    * covers it — `[valid_from, valid_to)` half-open, open version
    * unbounded. The point-in-time read SCD2 exists to serve.
    */
  def asOf(versioned: DataFrame, date: Date): DataFrame =
    versioned.where(col("valid_from") <= lit(date) &&
      (col("valid_to").isNull || col("valid_to") > lit(date)))

  /** Fact-side TEMPORAL dimension join — each fact row picks up the
    * dimension version valid on ITS OWN date (`version_from` + the
    * requested `payload` attributes; facts dated before the key's first
    * version keep nulls). This is the consumption pattern SCD2 history
    * exists for: "price the order at the price of its day", at fact
    * scale.
    *
    * Because [[merge]] keeps each key's versions TILING time
    * contiguously (a version closes exactly where the next opens), the
    * interval-containment lookup reduces to an as-of join on
    * `valid_from` — so this delegates to [[graft.ext.AsOfJoin]]'s
    * union + one-window-pass plan: one key shuffle of facts + versions,
    * linear on hot keys, never the key-equal cross product a range
    * predicate would plan.
    */
  def temporalJoin(fact: DataFrame, dateCol: String, versioned: DataFrame,
      key: String, payload: Seq[String] = Nil): DataFrame =
    graft.ext.AsOfJoin.asOf(fact,
      versioned.select((col(key) +: col("valid_from") +: payload.map(col)): _*)
        .withColumn("version_from", col("valid_from")),
      key, dateCol, "valid_from", "version_from" +: payload)

  /** SCD TYPE-1 upsert — the `MERGE INTO` a lakehouse table format runs
    * for a history-free dimension refresh: delta rows overwrite matched
    * keys wholesale, unmatched delta keys insert, untouched current rows
    * pass through. One full-outer equi-join on the key; the emitted
    * `action` column ('insert' / 'update' / 'keep') is the merge audit a
    * production MERGE reports as its row-activity metrics. `delta` must
    * be unique per key (pre-aggregate a multi-version feed first — with
    * duplicates, which delta row wins is nondeterministic).
    *
    * Null semantics: change detection is null-safe (`<=>` per column), a
    * matched row counts as 'update' only if some attribute actually
    * differs; matched-but-identical rows report 'keep', so re-running
    * the same delta is visibly idempotent.
    */
  def upsertType1(current: DataFrame, delta: DataFrame, key: String,
      attrs: Seq[String]): DataFrame = {
    val d = delta.select((key +: attrs).map(c => col(c).as(s"u_$c")): _*)
    val j = current.join(d, col(key) === col(s"u_$key"), "full_outer")
    val changed = attrs.map(c => !(col(c) <=> col(s"u_$c"))).reduce(_ || _)
    val action = when(col(key).isNull, lit("insert"))
      .when(col(s"u_$key").isNull, lit("keep"))
      .when(changed, lit("update"))
      .otherwise(lit("keep"))
    val matched = col(s"u_$key").isNotNull
    j.select(
      coalesce(col(key), col(s"u_$key")).as(key) +:
        attrs.map(c => when(matched, col(s"u_$c")).otherwise(col(c)).as(c)) :+
        action.as("action"): _*)
  }
}
