package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (a.k.a. point-in-time) join — for each left row,
  * attach the payload of the LAST right row at or before the left row's
  * time within the same key group; left rows with no preceding right row
  * keep null payloads (left-join semantics).
  *
  * The reference pipeline's closest analogue is the d−1 snapshot pair
  * (`glue_job_2_reconcile.py`'s yesterday-vs-today join), which is an
  * as-of join degenerated to a fixed lag; this is the general operator a
  * time-series/feature-store workload needs (e.g. "each event sees the
  * most recent order before it").
  *
  * Scale design (100 TB): the tempting formulation — a range join
  * `l.key = r.key AND r.t <= l.t` + a per-left-row max — makes Spark
  * build the full key-equal cross product before filtering (there is no
  * native as-of physical operator), which is O(|L|·|R| / keys) shuffle
  * and blows up on hot keys. This implementation instead UNIONS the two
  * sides and runs ONE window pass: tag rows with a side marker, sort
  * each key group by (time, side) with right rows first at equal
  * timestamps, and carry the last non-null payload forward
  * (`last(col, ignoreNulls = true)` over unbounded-preceding..current).
  * Cost: one shuffle of |L| + |R| rows on the key, sequential scan per
  * group — the same shape Flink's temporal join and kdb's aj use.
  * Hot-key groups degrade linearly (a sort + scan), never quadratically.
  *
  * Contract: `right` must be unique per (key, time) — pre-aggregate it
  * (e.g. `max_by`) if it is not; with duplicates, which right row wins
  * is not deterministic because each payload column is carried forward
  * independently.
  */
object AsOfJoin {

  /** @param left      probe side; all its columns pass through
    * @param right     build side; must share `key`'s name, be unique per
    *                  (key, rightTime), and have no other column names in
    *                  common with `left`
    * @param key       equi-join key column name (same on both sides)
    * @param leftTime  left event-time column name
    * @param rightTime right event-time column name
    * @param payload   right columns to attach (all others are dropped)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val overlap = (right.columns.toSet - key).intersect(left.columns.toSet)
    require(overlap.isEmpty, s"rename overlapping right columns: $overlap")
    // side: right = 0, left = 1 — at equal times the right row sorts
    // first, so a left row at exactly t sees a right row at t (>= asof).
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val r = right.withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
      .drop(rightTime)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
      .where(col("__side") === 1)
      .select(left.columns.map(col) ++ payload.map(col): _*)
  }

  /** As-of join with a max-staleness tolerance — identical to [[asOf]]
    * except a match older than `toleranceSec` seconds before the left
    * row's time is discarded (payload stays null): the feature-store
    * "point-in-time lookup with TTL" contract.
    *
    * Same single union + window pass: the matched right TIME is carried
    * forward beside the payload, then payload columns are nulled where
    * it trails the left time by more than the tolerance. No extra
    * shuffle over [[asOf]]. The tolerance is also what bounds state in
    * a streaming twin — nothing older than `toleranceSec` can ever
    * match, so retained state per key is a fixed time window rather
    * than the whole history.
    */
  def asOfTolerance(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      toleranceSec: Long): DataFrame = {
    val overlap = (right.columns.toSet - key).intersect(left.columns.toSet)
    require(overlap.isEmpty, s"rename overlapping right columns: $overlap")
    require(toleranceSec >= 0, "toleranceSec must be non-negative")
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val r = right.withColumn("__t", col(rightTime))
      .withColumn("__rt", col(rightTime)).withColumn("__side", lit(0))
      .drop(rightTime)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = ("__rt" +: payload).foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val fresh = col("__rt") >=
      col(leftTime) - expr(s"INTERVAL $toleranceSec SECOND")
    payload.foldLeft(carried) { (df, c) =>
      df.withColumn(c, when(fresh, col(c)))
    }
      .where(col("__side") === 1)
      .select(left.columns.map(col) ++ payload.map(col): _*)
  }

  /** NEAREST-neighbor as-of join: each left row gets the right row
    * closest in time in EITHER direction, ties preferring the backward
    * (at-or-before) match — the sensor-alignment contract ("attach the
    * reading nearest this event"), where plain [[asOf]] is the
    * look-back-only feature-store contract.
    *
    * Same single union + key exchange: TWO window passes share the one
    * partitioning — a forward scan carrying the last at-or-before right
    * row and a backward scan (descending time order) carrying the first
    * at-or-after one — then a pure projection picks whichever matched
    * time is nearer. The direction choice is made ONCE per row and all
    * payload columns follow it, so the attached columns always come
    * from a single right row. Cost over [[asOf]]: one extra sort within
    * the same exchange, no extra shuffle; hot keys stay linear.
    */
  def asOfNearest(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val overlap = (right.columns.toSet - key).intersect(left.columns.toSet)
    require(overlap.isEmpty, s"rename overlapping right columns: $overlap")
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val r = right.withColumn("__t", col(rightTime))
      .withColumn("__rt", col(rightTime)).withColumn("__side", lit(0))
      .drop(rightTime)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort ahead of left rows at equal times in BOTH scan
    // directions, so an exact-time right row is visible to the left row
    // as a zero-distance match both ways.
    val wb = Window.partitionBy(key).orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(key).orderBy(col("__t").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(
      unioned
        .withColumn("__bt", last(col("__rt"), ignoreNulls = true).over(wb))
        .withColumn("__ft", last(col("__rt"), ignoreNulls = true).over(wf))) {
      (df, c) =>
        df.withColumn(s"__b_$c", last(col(c), ignoreNulls = true).over(wb))
          .withColumn(s"__f_$c", last(col(c), ignoreNulls = true).over(wf))
    }
    val useBack = col("__bt").isNotNull && (col("__ft").isNull ||
      (expr(s"unix_micros($leftTime)") - expr("unix_micros(__bt)")) <=
        (expr("unix_micros(__ft)") - expr(s"unix_micros($leftTime)")))
    payload.foldLeft(carried) { (df, c) =>
      df.withColumn(c, when(useBack, col(s"__b_$c")).otherwise(col(s"__f_$c")))
    }
      .where(col("__side") === 1)
      .select(left.columns.map(col) ++ payload.map(col): _*)
  }
}
