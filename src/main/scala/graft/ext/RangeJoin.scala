package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X7 — distributed NON-EQUI point-in-interval join (range join).
  *
  * Spark's join machinery plans a pure range predicate (no equi key) as
  * BroadcastNestedLoopJoin — fine when one side fits in memory, a
  * cross-product catastrophe when both sides are large. This operator
  * makes the range predicate equi-joinable by BUCKET BLOCKING the time
  * axis: each point hashes to the single bucket containing it, each
  * interval explodes to every bucket it covers, and the join runs as a
  * plain shuffled equi-join on the bucket id with the exact range
  * predicate as a residual filter. A matching pair meets in EXACTLY one
  * bucket (the point's), so the output needs no dedup and each pair is
  * verified once.
  *
  * Cost model: candidates = Σ_buckets |points_b| · |intervals covering
  * b| — linear in true matches plus an overlap factor of ~(1 +
  * interval_len / bucket). Pick `bucketSeconds` near the typical
  * interval length: too small multiplies the interval explosion, too
  * large degrades toward per-bucket cross products. Degenerate
  * year-spanning intervals explode to ~8760 rows at the 1-hour default
  * — bounded, but cap open-ended intervals upstream.
  *
  * This is the large-large path; when one side is small, Spark's own
  * BroadcastNestedLoopJoin (or a `broadcast()` hint on the dim) is
  * already the right plan and this blocking is unnecessary.
  */
object RangeJoin {

  /** Join `points` (event-time column `ptCol`, TIMESTAMP) to `intervals`
    * (`[startCol, endCol]` TIMESTAMP, inclusive both ends) on
    * containment. Output: every (interval ⋈ point) pair's columns;
    * column names must be disjoint across the two frames (internal
    * bucket/micros columns are dropped).
    */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    val bw = bucketSeconds * 1000000L
    val bkt = (c: Column) => floor(unix_micros(c) / bw)
    val p = points.withColumn("__bkt", bkt(col(ptCol)))
    val iv = intervals.withColumn("__bkt",
      explode(sequence(bkt(col(startCol)), bkt(col(endCol)))))
    p.join(iv, p("__bkt") === iv("__bkt") &&
        col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bkt")
  }
}
