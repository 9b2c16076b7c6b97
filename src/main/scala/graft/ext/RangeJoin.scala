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

  /** Bounded ENUMERATING form of the range join: per interval, the
    * top-`k` contained points under `(ptCol DESC, tieCols ASC)` — the
    * "latest k events in each window" shape. This is the scalable
    * answer when the caller needs actual point rows, not a census
    * ([[intervalCount]]) and not the full pair set ([[pointInInterval]],
    * whose OUTPUT is density-quadratic — 163B rows at sf10 for the
    * declared session×event pairing; BASELINE.md names it output-bound):
    * output is exactly ≤ k·|intervals|, linear in intervals at any
    * density.
    *
    * Plan shape: the same bucket-blocked equi-join generates candidate
    * pairs, and the ranking is the bounded-heap aggregate
    * [[graft.functions.TopKByScore]] (score = event-time micros, DESC;
    * id ASC tie-break) — a size-k heap per interval per map task, so
    * the pair volume STREAMS through the join's codegen into partial
    * aggregation and the exchange carries ≤ k rows per (interval,
    * partition). NO SORT touches the pair stream anywhere. This is
    * load-bearing, not style: the first form of this operator used
    * `row_number ≤ k`, whose WindowGroupLimit partial pass still SORTS
    * every map task's full pair set — measured 182 s at sf1 vs 21 s
    * for interval_join's enumerate-everything on the same pairs; the
    * heap form ranks the same stream in O(pairs·log k) with no
    * materialization. `keyCols` must identify intervals. Output:
    * keyCols, rank (1-based), `idCol`, and the point time as `ptCol`.
    */
  def pointInIntervalTopK(points: DataFrame, ptCol: String, idCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      keyCols: Seq[String], k: Int,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // Micros fit a double exactly (|ts| ≪ 2⁵³), so score order ≡ ts
    // order. The score is PROJECTED before the aggregate so it collapses
    // into the join's codegen'd output projection and the aggregate's
    // per-row update evaluates two bound references — a
    // TypedImperativeAggregate's update is interpreted per row, and at
    // 10⁹ candidate pairs every virtual call in that path is wall-clock.
    pointInInterval(points, ptCol, intervals, startCol, endCol, bucketSeconds)
      .select(keyCols.map(col) :+
        unix_micros(col(ptCol)).cast("double").as("__score") :+ col(idCol): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(graft.functions.TopKByScore(col("__score"), col(idCol), k).as("tk"))
      .select(keyCols.map(col) :+ posexplode(col("tk")).as(Seq("r", "nb")): _*)
      .select(keyCols.map(col) ++ Seq((col("r") + 1).as("rank"),
        col("nb.id").as(idCol),
        timestamp_micros(col("nb.score").cast("long")).as(ptCol)): _*)
  }

  /** Stabbing COUNT — per interval, the NUMBER of points inside
    * `[startCol, endCol]` (inclusive both ends), WITHOUT enumerating the
    * point-interval pairs.
    *
    * Why it exists: [[pointInInterval]]'s cost is its OUTPUT — the pair
    * volume is quadratic in per-window density (the sf1 scale run
    * measured exactly 100× pairs for 10× density on both sides:
    * 16.27M → 1.627B, BASELINE.md). When the caller only aggregates a
    * COUNT over those pairs, none of that volume needs to exist: count
    * of points in [s, e] = F(e) − F(s⁻), where F(t) is the global
    * cumulative point count at time t. This operator computes F with a
    * distributed two-level prefix sum over endpoint MARKERS, so total
    * cost is O((|points| + 2|intervals|) · log) with output exactly
    * |intervals| — linear where the pair join is density-quadratic.
    *
    * Plan shape (all stages linear, no pair stage anywhere):
    *   1. Union one marker row per point (weight 1) with two per
    *      interval (start, sign −1; end, sign +1). Inclusive-endpoint
    *      tie-break rides a `__tie` column: a start marker sorts BEFORE
    *      equal-time points (so F(s⁻) excludes them → they count as
    *      inside), an end marker AFTER (so F(e) includes them).
    *   2. Bucket the time axis (same axis blocking as
    *      [[pointInInterval]]); per-bucket point totals cumsum into
    *      bucket OFFSETS. The offset table is bucket-scale (time range /
    *      bucketSeconds — ~9k rows/year at the 1h default), so its
    *      single-partition window and its broadcast are nation/region-
    *      class at any data scale; a multi-decade 100 TB deployment
    *      that outgrows that applies the same two-level trick to the
    *      bucket table itself.
    *   3. Within each bucket, a (ts, tie)-ordered running count of
    *      point markers — the only data-scale exchange, one hash
    *      partition by bucket. F(marker) = bucket offset + running
    *      count. Marker rows with equal (ts, tie) are order-ambiguous
    *      only among themselves, and endpoint markers carry weight 0,
    *      so every endpoint's F is deterministic.
    *   4. Keep endpoint rows, sum sign·F per `keyCols` — an interval
    *      with no points inside yields a 0-count row (the pair join
    *      would omit it).
    *
    * `keyCols` must identify intervals (duplicate keys sum their
    * intervals' counts). Only the count is available — callers needing
    * per-pair payloads (joins back to point attributes) still pay
    * [[pointInInterval]]'s output-bound cost, which is then optimal:
    * the answer itself is that large.
    *
    * DEGENERATE intervals (null start/end, or start > end) are filtered
    * out up front, matching the twin contract exactly: the pair join's
    * null-intolerant / contradictory range predicate emits no row for
    * them, so the count path must emit no row either — without the
    * filter a null endpoint would drop only its ONE marker at the
    * bucket join (null never equi-matches), leaving a one-sided ±F
    * contribution, and an inverted interval would yield F(e) − F(s⁻)
    * < 0 (RangeJoinSpec pins both cases).
    */
  def intervalCount(points: DataFrame, ptCol: String,
      intervals0: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String,
      bucketSeconds: Long = 3600L,
      countCol: String = "n_inside"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val intervals = intervals0.where(
      col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
    val bw = bucketSeconds * 1000000L
    val keyTypes = keyCols.map(k => k -> intervals.schema(k).dataType)
    val pts = points.select(
      keyTypes.map { case (k, t) => lit(null).cast(t).as(k) } ++ Seq(
        unix_micros(col(ptCol)).as("__t"), lit(0).as("__tie"),
        lit(1L).as("__ev"), lit(0L).as("__sign")): _*)
    def endpoint(tc: String, tie: Int, sign: Long) = intervals.select(
      keyCols.map(col) ++ Seq(
        unix_micros(col(tc)).as("__t"), lit(tie).as("__tie"),
        lit(0L).as("__ev"), lit(sign).as("__sign")): _*)
    val u = pts
      .unionByName(endpoint(startCol, -1, -1L))
      .unionByName(endpoint(endCol, 1, 1L))
      .withColumn("__bkt", floor(col("__t") / bw))
    // Bucket offsets: points strictly BEFORE each bucket. Bucket-scale
    // frame; the empty-bucket gaps need no rows because every marker's
    // own bucket is present by construction.
    val wOff = Window.orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = u.groupBy("__bkt").agg(sum("__ev").as("__c"))
      .withColumn("__off", coalesce(sum("__c").over(wOff), lit(0L)))
      .select("__bkt", "__off")
    val wRun = Window.partitionBy("__bkt").orderBy(col("__t"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__run", sum("__ev").over(wRun))
      .where(col("__sign") =!= 0)
      .join(broadcast(offs), "__bkt")
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__sign") * (col("__run") + col("__off"))).as(countCol))
  }
}
