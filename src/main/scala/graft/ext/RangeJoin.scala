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

  /** Global TIME-MERGE form of [[pointInIntervalTopK]] — identical
    * result contract (per interval, the top-`k` contained points under
    * `(ptCol DESC, idCol ASC)`), with NO candidate-pair stage anywhere.
    *
    * Why it exists: the bucket-blocked join's candidate stream is
    * density-QUADRATIC under any bucket constant — sub-bucket intervals
    * × co-bucket points meet pairwise, so 10× denser data costs 100×
    * regardless of `bucketSeconds` (measured at sf1/sf10, BASELINE.md).
    * This form never enumerates a candidate: because the top-k order is
    * time-descending, the k best points in `[s, e]` are exactly the k
    * LATEST points at-or-before `e`, truncated at the first one older
    * than `s` — so each interval needs one PROBE at its end time, not a
    * join against its contents, and all probes ride a single ordered
    * scan of the time axis (the as-of union+scan machinery generalized
    * from 1 match to k).
    *
    * Plan shape (every stage linear or bucket-scale):
    *   1. Union point rows with one probe row per interval (at `e`;
    *      `__tie` sorts a probe AFTER equal-time points — inclusive
    *      end). Bucket the time axis as in [[pointInInterval]].
    *   2. Per bucket, an EXPANDING-frame window (unboundedPreceding →
    *      currentRow, ordered by time) running the bounded-heap
    *      [[graft.functions.TopKByScore]]: each probe row reads the
    *      top-k of its OWN bucket's points up to `e` from a prefix scan
    *      — O(n·log n) sort + O(n·k) heap updates, never n·p pairs.
    *   3. Carry-in across buckets: per-bucket point top-k (hash
    *      aggregate, map-side partial) prefix-merged by one
    *      bucket-scale single-partition window — the same
    *      nation/region-class table trick as [[intervalCount]]'s
    *      offsets — gives each bucket the top-k of ALL earlier buckets.
    *   4. Per probe, merge the two ≤k arrays (own-bucket prefix ∪
    *      carry-in), re-sort, truncate to k, drop elements older than
    *      `s`. Points before `s` rank strictly after every in-range
    *      point (time-descending order), so the surviving ranks are a
    *      consecutive 1..m prefix — identical to ranking inside
    *      `[s, e]` directly.
    *
    * Skew note: step 2 partitions by time bucket, so one bucket's
    * points sort in one task — `bucketSeconds` bounds per-task volume
    * (finer buckets shrink tasks and only grow the bucket-scale carry
    * table, k rows per bucket). Degenerate intervals (null bounds,
    * start > end) emit nothing, matching the join form's predicate.
    */
  def pointInIntervalTopKMerge(points: DataFrame, ptCol: String, idCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      keyCols: Seq[String], k: Int,
      bucketSeconds: Long = 3600L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive, got $k")
    val bw = bucketSeconds * 1000000L
    val tkType = "array<struct<score:double,id:bigint>>"
    val keyTypes = keyCols.map(kc => kc -> intervals.schema(kc).dataType)
    val pts = points.where(col(ptCol).isNotNull && col(idCol).isNotNull)
      .select(keyTypes.map { case (kc, t) => lit(null).cast(t).as(kc) } ++ Seq(
        unix_micros(col(ptCol)).as("__t"), lit(0).as("__tie"),
        unix_micros(col(ptCol)).cast("double").as("__score"),
        col(idCol).cast("long").as("__id"),
        lit(null).cast("long").as("__st")): _*)
    val probes = intervals.where(col(startCol).isNotNull &&
        col(endCol).isNotNull && col(startCol) <= col(endCol))
      .select(keyCols.map(col) ++ Seq(
        unix_micros(col(endCol)).as("__t"), lit(1).as("__tie"),
        lit(null).cast("double").as("__score"),
        lit(null).cast("long").as("__id"),
        unix_micros(col(startCol)).as("__st")): _*)
    val u = pts.unionByName(probes).withColumn("__bkt", floor(col("__t") / bw))

    // 2. Own-bucket prefix top-k. Null-scored probe rows never enter the
    // heap, so a probe reads exactly the POINTS at-or-before it.
    val wIn = Window.partitionBy("__bkt").orderBy(col("__t"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u.withColumn("__local",
      graft.functions.TopKByScore(col("__score"), col("__id"), k).over(wIn))
      .where(col("__tie") === 1)

    // 3. Bucket-scale carry-in: a marker per bucket sorts BEFORE its own
    // bucket's exploded top-k rows, so its prefix heap holds exactly the
    // earlier buckets' points. (k+1)·|buckets| rows through one
    // single-partition window — nation/region-class at any data scale.
    val perBkt = u.where(col("__tie") === 0)
      .groupBy("__bkt")
      .agg(graft.functions.TopKByScore(col("__score"), col("__id"), k).as("__tk"))
      .select(col("__bkt"), lit(0).as("__mtie"), explode(col("__tk")).as("__e"))
      .select(col("__bkt"), col("__mtie"),
        col("__e.score").as("__score"), col("__e.id").as("__id"))
    val markers = u.select("__bkt").distinct()
      .select(col("__bkt"), lit(-1).as("__mtie"),
        lit(null).cast("double").as("__score"), lit(null).cast("long").as("__id"))
    val wCarry = Window.orderBy(col("__bkt"), col("__mtie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = perBkt.unionByName(markers)
      .withColumn("__carry",
        graft.functions.TopKByScore(col("__score"), col("__id"), k).over(wCarry))
      .where(col("__mtie") === -1)
      .select(col("__bkt"), col("__carry"))

    // 4. Merge, truncate, filter to [s, e]. Both inputs are best-first
    // sorted; the comparator re-sorts the 2k concat under the same
    // (score DESC, id ASC) total order.
    val cmp = (l: Column, r: Column) =>
      when(l("score") > r("score"), -1)
        .when(l("score") < r("score"), 1)
        .when(l("id") < r("id"), -1)
        .when(l("id") > r("id"), 1)
        .otherwise(0)
    local.join(broadcast(carry), Seq("__bkt"), "left")
      .withColumn("__all", slice(array_sort(concat(
        coalesce(col("__local"), array().cast(tkType)),
        coalesce(col("__carry"), array().cast(tkType))), cmp), 1, k))
      .select(keyCols.map(col) :+ col("__st") :+
        posexplode(col("__all")).as(Seq("r", "nb")): _*)
      .where(col("nb.score") >= col("__st").cast("double"))
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
