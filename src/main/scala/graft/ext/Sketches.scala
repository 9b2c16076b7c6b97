package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distinct-count SKETCHES — the 100 TB cardinality tool.
  *
  * Exact `count(distinct x)` per group is a full shuffle of every
  * distinct value; at corpus scale the interesting questions ("how many
  * distinct users/URLs/documents per slice") need a bounded-size,
  * MERGEABLE summary instead. The classic engine answer is HyperLogLog
  * (`approx_count_distinct`), but HLL sketches are not portable across
  * engines bit-for-bit, which breaks our oracle discipline. The
  * K-MINIMUM-VALUES sketch (Bar-Yossef et al. 2002) is: keep the k
  * smallest 60-bit md5 hashes of the distinct values; estimate
  * D̂ = (k−1)·M / h_(k) where h_(k) is the k-th minimum and M = 2⁶⁰ the
  * hash space. Every step is order statistics over a deterministic hash
  * plus integer arithmetic — DuckDB replays it exactly.
  *
  * Scale shape: the sketch is ≤ k rows per group (k·16 bytes), built by
  * one distinct-aggregate + bounded window; merging two sketches is
  * "union, keep k smallest" — associative and commutative, so partial
  * sketches from shards/days/micro-batches combine without re-reading
  * data (the same frozen-store discipline as the minhash signature
  * store). Relative error ≈ 1/√(k−2) (k = 64 → ~13%, k = 1024 → ~3%).
  */
object Sketches {

  /** Hash space size M = 2⁶⁰ as an exact decimal (for the estimator's
    * (k−1)·M numerator, which exceeds a BIGINT; DuckDB mirrors with
    * HUGEINT).
    */
  val HashSpace: BigInt = BigInt(1) << 60

  /** Build the per-group KMV sketch: ≤ k rows (groupCols…, kmv_hash),
    * the k smallest DISTINCT hashes of `valueCol`. One distinct
    * aggregate (map-side partials) + one bounded-width window.
    */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("kmv_hash"))
    df.select(groupCols.map(col) :+
        Dedup.hash60(col(valueCol).cast("string")).as("kmv_hash"): _*)
      .where(col("kmv_hash").isNotNull)
      .distinct()
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .drop("rn")
  }

  /** Merge two sketches (or a sketch with a new batch's sketch): union,
    * dedup, keep the k smallest per group. Associative + commutative —
    * any batch cut converges to the one-shot sketch.
    */
  def kmvMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("kmv_hash"))
    a.unionByName(b).distinct()
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .drop("rn")
  }

  /** Estimate per-group distinct counts from a sketch. Groups that
    * retained fewer than k hashes saw every distinct value — their count
    * is EXACT. Saturated groups use the unbiased KMV estimator
    * ⌊(k−1)·M / h_(k)⌋ — decimal-exact on both engines (the quotient's
    * fractional part can never graze 1 within decimal(38,18) rounding,
    * because the divisor is < 2⁶⁰).
    */
  def kmvEstimate(sketch: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val numer = lit(new java.math.BigDecimal((HashSpace * (k - 1)).bigInteger))
    sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("kmv_cnt"), max(col("kmv_hash")).as("kmv_kth"))
      .select(groupCols.map(col) :+
        when(col("kmv_cnt") < k, col("kmv_cnt"))
          .otherwise(floor(numer / col("kmv_kth")).cast("long"))
          .as("est_distinct"): _*)
  }

  /** Sketch + estimate in one call — the declared-query form. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame =
    kmvEstimate(kmvSketch(df, groupCols, valueCol, k), groupCols, k)

  /** Rolling distinct-user counts — the mergeability payoff. Exact
    * rolling `count(distinct)` cannot use a windowed aggregate (distinct
    * doesn't decompose); the standard warehouse answer is per-day
    * sketches MERGED across the trailing window. Per day: the k-min
    * sketch of that day's users; each day's sketch contributes to the
    * `windowDays` target days it trails into (a bounded k×w explosion of
    * the TINY sketch table, never of the events), re-min per target day,
    * estimate. At 100 TB the daily sketches are the persisted store —
    * any window (7/28/90-day) re-derives from the same ≤ k·days rows
    * without touching raw events.
    *
    * Output: (day, users_roll) for every day present in the data.
    */
  def rollingActiveUsers(events: DataFrame, k: Int = 64,
      windowDays: Int = 7): DataFrame = {
    val byDay = events.select(to_date(col("ts")).as("day"), col("user_id"))
    val daily = kmvSketch(byDay, Seq("day"), "user_id", k)
    val days = byDay.select("day").distinct()
    val contrib = daily
      .withColumn("target_day",
        explode(sequence(col("day"), date_add(col("day"), windowDays - 1))))
      .join(days.select(col("day").as("target_day")), Seq("target_day"), "left_semi")
      .select(col("target_day").as("day"), col("kmv_hash"))
      .distinct()
    val w = Window.partitionBy("day").orderBy("kmv_hash")
    val merged = contrib
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .drop("rn")
    kmvEstimate(merged, Seq("day"), k)
      .withColumnRenamed("est_distinct", "users_roll")
  }

  /** Estimate the per-group INTERSECTION cardinality |A ∩ B| from two
    * same-k sketches — the set-algebra payoff KMV has over HLL (whose
    * sketches only union): merge to the union's k-min set U, count the
    * fraction ρ of U's hashes present in BOTH input sketches, and scale
    * the union estimate (Beyer et al. 2007): |A∩B| ≈ ρ·D̂(A∪B),
    * computed as `(n_both · D̂_U) div |U|` in pure integer arithmetic.
    * When neither side saturated its k, the union sketch is the exact
    * union and the estimate degenerates to the EXACT intersection
    * count. Both sketches must be built with the same k and hash
    * (enforced by sharing [[kmvSketch]]).
    *
    * The distributed-systems case for this over `COUNT(DISTINCT) ...
    * INTERSECT`: segment-overlap questions ("users who did X and Y")
    * against persisted per-segment sketch stores need no re-scan of
    * either side — k-row frames join k-row frames.
    */
  def kmvIntersectEstimate(a: DataFrame, b: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    val numer = lit(new java.math.BigDecimal((HashSpace * (k - 1)).bigInteger))
    val joinKey = groupCols :+ "kmv_hash"
    val flags = kmvMerge(a, b, groupCols, k)
      .join(a.withColumn("in_a", lit(1L)), joinKey, "left")
      .join(b.withColumn("in_b", lit(1L)), joinKey, "left")
    flags
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("kk"), max(col("kmv_hash")).as("kth"),
        sum(when(col("in_a") === 1L && col("in_b") === 1L, 1L).otherwise(0L))
          .as("n_both"))
      .withColumn("du",
        when(col("kk") < k, col("kk"))
          .otherwise(floor(numer / col("kth")).cast("long")))
      // The n_both·du product goes through decimal so its overflow
      // envelope matches the DuckDB mirror's HUGEINT promotion instead of
      // silently wrapping in long arithmetic (ADVICE r6); `div` of a
      // decimal by a long is still the integral quotient as BIGINT.
      .select(groupCols.map(col) :+
        expr("(n_both * CAST(du AS DECIMAL(38,0))) div kk").as("est_overlap"): _*)
  }

  // ------------------------------------------------------------ count-min

  /** The depth hash-row bucket columns for one value: row i buckets by
    * `((a_i·(h mod p) + b_i) mod p) mod width` over the 60-bit md5 base
    * hash — [[Dedup.Perms]] constants, so the DuckDB mirror is the same
    * integer chain (all intermediates < 2⁶², BIGINT-safe on both
    * engines). md5 (not xxhash) is deliberate here, unlike
    * [[graft.ext.BloomJoin]]: CMS ESTIMATES are hash-dependent values
    * the oracle must reproduce, not a membership prefilter whose output
    * is hash-independent.
    */
  private def cmsBucket(h: Column, i: Int, width: Int): Column = {
    val (a, b) = Dedup.Perms(i)
    (h % Dedup.Prime * a + b) % Dedup.Prime % width
  }

  /** COUNT-MIN sketch (Cormode & Muthukrishnan 2005) — the mergeable
    * FREQUENCY summary beside [[kmvSketch]]'s cardinality one. A d×w
    * counter table: each occurrence of a value increments one counter
    * per hash row; `est(v) = min_i counter[i][bucket_i(v)]` never
    * underestimates and overestimates by ≤ εN with probability 1−δ at
    * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. Because the counters are SUMS, the sketch
    * is order-independent and merges by addition — shards, days, and
    * micro-batches combine without re-reading data, the same
    * frozen-store discipline as the KMV and signature stores.
    *
    * Scale shape: building is one map-side-combined aggregate over the
    * occurrence rows into ≤ d·w counters (a few KiB at any corpus
    * size); estimating joins the probe set's d buckets against the
    * broadcast-sized counter table. The classic use at 100 TB: token /
    * URL / key frequency for heavy-hitter gating without a full groupBy
    * over the long tail.
    *
    * Output: (cms_row, cms_bucket, cms_cnt) — occupied counters only
    * (absent bucket ≡ 0, restored by [[cmsEstimate]]'s left join).
    */
  def cmsSketch(df: DataFrame, valueCol: String, depth: Int = 4,
      width: Int = 4096): DataFrame = {
    require(depth >= 1 && depth <= Dedup.SigCount,
      s"depth must be in [1, ${Dedup.SigCount}], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val h = Dedup.hash60(col(valueCol).cast("string"))
    df.where(col(valueCol).isNotNull)
      .select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("cms_row"), cmsBucket(h, i, width).as("cms_bucket"))): _*)).as("rb"))
      .groupBy(col("rb.cms_row").as("cms_row"), col("rb.cms_bucket").as("cms_bucket"))
      .agg(count(lit(1)).as("cms_cnt"))
  }

  /** [[cmsSketch]] from PRE-AGGREGATED (value, weight) rows: each
    * counter adds the value's weight instead of 1 per occurrence, so
    * `cmsSketchWeighted(counts(v), ...)` ≡ `cmsSketch(occurrences, ...)`
    * bit-for-bit when `weightCol` is the value's occurrence count (the
    * counters are sums; addition commutes). The point at scale (guide
    * §2.3 — aggregate before you shuffle, and hash less): the md5 +
    * d-row modular bucket chain runs once per DISTINCT value, not once
    * per occurrence — on a token stream the distinct set is the Zipf
    * head+tail, orders of magnitude smaller than the stream.
    */
  def cmsSketchWeighted(df: DataFrame, valueCol: String, weightCol: String,
      depth: Int = 4, width: Int = 4096): DataFrame = {
    require(depth >= 1 && depth <= Dedup.SigCount,
      s"depth must be in [1, ${Dedup.SigCount}], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val h = Dedup.hash60(col(valueCol).cast("string"))
    df.where(col(valueCol).isNotNull)
      .select(col(weightCol).as("__cms_w"),
        explode(array((0 until depth).map(i =>
          struct(lit(i).as("cms_row"), cmsBucket(h, i, width).as("cms_bucket"))): _*)).as("rb"))
      .groupBy(col("rb.cms_row").as("cms_row"), col("rb.cms_bucket").as("cms_bucket"))
      .agg(sum(col("__cms_w")).as("cms_cnt"))
  }

  /** Merge counter tables by addition — associative and commutative, so
    * any batch cut converges to the one-shot sketch bit-for-bit.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("cms_row", "cms_bucket")
      .agg(sum(col("cms_cnt")).as("cms_cnt"))

  /** Point-query the sketch for every row of `probes` (distinct on
    * `valueCol`; other columns pass through): min over the value's
    * depth counters, 0 for a value with an untouched bucket. The
    * counter table arrives broadcast — it is ≤ d·w rows by
    * construction.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 4096): DataFrame = {
    val h = Dedup.hash60(col(valueCol).cast("string"))
    val passCols = probes.columns.toSeq
    probes
      .select(passCols.map(col) :+ explode(array((0 until depth).map(i =>
        struct(lit(i).as("cms_row"), cmsBucket(h, i, width).as("cms_bucket"))): _*)).as("rb"): _*)
      .select(passCols.map(col) :+ col("rb.cms_row").as("cms_row") :+
        col("rb.cms_bucket").as("cms_bucket"): _*)
      .join(broadcast(sketch), Seq("cms_row", "cms_bucket"), "left")
      .groupBy(passCols.map(col): _*)
      .agg(min(coalesce(col("cms_cnt"), lit(0L))).as("cms_est"))
  }
}
