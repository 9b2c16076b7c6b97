package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table (SURVEY.md §2.11
  * X5/X6): JSON property extraction, batch sessionization, tumbling
  * time-window aggregation.
  *
  * Scale design: JSON extraction is a pure projection (no shuffle);
  * sessionization shuffles once on user_id and stays partitioned by user
  * through both window functions and the final aggregate (one Exchange
  * total); the hourly rollup is a single hash aggregate. The same
  * sessionization logic ports to Structured Streaming with
  * `session_window(ts, gap)` — the batch form here is the
  * backfill/reprocessing path.
  */
object Events {

  /** X5 — extract the integer property `$.k` from the JSON `props` column
    * and roll up by its value. Output: k, n_events, sum_value (4dp).
    *
    * `round` (not the floor-truncation used for ratios — TextOps.trunc4)
    * is deliberate for SUMS: the ideal value of a sum of fixed-decimal
    * inputs lies ON the 4dp grid, so the FP error lands strictly inside
    * a grid cell and both engines round to the same grid point — while
    * floor would sit exactly on the knife edge (1.23 computed as
    * 1.229999…9 floors to 1.2299). Ratios are the opposite case:
    * generically irrational, never on the grid, so floor is safe and
    * round's half-grid boundary is the risk. Grid-valued → round;
    * generic real → floor.
    */
  def jsonProps(events: DataFrame): DataFrame =
    events
      .select(
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))

  /** Session gap: a new session starts after > 6h of user inactivity. */
  val SessionGapSeconds = 21600L

  /** X6 — batch sessionization: per-user event ordering, gap detection
    * via lag, running-sum session numbering, per-session rollup.
    * Output: user_id, session_no, session_start, session_end, n_events,
    * n_purchases, sum_value (4dp).
    */
  /** Events with their session_no assigned (lag gap-detect + running
    * sum, one user_id exchange) — the shared prefix of [[sessionize]]
    * and [[sessionFunnel]].
    */
  private def withSessions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      // gap compare in integer microseconds: exact, no FP parity risk
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > SessionGapSeconds * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_no", sum("is_new").over(byUser))
  }

  def sessionize(events: DataFrame): DataFrame =
    withSessions(events)
      .groupBy("user_id", "session_no")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        round(sum("value"), 4).as("sum_value"))

  /** X6 — per-user conversion funnel over sessions: a session CONVERTS
    * when it contains a view and a purchase at-or-after that view (the
    * same at-or-before rule as the as-of attribution). Output: user_id,
    * n_sessions, n_converted, conversion (floor-truncated 4dp).
    *
    * Plan shape: [[withSessions]]' single user_id exchange feeds both
    * the per-session conditional-extrema aggregate and the per-user
    * rollup — the session and user keys nest, so no further shuffle.
    */
  def sessionFunnel(events: DataFrame): DataFrame =
    withSessions(events)
      .groupBy("user_id", "session_no")
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        max(when(col("event_type") === "purchase", col("ts"))).as("last_purchase"))
      .withColumn("converted", col("first_view").isNotNull &&
        col("last_purchase").isNotNull && col("first_view") <= col("last_purchase"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"))
      .select(col("user_id"), col("n_sessions"), col("n_converted"),
        TextOps.trunc4(col("n_converted") / col("n_sessions").cast("double"))
          .as("conversion"))

  /** X6 — cohort RETENTION matrix: users grouped by first-seen day (the
    * cohort), counted per (cohort_day, day_offset) for every later day
    * they return — the standard product-analytics retention triangle.
    * Output: cohort_day, day_offset, n_users.
    *
    * Plan shape: one (user, day) distinct projection of the event
    * stream, one per-user min for the cohort day, a user-keyed join
    * (both sides partitioned by user_id — the activity distinct and the
    * cohort min reuse one exchange), then the (cohort, offset) hash
    * aggregate. count(DISTINCT user) in the final aggregate is exact
    * but cheap: the input is already distinct per (user, day), so each
    * user contributes one row per retained day. At 100 TB this is two
    * user-keyed shuffles + one small-keyspace aggregate — no window, no
    * self-join, and the cohort table is per-user narrow.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val activity = events
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .distinct()
    val cohorts = activity.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
    activity.join(cohorts, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** X6 — tumbling 1-hour window aggregate by event type. Output:
    * hour_start, event_type, n_events, sum_value (4dp).
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** X6 — session BEHAVIOR-FLOW transition matrix: adjacent (from → to)
    * event-type pairs within a session, counted corpus-wide — the
    * product-analytics "where do users go next" aggregate (ClickHouse's
    * behavior-flow / Markov-chain input). Output: from_type, to_type,
    * n_transitions.
    *
    * Plan shape: [[withSessions]]' single user_id exchange also serves
    * the (user_id, session_no) lead window — the partition keys nest,
    * so the second window adds no shuffle; the final matrix is a
    * |types|²-keyspace hash aggregate with map-side partials.
    */
  def transitions(events: DataFrame): DataFrame =
    withSessions(events)
      .withColumn("to_type", lead("event_type", 1).over(
        Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))

  /** X6 — k-step ORDERED funnel with a completion window: per user, the
    * depth of the FIRST-TOUCH chain through `steps` — t1 = the user's
    * earliest step-1 event, each tᵢ₊₁ = the earliest stepᵢ₊₁ event
    * at-or-after tᵢ and within `windowSeconds` of t1. Output: user_id,
    * depth (1..k; users with no step-1 event are absent). The
    * ClickHouse-windowFunnel shape with pinned deterministic semantics:
    * anchoring at the FIRST step-1 touch (not best-of-any-chain) makes
    * every tᵢ a conditional min — exact, portable, no per-user fold.
    *
    * Plan shape: one conditional-min aggregate per step, all keyed on
    * user_id — the first aggregate's exchange serves every later join
    * and aggregate (k − 1 user-keyed left joins, no new shuffles of the
    * event stream beyond the per-step filtered projections). Depth is a
    * pure projection: tᵢ₊₁ non-null implies tᵢ non-null by
    * construction, so the non-null count IS the chain prefix length.
    */
  def funnelDepth(events: DataFrame, steps: Seq[String],
      windowSeconds: Long = 7 * 86400L): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val wUs = windowSeconds * 1000000L
    val base = events.select(col("user_id"), col("ts"), col("event_type"))
    val first = base.where(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("t1"))
    val chained = steps.drop(1).zipWithIndex.foldLeft(first) {
      case (acc, (st, i)) =>
        val ok = col("ts") >= col(s"t${i + 1}") &&
          unix_micros(col("ts")) - unix_micros(col("t1")) <= wUs
        acc.join(base.where(col("event_type") === st), Seq("user_id"), "left")
          .groupBy(acc.columns.map(col): _*)
          .agg(min(when(ok, col("ts"))).as(s"t${i + 2}"))
    }
    chained.select(col("user_id"),
      steps.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
        .reduce(_ + _).as("depth"))
  }

  /** The `value` column recovered as EXACT integer cents. The data is on
    * a 2-decimal grid, so `round(value * 100)` lands on the true integer
    * on every engine (the product's FP error is ≪ 0.5 and positives
    * round half-up identically) — the integer-cents trick that makes
    * windowed/grouped sums bit-identical cross-engine where a sliding
    * double sum would drift with accumulation order (DuckDB's
    * segment-tree windowed sum vs Spark's running sum).
    */
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  /** X6 — point-in-time ROLLING features: per purchase event, the
    * user's activity over the PRECEDING hour (count + exact sum of
    * value), the feature-backfill shape of a training pipeline — "user
    * state as of label time", computed for every label without a
    * per-label scan. Output: event_id, user_id, ts, n_1h, sum_1h.
    *
    * Plan shape: ONE user_id exchange; the range-frame window (integer
    * microseconds, `rangeBetween` on the event-time axis) runs over the
    * user's full event stream, and the purchase filter applies AFTER the
    * window so features see non-purchase activity. The frame sums
    * integer cents (exact — see [[cents]]); `sum_1h` is cents / 100.0,
    * an IEEE-exact-deterministic division both engines reproduce
    * bit-identically. At 100 TB this is the standard windowed
    * feature job: shuffle by user, sort by time within user, stream the
    * sliding frame — no self-join, no per-label re-scan.
    */
  def rollingFeatures(events: DataFrame, windowSeconds: Long = 3600L): DataFrame = {
    val frame = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-windowSeconds * 1000000L, 0L)
    events
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        unix_micros(col("ts")).as("us"), cents(col("value")).as("vc"))
      .withColumn("n_1h", count(lit(1)).over(frame))
      .withColumn("sum_1h", (sum("vc").over(frame) / 100.0))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("n_1h"), col("sum_1h"))
  }

  /** X6 — per-type outlier flags with EXACT arithmetic: an event is
    * anomalous when its squared z-score vs its event_type's population
    * exceeds `zSq` (default 9 = |z| > 3). The test is evaluated as the
    * integer inequality (n·v − S)² > zSq·(n·SQ − S²) over integer cents
    * (v = cents, S = Σv, SQ = Σv²), which is the z² definition cleared
    * of denominators — no division, no sqrt, no FP comparison to drift
    * cross-engine; DECIMAL(38,0) keeps the squares exact past int64.
    * Output: the anomalous events (event_id, event_type, value).
    *
    * Plan shape: one hash aggregate to the per-type moment table (5
    * rows), broadcast back onto the stream, pure-projection flag — at
    * 100 TB the moments are a map-side-partial aggregate and the flag
    * pass is a second scan with zero shuffle of the events themselves.
    */
  def anomalies(events: DataFrame, zSq: Int = 9): DataFrame =
    anomaliesAgainst(events, momentsOf(events), zSq)

  /** The per-type moment table (n, Σcents, Σcents²) [[anomaliesAgainst]]
    * scores against — at scale this is the offline "training" job whose
    * output is persisted and FROZEN, the same discipline as trained
    * centroids: scoring is then a pure function of the frozen store, so
    * streaming verdicts are batch-cut invariant.
    */
  def momentsOf(events: DataFrame): DataFrame =
    events.select(col("event_type"), cents(col("value")).as("vc"))
      .groupBy("event_type").agg(
        count(lit(1)).as("n"), sum("vc").as("s"),
        sum(col("vc").cast("decimal(38,0)") * col("vc")).as("sq"))

  /** Flag `events` rows anomalous under a (possibly frozen) `moments`
    * table — the scoring half of [[anomalies]].
    */
  def anomaliesAgainst(events: DataFrame, moments: DataFrame, zSq: Int = 9): DataFrame = {
    val vc = events.select(col("event_id"), col("event_type"), col("value"),
      cents(col("value")).as("vc"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val lhs = (dec(col("n")) * col("vc") - col("s")) *
      (dec(col("n")) * col("vc") - col("s"))
    val rhs = lit(zSq) * (dec(col("n")) * col("sq") - dec(col("s")) * col("s"))
    vc.join(broadcast(moments), "event_type")
      .where(lhs > rhs)
      .select(col("event_id"), col("event_type"), col("value"))
  }

  /** Time-to-convert: for every user whose first purchase is at or
    * after their first view, the two anchor timestamps and the exact
    * whole-second latency between them (integer micros difference,
    * floor-divided — positives, so Spark `div` ≡ DuckDB `//`). The
    * funnel-latency companion to [[funnelDepth]]: depth says HOW FAR
    * users get, this says HOW LONG the view→purchase hop takes.
    *
    * Scale: ONE user-keyed hash aggregate (two conditional mins with
    * map-side partials) over a single events scan; the latency math is
    * a pure projection of the user-scale frame. No window, no join.
    */
  def timeToConvert(events: DataFrame): DataFrame =
    convertFromPartials(convertPartials(events))

  /** The per-user anchor partials (first view / first purchase) — the
    * STORE half of [[timeToConvert]]: conditional mins are associative
    * and commutative, so per-batch partials merged by column-wise min
    * ([[graft.streaming.StreamingOps.mergeConvertStore]]) equal the
    * one-shot aggregate under any batch cut.
    */
  def convertPartials(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))

  /** The probe half: finalize a (possibly merged) partials store into
    * the converting-users latency report.
    */
  def convertFromPartials(per: DataFrame): DataFrame =
    per
      .where(col("first_view").isNotNull && col("first_purchase").isNotNull &&
        col("first_purchase") >= col("first_view"))
      .withColumn("secs_to_convert",
        expr("CAST((unix_micros(first_purchase) - unix_micros(first_view)) DIV 1000000 AS BIGINT)"))
      .select("user_id", "first_view", "first_purchase", "secs_to_convert")

  /** X6 — SLIDING-window activity counts (1h windows every 15min): the
    * overlapping-window shape behind "trending now" dashboards, where
    * tumbling windows quantize away a burst that straddles a boundary.
    * Spark's `window(ts, dur, slide)` expands each event to its
    * dur/slide covering windows map-side (a bounded 4× multiply here —
    * the same Expand discipline as multi_distinct) and aggregates on
    * the (window, type) key; the window grid is epoch-aligned, which
    * the oracle reproduces with integer-microsecond floor arithmetic.
    */
  def slidingCounts(events: DataFrame, windowDur: String = "1 hour",
      slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowDur, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** X6 — top-k 3-step behavior paths: the trigram census over
    * session-ordered event types (session_transitions' bigram big
    * sibling — three-step paths separate "browse→view→purchase" intent
    * from "view→view→view" drift). Two `lead`s on the SAME
    * (user, session) window the sessionizer already sorts — zero
    * additional exchanges past [[withSessions]] — then one bounded
    * |distinct paths| aggregate and a TakeOrdered.
    */
  def eventPaths(events: DataFrame, k: Int = 15): DataFrame = {
    val bySess = Window.partitionBy("user_id", "session_no")
      .orderBy("ts", "event_id")
    withSessions(events)
      .withColumn("t1", lead("event_type", 1).over(bySess))
      .withColumn("t2", lead("event_type", 2).over(bySess))
      .where(col("t1").isNotNull && col("t2").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t1"), col("t2")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("path"))
      .limit(k)
  }

  /** X7 — MULTI-touch attribution: every view inside the purchase's
    * lookback window shares the credit (the as-of join is last-touch —
    * one winner; marketing mix wants the full pair set weighted). The
    * split is exact integer ppm: each view gets ⌊1e6 / n⌋ and the
    * LATEST view absorbs the remainder, so per-purchase credit sums to
    * exactly 1 000 000 — no float drift, deterministic tiebreak on
    * (view_ts, view_id).
    *
    * Scale: the pair join is an equi-join on user_id with the time
    * range as residual — per-user pair volume is bounded by activity ×
    * window, the same state bound the streaming twin
    * ([[graft.streaming.StreamingOps.viewPurchaseJoinStream]]) gets
    * from its watermark; both windows run per-purchase over handfuls
    * of rows.
    */
  def multiTouchAttribution(events: DataFrame,
      windowSeconds: Long = 3600L): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = events.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))
    val pairs = purchases.join(views,
      col("v_user") === col("user_id") &&
        col("view_ts") <= col("ts") &&
        col("view_ts") >= col("ts") - expr(s"INTERVAL $windowSeconds SECOND"))
    val byPurchase = Window.partitionBy("event_id")
    val latestFirst = Window.partitionBy("event_id")
      .orderBy(col("view_ts").desc, col("view_id").desc)
    pairs
      .withColumn("n_views", count(lit(1)).over(byPurchase))
      .withColumn("rn", row_number().over(latestFirst))
      .select(col("event_id"), col("user_id"), col("view_id"),
        (expr("1000000 DIV n_views") +
          when(col("rn") === 1, expr("1000000 % n_views")).otherwise(0L))
          .cast("long").as("credit_ppm"))
  }
}
