package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOfJoin, BloomJoin, Corpus, Dedup, Events, Hierarchy, Multimodal, Privacy, RangeJoin, Retail, SaltedJoin, Similarity, Sketches, Stats, StockSim, TextOps}
import graft.etl.ZOrder

/** X5/X6 event analytics: JSON extraction, sessionization,
  * windows/funnels/attribution, temporal (as-of / interval) joins.
  *
  * Registry object: entry/oracle blocks moved verbatim from the
  * pre-r12 ExtQueries monolith (plans unchanged); ExtQueries
  * composes every family back into the driver-contract maps and
  * still owns the shared session stores and SQL fragments.
  */
private[graft] object QueriesEvents {
  import ExtQueries._

  def entries: Map[String, Q] = Map[String, Q](
    // X5 — JSON property extraction + rollup.
    "json_props" -> ((s, dir) =>
      Events.jsonProps(Tables.events(s, dir)).orderBy("k")),

    // X6 — batch sessionization (6h gap).
    "sessionize" -> ((s, dir) =>
      Events.sessionize(Tables.events(s, dir)).orderBy("user_id", "session_no")),

    // X6 — per-user view→purchase conversion funnel over sessions.
    "session_funnel" -> ((s, dir) =>
      Events.sessionFunnel(Tables.events(s, dir)).orderBy("user_id")),

    // X6 — tumbling 1-hour rollup by event type.
    "event_windows" -> ((s, dir) =>
      Events.hourlyRollup(Tables.events(s, dir)).orderBy("hour_start", "event_type")),

    // X6 — sliding-window trending counts (1h every 15m; see
    // Events.slidingCounts for the epoch-aligned grid contract).
    "sliding_windows" -> ((s, dir) =>
      Events.slidingCounts(Tables.events(s, dir))
        .orderBy("window_start", "event_type")),

    // X6 — cohort retention matrix (first-seen day × return-day offset).
    "retention_cohorts" -> ((s, dir) =>
      Events.retentionCohorts(Tables.events(s, dir))
        .orderBy("cohort_day", "day_offset")),

    // X6 — session behavior-flow transition matrix (adjacent event-type
    // pairs within sessions).
    "session_transitions" -> ((s, dir) =>
      Events.transitions(Tables.events(s, dir)).orderBy("from_type", "to_type")),

    // X6 — 3-step ordered funnel (signup → view → purchase, 7-day
    // completion window, first-touch anchoring).
    "funnel_depth" -> ((s, dir) =>
      Events.funnelDepth(Tables.events(s, dir),
        Seq("signup", "view", "purchase")).orderBy("user_id")),

    // X6 — point-in-time rolling features at purchase (label) time:
    // preceding-hour user activity via ONE range-frame window pass.
    "rolling_features" -> ((s, dir) =>
      Events.rollingFeatures(Tables.events(s, dir)).orderBy("event_id")),

    // X6 — per-type outlier flags, z² cleared of denominators so the
    // comparison is exact integer arithmetic on both engines.
    "event_anomalies" -> ((s, dir) =>
      Events.anomalies(Tables.events(s, dir)).orderBy("event_id")),

    // X7 — bucket-blocked NON-EQUI interval join: per session interval,
    // the count of ALL events (any user) falling inside it — the
    // concurrency-load query no equi key can express. The blocking
    // turns the would-be BroadcastNestedLoopJoin into a shuffled
    // equi-join on the time bucket (see RangeJoin scaladoc).
    "interval_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val sessions = Events.sessionize(ev).select(col("user_id"),
        col("session_no"), col("session_start"), col("session_end"))
      RangeJoin.pointInInterval(ev.select(col("ts"), col("event_id")), "ts",
          sessions, "session_start", "session_end")
        .groupBy("user_id", "session_no")
        .agg(count(lit(1)).as("n_concurrent"))
        .orderBy("user_id", "session_no")
    }),

    // X7 — bounded ENUMERATING twin of `interval_join`: per session
    // interval, the 3 LATEST events (any user) inside it — actual
    // point rows where interval_count is a census, with output
    // ≤ 3·|sessions| (linear) where interval_join's is
    // density-quadratic. Runs the global TIME-MERGE form (VERDICT r15
    // ask #3): time order makes the answer the k latest events at the
    // interval END truncated at its start, so each session is one
    // PROBE on an ordered scan of the time axis and no candidate pair
    // ever forms — density-INDEPENDENT where even the bounded-heap
    // join form's candidate stream stayed quadratic (its plan ladder:
    // row_number 182 s / heap join 113 s at sf1; the merge form has
    // no pair stage at all). See RangeJoin.pointInIntervalTopKMerge.
    "interval_topk" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val sessions = Events.sessionize(ev).select(col("user_id"),
        col("session_no"), col("session_start"), col("session_end"))
      castLongs(
        RangeJoin.pointInIntervalTopKMerge(ev.select(col("ts"), col("event_id")),
          "ts", "event_id", sessions, "session_start", "session_end",
          Seq("user_id", "session_no"), k = 3)
          .select("user_id", "session_no", "rank", "event_id"),
        "rank")
        .orderBy("user_id", "session_no", "rank")
    }),

    // X7 — stabbing-COUNT twin of `interval_join`: identical result
    // (per-session all-user concurrency counts), computed by a
    // distributed endpoint-marker prefix sum instead of pair
    // enumeration. The pair join's cost IS its pair volume — quadratic
    // in per-window density (measured 100× pairs for 10× data at sf1);
    // this plan never materializes a pair, so its cost stays linear in
    // events + sessions at any density (see RangeJoin.intervalCount).
    "interval_count" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val sessions = Events.sessionize(ev).select(col("user_id"),
        col("session_no"), col("session_start"), col("session_end"))
      RangeJoin.intervalCount(ev.select(col("ts")), "ts", sessions,
          Seq("user_id", "session_no"), "session_start", "session_end",
          countCol = "n_concurrent")
        .orderBy("user_id", "session_no")
    }),

    // Layout — z-order clustering keys: the Morton code zorderWrite
    // range-partitions files on, so footer min/max prune on EITHER key.
    "zorder_keys" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          ZOrder.zValue(col("l_partkey"), col("l_suppkey")).as("z"))
        .orderBy("z", "l_orderkey", "l_linenumber").limit(1000)),

    // X7 — distributed as-of join: attribute each purchase to the user's
    // most recent view at or before it (union + one window pass — never
    // the range cross-product; see AsOfJoin scaladoc).
    "event_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").as("purchase_value"))
      // Right side unique per (user_id, ts) by contract: deterministic
      // max-event_id survivor, view time duplicated into the payload so
      // the output carries WHICH view matched.
      val views = ev.where(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("vts"))
        .agg(max(col("event_id")).as("view_id"))
        .withColumn("view_ts", col("vts"))
      AsOfJoin.asOf(purchases, views, "user_id", "ts", "vts",
          Seq("view_id", "view_ts"))
        .orderBy("event_id")
    }),

    // X7 — multi-touch attribution: all views in the purchase's 1h
    // lookback share exact-ppm credit (latest view absorbs the
    // remainder so every purchase credits exactly 1e6; see
    // Events.multiTouchAttribution).
    "multi_touch" -> ((s, dir) =>
      Events.multiTouchAttribution(Tables.events(s, dir))
        .orderBy("event_id", "view_id")),

    // X6 — top-15 3-step session paths (trigram census; two leads on
    // the sessionizer's existing window, zero extra exchanges).
    "event_paths" -> ((s, dir) =>
      Events.eventPaths(Tables.events(s, dir))),

    // X5b — JSON parse audit with PLANTED corruption (every 97th
    // event's props gains LEADING garbage in-plan — leading, because
    // Spark's Jackson parser accepts trailing bytes after a complete
    // document while DuckDB's json_valid does not; prefix corruption is
    // malformed under both): from_json with a
    // pinned schema nulls the malformed struct, and the per-type audit
    // counts recovered vs quarantined rows — the JSON twin of the CSV
    // corrupt-record quarantine. At scale this is one projection + one
    // bounded aggregate; no second pass over the raw zone.
    "json_parse_audit" -> ((s, dir) => {
      val raw = Tables.events(s, dir)
        .withColumn("raw", when(col("event_id") % 97 === 0,
          concat(lit("broken{"), col("props"))).otherwise(col("props")))
        .withColumn("p", from_json(col("raw"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "k INT, _corrupt_record STRING"),
          java.util.Map.of("mode", "PERMISSIVE",
            "columnNameOfCorruptRecord", "_corrupt_record")))
      raw.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("p._corrupt_record").isNotNull, 1L).otherwise(0L))
            .as("n_malformed"),
          sum(coalesce(col("p.k").cast("long"), lit(0L))).as("sum_k"))
        .orderBy("event_type")
    }),

    // X7 — as-of join with a staleness tolerance (feature-store TTL):
    // same attribution, but a view more than 30 minutes before the
    // purchase no longer counts. Same single union + window pass as
    // event_attribution — the tolerance nulls, it never re-shuffles —
    // and it is what bounds per-key state in a streaming twin.
    "asof_tolerance" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").as("purchase_value"))
      val views = ev.where(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("vts"))
        .agg(max(col("event_id")).as("view_id"))
        .withColumn("view_ts", col("vts"))
      AsOfJoin.asOfTolerance(purchases, views, "user_id", "ts", "vts",
          Seq("view_id", "view_ts"), toleranceSec = 30 * 60)
        .orderBy("event_id")
    }),

    // X7 — NEAREST as-of join: each purchase attaches the view closest
    // in time in either direction (tie → backward), the sensor-
    // alignment contract; same one-exchange two-sort union+window plan
    // (see AsOfJoin.asOfNearest).
    "asof_nearest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("value").as("purchase_value"))
      val views = ev.where(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("vts"))
        .agg(max(col("event_id")).as("view_id"))
        .withColumn("view_ts", col("vts"))
      AsOfJoin.asOfNearest(purchases, views, "user_id", "ts", "vts",
          Seq("view_id", "view_ts"))
        .orderBy("event_id")
    }),

    // X6 — gaps-and-islands: longest consecutive-active-day streak per
    // user (the classic date − row_number island key, all integer);
    // the engagement metric next to retention_cohorts.
    "user_streaks" -> ((s, dir) => {
      val days = Tables.events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("d")).distinct()
      val w = Window.partitionBy("user_id").orderBy("d")
      days
        .withColumn("grp",
          (datediff(col("d"), lit("1970-01-01").cast("date")) -
            row_number().over(w)).cast("long"))
        .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(max("len").as("longest_streak"), count(lit(1)).as("n_streaks"))
        .orderBy("user_id")
    }),

    // X6 — view→purchase conversion latency per user: one conditional-
    // min aggregate, exact integer seconds (see Events.timeToConvert).
    "time_to_convert" -> ((s, dir) =>
      Events.timeToConvert(Tables.events(s, dir)).orderBy("user_id")),

    // X6 — behavioral segmentation by event-type bitmask: per
    // (user, day), bit_or of one bit per type (order-insensitive,
    // merge-friendly — partial masks OR together), then the bounded
    // mask census: which daily behavior profiles exist and how common
    // each is. Two aggregates, the first map-side combinable.
    "behavior_segments" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("d"), expr(
          """CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
            |WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
            |WHEN 'error' THEN 16 ELSE 0 END""".stripMargin).as("bit"))
        .groupBy("user_id", "d").agg(expr("bit_or(bit)").cast("long").as("mask"))
        .groupBy("mask").agg(count(lit(1)).as("n_user_days"))
        .orderBy("mask")),
  )

  def oracles: Map[String, String] = Map(
    "json_props" ->
      s"""SELECT CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k,
         |  count(*) AS n_events, round(sum(value), 4) AS sum_value
         |FROM events GROUP BY 1 ORDER BY k""".stripMargin,

    "sliding_windows" ->
      s"""WITH x AS (SELECT event_type, epoch_us(ts) AS eus FROM events),
         |w AS (SELECT event_type,
         |    make_timestamp((eus // 900000000) * 900000000
         |      - t.k * 900000000) AS window_start
         |  FROM x CROSS JOIN range(0, 4) t(k))
         |SELECT window_start, event_type, count(*) AS n_events
         |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "multi_touch" ->
      s"""WITH p AS (SELECT event_id, user_id, ts FROM events
         |    WHERE event_type = 'purchase'),
         |v AS (SELECT event_id AS view_id, user_id AS v_user, ts AS view_ts
         |    FROM events WHERE event_type = 'view'),
         |pr AS (SELECT p.event_id, p.user_id, v.view_id, v.view_ts
         |  FROM p JOIN v ON v_user = user_id
         |    AND view_ts <= ts AND view_ts >= ts - INTERVAL 3600 SECOND),
         |c AS (SELECT *,
         |    count(*) OVER (PARTITION BY event_id) AS n_views,
         |    row_number() OVER (PARTITION BY event_id
         |      ORDER BY view_ts DESC, view_id DESC) AS rn
         |  FROM pr)
         |SELECT event_id, user_id, view_id,
         |  CAST(1000000 // n_views
         |    + CASE WHEN rn = 1 THEN 1000000 % n_views ELSE 0 END
         |    AS BIGINT) AS credit_ppm
         |FROM c ORDER BY event_id, view_id""".stripMargin,

    "event_paths" ->
      s"""WITH $sessionCtes,
         |t AS (SELECT event_type,
         |    lead(event_type, 1) OVER w AS t1,
         |    lead(event_type, 2) OVER w AS t2
         |  FROM s WINDOW w AS (PARTITION BY user_id, session_no
         |    ORDER BY ts, event_id))
         |SELECT event_type || '>' || t1 || '>' || t2 AS path,
         |  count(*) AS n_paths
         |FROM t WHERE t1 IS NOT NULL AND t2 IS NOT NULL
         |GROUP BY 1 ORDER BY n_paths DESC, path LIMIT 15""".stripMargin,

    "json_parse_audit" ->
      s"""WITH r AS (SELECT event_type,
         |    CASE WHEN event_id % 97 = 0 THEN 'broken{' || props
         |         ELSE props END AS raw
         |  FROM events)
         |SELECT event_type, count(*) AS n_events,
         |  CAST(sum(CASE WHEN NOT json_valid(raw) THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_malformed,
         |  CAST(sum(CASE WHEN json_valid(raw)
         |    THEN CAST(json_extract_string(raw, '$$.k') AS BIGINT)
         |    ELSE 0 END) AS BIGINT) AS sum_k
         |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin,

    "sessionize" ->
      s"""WITH $sessionCtes
         |SELECT user_id, session_no,
         |  min(ts) AS session_start, max(ts) AS session_end,
         |  count(*) AS n_events,
         |  count(*) FILTER (event_type = 'purchase') AS n_purchases,
         |  round(sum(value), 4) AS sum_value
         |FROM s GROUP BY user_id, session_no ORDER BY user_id, session_no""".stripMargin,

    "session_funnel" ->
      s"""WITH $sessionCtes,
         |g AS (SELECT user_id, session_no,
         |    min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         |    max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
         |  FROM s GROUP BY 1, 2),
         |u AS (SELECT user_id, count(*) AS n_sessions,
         |    CAST(sum(CASE WHEN first_view IS NOT NULL AND last_purchase IS NOT NULL
         |      AND first_view <= last_purchase THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_converted
         |  FROM g GROUP BY 1)
         |SELECT user_id, n_sessions, n_converted,
         |  floor(n_converted::DOUBLE / n_sessions * 10000) / 10000 AS conversion
         |FROM u ORDER BY user_id""".stripMargin,

    "event_windows" ->
      s"""SELECT date_trunc('hour', ts) AS hour_start, event_type,
         |  count(*) AS n_events, round(sum(value), 4) AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,

    "retention_cohorts" ->
      s"""WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
         |coh AS (SELECT user_id, min(d) AS cohort_day FROM act GROUP BY 1)
         |SELECT cohort_day, CAST(d - cohort_day AS BIGINT) AS day_offset,
         |  count(*) AS n_users
         |FROM act JOIN coh USING (user_id)
         |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,

    "session_transitions" ->
      s"""WITH $sessionCtes,
         |t AS (SELECT event_type AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id, session_no
         |      ORDER BY ts, event_id) AS to_type FROM s)
         |SELECT from_type, to_type, count(*) AS n_transitions
         |FROM t WHERE to_type IS NOT NULL
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // The same conditional-min chain: each tᵢ₊₁ is a FILTER'd min
    // anchored at t1's window; depth = non-null prefix length.
    "funnel_depth" ->
      s"""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
         |    WHERE event_type = 'signup' GROUP BY 1),
         |s2 AS (SELECT s1.user_id, s1.t1,
         |    min(e.ts) FILTER (e.ts >= s1.t1
         |      AND epoch_us(e.ts) - epoch_us(s1.t1) <= 604800000000) AS t2
         |  FROM s1 LEFT JOIN events e
         |    ON e.user_id = s1.user_id AND e.event_type = 'view'
         |  GROUP BY 1, 2),
         |s3 AS (SELECT s2.user_id, s2.t1, s2.t2,
         |    min(e.ts) FILTER (e.ts >= s2.t2
         |      AND epoch_us(e.ts) - epoch_us(s2.t1) <= 604800000000) AS t3
         |  FROM s2 LEFT JOIN events e
         |    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
         |  GROUP BY 1, 2, 3)
         |SELECT user_id,
         |  (CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
         |   + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
         |   + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS depth
         |FROM s3 ORDER BY user_id""".stripMargin,

    // Integer-cents frame sum → bit-identical despite DuckDB's
    // segment-tree vs Spark's running-sum accumulation order.
    "rolling_features" ->
      s"""WITH w AS (SELECT event_id, user_id, ts, event_type,
         |    count(*) OVER win AS n_1h,
         |    sum(CAST(round(value * 100) AS BIGINT)) OVER win AS c_1h
         |  FROM events
         |  WINDOW win AS (PARTITION BY user_id ORDER BY epoch_us(ts)
         |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
         |SELECT event_id, user_id, ts, n_1h, c_1h / 100.0 AS sum_1h
         |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    // (n·v − S)² > 9·(n·SQ − S²) over integer cents — z² > 9 cleared of
    // denominators; HUGEINT keeps the squares exact past int64.
    "event_anomalies" ->
      s"""WITH vc AS (SELECT event_id, event_type, value,
         |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
         |m AS (SELECT event_type, count(*) AS n, sum(v) AS s,
         |    sum(v::HUGEINT * v) AS sq FROM vc GROUP BY 1)
         |SELECT event_id, event_type, value
         |FROM vc JOIN m USING (event_type)
         |WHERE (n::HUGEINT * v - s) * (n::HUGEINT * v - s)
         |    > 9 * (n::HUGEINT * sq - s::HUGEINT * s)
         |ORDER BY event_id""".stripMargin,

    "interval_join" ->
      s"""WITH $sessionCtes,
         |iv AS (SELECT user_id, session_no, min(ts) AS st, max(ts) AS en
         |  FROM s GROUP BY 1, 2)
         |SELECT iv.user_id, iv.session_no, count(*) AS n_concurrent
         |FROM iv JOIN events e ON e.ts >= iv.st AND e.ts <= iv.en
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "interval_topk" ->
      s"""WITH $sessionCtes,
         |iv AS (SELECT user_id, session_no, min(ts) AS st, max(ts) AS en
         |  FROM s GROUP BY 1, 2),
         |p AS (SELECT iv.user_id, iv.session_no, e.event_id, e.ts
         |  FROM iv JOIN events e ON e.ts >= iv.st AND e.ts <= iv.en),
         |r AS (SELECT user_id, session_no, event_id, row_number() OVER
         |    (PARTITION BY user_id, session_no ORDER BY ts DESC, event_id)
         |    AS rank FROM p)
         |SELECT user_id, session_no, CAST(rank AS BIGINT) AS rank, event_id
         |FROM r WHERE rank <= 3 ORDER BY user_id, session_no, rank""".stripMargin,

    // Same result contract as interval_join — the oracle's inner pair
    // join is safe here because every session interval contains its own
    // endpoints (session_start/end ARE events of that user), so no
    // zero-count session exists for the join to drop.
    "interval_count" ->
      s"""WITH $sessionCtes,
         |iv AS (SELECT user_id, session_no, min(ts) AS st, max(ts) AS en
         |  FROM s GROUP BY 1, 2)
         |SELECT iv.user_id, iv.session_no, count(*) AS n_concurrent
         |FROM iv JOIN events e ON e.ts >= iv.st AND e.ts <= iv.en
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "zorder_keys" ->
      s"""WITH $zorderCtes
         |SELECT l_orderkey, l_linenumber, (a | (b << 1)) AS z
         |FROM z${ZOrder.SpreadSteps.size}
         |ORDER BY z, l_orderkey, l_linenumber LIMIT 1000""".stripMargin,

    "event_attribution" ->
      s"""WITH v AS (SELECT user_id, ts AS vts, max(event_id) AS view_id
         |    FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         |p AS (SELECT event_id, user_id, ts, value AS purchase_value
         |    FROM events WHERE event_type = 'purchase')
         |SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
         |  v.view_id, v.vts AS view_ts
         |FROM p ASOF LEFT JOIN v
         |  ON p.user_id = v.user_id AND p.ts >= v.vts
         |ORDER BY p.event_id""".stripMargin,

    // The as-of match, then staleness nulling — DuckDB's ASOF picks the
    // same "last view at or before" row, and the CASE discards it when
    // it trails the purchase by more than the 30-minute tolerance.
    "asof_tolerance" ->
      s"""WITH v AS (SELECT user_id, ts AS vts, max(event_id) AS view_id
         |    FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         |p AS (SELECT event_id, user_id, ts, value AS purchase_value
         |    FROM events WHERE event_type = 'purchase'),
         |a AS (SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
         |        v.view_id, v.vts
         |      FROM p ASOF LEFT JOIN v
         |        ON p.user_id = v.user_id AND p.ts >= v.vts)
         |SELECT event_id, user_id, ts, purchase_value,
         |  CASE WHEN vts >= ts - INTERVAL 30 MINUTE THEN view_id END AS view_id,
         |  CASE WHEN vts >= ts - INTERVAL 30 MINUTE THEN vts END AS view_ts
         |FROM a ORDER BY event_id""".stripMargin,

    // Backward + forward ASOF joins, then the same nearer-side pick
    // (exact micros distance, tie → backward).
    "asof_nearest" ->
      s"""WITH v AS (SELECT user_id, ts AS vts, max(event_id) AS view_id
         |    FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         |p AS (SELECT event_id, user_id, ts, value AS purchase_value
         |    FROM events WHERE event_type = 'purchase'),
         |b AS (SELECT p.event_id, v.view_id AS b_id, v.vts AS b_ts
         |      FROM p ASOF LEFT JOIN v
         |        ON p.user_id = v.user_id AND p.ts >= v.vts),
         |f AS (SELECT p.event_id, v.view_id AS f_id, v.vts AS f_ts
         |      FROM p ASOF LEFT JOIN v
         |        ON p.user_id = v.user_id AND p.ts <= v.vts)
         |SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
         |  CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL OR
         |         epoch_us(p.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(p.ts))
         |       THEN b_id ELSE f_id END AS view_id,
         |  CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL OR
         |         epoch_us(p.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(p.ts))
         |       THEN b_ts ELSE f_ts END AS view_ts
         |FROM p JOIN b USING (event_id) JOIN f USING (event_id)
         |ORDER BY p.event_id""".stripMargin,

    "user_streaks" ->
      s"""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
         |isl AS (SELECT user_id,
         |    CAST(d - DATE '1970-01-01' AS BIGINT)
         |      - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
         |  FROM days),
         |runs AS (SELECT user_id, grp, count(*) AS len
         |         FROM isl GROUP BY 1, 2)
         |SELECT user_id, max(len) AS longest_streak, count(*) AS n_streaks
         |FROM runs GROUP BY 1 ORDER BY user_id""".stripMargin,

    "time_to_convert" ->
      s"""WITH per AS (
         |  SELECT user_id,
         |    min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
         |  FROM events GROUP BY 1)
         |SELECT user_id, first_view, first_purchase,
         |  CAST((epoch_us(first_purchase) - epoch_us(first_view)) // 1000000
         |    AS BIGINT) AS secs_to_convert
         |FROM per
         |WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
         |  AND first_purchase >= first_view
         |ORDER BY user_id""".stripMargin,

    "behavior_segments" ->
      s"""WITH b AS (SELECT user_id, CAST(ts AS DATE) AS d,
         |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
         |      WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
         |      WHEN 'error' THEN 16 ELSE 0 END AS bit
         |  FROM events),
         |m AS (SELECT user_id, d, CAST(bit_or(bit) AS BIGINT) AS mask
         |      FROM b GROUP BY 1, 2)
         |SELECT mask, count(*) AS n_user_days
         |FROM m GROUP BY 1 ORDER BY mask""".stripMargin,
  )
}
