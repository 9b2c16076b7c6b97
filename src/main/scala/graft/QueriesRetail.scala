package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOfJoin, BloomJoin, Corpus, Dedup, Events, Hierarchy, Multimodal, Privacy, RangeJoin, Retail, SaltedJoin, Similarity, Sketches, Stats, StockSim, TextOps}
import graft.etl.ZOrder

/** Warehouse/retail analytics beyond the core reference
  * contract: concentration, hierarchy, co-purchase graph, cohorts,
  * forecasting, profiling.
  *
  * Registry object: entry/oracle blocks moved verbatim from the
  * pre-r12 ExtQueries monolith (plans unchanged); ExtQueries
  * composes every family back into the driver-contract maps and
  * still owns the shared session stores and SQL fragments.
  */
private[graft] object QueriesRetail {
  import ExtQueries._

  def entries: Map[String, Q] = Map[String, Q](
    // Stats — supplier revenue CONCENTRATION (Gini index in exact ppm):
    // G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over ascending-sorted
    // per-supplier revenue. The rank-weighted sum s1 and the ppm
    // numerator run in DECIMAL(38,0): s1 ≤ n·Σx and the numerator
    // carries an extra 10⁶ factor, so BIGINT overflows already at the
    // sf1 fixture (measured: 2·s1·10⁶ ≈ 8.4e18 at sf0.1 — a hair under
    // 2⁶³ — and ~8.4e20 at sf1; ANSI mode turned that into a crash
    // instead of a silent wrap). The dollar grid (not cents) keeps even
    // 100 TB totals inside the decimal's 38 digits; only the final
    // bounded gini_ppm (≤ 10⁶) casts back to BIGINT. One supplier-scale
    // aggregate, one rank window over the |suppliers| frame, one 1-row
    // finish.
    "supplier_concentration" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .groupBy("l_suppkey")
        .agg(expr(
          "CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) DIV 100 AS BIGINT)")
          .as("dollars"))
      val ranked = rev.withColumn("i", row_number().over(
        Window.orderBy(col("dollars"), col("l_suppkey"))).cast("long"))
      ranked.agg(
        count(lit(1)).as("n_suppliers"),
        sum("dollars").as("total_dollars"),
        sum(expr("CAST(i AS DECIMAL(38,0)) * dollars")).as("s1"))
        .withColumn("gini_ppm", expr(
          "CAST((2 * s1 - (n_suppliers + 1) * CAST(total_dollars AS DECIMAL(38,0))) * 1000000" +
            " DIV (CAST(n_suppliers AS DECIMAL(38,0)) * total_dollars) AS BIGINT)"))
        .select("n_suppliers", "total_dollars", "gini_ppm")
        .orderBy("n_suppliers")
    }),

    // Stats — Pearson correlation of quantity vs discount per return
    // flag, from EXACT integer moments (bit-identical cross-engine;
    // only the final r touches FP, and IEEE exactly-rounded ops on
    // identical integers give identical doubles — see Stats.exactCorr
    // for why built-in corr() is avoided).
    "qty_discount_corr" -> ((s, dir) =>
      Stats.exactCorr(
          Tables.lineitem(s, dir).select(col("l_returnflag"),
            col("l_quantity").cast("long").as("x"),
            expr("CAST(round(l_discount * 10000) AS BIGINT)").as("y")),
          Seq("l_returnflag"), "x", "y")
        .orderBy("l_returnflag")),

    // X7 — Bloom-filter pruned equi-join: the probe side (lineitem) is
    // semi-join-reduced by a broadcast 128 KiB bit array built from the
    // filtered dim's keys BEFORE the join shuffle. Bloom filters have no
    // false negatives, so the result ≡ the plain join — the oracle IS
    // the unhinted SQL join (see BloomJoin scaladoc).
    "bloom_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_partkey"), col("l_quantity"))
      val pt = Tables.part(s, dir).where(col("p_size") <= 5)
        .select(col("p_partkey"), col("p_brand"))
      BloomJoin.join(li, "l_partkey", pt, "p_partkey")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy("p_brand")
    }),

    // X7 — skew-safe salted equi-join (lineitem ⋈ orders), rolled up per
    // priority. Output is identical to the plain join; the salting is
    // physical-plan insurance for hot keys (see SaltedJoin scaladoc).
    "salted_rollup" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("okey"), col("l_quantity"))
      val ord = Tables.orders(s, dir)
        .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      SaltedJoin.equiJoin(li, ord, "okey", saltFactor = 4, heavyThreshold = 5)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy("o_orderpriority")
    }),

    // Retail — ABC (Pareto) classification per brand: integer-exact
    // cumulative revenue shares (cum·100 ≤ tot·80 cross-multiplication),
    // brand-partitioned so the cumsum distributes.
    "abc_class" -> ((s, dir) =>
      Retail.abcClassification(Tables.lineitem(s, dir), Tables.part(s, dir))
        .orderBy(col("p_brand"), col("rev_cents").desc, col("p_partkey"))),

    // Retail — trailing 7-day demand per (brand, ship-day): RANGE frame
    // over the integer day index on the tiny post-aggregate frame.
    "demand_forecast" -> ((s, dir) =>
      Retail.demandForecast(Tables.lineitem(s, dir), Tables.part(s, dir), 1995)
        .orderBy("p_brand", "day")),

    // Retail — market-basket co-purchase affinity: part pairs by lift,
    // pair explosion bounded by basket width (see Retail scaladoc).
    "copurchase_pairs" -> ((s, dir) =>
      Retail.copurchasePairs(Tables.lineitem(s, dir), minCount = 3, k = 25,
          itemsStore = Some(copurchaseItemsStore(s, dir)),
          pairStore = Some(copurchasePairStore(s, dir)))
        .orderBy("rank")),

    // Retail graph — integer-exact PageRank over the co-purchase graph
    // (3 unrolled Pregel rounds, ppm-scaled ranks; see copurchaseRank
    // scaladoc for why the arithmetic is integer). Shares the Σ|basket|²
    // pair stage with copurchase_pairs through the session store.
    "copurchase_rank" -> ((s, dir) =>
      Retail.copurchaseRank(Tables.lineitem(s, dir), minCount = 3, iters = 3,
        itemsStore = Some(copurchaseItemsStore(s, dir)),
        pairStore = Some(copurchasePairStore(s, dir)))),

    // Retail — SEQUENTIAL basket affinity: "bought A, came back for B"
    // across consecutive orders (time-ordered sibling of co-purchase;
    // see Retail.repeatAffinity). Shares the distinct-items store.
    "repeat_affinity" -> ((s, dir) =>
      Retail.repeatAffinity(Tables.orders(s, dir), Tables.lineitem(s, dir),
        itemsStore = Some(copurchaseItemsStore(s, dir)))),

    // Retail graph — single-source BFS distance census from the
    // minimum-id seed part (min-plus propagation, 3 unrolled rounds;
    // see Retail.reachLevels). Shares the pair store.
    "reach_levels" -> ((s, dir) =>
      Retail.reachLevels(copurchasePairStore(s, dir), minCount = 3,
        maxHops = 3)),

    // Retail graph — weighted label-propagation communities (2
    // synchronous rounds, weighted argmax vote with min-label tiebreak;
    // see Retail.labelPropagation for the determinism contract and why
    // a bridge edge doesn't merge clusters the way CC would). Shares
    // the pair stage through the session store.
    "copurchase_communities" -> ((s, dir) =>
      Retail.labelPropagation(copurchasePairStore(s, dir), minCount = 3,
        iters = 2)),

    // Hierarchy — pointer-doubling flatten of the synthetic decimal
    // category forest (parent = key div 10): per-depth census. Four
    // rounds resolve depth ≤ 16 in four key-shuffles total — O(log
    // depth), never O(depth) — the distributed answer to a recursive
    // CTE (see Hierarchy scaladoc).
    "hierarchy_flatten" -> ((s, dir) =>
      Hierarchy.flatten(partForest(s, dir))
        .groupBy("depth")
        .agg(count(lit(1)).as("n_nodes"), countDistinct(col("root")).as("n_roots"))
        .orderBy("depth")),

    // Hierarchy — revenue rolled up the same forest to its roots: the
    // category-level sales report. The fact joins the flattened (node →
    // root) map on the part key — one key shuffle — then aggregates on
    // the root-scale frame; top-10 is a TakeOrdered.
    "hierarchy_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_partkey"),
          expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)")
            .as("rev_c"))
        .join(partClosureStore(s, dir),
          col("l_partkey") === col("node"))
        .groupBy("root")
        .agg(sum("rev_c").as("revenue_cents"),
          countDistinct(col("node")).as("n_parts"))
        .orderBy(col("revenue_cents").desc, col("root"))
        .limit(10)),

    // Typed sorted-group fold — clamped replenishment simulation (see
    // StockSim: the clamp makes the recurrence non-associative, so no
    // window frame expresses it; flatMapSortedGroups is the scale-safe
    // per-key sequential scan). Oracle replays the fold as a
    // day-indexed recursive CTE.
    "stock_sim" -> ((s, dir) => {
      import s.implicits._
      StockSim.simulate(StockSim.juneGrid(Tables.lineitem(s, dir)),
          opening = 50L, inflow = 8L)
        .toDF().orderBy("part")
    }),

    // Ops/DQ — partition-key skew profile: the top-20 heaviest event
    // keys with exact-ppm traffic share. THE pre-flight check before
    // any user-keyed shuffle (pairs with salted_rollup, which is the
    // fix): one map-combinable aggregate, a 1-row total broadcast, a
    // TakeOrdered — nothing fact-scale crosses the wire twice.
    "key_skew" -> ((s, dir) => {
      val per = Tables.events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"))
      val tot = per.agg(sum("n_events").as("total"))
      per.crossJoin(broadcast(tot))
        .withColumn("share_ppm",
          // DECIMAL(38,0): total is the full fact-table row count —
          // ~1e12 events at 100 TB puts n_events·1e6 for a hot key
          // within one order of 2⁶³ (the ppm-numerator overflow class).
          expr("CAST(CAST(n_events AS DECIMAL(38,0)) * 1000000 DIV total AS BIGINT)"))
        .select("user_id", "n_events", "share_ppm")
        .orderBy(col("n_events").desc, col("user_id"))
        .limit(20)
    }),

    // DQ — Benford first-significant-digit profile of order totals:
    // the classic fabricated-data smell test. The digit is extracted
    // from the cents-grid BIGINT's decimal string (no float log10 —
    // portable across engines); output is the 9-row digit census with
    // exact-ppm shares.
    "benford_digits" -> ((s, dir) => {
      val d = Tables.orders(s, dir)
        .where(col("o_totalprice") > 0)
        .select(substring(
          expr("CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)"),
          1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_orders"))
      val tot = d.agg(sum("n_orders").as("total"))
      d.crossJoin(broadcast(tot))
        .withColumn("obs_ppm",
          // DECIMAL(38,0): digit-1 holds ~30% of all orders; fact-scale
          // count × 1e6 is the same ppm-numerator overflow class.
          expr("CAST(CAST(n_orders AS DECIMAL(38,0)) * 1000000 DIV total AS BIGINT)"))
        .select("digit", "n_orders", "obs_ppm")
        .orderBy("digit")
    }),

    // Hierarchy — percent-of-parent rollup: each part's exact-ppm share
    // of its ROOT category's revenue (the drill-down report the flatten
    // exists for). Revenue aggregates once on (node, root); the root
    // totals reuse that frame; the share is integer DIV ppm.
    "hierarchy_share" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .select(col("l_partkey"),
          expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)")
            .as("rev_c"))
        .join(partClosureStore(s, dir),
          col("l_partkey") === col("node"))
        .groupBy("node", "root").agg(sum("rev_c").as("node_cents"))
      val roots = rev.groupBy("root").agg(sum("node_cents").as("root_cents"))
      rev.join(roots, "root")
        .withColumn("share_ppm",
          // DECIMAL(38,0): node_cents·10⁶ is a cents-grid sum × 1e6 —
          // a hot part grossing ~$10^10 at warehouse scale puts the
          // BIGINT product within one order of 2⁶³ (the
          // supplier_concentration overflow class, found by the sf1
          // run). 38 digits hold any real total; the share itself is
          // bounded ≤ 10⁶.
          expr("CAST(CAST(node_cents AS DECIMAL(38,0)) * 1000000 DIV root_cents AS BIGINT)"))
        .select("root", "node", "node_cents", "root_cents", "share_ppm")
        .orderBy("root", "node")
    }),

    // Retail — cohort REVENUE curve (the CLV face of retention_cohorts'
    // activity matrix): customers anchor on their first-order month;
    // every later order lands in (cohort_month, months_since) on the
    // exact integer month grid (y·12+m arithmetic — no date
    // subtraction ambiguity), then a cumulative window per cohort turns
    // per-offset revenue into the lifetime-value curve. The windows run
    // over the (cohorts × offsets) POST-aggregate frame.
    "cohort_revenue" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("ym"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val anchor = o.groupBy("o_custkey").agg(min("ym").as("anchor_ym"))
      val cells = o.join(anchor, "o_custkey")
        .groupBy(col("anchor_ym").as("cohort_ym"),
          (col("ym") - col("anchor_ym")).as("months_since"))
        .agg(count(lit(1)).as("n_orders"), sum("cents").as("rev_cents"))
      cells
        .withColumn("cum_rev_cents", sum("rev_cents").over(
          Window.partitionBy("cohort_ym").orderBy("months_since")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("cohort_ym", "months_since")
    }),

    // Retail — RFM customer segmentation: deterministic quintile scores
    // over the per-customer order aggregate (see Retail.rfmSegments for
    // the ntile determinism argument and the global-window scale note).
    "rfm_segments" -> ((s, dir) =>
      Retail.rfmSegments(Tables.orders(s, dir)).orderBy("o_custkey")),

    // Retail — directional association rules (confidence in exact ppm);
    // shares the Σ|basket|² pair stage through the session store.
    "assoc_rules" -> ((s, dir) =>
      Retail.assocRules(Tables.lineitem(s, dir), minCount = 3,
          minConfPpm = 100000, k = 50,
          itemsStore = Some(copurchaseItemsStore(s, dir)),
          pairStore = Some(copurchasePairStore(s, dir)))
        .orderBy(col("conf_ppm").desc, col("antecedent"), col("consequent"))),

    // Retail graph — triangle census of the co-purchase graph: oriented
    // wedge join + closure semi-join over the session pair store (see
    // Retail.copurchaseTriangles for the orientation argument).
    "triangle_count" -> ((s, dir) =>
      Retail.copurchaseTriangles(Tables.lineitem(s, dir), minCount = 2,
        itemsStore = Some(copurchaseItemsStore(s, dir)),
        pairStore = Some(copurchasePairStore(s, dir)))),

    // Retail ops — open-order backlog curve: +1 at order date, −1 at
    // first shipment, daily net, then a running sum over the day-scale
    // frame (the event-sourced running-balance shape; the global window
    // sees |days| rows, never fact volume).
    "orders_backlog" -> ((s, dir) => {
      val opened = Tables.orders(s, dir)
        .select(col("o_orderdate").cast("date").as("d"), lit(1L).as("delta"))
      val shipped = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(min(col("l_shipdate")).cast("date").as("d"))
        .select(col("d"), lit(-1L).as("delta"))
      opened.unionByName(shipped)
        .groupBy("d").agg(sum("delta").as("net"))
        .withColumn("backlog", sum("net").over(
          Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("d")
    }),

    // Retail ops — fulfillment latency distribution: whole-day gap from
    // order date to FIRST shipment, as a day histogram (per-order min
    // aggregate + key join + bounded histogram aggregate).
    "fulfillment_latency" -> ((s, dir) => {
      val firstShip = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey")).agg(min(col("l_shipdate")).as("first_ship"))
      Tables.orders(s, dir).select("o_orderkey", "o_orderdate")
        .join(firstShip, col("o_orderkey") === col("l_orderkey"))
        .select(datediff(col("first_ship").cast("date"),
          col("o_orderdate").cast("date")).cast("long").as("days_to_ship"))
        .groupBy("days_to_ship").agg(count(lit(1)).as("n_orders"))
        .orderBy("days_to_ship")
    }),

    // Profiling — numeric column profile of the fact table in ONE
    // melted aggregate pass (see Stats.numericProfile).
    "table_profile" -> ((s, dir) =>
      ext.Stats.numericProfile(Tables.lineitem(s, dir),
        Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))),

    // Stats — exact per-priority discrete order-value quantiles
    // (type-1: value at rank ceil(p·n/100), pure integer rank
    // arithmetic — no interpolation, no FP).
    "order_quantiles" -> ((s, dir) =>
      ext.Stats.groupQuantiles(Tables.orders(s, dir), Seq("o_orderpriority"),
          "o_totalprice", Seq(50, 90, 99))
        .orderBy("o_orderpriority")),

    // Retail — calendar gap-fill: each brand's daily demand densified
    // over its own sale span with explicit zero days.
    "demand_gapfill" -> ((s, dir) =>
      Retail.demandGapFill(Tables.lineitem(s, dir), Tables.part(s, dir), 1995)
        .orderBy("p_brand", "day")),
  )

  def oracles: Map[String, String] = Map(
    "cohort_revenue" ->
      s"""WITH o AS (SELECT o_custkey,
         |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders),
         |a AS (SELECT o_custkey, min(ym) AS anchor_ym FROM o GROUP BY 1),
         |cells AS (SELECT anchor_ym AS cohort_ym, ym - anchor_ym AS months_since,
         |    count(*) AS n_orders, CAST(sum(cents) AS BIGINT) AS rev_cents
         |  FROM o JOIN a USING (o_custkey) GROUP BY 1, 2)
         |SELECT cohort_ym, months_since, n_orders, rev_cents,
         |  CAST(sum(rev_cents) OVER (PARTITION BY cohort_ym
         |    ORDER BY months_since
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_rev_cents
         |FROM cells ORDER BY cohort_ym, months_since""".stripMargin,

    "supplier_concentration" ->
      s"""WITH rev AS (SELECT l_suppkey,
         |    CAST(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
         |      AS BIGINT)) AS BIGINT) // 100 AS BIGINT) AS dollars
         |  FROM lineitem GROUP BY 1),
         |r AS (SELECT dollars, CAST(row_number() OVER (
         |    ORDER BY dollars, l_suppkey) AS BIGINT) AS i FROM rev),
         |m AS (SELECT count(*) AS n_suppliers,
         |    CAST(sum(dollars) AS BIGINT) AS total_dollars,
         |    sum(CAST(i AS HUGEINT) * dollars) AS s1 FROM r)
         |SELECT n_suppliers, total_dollars,
         |  CAST((2 * s1 - (n_suppliers + 1) * CAST(total_dollars AS HUGEINT)) * 1000000
         |    // (CAST(n_suppliers AS HUGEINT) * total_dollars) AS BIGINT) AS gini_ppm
         |FROM m ORDER BY n_suppliers""".stripMargin,

    "qty_discount_corr" ->
      s"""WITH g AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
         |    CAST(round(l_discount * 10000) AS BIGINT) AS y FROM lineitem),
         |m AS (SELECT l_returnflag, count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM g GROUP BY 1)
         |SELECT l_returnflag, n, sx, sy, sxy, sxx, syy,
         |  floor(((n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE
         |    / sqrt((n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE
         |         * (n::HUGEINT * syy - sy::HUGEINT * sy)::DOUBLE))
         |    * 1000000) / 1000000 AS corr_6dp
         |FROM m ORDER BY l_returnflag""".stripMargin,

    "bloom_join" ->
      s"""SELECT p_brand, count(*) AS n_items,
         |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_size <= 5
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "salted_rollup" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
         |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "abc_class" ->
      s"""WITH rev AS (
         |  SELECT p_brand, p_partkey,
         |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         |      AS rev_cents
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY 1, 2),
         |w AS (
         |  SELECT *,
         |    row_number() OVER br AS rn,
         |    sum(rev_cents) OVER (br ROWS UNBOUNDED PRECEDING) AS cum,
         |    sum(rev_cents) OVER (PARTITION BY p_brand) AS tot
         |  FROM rev
         |  WINDOW br AS (PARTITION BY p_brand
         |    ORDER BY rev_cents DESC, p_partkey))
         |SELECT p_brand, p_partkey, rev_cents,
         |  CASE WHEN rn = 1 OR cum * 100 <= tot * 80 THEN 'A'
         |       WHEN cum * 100 <= tot * 95 THEN 'B'
         |       ELSE 'C' END AS abc_class
         |FROM w ORDER BY p_brand, rev_cents DESC, p_partkey""".stripMargin,

    "demand_forecast" ->
      s"""WITH daily AS (
         |  SELECT p_brand, CAST(l_shipdate AS DATE) AS day,
         |    CAST(sum(l_quantity) AS BIGINT) AS qty
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= DATE '1995-01-01'
         |    AND l_shipdate < DATE '1996-01-01'
         |  GROUP BY 1, 2)
         |SELECT p_brand, day, qty,
         |  CAST(sum(qty) OVER w AS BIGINT) AS qty_7d,
         |  count(*) OVER w AS days_observed
         |FROM daily
         |WINDOW w AS (PARTITION BY p_brand
         |  ORDER BY datediff('day', DATE '1970-01-01', day)
         |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
         |ORDER BY p_brand, day""".stripMargin,

    "copurchase_pairs" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |nt AS (SELECT count(DISTINCT l_orderkey) AS n_total FROM items),
         |pp AS (SELECT l_partkey, count(*) AS n_part FROM items GROUP BY 1),
         |pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         |    count(*) AS n_ab
         |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
         |    AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 3),
         |l AS (SELECT part_a, part_b, n_ab,
         |    floor(n_ab::DOUBLE * n_total / pa.n_part / pb.n_part * 1000000)
         |      / 1000000 AS lift
         |  FROM pr
         |  CROSS JOIN nt
         |  JOIN pp pa ON pr.part_a = pa.l_partkey
         |  JOIN pp pb ON pr.part_b = pb.l_partkey),
         |r AS (SELECT *, row_number() OVER
         |    (ORDER BY lift DESC, part_a, part_b) AS rank FROM l)
         |SELECT part_a, part_b, n_ab, lift, rank
         |FROM r WHERE rank <= 25 ORDER BY rank""".stripMargin,

    // The 3 Pregel rounds unrolled as CTE pairs (contribution, refresh);
    // `//` is DuckDB's floor division ≡ Spark's `div` on positive BIGINTs.
    "copurchase_rank" -> {
      val rounds = (1 to 3).map { i =>
        s"""c$i AS (SELECT e.dst AS node, sum(r.rank_ppm // d.out_deg) AS s
           |  FROM edges e JOIN deg d USING (src)
           |  JOIN r${i - 1} r ON e.src = r.node GROUP BY 1),
           |r$i AS (SELECT r0.node,
           |    CAST(150000 + (85 * COALESCE(c$i.s, 0)) // 100 AS BIGINT) AS rank_ppm
           |  FROM r0 LEFT JOIN c$i USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |und AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
         |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
         |    AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 3),
         |edges AS (SELECT pa AS src, pb AS dst FROM und
         |          UNION ALL SELECT pb, pa FROM und),
         |deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY 1),
         |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank_ppm FROM deg),
         |$rounds
         |SELECT node AS p_partkey, rank_ppm FROM r3
         |ORDER BY rank_ppm DESC, p_partkey""".stripMargin
    },

    "repeat_affinity" ->
      s"""WITH c AS (SELECT o_custkey, o_orderkey, o_orderdate,
         |    lead(o_orderkey) OVER (PARTITION BY o_custkey
         |      ORDER BY o_orderdate, o_orderkey) AS next_orderkey
         |  FROM orders),
         |items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |p AS (SELECT a.l_partkey AS part_first, b.l_partkey AS part_next
         |  FROM c
         |  JOIN items a ON a.l_orderkey = c.o_orderkey
         |  JOIN items b ON b.l_orderkey = c.next_orderkey
         |  WHERE c.next_orderkey IS NOT NULL
         |    AND a.l_partkey != b.l_partkey)
         |SELECT part_first, part_next, count(*) AS n_sequences
         |FROM p GROUP BY 1, 2 HAVING count(*) >= 3
         |ORDER BY n_sequences DESC, part_first, part_next LIMIT 25""".stripMargin,

    "reach_levels" -> {
      val rounds = (1 to 3).map { i =>
        s"""r$i AS (SELECT e.dst AS node, min(d.dist + 1) AS nd
           |  FROM edges e JOIN d${i - 1} d ON e.src = d.node
           |  WHERE d.dist IS NOT NULL GROUP BY 1),
           |d$i AS (SELECT n.node,
           |    CASE WHEN n.dist IS NOT NULL AND (r.nd IS NULL OR n.dist <= r.nd)
           |         THEN n.dist ELSE r.nd END AS dist
           |  FROM d${i - 1} n LEFT JOIN r$i r ON n.node = r.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |und AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
         |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
         |    AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 3),
         |edges AS (SELECT pa AS src, pb AS dst FROM und
         |          UNION ALL SELECT pb, pa FROM und),
         |seedv AS (SELECT min(src) AS seed FROM edges),
         |d0 AS (SELECT DISTINCT e.src AS node,
         |    CASE WHEN e.src = s.seed THEN CAST(0 AS BIGINT) END AS dist
         |  FROM edges e CROSS JOIN seedv s),
         |$rounds
         |SELECT COALESCE(dist, -1) AS distance, count(*) AS n_parts
         |FROM d3 GROUP BY 1 ORDER BY distance""".stripMargin
    },

    "copurchase_communities" -> {
      val rounds = (1 to 2).map { i =>
        s"""v$i AS (SELECT e.src, l.label, CAST(sum(e.n_ab) AS BIGINT) AS w
           |  FROM edges e JOIN l${i - 1} l ON e.dst = l.node GROUP BY 1, 2),
           |l$i AS (SELECT src AS node, label FROM (
           |  SELECT src, label,
           |    row_number() OVER (PARTITION BY src ORDER BY w DESC, label) AS rn
           |  FROM v$i) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |und AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         |    count(*) AS n_ab
         |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
         |    AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 3),
         |edges AS (SELECT pa AS src, pb AS dst, n_ab FROM und
         |          UNION ALL SELECT pb, pa, n_ab FROM und),
         |l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
         |$rounds
         |SELECT label AS community, count(*) AS n_members FROM l2
         |GROUP BY 1 ORDER BY n_members DESC, community""".stripMargin
    },

    "hierarchy_flatten" ->
      s"""WITH RECURSIVE e AS (SELECT p_partkey AS node, p_partkey // 10 AS parent
         |    FROM part WHERE p_partkey >= 10),
         |n AS (SELECT DISTINCT node FROM (
         |  SELECT node FROM e UNION ALL SELECT parent FROM e)),
         |w AS (SELECT node AS node0, node AS cur, CAST(0 AS BIGINT) AS d FROM n
         |  UNION ALL
         |  SELECT w.node0, e.parent, w.d + 1 FROM w JOIN e ON w.cur = e.node),
         |flat AS (SELECT node0 AS node, cur AS root, d AS depth FROM w
         |  WHERE cur NOT IN (SELECT node FROM e))
         |SELECT depth, count(*) AS n_nodes,
         |  CAST(count(DISTINCT root) AS BIGINT) AS n_roots
         |FROM flat GROUP BY 1 ORDER BY depth""".stripMargin,

    "hierarchy_rollup" ->
      s"""WITH RECURSIVE e AS (SELECT p_partkey AS node, p_partkey // 10 AS parent
         |    FROM part WHERE p_partkey >= 10),
         |n AS (SELECT DISTINCT node FROM (
         |  SELECT node FROM e UNION ALL SELECT parent FROM e)),
         |w AS (SELECT node AS node0, node AS cur, CAST(0 AS BIGINT) AS d FROM n
         |  UNION ALL
         |  SELECT w.node0, e.parent, w.d + 1 FROM w JOIN e ON w.cur = e.node),
         |flat AS (SELECT node0 AS node, cur AS root, d AS depth FROM w
         |  WHERE cur NOT IN (SELECT node FROM e))
         |SELECT root,
         |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
         |    AS BIGINT)) AS BIGINT) AS revenue_cents,
         |  CAST(count(DISTINCT node) AS BIGINT) AS n_parts
         |FROM lineitem JOIN flat ON l_partkey = node
         |GROUP BY 1 ORDER BY revenue_cents DESC, root LIMIT 10""".stripMargin,

    "hierarchy_share" ->
      s"""WITH RECURSIVE e AS (SELECT p_partkey AS node, p_partkey // 10 AS parent
         |    FROM part WHERE p_partkey >= 10),
         |n AS (SELECT DISTINCT node FROM (
         |  SELECT node FROM e UNION ALL SELECT parent FROM e)),
         |w AS (SELECT node AS node0, node AS cur, CAST(0 AS BIGINT) AS d FROM n
         |  UNION ALL
         |  SELECT w.node0, e.parent, w.d + 1 FROM w JOIN e ON w.cur = e.node),
         |flat AS (SELECT node0 AS node, cur AS root, d AS depth FROM w
         |  WHERE cur NOT IN (SELECT node FROM e)),
         |rev AS (SELECT node, root,
         |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
         |      AS BIGINT)) AS BIGINT) AS node_cents
         |  FROM lineitem JOIN flat ON l_partkey = node GROUP BY 1, 2),
         |roots AS (SELECT root, CAST(sum(node_cents) AS BIGINT) AS root_cents
         |  FROM rev GROUP BY 1)
         |SELECT rev.root, node, node_cents, root_cents,
         |  CAST(CAST(node_cents AS HUGEINT) * 1000000 // root_cents AS BIGINT) AS share_ppm
         |FROM rev JOIN roots ON rev.root = roots.root
         |ORDER BY rev.root, node""".stripMargin,

    "stock_sim" ->
      s"""WITH RECURSIVE sold AS (SELECT l_partkey AS part,
         |    CAST(datepart('day', l_shipdate) AS INTEGER) AS day,
         |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sold
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-06-01'
         |    AND l_shipdate < TIMESTAMP '1996-07-01'
         |  GROUP BY 1, 2),
         |parts AS (SELECT DISTINCT part FROM sold),
         |g AS (SELECT p.part, t.d AS day, COALESCE(s.sold, 0) AS sold
         |  FROM parts p CROSS JOIN range(1, 31) t(d)
         |  LEFT JOIN sold s ON p.part = s.part AND s.day = t.d),
         |sim AS (
         |  SELECT part, 0 AS day, CAST(50 AS BIGINT) AS bal,
         |    CAST(0 AS BIGINT) AS so, CAST(0 AS BIGINT) AS unmet FROM parts
         |  UNION ALL
         |  SELECT g.part, g.day,
         |    CASE WHEN sim.bal + 8 - g.sold < 0 THEN 0
         |         ELSE sim.bal + 8 - g.sold END,
         |    sim.so + CASE WHEN sim.bal + 8 - g.sold < 0 THEN 1 ELSE 0 END,
         |    sim.unmet + CASE WHEN sim.bal + 8 - g.sold < 0
         |         THEN -(sim.bal + 8 - g.sold) ELSE 0 END
         |  FROM sim JOIN g ON g.part = sim.part AND g.day = sim.day + 1)
         |SELECT part, bal AS final_balance, so AS n_stockouts,
         |  unmet AS total_unmet
         |FROM sim WHERE day = 30 ORDER BY part""".stripMargin,

    "key_skew" ->
      s"""WITH per AS (SELECT user_id, count(*) AS n_events
         |  FROM events GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS total FROM per)
         |SELECT user_id, n_events,
         |  CAST(CAST(n_events AS HUGEINT) * 1000000 // total AS BIGINT) AS share_ppm
         |FROM per CROSS JOIN tot
         |ORDER BY n_events DESC, user_id LIMIT 20""".stripMargin,

    "benford_digits" ->
      s"""WITH d AS (SELECT CAST(substring(
         |      CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
         |      1, 1) AS INTEGER) AS digit
         |  FROM orders WHERE o_totalprice > 0),
         |per AS (SELECT digit, count(*) AS n_orders FROM d GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM per)
         |SELECT digit, n_orders,
         |  CAST(CAST(n_orders AS HUGEINT) * 1000000 // total AS BIGINT) AS obs_ppm
         |FROM per CROSS JOIN tot ORDER BY digit""".stripMargin,

    "rfm_segments" ->
      s"""WITH per AS (
         |  SELECT o_custkey,
         |    max(CAST(o_orderdate AS DATE)) AS last_order,
         |    count(*) AS n_orders,
         |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         |      AS total_cents
         |  FROM orders GROUP BY 1),
         |a AS (SELECT max(CAST(o_orderdate AS DATE)) AS anchor FROM orders),
         |sc AS (SELECT per.*, CAST(anchor - last_order AS BIGINT) AS recency_days
         |       FROM per CROSS JOIN a),
         |t AS (SELECT o_custkey, recency_days, n_orders, total_cents,
         |    CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey) AS BIGINT) AS r,
         |    CAST(ntile(5) OVER (ORDER BY n_orders DESC, o_custkey) AS BIGINT) AS f,
         |    CAST(ntile(5) OVER (ORDER BY total_cents DESC, o_custkey) AS BIGINT) AS m
         |  FROM sc)
         |SELECT o_custkey, recency_days, n_orders, total_cents, r, f, m,
         |  r::VARCHAR || f::VARCHAR || m::VARCHAR AS segment
         |FROM t ORDER BY o_custkey""".stripMargin,

    "assoc_rules" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |pp AS (SELECT l_partkey AS antecedent, count(*) AS n_ante
         |       FROM items GROUP BY 1),
         |pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         |    count(*) AS n_ab
         |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
         |    AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 3),
         |d AS (SELECT part_a AS antecedent, part_b AS consequent, n_ab FROM pr
         |      UNION ALL SELECT part_b, part_a, n_ab FROM pr),
         |c AS (SELECT d.antecedent, d.consequent, d.n_ab, pp.n_ante,
         |    CAST(CAST(d.n_ab AS HUGEINT) * 1000000 // pp.n_ante AS BIGINT) AS conf_ppm
         |  FROM d JOIN pp USING (antecedent))
         |SELECT antecedent, consequent, n_ab, n_ante, conf_ppm
         |FROM c WHERE conf_ppm >= 100000
         |ORDER BY conf_ppm DESC, antecedent, consequent LIMIT 50""".stripMargin,

    "triangle_count" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e AS (SELECT a.l_partkey AS a, b.l_partkey AS b
         |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
         |    AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
         |  FROM e e1 JOIN e e2 ON e1.b = e2.a
         |  WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.a = e1.a AND e3.b = e2.b)),
         |nodes AS (SELECT a AS p_partkey FROM tri
         |          UNION ALL SELECT b FROM tri
         |          UNION ALL SELECT c FROM tri)
         |SELECT p_partkey, count(*) AS n_triangles
         |FROM nodes GROUP BY 1 ORDER BY n_triangles DESC, p_partkey""".stripMargin,

    "orders_backlog" ->
      s"""WITH ev AS (
         |  SELECT CAST(o_orderdate AS DATE) AS d, 1 AS delta FROM orders
         |  UNION ALL
         |  SELECT CAST(min(l_shipdate) AS DATE) AS d, -1 AS delta
         |  FROM lineitem GROUP BY l_orderkey),
         |net AS (SELECT d, CAST(sum(delta) AS BIGINT) AS net
         |        FROM ev GROUP BY 1)
         |SELECT d, net,
         |  CAST(sum(net) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |    AS backlog
         |FROM net ORDER BY d""".stripMargin,

    "fulfillment_latency" ->
      s"""WITH fs AS (SELECT l_orderkey, min(l_shipdate) AS first_ship
         |            FROM lineitem GROUP BY 1),
         |g AS (SELECT CAST(CAST(first_ship AS DATE) - CAST(o_orderdate AS DATE)
         |    AS BIGINT) AS days_to_ship
         |  FROM orders JOIN fs ON o_orderkey = l_orderkey)
         |SELECT days_to_ship, count(*) AS n_orders
         |FROM g GROUP BY 1 ORDER BY days_to_ship""".stripMargin,

    "table_profile" -> {
      val arms = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
        .map(c =>
          s"SELECT '$c' AS column_name, CAST(round($c * 100) AS BIGINT) AS v FROM lineitem")
        .mkString("\n  UNION ALL\n")
      s"""WITH m AS (
         |$arms)
         |SELECT column_name, count(*) AS n_rows, count(v) AS n_values,
         |  count(DISTINCT v) AS n_distinct, min(v) AS min_cents,
         |  max(v) AS max_cents, CAST(sum(v) AS BIGINT) AS sum_cents
         |FROM m GROUP BY 1 ORDER BY column_name""".stripMargin
    },

    "order_quantiles" ->
      s"""WITH r AS (SELECT o_orderpriority, o_totalprice AS v,
         |    row_number() OVER (PARTITION BY o_orderpriority
         |      ORDER BY o_totalprice) AS rn,
         |    count(*) OVER (PARTITION BY o_orderpriority) AS n
         |  FROM orders WHERE o_totalprice IS NOT NULL)
         |SELECT o_orderpriority,
         |  max(CASE WHEN rn = (n * 50 + 99) // 100 THEN v END) AS p50,
         |  max(CASE WHEN rn = (n * 90 + 99) // 100 THEN v END) AS p90,
         |  max(CASE WHEN rn = (n * 99 + 99) // 100 THEN v END) AS p99
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "demand_gapfill" ->
      s"""WITH daily AS (
         |  SELECT p_brand, CAST(l_shipdate AS DATE) AS day,
         |    CAST(sum(l_quantity) AS BIGINT) AS qty
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= DATE '1995-01-01'
         |    AND l_shipdate < DATE '1996-01-01'
         |  GROUP BY 1, 2),
         |b AS (SELECT p_brand, min(day) AS d0, max(day) AS d1
         |  FROM daily GROUP BY 1),
         |cal AS (SELECT p_brand,
         |    unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
         |  FROM b)
         |SELECT cal.p_brand, cal.day, coalesce(d.qty, 0) AS qty
         |FROM cal LEFT JOIN daily d
         |  ON cal.p_brand = d.p_brand AND cal.day = d.day
         |ORDER BY 1, 2""".stripMargin,
  )
}
