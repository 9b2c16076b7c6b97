package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Classic decision-support join shapes (TPC-H Q5/Q7/Q10/Q13/Q14/Q15/
  * Q18/Q19 plus adapted Q21/Q22) over the warehouse star schema — the
  * analytics face the reference serves from Redshift after the ETL
  * lands (`sql/create_redshift_tables.sql:14-38` defines exactly this
  * kind of fact/dim layout; `dags/retail_pipeline_dag.py:19-41` loads
  * it so analysts can run these shapes). Expressed Spark-first: every
  * query is a declarative DataFrame plan — Catalyst pushes the scan
  * filters, AQE picks broadcast vs shuffle per side, and all money
  * math runs on the exact BIGINT cents grid so the DuckDB oracle
  * matches bit-for-bit.
  *
  * Scale discipline shared by the batch:
  *  - region/nation are genuinely tiny at any scale → explicit
  *    `broadcast()`.
  *  - customer/supplier/part/orders are fact-scale at 100 TB → no
  *    pinned broadcasts; key equi-joins that AQE may broadcast at toy
  *    scale and SortMergeJoin on the key at scale.
  *  - correlated sub-queries become per-key aggregates joined back
  *    (Q18, Q21) or 1-row scalar frames cross-joined via `broadcast`
  *    (Q14's share, Q15's max, Q22's average) — never a driver-side
  *    collect.
  *  - divisions are cleared to integer cross-multiplies (Q22's
  *    above-average test) or exact `DIV` ppm (Q14) so both engines
  *    compare the same integers.
  */
object TpchShapes {

  type Q = (SparkSession, String) => DataFrame

  /** Discounted revenue on the cents grid — the shared money measure. */
  private val revC =
    expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)")
  private val revCSql =
    "CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)"

  private def ts(d: String) = lit(d).cast(TimestampType)

  /** DERIVED PARTSUPP — the driver testdata ships no partsupp table
    * (FIXTURES.md), so the Q2/Q11/Q16/Q20 shapes run over a
    * deterministic partsupp derived from `part` × the supplier count:
    * 4 suppliers per part (the TPC-H fan-out), ps_suppkey spread by
    * pure integer arithmetic over the contiguous 0-based key space,
    * availqty/supplycost as integer hashes of the pair. Both engines
    * derive the SAME rows from the same parquet inputs (the supplier
    * count unrolls as a 1-row broadcast here and a scalar subquery in
    * the oracle — the scaledSeedSql precedent), so the join/agg
    * compositions those queries exist for are exercised end-to-end.
    * The i·7 stride is collision-free per part whenever the supplier
    * count is not a multiple of 7 (testdata: powers of 10).
    *
    * Scale: |partsupp| = 4·|part| rows, derived in-plan from the part
    * scan — one projection + a 4-way explode, no shuffle; at 100 TB
    * this is the table the ingest job would materialize once.
    */
  private def partsupp(s: SparkSession, dir: String): DataFrame = {
    val sCnt = Tables.supplier(s, dir).agg(count(lit(1)).as("__s"))
    Tables.part(s, dir).select("p_partkey")
      .crossJoin(broadcast(sCnt))
      .select(col("p_partkey"), explode(expr("sequence(0, 3)")).as("i"),
        col("__s"))
      .withColumn("ps_suppkey",
        (col("p_partkey") * 13 + col("i") * 7 + 1) % col("__s"))
      .select(col("p_partkey").as("ps_partkey"), col("ps_suppkey"),
        ((col("p_partkey") * 7 + col("ps_suppkey") * 11) % 9999 + 1)
          .cast("long").as("ps_availqty"),
        ((col("p_partkey") * 31 + col("ps_suppkey") * 17) % 90001 + 10000)
          .cast("long").as("ps_supplycost_c"))
  }

  /** Oracle twin of [[partsupp]]: CTEs ending in
    * `ps(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_c)`.
    */
  private val partsuppSql: String =
    """ps0 AS (SELECT p_partkey,
      |          (p_partkey * 13 + u.i * 7 + 1) %
      |            (SELECT count(*) FROM supplier) AS ps_suppkey
      |        FROM part, unnest(range(0, 4)) AS u(i)),
      |ps AS (SELECT p_partkey AS ps_partkey, ps_suppkey,
      |         (p_partkey * 7 + ps_suppkey * 11) % 9999 + 1 AS ps_availqty,
      |         (p_partkey * 31 + ps_suppkey * 17) % 90001 + 10000
      |           AS ps_supplycost_c
      |       FROM ps0)""".stripMargin

  def queries: Map[String, Q] = Map[String, Q](

    // Q5 — local supplier volume: revenue kept inside one region in one
    // year, counted only when the customer and the line's supplier sit
    // in the SAME nation. The nation⋈region dim chain is an explicit
    // broadcast (≤ a few hundred rows at any scale); the
    // lineitem⋈orders⋈customer⋈supplier chain is all key equi-joins —
    // SMJ on the key at 100 TB, with the same-nation requirement as a
    // residual equality inside the supplier join, not a post-filter.
    // The order-year filter is pushed to the orders scan.
    "q5_local_volume" -> ((s, dir) => {
      val asia = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1997-01-01"))
        .select("o_orderkey", "o_custkey")
      val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), revC.as("rev_c"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum("rev_c").as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("n_name"))
    }),

    // Q7 — volume shipping between two nations, either direction, by
    // ship year. supplier⋈nation and customer⋈nation pre-resolve each
    // side's nation NAME before the fact join (two dim joins on
    // bounded frames, broadcast nation only); the either-direction
    // pair predicate rides the join output as one boolean, and the
    // two-year ship window is pushed to the lineitem scan.
    "q7_volume_shipping" -> ((s, dir) => {
      val (na, nb) = ("NATION_3", "NATION_7")
      val n = broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name"))
      val sup = Tables.supplier(s, dir)
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, dir)
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"), revC.as("rev_c"))
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .where((col("supp_nation") === na && col("cust_nation") === nb) ||
          (col("supp_nation") === nb && col("cust_nation") === na))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum("rev_c").as("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Q6 — the forecast-revenue-change scan: one fully-pushed filter
    // (year × discount band × quantity cap) and a 1-row sum of
    // l_extendedprice·l_discount on the cents grid. The simplest TPC-H
    // shape, kept because it is the purest pushdown/codegen probe: the
    // whole query is scan → filter → partial/final agg with no
    // exchange beyond the final 1-row merge.
    "q6_forecast_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01") &&
          expr("CAST(round(l_discount * 100) AS BIGINT)").between(5L, 7L) &&
          col("l_quantity") < 24)
        .agg(
          count(lit(1)).as("n_lines"),
          sum(expr("CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)"))
            .as("revenue_effect_cents"))
        .orderBy("n_lines")),

    // Q8 — national market share: of one region's revenue for one part
    // type across two years, the ppm slice delivered by suppliers of
    // one nation, per order year. The share is a conditional-sum DIV
    // total on the cents grid (exact ppm, like Q14); customer-side
    // nation chain restricts the market region, supplier-side nation
    // provides the numerator flag. nation/region broadcast; everything
    // else key equi-joins.
    "q8_market_share" -> ((s, dir) => {
      val n = Tables.nation(s, dir).select("n_nationkey", "n_name", "n_regionkey")
      val marketNations = broadcast(n
        .join(Tables.region(s, dir).where(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("mkt_nationkey")))
      val supNation = broadcast(n.select(col("n_nationkey").as("s_nkey"),
        col("n_name").as("supp_nation")))
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
      val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val p = Tables.part(s, dir).where(col("p_type") === "PROMO")
        .select("p_partkey")
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), revC.as("rev_c"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(marketNations, col("c_nationkey") === col("mkt_nationkey"))
        .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(supNation, col("s_nationkey") === col("s_nkey"))
        .groupBy("o_year")
        .agg(
          sum(when(col("supp_nation") === "NATION_2", col("rev_c")).otherwise(0L))
            .as("nation_cents"),
          sum("rev_c").as("total_cents"))
        .withColumn("share_ppm",
          // DECIMAL(38,0): cents-sum × 1e6 — total ASIA revenue at
          // 100 TB is ~1e15-16 cents, so the BIGINT product overflows
          // (the supplier_concentration/hierarchy_share class). The
          // share itself stays ≤ 1e6.
          expr("CAST(CAST(nation_cents AS DECIMAL(38,0)) * 1000000 DIV total_cents AS BIGINT)"))
        .orderBy("o_year")
    }),

    // Q10 — returned-item reporting: top 20 customers by revenue lost
    // to returns in one quarter. Quarter filter pushed to the orders
    // scan, returnflag filter pushed to the lineitem scan; grouping
    // keys carry the customer attributes through the aggregate (no
    // second customer join), and the top-20 is a TakeOrdered, never a
    // global sort.
    "q10_returned_items" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1996-04-01"))
        .select("o_orderkey", "o_custkey")
      val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("acctbal_cents"),
        col("c_nationkey"))
      val n = broadcast(Tables.nation(s, dir).select("n_nationkey", "n_name"))
      Tables.lineitem(s, dir)
        .where(col("l_returnflag") === "R")
        .select(col("l_orderkey"), revC.as("rev_c"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "acctbal_cents", "n_name")
        .agg(sum("rev_c").as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q13 — customer order-count distribution: the canonical left-outer
    // + double-aggregate shape. The left join keeps order-less
    // customers (their count is 0 via count(o_custkey) null-skipping);
    // the second aggregate runs over the |distinct counts|-bounded
    // frame, so the expensive exchange is only the first, on c_custkey.
    "q13_order_distribution" -> ((s, dir) =>
      Tables.customer(s, dir).select("c_custkey")
        .join(Tables.orders(s, dir).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_custkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("c_count").desc)),

    // Q14 — promo revenue share for one month, in exact ppm. One
    // month-pruned fact scan joined to part on the key (no broadcast
    // pin: part is fact-scale at 100 TB), then a single 1-row
    // conditional aggregate — the division is integer DIV on the cents
    // grid so both engines emit the same BIGINT.
    "q14_promo_share" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= ts("1996-03-01") &&
          col("l_shipdate") < ts("1996-04-01"))
        .select(col("l_partkey"), revC.as("rev_c"))
        .join(Tables.part(s, dir).select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev_c")).otherwise(0L))
            .as("promo_cents"),
          sum("rev_c").as("total_cents"))
        .withColumn("promo_ppm",
          // DECIMAL(38,0): same cents-sum × 1e6 overflow class as q8.
          expr("CAST(CAST(promo_cents AS DECIMAL(38,0)) * 1000000 DIV total_cents AS BIGINT)"))
        .orderBy("total_cents")),

    // Q15 — top supplier(s) by quarter revenue. The per-supplier
    // aggregate is supplier-scale; its max is a 1-row frame broadcast
    // back as a cross join (the view + scalar-subquery of the original,
    // with ties kept). Supplier names attach AFTER the argmax filter —
    // the name join touches only winners.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1996-04-01"))
        .groupBy("l_suppkey")
        .agg(sum(revC).as("total_rev_cents"))
      val mx = rev.agg(max("total_rev_cents").as("mx"))
      rev.crossJoin(broadcast(mx))
        .where(col("total_rev_cents") === col("mx"))
        .join(Tables.supplier(s, dir).select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev_cents")
        .orderBy("s_suppkey")
    }),

    // Q18 — large-volume orders: the correlated HAVING sum(qty) > 300
    // becomes a per-order aggregate filtered BEFORE joining back to
    // orders/customer, so the join probe side is only the qualifying
    // keys (at 100 TB that's the difference between joining 600 B rows
    // and a few million). Bounded TakeOrdered top-100.
    "q18_large_orders" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .where(col("total_qty") > 300L)
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("order_date"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("total_cents"))
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir).select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "order_date",
          "total_cents", "total_qty")
        .orderBy(col("total_cents").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Q19 — OR-of-ANDs flexible predicate (brand × size × quantity
    // bands). The join stays a pure partkey equi-join — the disjunction
    // is a residual condition evaluated inside the join, and Catalyst
    // derives the common `p_size >= 1` + quantity-range bounds as
    // pushed scan filters. One 1-row aggregate out.
    "q19_flex_predicate" -> ((s, dir) => {
      // Raw (uncast) quantity in the band predicates — the oracle
      // compares raw l_quantity, and a long cast would truncate 20.5
      // into the 10–20 band here while DuckDB rejects it.
      val li = Tables.lineitem(s, dir).select(col("l_partkey"),
        col("l_quantity").as("q"), revC.as("rev_c"))
      val p = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("q").between(1L, 11L)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("q").between(10L, 20L)) ||
          (col("p_brand") === "Brand#20" && col("p_size").between(1, 15) &&
            col("q").between(20L, 30L)))
        .agg(count(lit(1)).as("n_lines"), sum("rev_c").as("revenue_cents"))
        .orderBy("n_lines")
    }),

    // Q21 (adapted — the testdata has no receipt/commit dates, so
    // "kept waiting" is shipped > 60 days after order) — suppliers who
    // were the SOLE late supplier on a finished multi-supplier order.
    // The oracle keeps the EXISTS / NOT EXISTS formulation; the engine
    // uses the standard decorrelation: per-(order, supplier) late
    // flags, then one per-order census (supplier count, late count) —
    // "sole late on a multi-supplier order" is the pure predicate
    // is_late ∧ n_supp > 1 ∧ n_late = 1. Two orderkey-clustered
    // aggregates + one orderkey join replace two distincts, a semi and
    // an anti join (measured ~3× at sf0.1), and every shuffle is on
    // the order key — no pair-grain blowup at any scale.
    "q21_sole_late" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .where(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val flagged = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
            .cast("long").as("late"))
      val per = flagged.groupBy("l_orderkey", "l_suppkey")
        .agg(max("late").as("is_late"))
      val ord = per.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"), sum("is_late").as("n_late"))
      per.join(ord, "l_orderkey")
        .where(col("is_late") === 1L && col("n_supp") > 1L &&
          col("n_late") === 1L)
        .join(Tables.supplier(s, dir).select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // Q22 (adapted — no phone column, so the prefix bucket is the
    // customer's nation; "never ordered" would be empty on this dense
    // synthetic corpus, so the lapse test is NO orders in the final
    // year) — well-funded customers gone quiet. The global
    // positive-balance average is a 1-row broadcast, and the
    // above-average test is the integer cross-multiply bal·n > Σbal
    // (no division, exact on both engines); the lapse is a left-anti
    // join against the year-pruned order keys (filter pushed to the
    // orders scan — the anti join's build side is one year, not the
    // full history).
    "q22_idle_customers" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_custkey"),
        col("c_nationkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_c"))
      val avg1 = c.where(col("bal_c") > 0L)
        .agg(sum("bal_c").as("s_bal"), count(lit(1)).as("n_bal"))
      c.crossJoin(broadcast(avg1))
        .where(col("bal_c") * col("n_bal") > col("s_bal"))
        .join(Tables.orders(s, dir)
            .where(col("o_orderdate") >= ts("2001-01-01")).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"), sum("bal_c").as("total_bal_cents"))
        .orderBy("c_nationkey")
    }),

    // Q12 (adapted — testdata has no l_shipmode/l_commitdate/
    // l_receiptdate, so the mode dimension is returnflag-linestatus and
    // "late" is ship-lag > 60 days after the order date) — did slow
    // shipping channels carry critical orders? One key equi-join
    // lineitem⋈orders with the lateness test as a residual join
    // predicate, then a conditional aggregate splitting each mode's
    // late lines by order priority (URGENT/HIGH vs the rest). The ship
    // window is pushed to the lineitem scan; orders contributes only
    // (o_orderkey, o_orderpriority, o_orderdate) — SMJ on the key at
    // 100 TB, AQE may broadcast at toy scale. No post-join filter: the
    // priority split is a SUM(CASE), one pass, map-side partials.
    "q12_shipmodes" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01"))
        .select(col("l_orderkey"), col("l_shipdate"),
          concat_ws("-", col("l_returnflag"), col("l_linestatus"))
            .as("ship_mode"))
      val o = Tables.orders(s, dir)
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
      l.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
        .groupBy("ship_mode")
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT" ||
            col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority") =!= "1-URGENT" &&
            col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy("ship_mode")
    }),

    // Q2 (adapted filters: p_type = LARGE, p_size ≤ 10; the testdata
    // has no mfgr/comment) — minimum-cost supplier per part within one
    // region, over the derived partsupp. The correlated MIN subquery
    // becomes a per-part row_number window (deterministic s_suppkey
    // tie-break) over the region-restricted join — the window sees ≤ 4
    // rows per part, so it is a bounded-width WindowGroupLimit, never
    // a second pass over partsupp. nation⋈region broadcast; part
    // filter pushed to the scan; partsupp⋈part and ⋈supplier are key
    // equi-joins (SMJ at scale, AQE broadcast at toy scale).
    "q2_min_cost_supp" -> ((s, dir) => {
      val eur = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)
          .where(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(eur), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val p = Tables.part(s, dir)
        .where(col("p_type") === "LARGE" && col("p_size") <= 10)
        .select("p_partkey", "p_name")
      val w = Window.partitionBy("ps_partkey")
        .orderBy(col("ps_supplycost_c"), col("ps_suppkey"))
      partsupp(s, dir)
        .join(p, col("ps_partkey") === col("p_partkey"))
        .join(sup, col("ps_suppkey") === col("s_suppkey"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
          expr("CAST(round(s_acctbal * 100) AS BIGINT)").as("s_acctbal_cents"),
          col("ps_supplycost_c").as("min_cost_cents"))
        .orderBy("p_partkey")
    }),

    // Q11 (adapted threshold: parts holding > 2× the MEAN stock value
    // instead of TPC-H's 0.0001/SF fraction — the fixed fraction
    // empties at large SF while the mean-multiple stays scale-free) —
    // important stock held by one nation's suppliers. Value runs on
    // the exact cents grid; the global total and group count are a
    // 1-row broadcast, and the threshold is the integer
    // cross-multiply value·n_parts > 2·total — no division, exact on
    // both engines (the Q22 discipline).
    "q11_important_stock" -> ((s, dir) => {
      val n7 = Tables.nation(s, dir).where(col("n_name") === "NATION_7")
        .select("n_nationkey")
      val sup = Tables.supplier(s, dir)
        .join(broadcast(n7), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val v = partsupp(s, dir)
        .join(sup, col("ps_suppkey") === col("s_suppkey"), "left_semi")
        .select(col("ps_partkey"),
          (col("ps_supplycost_c") * col("ps_availqty")).as("value_c"))
      val byPart = v.groupBy("ps_partkey")
        .agg(sum("value_c").as("stock_value_cents"))
      val tot = byPart.agg(sum("stock_value_cents").as("total_c"),
        count(lit(1)).as("n_parts"))
      byPart.crossJoin(broadcast(tot))
        .where(col("stock_value_cents") * col("n_parts") >
          col("total_c") * 2)
        .select(col("ps_partkey"), col("stock_value_cents"))
        .orderBy(col("stock_value_cents").desc, col("ps_partkey"))
    }),

    // Q16 (adapted: "customer complaints" exclusion becomes negative
    // account balance — no comment column) — how many distinct
    // suppliers can serve each surviving (brand, type, size) part
    // class. Part filters pushed to the scan; the supplier exclusion
    // is a left-anti join against the (tiny) flagged-supplier list;
    // count_distinct shuffles once on the 3-part group key.
    "q16_supplier_cnt" -> ((s, dir) => {
      val badSup = Tables.supplier(s, dir).where(col("s_acctbal") < 0)
        .select("s_suppkey")
      val p = Tables.part(s, dir)
        .where(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      partsupp(s, dir)
        .join(p, col("ps_partkey") === col("p_partkey"))
        .join(badSup, col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("ps_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // Q20 (adapted: p_name prefix 'small', 1996 ship year, one
    // nation) — suppliers holding excess stock of promotion-candidate
    // parts: ps_availqty > half the quantity they actually shipped.
    // The correlated sum decorrelates to a per-(part, supplier)
    // aggregate joined back on the pair key with the half-test as a
    // join residual; candidate suppliers reach the nation-filtered
    // supplier scan as a left-semi join. l_quantity values are
    // integer-valued, so the double sum (and its exact binary halving)
    // matches DuckDB bit-for-bit — the q1_agg precedent.
    // Q9 (adapted: p_name prefix 'red' as the product-line filter) —
    // profit by supplier nation and order year: revenue minus
    // supplycost·quantity on the exact cents grid. The 5-way chain is
    // all key equi-joins (part filter pushed and pruning the lineitem
    // join early; partsupp joined on the (part, supplier) PAIR key;
    // nation broadcast); l_quantity is integer-valued so the cents
    // product is exact on both engines.
    "q9_product_profit" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .where(col("p_name").startsWith("red")).select("p_partkey")
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      Tables.lineitem(s, dir)
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(partsupp(s, dir),
          col("ps_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("o_year"),
          (revC - col("ps_supplycost_c") * col("l_quantity").cast("long"))
            .as("amount_c"))
        .groupBy("nation", "o_year")
        .agg(sum("amount_c").as("profit_cents"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    "q20_promotion_suppliers" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .where(col("p_name").startsWith("small")).select("p_partkey")
      val shipped = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum("l_quantity").as("qty"))
      val cand = partsupp(s, dir)
        .join(shipped, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey") &&
          col("ps_availqty") > col("qty") * 0.5)
        .select("ps_suppkey")
      Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .where(col("n_name") === "NATION_3").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(cand, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }))

  def oracleSql: Map[String, String] = Map(

    "q5_local_volume" ->
      s"""SELECT n_name, CAST(sum($revCSql) AS BIGINT) AS revenue_cents
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY 1 ORDER BY revenue_cents DESC, n_name""".stripMargin,

    "q7_volume_shipping" ->
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         |  year(l_shipdate) AS l_year,
         |  CAST(sum($revCSql) AS BIGINT) AS revenue_cents
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
         |    OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
         |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q6_forecast_revenue" ->
      s"""SELECT count(*) AS n_lines,
         |  CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
         |    AS BIGINT) AS revenue_effect_cents
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
         |  AND l_quantity < 24
         |ORDER BY n_lines""".stripMargin,

    "q8_market_share" ->
      s"""WITH rev AS (SELECT year(o_orderdate) AS o_year,
         |    sn.n_name AS supp_nation, $revCSql AS rev_c
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation cn ON c_nationkey = cn.n_nationkey
         |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation sn ON s_nationkey = sn.n_nationkey
         |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate < TIMESTAMP '1998-01-01'),
         |m AS (SELECT o_year,
         |    CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN rev_c ELSE 0 END)
         |      AS BIGINT) AS nation_cents,
         |    CAST(sum(rev_c) AS BIGINT) AS total_cents
         |  FROM rev GROUP BY 1)
         |SELECT o_year, nation_cents, total_cents,
         |  CAST(CAST(nation_cents AS HUGEINT) * 1000000 // total_cents AS BIGINT) AS share_ppm
         |FROM m ORDER BY o_year""".stripMargin,

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name,
         |  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents, n_name,
         |  CAST(sum($revCSql) AS BIGINT) AS revenue_cents
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-04-01'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin,

    "q13_order_distribution" ->
      s"""SELECT c_count, count(*) AS n_cust FROM (
         |  SELECT c_custkey, count(o_custkey) AS c_count
         |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |  GROUP BY 1)
         |GROUP BY 1 ORDER BY c_count DESC""".stripMargin,

    "q14_promo_share" ->
      s"""SELECT
         |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revCSql ELSE 0 END)
         |    AS BIGINT) AS promo_cents,
         |  CAST(sum($revCSql) AS BIGINT) AS total_cents,
         |  CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revCSql ELSE 0 END)
         |      AS HUGEINT) * 1000000
         |    // CAST(sum($revCSql) AS BIGINT) AS BIGINT) AS promo_ppm
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
         |  AND l_shipdate < TIMESTAMP '1996-04-01'
         |ORDER BY total_cents""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (SELECT l_suppkey,
         |    CAST(sum($revCSql) AS BIGINT) AS total_rev_cents
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_rev_cents
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_rev_cents = (SELECT max(total_rev_cents) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q18_large_orders" ->
      s"""WITH big AS (SELECT l_orderkey,
         |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
         |  FROM lineitem GROUP BY 1 HAVING total_qty > 300)
         |SELECT c_name, c_custkey, o_orderkey,
         |  CAST(o_orderdate AS DATE) AS order_date,
         |  CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents, total_qty
         |FROM orders
         |JOIN big ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY total_cents DESC, o_orderkey LIMIT 100""".stripMargin,

    "q19_flex_predicate" ->
      s"""SELECT count(*) AS n_lines,
         |  CAST(sum($revCSql) AS BIGINT) AS revenue_cents
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |    AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |    AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 20 AND 30)
         |ORDER BY n_lines""".stripMargin,

    "q21_sole_late" ->
      s"""WITH late AS (SELECT DISTINCT l_orderkey, l_suppkey
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE o_orderstatus = 'F'
         |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         |SELECT s_name, count(*) AS numwait
         |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
         |WHERE EXISTS (SELECT 1 FROM lineitem l2
         |    WHERE l2.l_orderkey = l1.l_orderkey
         |      AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (SELECT 1 FROM late l3
         |    WHERE l3.l_orderkey = l1.l_orderkey
         |      AND l3.l_suppkey <> l1.l_suppkey)
         |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q22_idle_customers" ->
      s"""WITH c AS (SELECT c_custkey, c_nationkey,
         |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer),
         |avg1 AS (SELECT CAST(sum(bal_c) AS BIGINT) AS s_bal,
         |    count(*) AS n_bal FROM c WHERE bal_c > 0)
         |SELECT c_nationkey, count(*) AS n_cust,
         |  CAST(sum(bal_c) AS BIGINT) AS total_bal_cents
         |FROM c, avg1
         |WHERE bal_c * n_bal > s_bal
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |    AND o_orderdate >= TIMESTAMP '2001-01-01')
         |GROUP BY 1 ORDER BY c_nationkey""".stripMargin,

    "q12_shipmodes" ->
      s"""SELECT l_returnflag || '-' || l_linestatus AS ship_mode,
         |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
         |GROUP BY 1 ORDER BY ship_mode""".stripMargin,

    "q2_min_cost_supp" ->
      s"""WITH $partsuppSql,
         |eur AS (SELECT n_nationkey, n_name FROM nation
         |        JOIN region ON n_regionkey = r_regionkey
         |        WHERE r_name = 'EUROPE'),
         |sup AS (SELECT s_suppkey, s_name, s_acctbal, n_name
         |        FROM supplier JOIN eur ON s_nationkey = n_nationkey),
         |j AS (SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
         |        ps_supplycost_c,
         |        row_number() OVER (PARTITION BY ps_partkey
         |          ORDER BY ps_supplycost_c, ps_suppkey) AS rn
         |      FROM ps
         |      JOIN part ON ps_partkey = p_partkey
         |      JOIN sup ON ps_suppkey = s_suppkey
         |      WHERE p_type = 'LARGE' AND p_size <= 10)
         |SELECT p_partkey, p_name, s_name, n_name,
         |  CAST(round(s_acctbal * 100) AS BIGINT) AS s_acctbal_cents,
         |  ps_supplycost_c AS min_cost_cents
         |FROM j WHERE rn = 1 ORDER BY p_partkey""".stripMargin,

    "q11_important_stock" ->
      s"""WITH $partsuppSql,
         |v AS (SELECT ps_partkey,
         |        ps_supplycost_c * ps_availqty AS value_c
         |      FROM ps
         |      WHERE ps_suppkey IN (
         |        SELECT s_suppkey FROM supplier
         |        JOIN nation ON s_nationkey = n_nationkey
         |        WHERE n_name = 'NATION_7')),
         |bp AS (SELECT ps_partkey,
         |         CAST(sum(value_c) AS BIGINT) AS stock_value_cents
         |       FROM v GROUP BY 1),
         |tot AS (SELECT CAST(sum(stock_value_cents) AS BIGINT) AS total_c,
         |          count(*) AS n_parts FROM bp)
         |SELECT ps_partkey, stock_value_cents
         |FROM bp, tot
         |WHERE stock_value_cents * n_parts > total_c * 2
         |ORDER BY stock_value_cents DESC, ps_partkey""".stripMargin,

    "q16_supplier_cnt" ->
      s"""WITH $partsuppSql
         |SELECT p_brand, p_type, p_size,
         |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
         |FROM ps JOIN part ON ps_partkey = p_partkey
         |WHERE p_brand != 'Brand#1' AND p_type != 'PROMO'
         |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
         |  AND ps_suppkey NOT IN
         |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY 1, 2, 3
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q9_product_profit" ->
      s"""WITH $partsuppSql
         |SELECT n_name AS nation, year(o_orderdate) AS o_year,
         |  CAST(sum($revCSql
         |    - ps_supplycost_c * CAST(l_quantity AS BIGINT)) AS BIGINT)
         |    AS profit_cents
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE 'red%'
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q20_promotion_suppliers" ->
      s"""WITH $partsuppSql,
         |shipped AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_name LIKE 'small%'
         |    AND l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1997-01-01'
         |  GROUP BY 1, 2)
         |SELECT s_suppkey, s_name FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name = 'NATION_3'
         |  AND s_suppkey IN (
         |    SELECT ps_suppkey FROM ps
         |    JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         |    WHERE ps_availqty > qty * 0.5)
         |ORDER BY s_suppkey""".stripMargin)
}
