package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the TPC-H shape batch beyond the DuckDB hash
  * compare: cross-checks that each decorrelation/rewrite preserves the
  * SPECIFICATION it stands in for, asserted on the sf0.001 tables (the
  * hash compare proves Spark ≡ DuckDB; these prove both ≡ the intended
  * semantics).
  */
class TpchShapesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q13 partitions every customer exactly once, zero-order bucket included") {
    val dist = TpchShapes.queries("q13_order_distribution")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nCust = Tables.customer(spark, dir).count()
    assert(dist.values.sum === nCust, "distribution must cover every customer")
    // The zero bucket must hold EXACTLY the order-less customers (at
    // this sf that may be zero — the assertion is the identity, not a
    // nonzero count).
    val withOrders = Tables.orders(spark, dir)
      .select("o_custkey").distinct().count()
    assert(dist.getOrElse(0L, 0L) === nCust - withOrders,
      "left-join zero-order bucket out of balance")
  }

  test("q21's census rewrite matches a literal EXISTS/NOT-EXISTS evaluation") {
    val got = TpchShapes.queries("q21_sole_late")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // Literal spec: late (order, supp) pairs on finished orders; keep
    // those with ANOTHER supplier on the order and NO other late one.
    val o = Tables.orders(spark, dir).where(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val pairs = Tables.lineitem(spark, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY")).as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val suppsByOrder = pairs.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.toSet).toMap
    val lateByOrder = pairs.filter(_._3).groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.toSet).toMap
    val sole = lateByOrder.toSeq.flatMap { case (ok, lateSupps) =>
      lateSupps.filter(s => suppsByOrder(ok).size > 1 && lateSupps == Set(s))
        .map(s => (ok, s))
    }
    val names = Tables.supplier(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = sole.groupBy(p => names(p._2)).view.mapValues(_.size.toLong)
      .toSeq.sortBy(t => (-t._2, t._1)).take(20).toSet
    assert(got === expected)
  }

  test("q22 selects only above-average balances with no final-year orders") {
    val out = TpchShapes.queries("q22_idle_customers")(spark, dir).collect()
    assert(out.nonEmpty, "lapsed-customer census came back empty")
    // Re-derive the invariant directly: every counted customer must
    // beat the positive-balance mean and have no 2001 order.
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val pos = c.map(_._3).filter(_ > 0)
    val recent = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val expected = c
      .filter(t => t._3 * pos.length > pos.sum && !recent.contains(t._1))
      .groupBy(_._2).view.mapValues(g => (g.size.toLong, g.map(_._3).sum)).toMap
    val got = out.map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
  }

  test("q15 keeps ties: every returned supplier holds exactly the max revenue") {
    val rows = TpchShapes.queries("q15_top_supplier")(spark, dir).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getLong(2)).toSet
    assert(revs.size === 1, "argmax returned mixed revenues")
  }
}
