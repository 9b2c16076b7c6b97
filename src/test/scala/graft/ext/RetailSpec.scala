package graft.ext

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Retail]] — ABC classification thresholds/tie-breaks and the
  * trailing-demand RANGE frame, on hand-computed fixtures.
  */
class RetailSpec extends SparkSpec {
  import spark.implicits._

  private def li(pk: Long, price: Double, qty: Double, day: String) =
    (pk, price, qty, Timestamp.valueOf(s"$day 00:00:00"))

  test("ABC classes follow cumulative brand-revenue shares") {
    // one brand, revenues 50, 30, 15, 5 → cum shares 50, 80, 95, 100:
    // A (rn=1), A (cum=80 ≤ 80), B (cum=95 ≤ 95), C.
    val lineitem = Seq(
      li(1, 50.00, 1, "1995-01-01"), li(2, 30.00, 1, "1995-01-01"),
      li(3, 15.00, 1, "1995-01-01"), li(4, 5.00, 1, "1995-01-01"))
      .toDF("l_partkey", "l_extendedprice", "l_quantity", "l_shipdate")
    val part = Seq((1L, "B1"), (2L, "B1"), (3L, "B1"), (4L, "B1"))
      .toDF("p_partkey", "p_brand")
    val got = Retail.abcClassification(lineitem, part)
      .select("p_partkey", "abc_class").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "A", 2L -> "A", 3L -> "B", 4L -> "C"))
  }

  test("a single dominant item is A even when it overshoots 80% alone") {
    val lineitem = Seq(li(1, 99.00, 1, "1995-01-01"), li(2, 1.00, 1, "1995-01-01"))
      .toDF("l_partkey", "l_extendedprice", "l_quantity", "l_shipdate")
    val part = Seq((1L, "B1"), (2L, "B1")).toDF("p_partkey", "p_brand")
    val got = Retail.abcClassification(lineitem, part)
      .select("p_partkey", "abc_class").as[(Long, String)].collect().toMap
    assert(got(1L) === "A")
    assert(got(2L) === "C") // cum = 100% > 95%
  }

  test("brands classify independently and ties break on partkey") {
    val lineitem = Seq(
      li(1, 10.00, 1, "1995-01-01"), li(2, 10.00, 1, "1995-01-01"), // B1 tie
      li(3, 7.00, 1, "1995-01-01")) // B2 alone
      .toDF("l_partkey", "l_extendedprice", "l_quantity", "l_shipdate")
    val part = Seq((1L, "B1"), (2L, "B1"), (3L, "B2")).toDF("p_partkey", "p_brand")
    val got = Retail.abcClassification(lineitem, part)
      .select("p_partkey", "abc_class").as[(Long, String)].collect().toMap
    // tie on revenue: partkey 1 ranks first (A at cum 50%), partkey 2
    // closes the brand at 100% → C; B2's only item is A.
    assert(got === Map(1L -> "A", 2L -> "C", 3L -> "A"))
  }

  test("co-purchase pairs: hand-computed lifts, distinct items, minCount gate") {
    // orders: o1 {1,2,3}, o2 {1,2}, o3 {1,2}, o4 {1,3}; part 2 duplicated
    // in o2 to prove the distinct. n_total=4, n_1=4, n_2=3, n_3=2.
    // (1,2): 3 orders, lift 3·4/(4·3)=1.0; (1,3): 2 orders, lift
    // 2·4/(4·2)=1.0; (2,3): 1 order — gated at minCount=2.
    val lineitem = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 2L),
      (3L, 1L), (3L, 2L),
      (4L, 1L), (4L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val got = Retail.copurchasePairs(lineitem, minCount = 2, k = 10)
      .select("part_a", "part_b", "n_ab", "lift", "rank")
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 3L, 1.0, 1L), (1L, 3L, 2L, 1.0, 2L)))
  }

  test("co-purchase lift ranks dependent pairs above independent ones") {
    // parts 10/11 always together (3 of 6 orders); parts 20/21 together
    // once but each in 3 orders → lift 6·1/(3·3) < 10/11's 6·3/(3·3).
    val lineitem = Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L), (3L, 11L),
      (4L, 20L), (4L, 21L), (5L, 20L), (5L, 22L), (6L, 21L), (6L, 22L))
      .toDF("l_orderkey", "l_partkey")
    val got = Retail.copurchasePairs(lineitem, minCount = 1, k = 10)
      .select("part_a", "part_b", "rank").as[(Long, Long, Long)].collect()
      .sortBy(_._3)
    assert(got.head._1 === 10L && got.head._2 === 11L)
  }

  test("demand window sums the last 7 calendar days, gaps included") {
    val lineitem = Seq(
      li(1, 1.0, 10, "1995-03-01"), li(1, 1.0, 5, "1995-03-02"),
      li(1, 1.0, 2, "1995-03-09"), // 7 days after 03-02: out of its window
      li(1, 1.0, 1, "1995-03-08")) // window covers 03-02..03-08
      .toDF("l_partkey", "l_extendedprice", "l_quantity", "l_shipdate")
    val part = Seq((1L, "B1")).toDF("p_partkey", "p_brand")
    val got = Retail.demandForecast(lineitem, part, 1995)
      .select("day", "qty_7d", "days_observed")
      .as[(Date, Long, Long)].collect().sortBy(_._1.toString)
    assert(got.map(r => (r._1.toString, r._2, r._3)).toSeq === Seq(
      ("1995-03-01", 10L, 1L),
      ("1995-03-02", 15L, 2L),  // 03-01 + 03-02
      ("1995-03-08", 6L, 2L),   // 03-02 + 03-08 (03-01 aged out)
      ("1995-03-09", 3L, 2L)))  // 03-08 + 03-09
  }

  test("demand forecast filters to the requested year") {
    val lineitem = Seq(li(1, 1.0, 10, "1994-12-31"), li(1, 1.0, 5, "1995-01-01"))
      .toDF("l_partkey", "l_extendedprice", "l_quantity", "l_shipdate")
    val part = Seq((1L, "B1")).toDF("p_partkey", "p_brand")
    val got = Retail.demandForecast(lineitem, part, 1995)
      .select("day", "qty").as[(Date, Long)].collect()
    assert(got.map(r => (r._1.toString, r._2)).toSeq === Seq(("1995-01-01", 5L)))
  }

  test("gap-fill emits explicit zero days across each brand's own span") {
    val lineitem = Seq(
      li(1, 1.0, 10, "1995-03-01"), li(1, 1.0, 2, "1995-03-04"),
      li(2, 1.0, 7, "1995-06-10"))
      .toDF("l_partkey", "l_extendedprice", "l_quantity", "l_shipdate")
    val part = Seq((1L, "B1"), (2L, "B2")).toDF("p_partkey", "p_brand")
    val got = Retail.demandGapFill(lineitem, part, 1995)
      .as[(String, Date, Long)].collect()
      .map(r => (r._1, r._2.toString, r._3)).sortBy(r => (r._1, r._2))
    // B1 densifies 03-01..03-04 (two zero days); B2's span is one day —
    // no bleed across brands, no global calendar.
    assert(got.toSeq === Seq(
      ("B1", "1995-03-01", 10L), ("B1", "1995-03-02", 0L),
      ("B1", "1995-03-03", 0L), ("B1", "1995-03-04", 2L),
      ("B2", "1995-06-10", 7L)))
  }
}
