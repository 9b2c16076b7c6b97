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
}
