package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Stats.groupQuantiles]] — discrete type-1 quantiles: hand-computed
  * ranks, tie safety, group isolation, degenerate group sizes.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("quantiles select the value at rank ceil(p*n/100)") {
    // n = 10, values 10..100: p50 -> rank 5 -> 50; p90 -> rank 9 -> 90;
    // p99 -> rank 10 -> 100
    val df = (1 to 10).map(i => ("g", i * 10.0)).toDF("g", "v")
    val got = Stats.groupQuantiles(df, Seq("g"), "v", Seq(50, 90, 99))
      .as[(String, Double, Double, Double)].collect().head
    assert(got === (("g", 50.0, 90.0, 100.0)))
  }

  test("tied values cannot change the answer") {
    // All mass at two values; any row_number assignment among ties
    // yields the same selected value.
    val df = (Seq.fill(5)(1.0) ++ Seq.fill(5)(2.0)).map(("g", _)).toDF("g", "v")
    val got = Stats.groupQuantiles(df, Seq("g"), "v", Seq(50, 100))
      .as[(String, Double, Double)].collect().head
    assert(got === (("g", 1.0, 2.0)))
  }

  test("groups compute independently; n=1 returns the value everywhere") {
    val df = (Seq(("a", 7.0)) ++ (1 to 100).map(i => ("b", i.toDouble)))
      .toDF("g", "v")
    val got = Stats.groupQuantiles(df, Seq("g"), "v", Seq(1, 50, 100))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") === ((7.0, 7.0, 7.0)))
    assert(got("b") === ((1.0, 50.0, 100.0)))
  }

  test("caller columns named rn/n survive as group keys (collision-safe working names)") {
    // ADVICE r6: the internal rank/count columns must not clobber input
    // columns of the same name — here `n` is itself a grouping column.
    val df = Seq(("g", 1, 10.0), ("g", 1, 20.0), ("g", 2, 30.0))
      .toDF("g", "n", "v")
    val got = Stats.groupQuantiles(df, Seq("g", "n"), "v", Seq(100))
      .as[(String, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === Map(("g", 1) -> 20.0, ("g", 2) -> 30.0))
  }

  test("duplicate percentiles are rejected instead of emitting colliding columns") {
    val df = Seq(("g", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Stats.groupQuantiles(df, Seq("g"), "v", Seq(50, 50))
    }
  }

  test("null values are excluded before ranking") {
    val df = Seq(("g", Some(1.0)), ("g", None), ("g", Some(3.0)))
      .toDF("g", "v")
    val got = Stats.groupQuantiles(df, Seq("g"), "v", Seq(100))
      .as[(String, Double)].collect().head
    assert(got === (("g", 3.0)))
  }

  test("globalRowNumber equals the single-partition row_number window") {
    import org.apache.spark.sql.expressions.Window
    // Sizes straddling the partition count (32), including n < P,
    // n = P, and a frame much larger than P, plus duplicate VALUES
    // (the unique id tiebreaker keeps the order total).
    for (n <- Seq(1, 7, 32, 33, 1000)) {
      val df = (1 to n).map(i => (i.toLong, (i * 7919) % 97)).toDF("id", "v")
      val order = Seq(col("v").desc, col("id"))
      val got = Stats.globalRowNumber(df, order)
        .select("id", "rank").as[(Long, Long)].collect().toMap
      val want = df.withColumn("rank",
          row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
        .select("id", "rank").as[(Long, Long)].collect().toMap
      assert(got === want, s"rank mismatch at n=$n")
    }
  }

  test("ntileExact is bit-identical to the ntile window for every k and n") {
    import org.apache.spark.sql.expressions.Window
    // Covers n < k (each row its own tile), n = k, remainder buckets
    // (n mod k != 0), and exact division.
    for (n <- Seq(3, 10, 25, 100, 1001); k <- Seq(4, 5, 10)) {
      val df = (1 to n).map(i => (i.toLong, (i * 6151) % 53)).toDF("id", "v")
      val order = Seq(col("v"), col("id"))
      val got = Stats.ntileExact(df, k, order)
        .select("id", "tile").as[(Long, Int)].collect().toMap
      val want = df.withColumn("tile",
          ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "tile").as[(Long, Int)].collect().toMap
      assert(got === want, s"tile mismatch at n=$n k=$k")
    }
  }
}
