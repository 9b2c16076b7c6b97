package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[RangeJoin.pointInInterval]] — bucket-blocked non-equi containment
  * join: equivalence with the naive cross-join filter, exactly-once pair
  * emission across bucket boundaries, inclusive endpoints.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("matches the naive cross-join filter, each pair exactly once") {
    // Deterministic spread: 60 points across 3 days, 12 intervals of
    // lengths 1 min .. 40 h (many spanning several 1h buckets).
    val points = (1L to 60L)
      .map(i => (i, ts(f"2024-01-0${1 + (i % 3)}%d ${(i * 7 % 24)}%02d:${i % 60}%02d:00")))
      .toDF("pid", "pt")
    val intervals = (1L to 12L).map { k =>
      val st = ts(f"2024-01-0${1 + (k % 3)}%d ${(k * 5 % 23)}%02d:00:00")
      val en = new Timestamp(st.getTime + k * k * 1000L * 60 * 17) // 17min..41h
      (k, st, en)
    }.toDF("iid", "st", "en")
    val got = RangeJoin.pointInInterval(points, "pt", intervals, "st", "en")
      .select("iid", "pid").as[(Long, Long)].collect().sorted
    val naive = points.crossJoin(intervals)
      .where(col("pt") >= col("st") && col("pt") <= col("en"))
      .select("iid", "pid").as[(Long, Long)].collect().sorted
    assert(naive.nonEmpty, "fixture must produce matches")
    assert(got.toSeq === naive.toSeq)
    assert(got.length === got.distinct.length, "no pair may be emitted twice")
  }

  test("endpoints are inclusive and bucket edges don't drop matches") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")), // exactly interval start
      (2L, ts("2024-01-01 12:00:00")), // exactly interval end, bucket edge
      (3L, ts("2024-01-01 11:00:00")), // interior, on a bucket boundary
      (4L, ts("2024-01-01 12:00:01"))) // one second past the end
      .toDF("pid", "pt")
    val intervals = Seq((7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")))
      .toDF("iid", "st", "en")
    val got = RangeJoin.pointInInterval(points, "pt", intervals, "st", "en")
      .select("pid").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L, 3L))
  }

  test("zero-length interval matches exactly its own instant") {
    val points = Seq((1L, ts("2024-01-01 10:30:00")), (2L, ts("2024-01-01 10:30:01")))
      .toDF("pid", "pt")
    val intervals = Seq((1L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:30:00")))
      .toDF("iid", "st", "en")
    val got = RangeJoin.pointInInterval(points, "pt", intervals, "st", "en")
      .select("pid").as[Long].collect()
    assert(got.toSeq === Seq(1L))
  }

  test("intervalCount equals the pair join's group count, plus 0-rows") {
    // Same spread fixture as the pair-join equivalence test — many
    // intervals spanning several 1h buckets, some empty.
    val points = (1L to 60L)
      .map(i => (i, ts(f"2024-01-0${1 + (i % 3)}%d ${(i * 7 % 24)}%02d:${i % 60}%02d:00")))
      .toDF("pid", "pt")
    val intervals = (1L to 12L).map { k =>
      val st = ts(f"2024-01-0${1 + (k % 3)}%d ${(k * 5 % 23)}%02d:00:00")
      val en = new Timestamp(st.getTime + k * k * 1000L * 60 * 17)
      (k, st, en)
    }.toDF("iid", "st", "en")
    val got = RangeJoin.intervalCount(points.select(col("pt")), "pt",
        intervals, Seq("iid"), "st", "en")
      .as[(Long, Long)].collect().toMap
    val viaPairs = RangeJoin.pointInInterval(points, "pt", intervals, "st", "en")
      .groupBy("iid").count().as[(Long, Long)].collect().toMap
    assert(got.keySet === (1L to 12L).toSet,
      "every interval gets a row, empty ones included")
    for (k <- 1L to 12L)
      assert(got(k) === viaPairs.getOrElse(k, 0L), s"interval $k")
    assert(viaPairs.nonEmpty, "fixture must produce matches")
  }

  test("intervalCount endpoints are inclusive; equal-time ties count inward") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")), // exactly start
      (2L, ts("2024-01-01 10:00:00")), // duplicate at start
      (3L, ts("2024-01-01 12:00:00")), // exactly end, on a bucket edge
      (4L, ts("2024-01-01 12:00:01")), // past the end
      (5L, ts("2024-01-01 09:59:59"))) // before the start
      .toDF("pid", "pt")
    val intervals = Seq(
      (7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      (8L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00")), // zero-length
      (9L, ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00"))) // empty
      .toDF("iid", "st", "en")
    val got = RangeJoin.intervalCount(points.select(col("pt")), "pt",
        intervals, Seq("iid"), "st", "en")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(7L -> 3L, 8L -> 2L, 9L -> 0L))
  }

  test("intervalCount drops degenerate intervals exactly like the pair join") {
    // Null endpoints and inverted intervals: pointInInterval's range
    // predicate emits no row for them, so the count twin must emit no
    // row either (not a one-sided or negative count — ADVICE r12).
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 11:00:00")))
      .toDF("pid", "pt")
    val intervals = Seq(
      (1L, Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 12:00:00"))), // valid
      (2L, None, Some(ts("2024-01-01 12:00:00"))),                            // null start
      (3L, Some(ts("2024-01-01 10:00:00")), None),                            // null end
      (4L, Some(ts("2024-01-01 12:00:00")), Some(ts("2024-01-01 10:00:00")))) // inverted
      .toDF("iid", "st", "en")
    val got = RangeJoin.intervalCount(points.select(col("pt")), "pt",
        intervals, Seq("iid"), "st", "en")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L))
    val viaPairs = RangeJoin.pointInInterval(points, "pt", intervals, "st", "en")
      .groupBy("iid").count().as[(Long, Long)].collect().toMap
    assert(viaPairs === Map(1L -> 2L))
  }

  test("pointInIntervalTopK = naive pair join's per-interval top-k") {
    val points = (1L to 60L)
      .map(i => (i, ts(f"2024-01-0${1 + (i % 3)}%d ${(i * 7 % 24)}%02d:${i % 60}%02d:00")))
      .toDF("pid", "pt")
    val intervals = (1L to 12L).map { k =>
      val st = ts(f"2024-01-0${1 + (k % 3)}%d ${(k * 5 % 23)}%02d:00:00")
      val en = new Timestamp(st.getTime + k * k * 1000L * 60 * 17)
      (k, st, en)
    }.toDF("iid", "st", "en")
    val got = RangeJoin.pointInIntervalTopK(points, "pt", "pid", intervals,
        "st", "en", Seq("iid"), k = 3)
      .select("iid", "rank", "pid").as[(Long, Int, Long)].collect().sorted
    val naive = points.crossJoin(intervals)
      .where(col("pt") >= col("st") && col("pt") <= col("en"))
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy("iid").orderBy(col("pt").desc, col("pid"))))
      .where(col("rank") <= 3)
      .select("iid", "rank", "pid").as[(Long, Int, Long)].collect().sorted
    assert(naive.nonEmpty)
    assert(got.toSeq === naive.toSeq)
    // Output bound: no interval may exceed k rows.
    assert(got.groupBy(_._1).values.forall(_.length <= 3))
  }

  test("pointInIntervalTopKMerge = join form = naive, on the spread fixture") {
    val points = (1L to 60L)
      .map(i => (i, ts(f"2024-01-0${1 + (i % 3)}%d ${(i * 7 % 24)}%02d:${i % 60}%02d:00")))
      .toDF("pid", "pt")
    val intervals = (1L to 12L).map { k =>
      val st = ts(f"2024-01-0${1 + (k % 3)}%d ${(k * 5 % 23)}%02d:00:00")
      val en = new Timestamp(st.getTime + k * k * 1000L * 60 * 17)
      (k, st, en)
    }.toDF("iid", "st", "en")
    val got = RangeJoin.pointInIntervalTopKMerge(points, "pt", "pid", intervals,
        "st", "en", Seq("iid"), k = 3)
      .select("iid", "rank", "pid").as[(Long, Int, Long)].collect().sorted
    val viaJoin = RangeJoin.pointInIntervalTopK(points, "pt", "pid", intervals,
        "st", "en", Seq("iid"), k = 3)
      .select("iid", "rank", "pid").as[(Long, Int, Long)].collect().sorted
    assert(viaJoin.nonEmpty)
    assert(got.toSeq === viaJoin.toSeq)
  }

  test("merge form: ties, inclusive bounds, cross-bucket carry-in") {
    val points = Seq(
      (10L, ts("2024-01-01 03:15:00")), // many buckets before the probes
      (11L, ts("2024-01-01 03:15:00")), // tie: smaller id must rank first
      (12L, ts("2024-01-01 09:59:59")), // just before interval 7's start
      (13L, ts("2024-01-01 10:00:00")), // exactly start
      (14L, ts("2024-01-01 12:00:00")), // exactly end, bucket edge
      (15L, ts("2024-01-01 12:00:01"))) // past the end
      .toDF("pid", "pt")
    val intervals = Seq(
      // Two in-range points (13, 14): top-3 truncates at start.
      (7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
      // Spans every point bucket: answer is carried across buckets and
      // must order (15, 14, 13) with the 03:15 tie pair pushed out.
      (8L, ts("2024-01-01 00:00:00"), ts("2024-01-01 23:00:00")),
      // Ends inside the tie pair's bucket: tie-break id ASC at rank 1/2.
      (9L, ts("2024-01-01 03:00:00"), ts("2024-01-01 04:00:00")),
      // Empty interval: no output row at all.
      (1L, ts("2024-01-01 05:00:00"), ts("2024-01-01 06:00:00")))
      .toDF("iid", "st", "en")
    val got = RangeJoin.pointInIntervalTopKMerge(points, "pt", "pid", intervals,
        "st", "en", Seq("iid"), k = 3)
      .select("iid", "rank", "pid").as[(Long, Int, Long)].collect().sorted
    assert(got.toSeq === Seq(
      (7L, 1, 14L), (7L, 2, 13L),
      (8L, 1, 15L), (8L, 2, 14L), (8L, 3, 13L),
      (9L, 1, 10L), (9L, 2, 11L)))
  }

  test("merge form drops degenerate intervals exactly like the join form") {
    val points = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("pid", "pt")
    val intervals = Seq(
      (1L, Some(ts("2024-01-01 09:00:00")), Some(ts("2024-01-01 11:00:00"))),
      (2L, None, Some(ts("2024-01-01 12:00:00")))                             ,
      (3L, Some(ts("2024-01-01 10:00:00")), None),
      (4L, Some(ts("2024-01-01 12:00:00")), Some(ts("2024-01-01 10:00:00"))))
      .toDF("iid", "st", "en")
    val got = RangeJoin.pointInIntervalTopKMerge(points, "pt", "pid", intervals,
        "st", "en", Seq("iid"), k = 3)
      .select("iid", "rank", "pid").as[(Long, Int, Long)].collect().sorted
    assert(got.toSeq === Seq((1L, 1, 1L)))
  }

  test("merge form plan has no point-interval join stage") {
    // The scale contract (VERDICT r15 ask #3): the only join may be the
    // bucket-scale carry-in broadcast — candidate pairs must never form,
    // so no sort-merge join and no nested-loop join can appear.
    val points = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("pid", "pt")
    val intervals = Seq((1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("iid", "st", "en")
    val plan = RangeJoin.pointInIntervalTopKMerge(points, "pt", "pid", intervals,
        "st", "en", Seq("iid"), k = 3).queryExecution.executedPlan.toString
    assert(plan.contains("top_k_by_score"), s"missing TopKByScore:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("NestedLoop"),
      s"no data-scale join may appear:\n$plan")
  }

  test("pointInIntervalTopK plan is heap-aggregated — no sort, no window") {
    // The scale contract (VERDICT r14 ask #4): ranking must be the
    // bounded-heap TopKByScore aggregate with a partial pass — the
    // pair stream may never be sorted (a row_number WindowGroupLimit
    // still sorts every map task's full pair set: 182 s vs 21 s for
    // plain enumeration at sf1) nor shuffled unbounded.
    val points = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("pid", "pt")
    val intervals = Seq((1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("iid", "st", "en")
    val plan = RangeJoin.pointInIntervalTopK(points, "pt", "pid", intervals,
        "st", "en", Seq("iid"), k = 3).queryExecution.executedPlan.toString
    assert(plan.contains("top_k_by_score"), s"missing TopKByScore:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"missing hash aggregate:\n$plan")
    assert(!plan.contains("WindowGroupLimit") && !plan.contains("Window "),
      s"pair stream must not be windowed:\n$plan")
  }
}
