package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Events.rollingFeatures]] (range-frame point-in-time features) and
  * [[Events.anomalies]] (exact-arithmetic z² outlier flags).
  */
class EventsFeatureSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(id: Long, user: Long, t: String, typ: String, v: Double) =
    (id, ts(t), user, typ, v)

  test("rollingFeatures: preceding-hour frame is inclusive at both ends, per user") {
    val events = Seq(
      // user 1: events at 10:00, 10:30, 11:00 (exactly 1h after first),
      // purchase at 11:00 → frame [10:00, 11:00] includes all three.
      ev(1, 1, "2024-01-01 10:00:00", "view", 10.00),
      ev(2, 1, "2024-01-01 10:30:00", "click", 20.00),
      ev(3, 1, "2024-01-01 11:00:00", "purchase", 30.00),
      // purchase at 11:00:01 for user 2: the 10:00:00 view is now
      // OUTSIDE the 1h frame (10:00:00 < 10:00:01).
      ev(4, 2, "2024-01-01 10:00:00", "view", 5.00),
      ev(5, 2, "2024-01-01 11:00:01", "purchase", 7.50),
      // user 1's events must not leak into user 2's frame and vice versa.
      ev(6, 3, "2024-01-01 10:59:00", "purchase", 1.25))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.rollingFeatures(events)
      .orderBy("event_id")
      .select("event_id", "n_1h", "sum_1h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((3L, 3L, 60.00), (5L, 1L, 7.50), (6L, 1L, 1.25)))
  }

  test("rollingFeatures: only purchases emit rows, but all events feed frames") {
    val events = Seq(
      ev(1, 1, "2024-01-01 10:00:00", "view", 1.00),
      ev(2, 1, "2024-01-01 10:10:00", "error", 2.00),
      ev(3, 1, "2024-01-01 10:20:00", "signup", 4.00))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Events.rollingFeatures(events).count() === 0)
    val withPurchase = events.unionByName(
      Seq(ev(4, 1, "2024-01-01 10:30:00", "purchase", 8.00))
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
    val out = Events.rollingFeatures(withPurchase).collect()
    assert(out.map(r => (r.getAs[Long]("n_1h"), r.getAs[Double]("sum_1h"))).toSeq
      === Seq((4L, 15.00)))
  }

  test("transitions: adjacent pairs within sessions only, never across the gap") {
    val events = Seq(
      // user 1 session 1: view → click → purchase.
      ev(1, 1, "2024-01-01 10:00:00", "view", 0),
      ev(2, 1, "2024-01-01 10:05:00", "click", 0),
      ev(3, 1, "2024-01-01 10:10:00", "purchase", 0),
      // > 6h gap → new session: purchase → view must NOT be counted
      // across it; within session 2: view → view.
      ev(4, 1, "2024-01-01 20:00:00", "view", 0),
      ev(5, 1, "2024-01-01 20:01:00", "view", 0),
      // user 2: single event → no transitions.
      ev(6, 2, "2024-01-01 10:00:00", "click", 0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.transitions(events)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(
      ("view", "click", 1L), ("click", "purchase", 1L), ("view", "view", 1L)))
  }

  test("funnelDepth: ordered chain, window cap, first-touch anchoring") {
    val events = Seq(
      // A completes signup → view → purchase in order, inside 7 days.
      ev(1, 1, "2024-01-01 10:00:00", "signup", 0),
      ev(2, 1, "2024-01-02 10:00:00", "view", 0),
      ev(3, 1, "2024-01-03 10:00:00", "purchase", 0),
      // B: view BEFORE signup → that view can't count; no later view.
      ev(4, 2, "2024-01-01 09:00:00", "view", 0),
      ev(5, 2, "2024-01-01 10:00:00", "signup", 0),
      // C: full chain but the purchase lands past the 7-day window.
      ev(6, 3, "2024-01-01 10:00:00", "signup", 0),
      ev(7, 3, "2024-01-02 10:00:00", "view", 0),
      ev(8, 3, "2024-01-20 10:00:00", "purchase", 0),
      // D: never signs up → absent from the funnel.
      ev(9, 4, "2024-01-01 10:00:00", "purchase", 0),
      // E: first-touch anchoring pinned — the window counts from the
      // FIRST signup, so the view on day 8 (1 h after a second signup)
      // is out of window and E stays at depth 1. Best-of-any-chain
      // semantics would score 2 here.
      ev(10, 5, "2024-01-01 10:00:00", "signup", 0),
      ev(11, 5, "2024-01-09 10:00:00", "signup", 0),
      ev(12, 5, "2024-01-09 11:00:00", "view", 0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.funnelDepth(events, Seq("signup", "view", "purchase"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 5L -> 1L))
  }

  test("anomalies: flags exactly the |z| > 3 rows of each type, per-type moments") {
    // Mirror-image populations: A = {40×10.00, one 1000.00}, B =
    // {40×1000.00, one 10.00}. Per type, exactly the lone value is a
    // > 3σ outlier; under POOLED moments (a cross-type leak) the mean
    // sits mid-way and the sd is so wide that NOTHING would flag — so
    // the expected set discriminates per-type scoping, not just outlier
    // detection.
    val a = (1L to 40L).map(i => ev(i, i, "2024-01-01 00:00:00", "A", 10.00)) ++
      Seq(ev(99, 99, "2024-01-01 00:00:00", "A", 1000.00))
    val b = (101L to 140L).map(i => ev(i, i, "2024-01-01 00:00:00", "B", 1000.00)) ++
      Seq(ev(199, 199, "2024-01-01 00:00:00", "B", 10.00))
    val events = (a ++ b)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.anomalies(events).select("event_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(99L, 199L))
  }

  test("anomalies: agrees with the naive double z-score away from the boundary") {
    // Deterministic pseudo-random 2dp values with a few planted spikes.
    val events = (1L to 400L).map { i =>
      val v = ((i * 37 % 100) + 1) / 4.0 // 0.25 .. 25.0, on the 2dp grid
      ev(i, i % 7, "2024-01-01 00:00:00", if (i % 3 == 0) "A" else "B", v)
    } ++ Seq(ev(901, 1, "2024-01-01 00:00:00", "A", 500.00),
      ev(902, 2, "2024-01-01 00:00:00", "B", 777.25))
    val df = events.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Events.anomalies(df).select("event_id").as[Long].collect().toSet
    // naive: per-type mean/sd in doubles
    val byType = events.groupBy(_._4)
    val expected = byType.flatMap { case (_, rows) =>
      val vs = rows.map(_._5)
      val n = vs.size.toDouble
      val m = vs.sum / n
      val sd = math.sqrt(vs.map(v => (v - m) * (v - m)).sum / n)
      rows.filter(r => math.abs(r._5 - m) > 3 * sd).map(_._1)
    }.toSet
    assert(got === expected)
    assert(got.contains(901L) && got.contains(902L))
  }

  test("multiTouch: per-purchase credit sums to exactly 1e6; latest view takes the remainder") {
    val events = Seq(
      // user 1: three views in-window → 333333+333333+333334.
      ev(1, 1, "2024-01-01 10:00:00", "view", 0),
      ev(2, 1, "2024-01-01 10:10:00", "view", 0),
      ev(3, 1, "2024-01-01 10:20:00", "view", 0),
      ev(4, 1, "2024-01-01 10:30:00", "purchase", 9),
      // user 2: one view exactly at the window boundary (inclusive).
      ev(5, 2, "2024-01-01 09:00:00", "view", 0),
      ev(6, 2, "2024-01-01 10:00:00", "purchase", 5),
      // user 3: view outside the window → purchase gets no rows.
      ev(7, 3, "2024-01-01 08:00:00", "view", 0),
      ev(8, 3, "2024-01-01 10:00:00", "purchase", 7))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.multiTouchAttribution(events)
    val perPurchase = out.groupBy("event_id")
      .agg(sum("credit_ppm").as("total")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(perPurchase === Map(4L -> 1000000L, 6L -> 1000000L))
    val credits = out.orderBy("event_id", "view_id")
      .select("event_id", "view_id", "credit_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(credits.toSeq === Seq(
      (4L, 1L, 333333L), (4L, 2L, 333333L), (4L, 3L, 333334L),
      (6L, 5L, 1000000L)))
  }

  test("multiTouch: the remainder-taking view IS the as-of tolerance match") {
    val events = Seq(
      ev(1, 1, "2024-01-01 10:00:00", "view", 0),
      ev(2, 1, "2024-01-01 10:20:00", "view", 0),
      ev(3, 1, "2024-01-01 10:30:00", "purchase", 9),
      ev(4, 2, "2024-01-01 09:30:00", "view", 0),
      ev(5, 2, "2024-01-01 10:00:00", "purchase", 5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val mt = Events.multiTouchAttribution(events)
    // The view holding the remainder is the LATEST in-window view —
    // exactly what the single-touch as-of join (with the same 1h
    // tolerance) attributes each purchase to.
    val latest = mt
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_id")
          .orderBy(col("credit_ppm").desc, col("view_id").desc)))
      .where(col("rk") === 1)
      .select("event_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val purchases = events.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value".as("purchase_value"))
    val views = events.where($"event_type" === "view")
      .groupBy($"user_id", $"ts".as("vts"))
      .agg(max($"event_id").as("view_id"))
    val asOf = AsOfJoin.asOfTolerance(purchases, views, "user_id", "ts", "vts",
        Seq("view_id"), toleranceSec = 3600L)
      .where(col("view_id").isNotNull)
      .select("event_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(latest === asOf)
    assert(latest === Map(3L -> 2L, 5L -> 4L))
  }
}
