package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Degenerate-input hardening for the event and similarity families. */
class EventsEdgeSpec extends SparkSpec {
  import spark.implicits._

  private val noEvents: DataFrame = Seq
    .empty[(Long, Timestamp, Long, String, Double)]
    .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("event operators return empty results on an empty stream") {
    assert(Events.sessionize(noEvents).count() === 0)
    assert(Events.sessionFunnel(noEvents).count() === 0)
    assert(Events.hourlyRollup(noEvents).count() === 0)
  }

  test("funnel with purchases only: sessions counted, zero conversions") {
    val ts = Timestamp.valueOf(_: String)
    val ev = Seq((1L, ts("2024-01-01 10:00:00"), 1L, "purchase", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.sessionFunnel(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 1L, 0L, 0.0)))
  }

  test("retentionCohorts builds the first-seen-day retention triangle") {
    val ts = Timestamp.valueOf(_: String)
    val ev = Seq(
      // user 1: cohort day 1, returns day 2 and day 4 (twice → one row)
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (2L, ts("2024-01-02 09:00:00"), 1L, "view", 0.0),
      (3L, ts("2024-01-04 09:00:00"), 1L, "purchase", 1.0),
      (4L, ts("2024-01-04 23:00:00"), 1L, "view", 0.0),
      // user 2: cohort day 2, never returns
      (5L, ts("2024-01-02 12:00:00"), 2L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.retentionCohorts(ev).orderBy("cohort_day", "day_offset")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L), ("2024-01-01", 3L, 1L),
      ("2024-01-02", 0L, 1L)))
  }

  private val noVecs: DataFrame = Seq
    .empty[(Long, Array[Float], Int)]
    .toDF("vec_id", "embedding", "label")

  test("similarity operators return empty results on an empty corpus") {
    assert(Similarity.labelCentroids(noVecs).count() === 0)
    assert(Similarity.labelCohesion(noVecs).count() === 0)
    assert(Similarity.kmeansAssign(noVecs).count() === 0)
    assert(Similarity.nearDupCosine(noVecs).count() === 0)
    assert(Similarity.topKBruteForce(noVecs).count() === 0)
  }

  test("zero vectors yield null cosines without poisoning label aggregates") {
    val emb = Seq(
      (0L, Array(0.0f, 0.0f), 0), // zero norm → cosine null
      (1L, Array(1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCohesion(emb).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 2L) // both members counted
  }
}
