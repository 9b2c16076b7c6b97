package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def left: DataFrame = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")), // before any right row
    (2L, 10L, ts("2024-01-01 12:00:00")), // after r1
    (3L, 10L, ts("2024-01-01 13:00:00")), // exactly at r2 → matches r2
    (4L, 10L, ts("2024-01-01 23:00:00")), // after r2
    (5L, 20L, ts("2024-01-01 12:00:00")), // key with no right rows
    (6L, 30L, ts("2024-01-01 12:00:00")), // key only in right, before it
  ).toDF("id", "k", "t")

  private def right: DataFrame = Seq(
    (10L, ts("2024-01-01 11:00:00"), 100L),
    (10L, ts("2024-01-01 13:00:00"), 200L),
    (30L, ts("2024-01-01 18:00:00"), 300L),
  ).toDF("k", "rt", "payload")

  test("asOf attaches the last right row at or before each left time") {
    val out = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("payload"))
      .orderBy("id")
      .select("id", "payload").as[(Long, Option[Long])].collect()
    assert(out === Seq(
      1L -> None, 2L -> Some(100L), 3L -> Some(200L), 4L -> Some(200L),
      5L -> None, 6L -> None))
  }

  test("asOf equals the naive range-join-and-argmax formulation") {
    // The O(|L|·|R|/keys) reference semantics, computed the slow way.
    val naive = left.as("l")
      .join(right.as("r"), col("l.k") === col("r.k") && col("r.rt") <= col("l.t"), "left")
      .groupBy(col("l.id").as("id"))
      .agg(max_by(col("r.payload"), col("r.rt")).as("payload"))
      .orderBy("id")
      .as[(Long, Option[Long])].collect()
    val fast = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("payload"))
      .orderBy("id").select("id", "payload")
      .as[(Long, Option[Long])].collect()
    assert(fast === naive)
  }

  test("asOf carries multiple payload columns from the same matched row") {
    val r2 = right.withColumn("payload2", col("payload") * 10)
    val out = AsOfJoin.asOf(left, r2, "k", "t", "rt", Seq("payload", "payload2"))
      .where(col("payload").isNotNull)
      .select("payload", "payload2")
      .as[(Long, Long)].collect()
    assert(out.forall { case (p, p2) => p2 === p * 10 })
  }

  test("asOf rejects overlapping non-key column names") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right.withColumnRenamed("payload", "t"), "k", "t", "rt", Seq("t"))
    }
  }

  test("asOfTolerance nulls matches older than the tolerance, keeps fresh ones") {
    // left id=2 trails r1 by 1h, id=4 trails r2 by 10h: a 2h tolerance
    // keeps 2 and 3 (exact-time match, lag 0) and discards 4.
    val out = AsOfJoin.asOfTolerance(left, right, "k", "t", "rt",
        Seq("payload"), toleranceSec = 2 * 3600)
      .orderBy("id").select("id", "payload").as[(Long, Option[Long])].collect()
    assert(out === Seq(
      1L -> None, 2L -> Some(100L), 3L -> Some(200L), 4L -> None,
      5L -> None, 6L -> None))
  }

  test("asOfTolerance at the exact boundary is inclusive") {
    // id=2 at 12:00 vs r1 at 11:00 — a 3600 s tolerance keeps it.
    val out = AsOfJoin.asOfTolerance(left, right, "k", "t", "rt",
        Seq("payload"), toleranceSec = 3600)
      .where(col("id") === 2L).select("payload").as[Option[Long]].collect()
    assert(out === Seq(Some(100L)))
  }

  test("asOfTolerance with a huge tolerance equals plain asOf") {
    val plain = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("payload"))
      .orderBy("id").select("id", "payload").as[(Long, Option[Long])].collect()
    val tol = AsOfJoin.asOfTolerance(left, right, "k", "t", "rt",
        Seq("payload"), toleranceSec = 365L * 24 * 3600)
      .orderBy("id").select("id", "payload").as[(Long, Option[Long])].collect()
    assert(tol === plain)
  }

  test("asOfTolerance nulls ALL payload columns of a stale match together") {
    val r2 = right.withColumn("payload2", col("payload") * 10)
    val out = AsOfJoin.asOfTolerance(left, r2, "k", "t", "rt",
        Seq("payload", "payload2"), toleranceSec = 2 * 3600)
      .orderBy("id").select("payload", "payload2")
      .as[(Option[Long], Option[Long])].collect()
    assert(out.forall { case (p, p2) => p.isDefined === p2.isDefined })
  }

  test("asOfNearest picks the closer side, backward on ties, either alone") {
    val out = AsOfJoin.asOfNearest(left, right, "k", "t", "rt", Seq("payload"))
      .orderBy("id")
      .select("id", "payload").as[(Long, Option[Long])].collect()
    assert(out === Seq(
      1L -> Some(100L), // before any right row → forward match
      2L -> Some(100L), // 11:00 is 1h back, 13:00 1h forward → tie → backward
      3L -> Some(200L), // exact-time match, distance 0
      4L -> Some(200L), // only backward exists
      5L -> None,       // key with no right rows at all
      6L -> Some(300L)))// only forward exists
  }

  test("asOfNearest attaches all payload columns from the SAME right row") {
    val r2 = right.withColumn("payload2", col("payload") * 10)
    val out = AsOfJoin.asOfNearest(left, r2, "k", "t", "rt",
        Seq("payload", "payload2"))
      .orderBy("id").select("payload", "payload2")
      .as[(Option[Long], Option[Long])].collect()
    assert(out.forall {
      case (Some(p), Some(p2)) => p2 === p * 10
      case (None, None) => true
      case _ => false
    })
  }
}
