package graft.ext

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Property tests for the r8c sequential/attribution operators:
  * StockSim against a naive Scala fold on random demand streams,
  * multi-touch credit conservation on random event sets, and the
  * sliding-window cover invariant (every event sits in exactly
  * dur/slide windows).
  */
class OpsPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val demandGen: Gen[List[(Long, List[Long])]] = for {
    nParts <- Gen.chooseNum(1, 5)
    demands <- Gen.listOfN(nParts,
      Gen.listOfN(12, Gen.chooseNum(0L, 25L)))
  } yield (1L to nParts).toList.zip(demands)

  test("StockSim.simulate equals the naive clamped fold on random demand") {
    val prop = Prop.forAll(demandGen) { parts =>
      val rows = parts.flatMap { case (p, ds) =>
        ds.zipWithIndex.map { case (sold, i) => StockDay(p, i + 1, sold) }
      }
      val got = StockSim.simulate(rows.toDS(), opening = 20L, inflow = 6L)
        .collect().map(s => s.part -> ((s.final_balance, s.n_stockouts, s.total_unmet)))
        .toMap
      val expected = parts.map { case (p, ds) =>
        var bal = 20L; var so = 0L; var unmet = 0L
        ds.foreach { sold =>
          val raw = bal + 6L - sold
          if (raw < 0) { so += 1; unmet -= raw; bal = 0 } else bal = raw
        }
        p -> ((bal, so, unmet))
      }.toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  private val eventsGen: Gen[List[(Long, Long, Int, String)]] = for {
    n <- Gen.chooseNum(2, 30)
    rows <- Gen.listOfN(n, for {
      user <- Gen.chooseNum(1L, 4L)
      minute <- Gen.chooseNum(0, 300)
      typ <- Gen.oneOf("view", "purchase")
    } yield (user, minute.toLong, minute, typ))
  } yield rows.zipWithIndex.map { case ((u, _, m, t), i) => (i.toLong, u, m, t) }

  test("multiTouch conserves exactly 1e6 credit per matched purchase") {
    val prop = Prop.forAll(eventsGen) { rows =>
      val df = rows.map { case (id, u, minute, t) =>
        (id, new Timestamp(1700000000000L + minute * 60000L), u, t, 0.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val out = Events.multiTouchAttribution(df).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      val perPurchase = out.groupBy(_._1).view.mapValues(_.map(_._3).sum)
      perPurchase.values.forall(_ == 1000000L) && {
        // Pair-set agreement with a naive evaluation of the window.
        val views = rows.filter(_._4 == "view")
        val purchases = rows.filter(_._4 == "purchase")
        val naive = (for {
          p <- purchases
          v <- views
          if v._2 == p._2 && v._3 <= p._3 && v._3 >= p._3 - 60
        } yield (p._1, v._1)).toSet
        out.map(t => (t._1, t._2)).toSet == naive
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("sliding windows cover every event exactly dur/slide times") {
    val prop = Prop.forAll(eventsGen) { rows =>
      val df = rows.map { case (id, u, minute, t) =>
        (id, new Timestamp(1700000000000L + minute * 60000L), u, t, 0.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val counted = Events.slidingCounts(df).collect().map(_.getLong(2)).sum
      counted == 4L * rows.length
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
