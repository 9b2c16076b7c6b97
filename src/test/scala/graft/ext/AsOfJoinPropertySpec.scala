package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Property test: the union+window as-of join agrees with the naive
  * range-join-and-argmax formulation on arbitrary key/time interleavings
  * (raw scalacheck — scalatestplus bridge not available offline).
  */
class AsOfJoinPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def ts(minutes: Int) = new Timestamp(t0 + minutes * 60000L)

  // Small key and time domains force collisions: same-timestamp
  // left/right pairs, multi-row keys, keys on one side only.
  private val rowGen = Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0, 30))
  private val leftGen = Gen.listOfN(25, rowGen)
  private val rightGen = Gen.listOfN(10, rowGen)

  test("asOf ≡ naive range-join argmax on random interleavings (15 cases)") {
    val prop = Prop.forAll(leftGen, rightGen) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, m), i) => (i.toLong, k, ts(m)) }
        .toDF("id", "k", "t")
      // Right must be unique per (key, time): keep the max payload, the
      // same dedup rule the declared query uses.
      val right = rs.map { case (k, m) => (k, ts(m), k * 1000 + m) }
        .toDF("k", "rt", "payload")
        .groupBy("k", "rt").agg(max("payload").as("payload"))
      val fast = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("payload"))
        .orderBy("id").select("id", "payload")
        .as[(Long, Option[Long])].collect().toSeq
      val naive = left.as("l")
        .join(right.as("r"),
          col("l.k") === col("r.k") && col("r.rt") <= col("l.t"), "left")
        .groupBy(col("l.id").as("id"))
        .agg(max_by(col("r.payload"), col("r.rt")).as("payload"))
        .orderBy("id").as[(Long, Option[Long])].collect().toSeq
      fast == naive
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
