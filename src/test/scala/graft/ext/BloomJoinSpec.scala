package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[BloomJoin]] — pruned join ≡ plain join (no false negatives), the
  * prefilter actually prunes (false-positive rate near theory), and the
  * degenerate filters behave.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pruned join equals the plain inner join, duplicates included") {
    // Probe has key duplicates and keys far outside the build set; build
    // has payload duplicates per key — the join must preserve both.
    val probe = (1L to 2000L).map(i => (i % 700, s"p$i")).toDF("k", "pv")
    val build = ((1L to 50L) ++ (1L to 50L)).map(i => (i * 13, s"b$i")).toDF("bk", "bv")
    val got = BloomJoin.join(probe, "k", build, "bk", mBits = 1 << 12)
      .select("k", "pv", "bv").as[(Long, String, String)].collect().sorted
    val plain = probe.join(build, col("k") === col("bk"))
      .select("k", "pv", "bv").as[(Long, String, String)].collect().sorted
    assert(plain.nonEmpty, "fixture must produce matches")
    assert(got.toSeq === plain.toSeq)
  }

  test("prune keeps every matching key (no false negatives)") {
    val build = (1L to 300L).map(i => Tuple1(i * 7)).toDF("k")
    val filter = BloomJoin.buildFilter(build, "k", mBits = 1 << 12)
    val probe = (1L to 3000L).map(Tuple1(_)).toDF("k")
    val kept = BloomJoin.prune(probe, "k", filter, mBits = 1 << 12)
      .select("k").as[Long].collect().toSet
    val mustKeep = (1L to 300L).map(_ * 7).filter(_ <= 3000L).toSet
    assert(mustKeep.subsetOf(kept))
  }

  test("prune drops most non-members: FP rate within 4x of theory") {
    val n = 1000
    val mBits = 1 << 14 // 16 bits/key, h=4 → theoretical FP ≈ 1.2%
    val build = (1L to n.toLong).map(Tuple1(_)).toDF("k")
    val filter = BloomJoin.buildFilter(build, "k", mBits = mBits)
    val nonMembers = (1000001L to 1020000L).map(Tuple1(_)).toDF("k")
    val fp = BloomJoin.prune(nonMembers, "k", filter, mBits = mBits).count()
    assert(fp < 20000 * 0.05, s"false-positive count $fp exceeds 5% of 20k probes")
  }

  test("empty build side prunes everything; join is empty like the plain join") {
    val probe = (1L to 100L).map(Tuple1(_)).toDF("k")
    val build = Seq.empty[Long].map(Tuple1(_)).toDF("bk")
    assert(BloomJoin.join(probe, "k", build, "bk", mBits = 1 << 12).count() === 0L)
  }

  test("null probe keys are dropped, matching inner-join semantics") {
    val probe = Seq(Some(1L), None, Some(2L)).toDF("k")
    val build = Seq(1L, 2L).toDF("bk")
    val got = BloomJoin.join(probe, "k", build, "bk", mBits = 1 << 12)
      .select("k").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L))
  }

  test("probe columns colliding with working names are rejected") {
    // ADVICE r6: a probe that already carries `bloom` (or `__pos_i`)
    // would make the cross-joined filter's references ambiguous.
    val build = Seq(1L, 2L).toDF("bk")
    val filter = BloomJoin.buildFilter(build, "bk", mBits = 1 << 12)
    val withBloom = Seq((1L, "x")).toDF("k", "bloom")
    intercept[IllegalArgumentException] {
      BloomJoin.prune(withBloom, "k", filter, mBits = 1 << 12)
    }
    val withPos = Seq((1L, "x")).toDF("k", "__pos_0")
    intercept[IllegalArgumentException] {
      BloomJoin.prune(withPos, "k", filter, mBits = 1 << 12)
    }
  }

  test("filter build is deterministic") {
    val build = (1L to 500L).map(Tuple1(_)).toDF("k")
    val a = BloomJoin.buildFilter(build, "k", mBits = 1 << 12).as[Seq[Long]].head()
    val b = BloomJoin.buildFilter(build, "k", mBits = 1 << 12).as[Seq[Long]].head()
    assert(a === b)
  }
}
