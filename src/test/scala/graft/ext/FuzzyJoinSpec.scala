package graft.ext

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def dim: DataFrame = Seq(
    (1L, "azure linen drab"),
    (2L, "azure linen slate"),
    (3L, "rose powder khaki"),
    (4L, "rose powder khakis"), // dist 1 from #3's name
  ).toDF("sku", "clean_name")

  private def link(dirty: DataFrame, maxDist: Int = 2): Seq[(Long, Long, Int)] =
    FuzzyJoin.linkage(dirty, "rec_id", "raw_name", dim, "sku", "clean_name", maxDist)
      .select("rec_id", "sku", "dist").as[(Long, Long, Int)].collect().toSeq.sorted

  test("tail corruptions within maxDist link to the right sku") {
    val dirty = Seq(
      (10L, "azure linen drabx"),  // append → #1, dist 1
      (11L, "azure linen slat"),   // truncate → #2, dist 1
      (12L, "rose powder khak#"),  // substitute → #3 dist 1 / #4 dist 2
      (13L, "rose powder khaki"),  // exact → #3, dist 0
    ).toDF("rec_id", "raw_name")
    assert(link(dirty) === Seq((10L, 1L, 1), (11L, 2L, 1), (12L, 3L, 1), (13L, 3L, 0)))
  }

  test("candidates beyond maxDist are dropped, not mis-linked") {
    val dirty = Seq((20L, "azure linen xxxxx")).toDF("rec_id", "raw_name")
    assert(link(dirty, maxDist = 2).isEmpty)
    assert(link(dirty, maxDist = 5) === Seq((20L, 1L, 5))) // drab→xxxxx = 5 edits
  }

  test("first-token corruption is recovered by the last-token pass (r10)") {
    // dist 1 with the FIRST block token changed — the r8 single-pass
    // contract documented this as a miss; the composite blocking's
    // second (last-token) pass must now find it.
    val dirty = Seq((30L, "azur linen drab")).toDF("rec_id", "raw_name")
    assert(link(dirty) === Seq((30L, 1L, 1)))
  }

  test("corrupting BOTH anchor tokens still misses (documented contract)") {
    // dist 2, but first ("azur") and last ("dra#") both diverge from
    // every dim anchor — no blocking pass can see the pair.
    val dirty = Seq((31L, "azur linen dra#")).toDF("rec_id", "raw_name")
    assert(link(dirty).isEmpty)
  }

  test("ties on (dist, name) fall through to the key tiebreak") {
    val dup = Seq((1L, "same name"), (2L, "same name")).toDF("sku", "clean_name")
    val dirty = Seq((40L, "same name")).toDF("rec_id", "raw_name")
    val out = FuzzyJoin.linkage(dirty, "rec_id", "raw_name", dup, "sku", "clean_name", 2)
      .select("sku").as[Long].collect()
    assert(out === Seq(1L))
  }

  test("rejects identical dirty/dim name columns") {
    val dirty = Seq((50L, "x")).toDF("rec_id", "clean_name")
    intercept[IllegalArgumentException] {
      FuzzyJoin.linkage(dirty, "rec_id", "clean_name", dim, "sku", "clean_name", 2)
    }
  }
}
