package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The leakage_safe_split invariant: hashing by near-dup COMPONENT
  * keeps every duplicate family in one split, where doc-id hashing
  * demonstrably splits families across train/test (the eval leak).
  */
class LeakageSpec extends SparkSpec {
  import spark.implicits._

  private def split(anchor: org.apache.spark.sql.Column) = {
    val b = Dedup.hash60(anchor.cast("string")) % 100
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }

  test("component-keyed split never separates near-duplicates; doc-id split does") {
    // 20 duplicate pairs: docs (2i, 2i+1) share identical text, so each
    // pair is one near-dup component; texts differ across pairs.
    val docs = (0 until 40).map { i =>
      val pair = i / 2
      // Per-pair disjoint vocabulary so different pairs share NO
      // shingles (shared filler words would merge every pair into one
      // giant component through cross-pair similarity).
      (i.toLong, (0 until 16).map(w => s"tok${pair}x$w").mkString(" "))
    }.toDF("doc_id", "text")
    val groups = Dedup.dupGroups(docs)
    assert(groups.select("group_id").distinct().count() === 20L)

    val labeled = docs.select("doc_id")
      .join(groups.select("doc_id", "group_id"), Seq("doc_id"), "left")
      .withColumn("anchor", coalesce(col("group_id"), col("doc_id")))
      .withColumn("safe_split", split(col("anchor")))
      .withColumn("naive_split", split(col("doc_id")))

    val safeLeaks = labeled.groupBy("anchor")
      .agg(countDistinct("safe_split").as("n_splits"))
      .where(col("n_splits") > 1).count()
    assert(safeLeaks === 0L, "component-keyed split separated a family")

    val naiveLeaks = labeled.groupBy("anchor")
      .agg(countDistinct("naive_split").as("n_splits"))
      .where(col("n_splits") > 1).count()
    assert(naiveLeaks > 0L,
      "fixture too small to demonstrate the doc-id-hash leak — grow it")
  }
}
