package graft.ext

import graft.SparkSpec

/** [[Similarity.semDedup]] — cluster-scoped semantic dedup verdicts. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def asg(rows: (Long, Int)*) = rows.toDF("vec_id", "cell")

  test("drops the higher id of a near-duplicate pair, keeps the rest") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.999f, 0.01f, 0.0f), 0), // near-dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f), 0), // orthogonal, same cell
      (4L, Array(0.0f, 0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.semDedup(emb, threshold = 0.97,
      assignments = Some(asg((1L, 0), (2L, 0), (3L, 0), (4L, 1))))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2)))
    assert(out.toSeq === Seq((1L, true), (2L, false), (3L, true), (4L, true)))
  }

  test("identical vectors in DIFFERENT cells are both kept (cluster-scoped)") {
    val v = Array(1.0f, 0.0f)
    val emb = Seq((1L, v, 0), (2L, v, 1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.semDedup(emb, threshold = 0.97,
      assignments = Some(asg((1L, 0), (2L, 1))))
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    assert(out === Set((1L, true), (2L, true)))
  }

  test("duplicate chain: only the lowest id survives its neighborhood") {
    // 1≈2≈3 pairwise above threshold — 2 and 3 each lose to a lower id.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.999f, 0.005f), 0),
      (3L, Array(0.998f, 0.01f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.semDedup(emb, threshold = 0.97,
      assignments = Some(asg((1L, 0), (2L, 0), (3L, 0))))
      .orderBy("vec_id").collect().map(_.getBoolean(2))
    assert(out.toSeq === Seq(true, false, false))
  }

  test("in-query training path produces a verdict for every vector") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.semDedup(emb, threshold = 0.99)
    assert(out.count() === 4L)
    assert(out.columns.toSeq === Seq("vec_id", "cell", "kept"))
  }
}
