package graft.ext

import org.apache.spark.sql.functions._

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

  test("semDedupIncremental: permuted batch cuts converge to the batch verdicts") {
    val vecs = Map(
      1L -> Array(1.0f, 0.0f), 2L -> Array(0.999f, 0.01f), // near-dups, cell 0
      5L -> Array(0.0f, 1.0f), 7L -> Array(0.01f, 0.999f)) // near-dups, cell 1
    val centroids = Seq((0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)))
      .toDF("cell", "centroid")
    def frame(ids: Seq[Long]) =
      ids.map(i => (i, vecs(i))).toDF("vec_id", "embedding")
    val empty = frame(Nil).withColumn("cell", lit(0))
      .where(lit(false)).select("vec_id", "embedding", "cell")
    def run(cuts: Seq[Seq[Long]]): Map[Long, Boolean] = {
      var store = empty
      var kept = Map.empty[Long, Boolean]
      cuts.foreach { ids =>
        val batch = frame(ids)
        val verdicts = Similarity
          .semDedupIncremental(store, batch, centroids, 0.97)
          .collect().map(r => (r.getLong(0), r.getBoolean(2)))
        // Fold: kept can only be revoked (demotion rows), never granted.
        verdicts.foreach { case (id, k) =>
          kept += id -> (kept.getOrElse(id, true) && k)
        }
        // The sink contract: EVERY batch vector joins the store.
        store = store.unionByName(
          batch.join(Similarity.assignCells(batch, centroids), "vec_id")
            .select("vec_id", "embedding", "cell")).localCheckpoint()
      }
      kept
    }
    val all = Seq(1L, 2L, 5L, 7L)
    val reference = Similarity.semDedup(
      frame(all).withColumn("label", lit(0)), threshold = 0.97,
      assignments = Some(Similarity.assignCells(frame(all), centroids)))
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(reference === Map(1L -> true, 2L -> false, 5L -> true, 7L -> false))
    // Min-id-arrives-LAST cuts exercise the demotion path.
    val cuts = Seq(
      Seq(Seq(1L, 2L, 5L, 7L)),
      Seq(Seq(2L, 7L), Seq(1L, 5L)),
      Seq(Seq(1L, 5L), Seq(2L, 7L)),
      Seq(Seq(7L), Seq(5L), Seq(2L), Seq(1L)))
    cuts.foreach { cut =>
      assert(run(cut) === reference, s"verdicts must be cut-invariant for $cut")
    }
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
