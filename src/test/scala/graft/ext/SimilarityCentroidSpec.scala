package graft.ext

import graft.SparkSpec

/** Specs for the embedding centroid / cohesion operators. */
class SimilarityCentroidSpec extends SparkSpec {
  import spark.implicits._

  private val emb = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(0.0f, 1.0f), 0),
    (2L, Array(2.0f, 0.0f), 1))
    .toDF("vec_id", "embedding", "label")

  test("labelCentroids is the exact per-dimension mean") {
    val out = Similarity.labelCentroids(emb).orderBy("label", "dim").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (0, 0L, 2L, 0.5), (0, 1L, 2L, 0.5),
      (1, 0L, 1L, 2.0), (1, 1L, 1L, 0.0)))
  }

  test("labelCohesion: cosine to the centroid, mean and min") {
    val out = Similarity.labelCohesion(emb).orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // label 0: both members at 45° to the [0.5, 0.5] centroid →
    // cos = 1/√2 truncated to 0.707106; label 1: identical direction → 1.
    assert(out.toSeq === Seq(
      (0, 2L, 0.707106, 0.707106),
      (1, 1L, 1.0, 1.0)))
  }

  test("kmeansAssign reassigns each vector to its most similar centroid") {
    val out = Similarity.kmeansAssign(emb).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getBoolean(4)))
    // vec 0 [1,0] is closer to label 1's centroid [2,0] (cos 1) than to
    // its own cell's [0.5,0.5] (cos 0.707…) → moves; the others stay.
    assert(out.toSeq === Seq(
      (0L, 0, 1, 1.0, true),
      (1L, 0, 0, 0.707106, false),
      (2L, 1, 1, 1.0, false)))
  }

  test("labelCentroids is invariant to input partitioning (exact decimal sums)") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Similarity.labelCentroids(d).orderBy("label", "dim")
      .collect().map(_.toSeq).toSeq
    val b = Similarity.labelCentroids(d.repartition(7)).orderBy("label", "dim")
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
