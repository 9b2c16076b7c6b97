package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity

/** Similarity search over the `embeddings` table (SURVEY.md §2.11 X3):
  * approximate-nearest-neighbor top-k and embedding-cosine near-dup.
  *
  * The cosine kernel is the custom codegen'd Catalyst expression
  * `graft.functions.CosineSimilarity` — one fused loop for dot product
  * and both norms instead of three higher-order-function passes.
  *
  * Scale design (100 TB of vectors):
  *  - `topKBruteForce` broadcasts the (small) probe set against the full
  *    corpus — a map-side join, no shuffle of the corpus; per-probe top-k
  *    via window rank. Correct baseline, O(|probes| × |corpus|).
  *  - `topKIvf` is the scale path: vectors are pre-assigned to cells
  *    (here the `label` column stands in for a trained IVF/k-means cell
  *    id; at rest, cell = partition key). A probe searches only its own
  *    cell → partition-pruned scan, work divided by the cell count.
  *  - `nearDupCosine` verifies candidate pairs; at this corpus size the
  *    candidate set is the blocked self-join on cell id — the same
  *    bounded-bucket shape as Dedup's LSH banding, never all-pairs.
  */
object Similarity {

  /** Rounded cosine similarity (6dp) — rounding makes ranking ties
    * deterministic across engines so results are oracle-comparable.
    */
  private def cos6 = round(CosineSimilarity(col("a.embedding"), col("b.embedding")), 6)

  private def topK(joined: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("neighbor_id"))
    joined
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("probe_id", "rank", "neighbor_id", "cosine")
  }

  /** Every `probeEvery`-th vector is a probe (deterministic probe set). */
  def probes(embeddings: DataFrame, probeEvery: Int): DataFrame =
    embeddings.where(col("vec_id") % probeEvery === 0)

  /** X3 — exact brute-force cosine top-k per probe (the baseline). */
  def topKBruteForce(embeddings: DataFrame, probeEvery: Int = 50, k: Int = 5): DataFrame =
    topK(
      broadcast(probes(embeddings, probeEvery).as("a"))
        .join(embeddings.as("b"), col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("probe_id"), col("b.vec_id").as("neighbor_id"),
          cos6.as("cosine")),
      k)

  /** X3 — IVF-style cell-restricted top-k: each probe searches only the
    * vectors sharing its cell id (`label`). The trained
    * assign-to-nearest-centroid step happens upstream (stubbed by the
    * pre-assigned label column); at scale cells map to storage partitions
    * so the scan itself is pruned.
    */
  def topKIvf(embeddings: DataFrame, probeEvery: Int = 50, k: Int = 5): DataFrame =
    topK(
      broadcast(probes(embeddings, probeEvery).as("a"))
        .join(embeddings.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("probe_id"), col("b.vec_id").as("neighbor_id"),
          cos6.as("cosine")),
      k)

  /** Embedding-cosine near-dup pairs: all pairs with cosine ≥ threshold,
    * candidates blocked on the cell id. Output: vec_a, vec_b, cosine.
    */
  def nearDupCosine(embeddings: DataFrame, threshold: Double = 0.4): DataFrame =
    embeddings.as("a")
      // broadcast: the cell-blocked self-join would otherwise sort-merge
      // on ~10 distinct cell ids — parallelism collapses to the cell
      // count and each SMJ group buffers the whole cell. Broadcasting one
      // side keeps the stream side's full partitioning.
      .join(broadcast(embeddings.as("b")),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), cos6.as("cosine"))
      .where(col("cosine") >= threshold)
}
