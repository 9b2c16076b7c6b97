package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked Levenshtein record linkage — match a dirty feed of names
  * against a clean dimension despite typos, the classic entity-resolution
  * step the reference pipeline's upstream would need when POS exports and
  * the product master drift apart (the reference trusts exact SKU equality;
  * real feeds rarely deserve that trust).
  *
  * Scale design (100 TB): an unblocked fuzzy join is |dirty| × |dim| edit
  * distances — never viable. This implementation equi-joins on a BLOCKING
  * KEY (the name's first token) so Spark plans an ordinary hash join, and
  * only within-block pairs pay `levenshtein()` (codegen'd built-in). The
  * per-record winner is a bounded `row_number` window (dist, name, key
  * tiebreak — fully deterministic). Candidate volume is Σ|block_d|·|block_c|;
  * a skewed block (every name starting with "premium…") degrades to that
  * block's product, so production corpora want a composite key (first token
  * + length bucket with adjacent-bucket probing, or q-gram prefix blocking)
  * and the SaltedJoin treatment on residual hot blocks.
  *
  * Recall contract: a pair is only found if the corruption preserves the
  * blocking key. First-token blocking is lossless for tail corruptions
  * (appends, truncations, substitutions past the first token) and misses
  * first-token typos — the standard single-key blocking trade; run a second
  * pass with a different key to close it.
  */
object FuzzyJoin {

  /** @param dirty     feed with an id column and a name column
    * @param dirtyId   unique record id in `dirty`
    * @param dirtyName name column in `dirty` (must differ from `dimName`)
    * @param dim       clean dimension
    * @param dimKey    dimension key column
    * @param dimName   dimension name column
    * @param maxDist   inclusive Levenshtein acceptance threshold
    * @return one row per MATCHED dirty record: (dirtyId, dirtyName,
    *         dimKey, dimName, dist), the deterministic best match
    *         (min dist, then dimName, then dimKey). Unmatched dirty
    *         records are absent — anti-join against this result to audit
    *         them.
    *
    * Edit distance is a pure function of the NAME PAIR, so verification
    * runs over DISTINCT names, not records: the dirty side dedups to its
    * name set, the dim side reduces to one row per name (for a fixed
    * name only its MIN key can win the (dist, name, key) tiebreak), the
    * blocked Levenshtein pass scores |dirty names| × |dim names| /
    * blocks, and records re-attach by one equi-join on the name.
    * Catalog feeds are heavily name-duplicated (variants ≪ records), so
    * this collapses the expensive stage by orders of magnitude and can
    * never exceed the record-level volume. A cheap |len(a) − len(b)| ≤
    * maxDist band (a Levenshtein lower bound) short-circuits before the
    * O(len²) distance evaluates.
    */
  def linkage(dirty: DataFrame, dirtyId: String, dirtyName: String,
      dim: DataFrame, dimKey: String, dimName: String,
      maxDist: Int): DataFrame = {
    require(dirtyName != dimName, "dirty and dim name columns must differ")
    require(maxDist >= 0, "maxDist must be non-negative")
    val dNames = dirty.select(col(dirtyName)).distinct()
      .withColumn("__blk", substring_index(col(dirtyName), " ", 1))
    val cNames = dim.groupBy(col(dimName))
      .agg(min(col(dimKey)).as(dimKey))
      .withColumn("__blk", substring_index(col(dimName), " ", 1))
    val cand = dNames.join(cNames, "__blk")
      .where(abs(length(col(dirtyName)) - length(col(dimName))) <= maxDist)
      .withColumn("dist", levenshtein(col(dirtyName), col(dimName)))
      .where(col("dist") <= maxDist)
    val w = Window.partitionBy(dirtyName)
      .orderBy(col("dist"), col(dimName), col(dimKey))
    val best = cand.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(dirtyName), col(dimKey), col(dimName), col("dist"))
    dirty.select(col(dirtyId), col(dirtyName))
      .join(best, dirtyName)
      .select(col(dirtyId), col(dirtyName), col(dimKey), col(dimName), col("dist"))
  }
}
