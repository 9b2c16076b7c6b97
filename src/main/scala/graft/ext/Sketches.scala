package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distinct-count SKETCHES — the 100 TB cardinality tool.
  *
  * Exact `count(distinct x)` per group is a full shuffle of every
  * distinct value; at corpus scale the interesting questions ("how many
  * distinct users/URLs/documents per slice") need a bounded-size,
  * MERGEABLE summary instead. The classic engine answer is HyperLogLog
  * (`approx_count_distinct`), but HLL sketches are not portable across
  * engines bit-for-bit, which breaks our oracle discipline. The
  * K-MINIMUM-VALUES sketch (Bar-Yossef et al. 2002) is: keep the k
  * smallest 60-bit md5 hashes of the distinct values; estimate
  * D̂ = (k−1)·M / h_(k) where h_(k) is the k-th minimum and M = 2⁶⁰ the
  * hash space. Every step is order statistics over a deterministic hash
  * plus integer arithmetic — DuckDB replays it exactly.
  *
  * Scale shape: the sketch is ≤ k rows per group (k·16 bytes), built by
  * one distinct-aggregate + bounded window; merging two sketches is
  * "union, keep k smallest" — associative and commutative, so partial
  * sketches from shards/days/micro-batches combine without re-reading
  * data (the same frozen-store discipline as the minhash signature
  * store). Relative error ≈ 1/√(k−2) (k = 64 → ~13%, k = 1024 → ~3%).
  */
object Sketches {

  /** Hash space size M = 2⁶⁰ as an exact decimal (for the estimator's
    * (k−1)·M numerator, which exceeds a BIGINT; DuckDB mirrors with
    * HUGEINT).
    */
  val HashSpace: BigInt = BigInt(1) << 60

  /** Build the per-group KMV sketch: ≤ k rows (groupCols…, kmv_hash),
    * the k smallest DISTINCT hashes of `valueCol`. One distinct
    * aggregate (map-side partials) + one bounded-width window.
    */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("kmv_hash"))
    df.select(groupCols.map(col) :+
        Dedup.hash60(col(valueCol).cast("string")).as("kmv_hash"): _*)
      .where(col("kmv_hash").isNotNull)
      .distinct()
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .drop("rn")
  }

  /** Merge two sketches (or a sketch with a new batch's sketch): union,
    * dedup, keep the k smallest per group. Associative + commutative —
    * any batch cut converges to the one-shot sketch.
    */
  def kmvMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("kmv_hash"))
    a.unionByName(b).distinct()
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .drop("rn")
  }

  /** Estimate per-group distinct counts from a sketch. Groups that
    * retained fewer than k hashes saw every distinct value — their count
    * is EXACT. Saturated groups use the unbiased KMV estimator
    * ⌊(k−1)·M / h_(k)⌋ — decimal-exact on both engines (the quotient's
    * fractional part can never graze 1 within decimal(38,18) rounding,
    * because the divisor is < 2⁶⁰).
    */
  def kmvEstimate(sketch: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val numer = lit(new java.math.BigDecimal((HashSpace * (k - 1)).bigInteger))
    sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("kmv_cnt"), max(col("kmv_hash")).as("kmv_kth"))
      .select(groupCols.map(col) :+
        when(col("kmv_cnt") < k, col("kmv_cnt"))
          .otherwise(floor(numer / col("kmv_kth")).cast("long"))
          .as("est_distinct"): _*)
  }

  /** Sketch + estimate in one call — the declared-query form. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame =
    kmvEstimate(kmvSketch(df, groupCols, valueCol, k), groupCols, k)
}
