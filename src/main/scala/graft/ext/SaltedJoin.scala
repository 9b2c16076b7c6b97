package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe large×large inner equi-join. A hot join key at 100 TB sends
  * all of its rows to ONE reducer of the shuffle join — the stage then
  * runs as long as its most-skewed task, spilling or OOMing while every
  * other slot idles. This operator salts the hot keys: the fact side's
  * hot rows get a deterministic salt in [0, saltFactor), the build side's
  * hot rows are replicated once per salt value, and the join key becomes
  * (key, salt) — a hot key's rows now land on `saltFactor` reducers. Cold
  * keys pay nothing (salt 0, no replication), so the output is exactly
  * the plain inner join's.
  *
  * AQE's skew-join handles the same problem for sort-merge joins it can
  * see; this operator is the explicit form — it works under any join
  * strategy, makes the salt factor a caller decision, and documents the
  * detect→salt→replicate pattern as a first-class library operator.
  *
  * Hot-key detection is a SAMPLED count (seed-fixed): at scale an exact
  * per-key count of the fact table would itself be a full shuffle. Which
  * keys get salted only affects the physical distribution, never the
  * result, so the sample's variance is harmless; the sampled-count
  * threshold is `sampleFraction × trueCount` in expectation.
  */
object SaltedJoin {

  /** @param left           fact/probe side (the skewed one)
    * @param right          build side; must share ONLY `key` with `left`
    * @param key            equi-join key column name (same on both sides)
    * @param saltFactor     reducers a hot key is spread across
    * @param heavyThreshold sampled-row-count at or above which a key is
    *                       treated as hot
    * @param sampleFraction fraction of `left` scanned by the detector
    *                       (1.0 = exact; ~1e-4 at real scale)
    */
  def equiJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int = 8, heavyThreshold: Long = 1000L,
      sampleFraction: Double = 1.0): DataFrame = {
    val overlap = (right.columns.toSet - key).intersect(left.columns.toSet)
    require(overlap.isEmpty, s"rename overlapping right columns: $overlap")
    val sampled =
      if (sampleFraction >= 1.0) left else left.sample(false, sampleFraction, 42L)
    // The hot-key set is tiny by construction (keys above a skew
    // threshold) — broadcast it to tag both sides without a shuffle.
    val hot = sampled.groupBy(key).count()
      .where(col("count") >= heavyThreshold)
      .select(col(key), lit(true).as("__hot"))
    // Fact rows of a hot key: deterministic per-row salt from the whole
    // row (degenerates to one salt only if rows are fully identical).
    val l = left.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot"), pmod(hash(left.columns.map(col): _*), lit(saltFactor)))
          .otherwise(0))
      .drop("__hot")
    // Build rows of a hot key: one replica per salt bucket.
    val r = right.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        explode(when(col("__hot"), sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
