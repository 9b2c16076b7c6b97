package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked Levenshtein record linkage — match a dirty feed of names
  * against a clean dimension despite typos, the classic entity-resolution
  * step the reference pipeline's upstream would need when POS exports and
  * the product master drift apart (the reference trusts exact SKU equality;
  * real feeds rarely deserve that trust).
  *
  * Scale design (100 TB): an unblocked fuzzy join is |dirty| × |dim| edit
  * distances — never viable. This implementation equi-joins on COMPOSITE
  * BLOCKING KEYS so Spark plans an ordinary hash join and only
  * within-block pairs pay `levenshtein()` (codegen'd built-in):
  *
  *   - TWO token passes: pass 0 blocks on the name's FIRST token, pass 1
  *     on its LAST token. A pair is a candidate if it agrees on either —
  *     so a typo inside one anchor token no longer hides a match as long
  *     as the other anchor survives (the r8 single-pass contract's
  *     documented recall hole, now closed). Both passes run as ONE
  *     equi-join on a (pass, token, bucket) key via a 2-row posexplode.
  *   - LENGTH BUCKETS of width maxDist+1 with ±1 adjacent-bucket probing
  *     on the dirty side. Levenshtein ≥ |len(a) − len(b)|, so every true
  *     pair lands in the same or an adjacent bucket — the bucket slice
  *     is recall-lossless by construction and cuts a hot token block
  *     ("premium …" catalogs) from |block|² to Σ per-bucket products.
  *
  * Residual hot (pass, token, bucket) blocks degrade to that block's
  * product; feeds where one token×length cell still dominates want the
  * SaltedJoin treatment on top.
  *
  * Recall contract: a pair is found iff the corruption preserves the
  * first OR the last token. Corrupting BOTH anchors of a short name can
  * still hide a match — close that with a q-gram pass if the feed
  * warrants it.
  */
object FuzzyJoin {

  private def firstTok(c: Column): Column = substring_index(c, " ", 1)
  private def lastTok(c: Column): Column = substring_index(c, " ", -1)

  /** Candidate pairs under the composite blocking, BEFORE the distance
    * threshold: (dirtyName, dimKey, dimName) distinct. Package-visible so
    * the property spec can assert the block-volume bound on the exact
    * frame the linkage scores.
    */
  private[ext] def candidates(dNames: DataFrame, dirtyName: String,
      cNames: DataFrame, dimKey: String, dimName: String,
      maxDist: Int): DataFrame = {
    val bw = maxDist + 1
    // substring_index returns "" for names with leading/trailing spaces;
    // keeping those rows would pool every padded name into one hot
    // ("", bucket) block — drop them (a real anchor from the other pass
    // still covers the name, preserving the recall contract).
    val dKeyed = dNames.select(col(dirtyName),
        posexplode(array(firstTok(col(dirtyName)), lastTok(col(dirtyName))))
          .as(Seq("__pass", "__tok")))
      .where(col("__tok") =!= "")
      .withColumn("__b0", expr(s"length($dirtyName) div $bw"))
      .withColumn("__bkt",
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val cKeyed = cNames.select(col(dimName), col(dimKey),
        posexplode(array(firstTok(col(dimName)), lastTok(col(dimName))))
          .as(Seq("__pass", "__tok")))
      .where(col("__tok") =!= "")
      .withColumn("__bkt", expr(s"length($dimName) div $bw"))
    // A pair agreeing on both anchors (or with a single-token name on
    // either side) shows up in both passes — distinct() collapses it
    // before any Levenshtein evaluates twice.
    dKeyed.join(cKeyed, Seq("__pass", "__tok", "__bkt"))
      .select(col(dirtyName), col(dimKey), col(dimName))
      .distinct()
  }

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
    * blocked Levenshtein pass scores the composite-blocked candidates,
    * and records re-attach by one equi-join on the name. Catalog feeds
    * are heavily name-duplicated (variants ≪ records), so this collapses
    * the expensive stage by orders of magnitude and can never exceed the
    * record-level volume. A cheap |len(a) − len(b)| ≤ maxDist band (a
    * Levenshtein lower bound) short-circuits before the O(len²) distance
    * evaluates.
    */
  def linkage(dirty: DataFrame, dirtyId: String, dirtyName: String,
      dim: DataFrame, dimKey: String, dimName: String,
      maxDist: Int): DataFrame = {
    require(dirtyName != dimName, "dirty and dim name columns must differ")
    require(maxDist >= 0, "maxDist must be non-negative")
    val dNames = dirty.select(col(dirtyName)).distinct()
    val cNames = dim.groupBy(col(dimName)).agg(min(col(dimKey)).as(dimKey))
    val cand = candidates(dNames, dirtyName, cNames, dimKey, dimName, maxDist)
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
