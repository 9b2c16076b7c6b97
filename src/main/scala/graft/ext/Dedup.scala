package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table (SURVEY.md §2.11
  * X1/X4) — the dedup half of an LLM-training-data pipeline: exact
  * (content-hash), MinHash+LSH banding, SimHash, and blocked n-gram
  * Jaccard.
  *
  * Scale design (100 TB): none of these ever form the all-pairs cross
  * product. Candidate pairs come from equality joins on LSH band values /
  * SimHash bands / blocking keys — a shuffle whose size is bounded by
  * bucket occupancy — and only candidates pay the exact-similarity
  * verification. Hashing is md5 (not `xxhash64`) deliberately: md5 is
  * bit-identical in every engine, so signatures are portable and
  * oracle-checkable; the minhash is the lexicographic min of the hex
  * digests, which preserves the uniform-min property.
  */
object Dedup {

  /** X1 — exact dedup by normalized-content hash. Keeps the smallest
    * doc_id per content group (deterministic survivor), reports group
    * size. Output: doc_id, content_key, group_size.
    */
  def exact(docs: DataFrame): DataFrame = {
    val keyed = docs.select(
      col("doc_id"),
      md5(TextOps.normalized(col("text")).cast("binary")).as("content_key"))
    val w = Window.partitionBy("content_key")
    keyed
      .withColumn("rn", row_number().over(w.orderBy("doc_id")))
      .withColumn("group_size", count(lit(1)).over(w))
      .where(col("rn") === 1)
      .select("doc_id", "content_key", "group_size")
  }

  /** Number of minhash signatures and LSH bands (rows-per-band =
    * SigCount / BandCount). 16 sigs in 8 bands of 2 catches Jaccard ≥ 0.5
    * candidates with p ≈ 1-(1-s²)⁸ (s=0.7 → 0.996).
    */
  val SigCount = 16
  val BandCount = 8

  /** X4 — near-duplicate pairs via MinHash + LSH banding on distinct
    * 2-word shingles, verified by exact Jaccard ≥ `threshold`.
    * Output: doc_a, doc_b, jaccard (rounded to 6dp).
    */
  def nearDupMinhash(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val rows = SigCount / BandCount
    val parallelism =
      docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // Materialization barrier (see ngramJaccardBlocked): shingle arrays are
    // computed once per document at this Exchange; all three consumers
    // (signatures + both verification joins) reuse the exchange instead of
    // re-deriving shingles — and never per candidate pair.
    val sh = docs.select(
      col("doc_id"),
      col("text"),
      TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TextOps.shingles("toks", 2).as("shingles"))
      .where(size(col("shingles")) > 0)
      .repartition(parallelism)

    val sigCols = (0 until SigCount).map { i =>
      expr(s"array_min(transform(shingles, s -> md5(cast(concat('$i|', s) AS binary))))")
        .as(s"sig$i")
    }
    val sig = sh.select(col("doc_id") +: sigCols: _*)
    val bandCols = (0 until BandCount).map { j =>
      val parts = (0 until rows).map(r => s"sig${j * rows + r}").mkString(", ")
      expr(s"md5(cast(concat($parts) AS binary))")
    }
    val banded = sig
      .select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))

    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))) /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** SimHash fingerprint width in bits (one per md5 hex digit, using the
    * digit's high bit as the per-token ±1 vote).
    */
  val SimhashBits = 32

  /** X4 — near-duplicate pairs via 32-bit SimHash over distinct 2-word
    * shingles: bit b is the sign of Σ over shingle md5s of (±1 by the
    * high bit of hex digit b). Shingles, not unigrams: on a small shared
    * vocabulary every document's token SET looks alike and unigram
    * SimHash collapses; shingle sets discriminate. Candidates share one
    * of four 8-bit bands; verified by Hamming ≤ `maxHamming`.
    * Output: doc_a, doc_b, hamming.
    */
  def nearDupSimhash(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val high = "('8','9','a','b','c','d','e','f')"
    val parallelism =
      docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // Materialization barrier (see ngramJaccardBlocked): the 32-bit
    // fingerprint is computed once per document, not per candidate pair.
    val fp = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        expr(s"transform(${TextOps.shinglesSql("toks", 2)}, " +
          "s -> md5(cast(s AS binary)))").as("hashes"))
      .where(size(col("hashes")) > 0)
      .select(
        col("doc_id"),
        expr(s"""
          |concat_ws('', transform(sequence(1, $SimhashBits), b ->
          |  CASE WHEN aggregate(hashes, 0, (acc, h) -> acc +
          |      (CASE WHEN substring(h, b, 1) IN $high THEN 1 ELSE -1 END)) > 0
          |  THEN '1' ELSE '0' END))
          |""".stripMargin.trim).as("fp"))
      .repartition(parallelism)

    val bandW = SimhashBits / 4
    val banded = fp.select(
      col("doc_id"), col("fp"),
      posexplode(array((0 until 4).map(j =>
        substring(col("fp"), j * bandW + 1, bandW)): _*)).as(Seq("band_idx", "band_val")))

    banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .distinct()
      .withColumn("hamming", expr(
        s"size(filter(sequence(1, $SimhashBits), " +
          "i -> substring(fp_a, i, 1) != substring(fp_b, i, 1)))"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** X4 — blocked character-3-gram Jaccard: candidates are pairs within
    * the same `lang` block (at scale: any cheap equality blocking key —
    * language, length bucket, source shard), verified by exact char-3-gram
    * Jaccard ≥ `threshold`. Output: doc_a, doc_b, jaccard (6dp).
    */
  def ngramJaccardBlocked(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val parallelism =
      docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // The round-robin repartition is load-bearing, not cosmetic: the
    // Exchange materializes the gram arrays (once per document) so the
    // self-join below compares precomputed arrays. Without the barrier,
    // Catalyst collapses the projection into the join and rebuilds both
    // documents' gram arrays for every candidate PAIR — O(pairs × doc
    // length) — on however few partitions the scan produced.
    val g = docs.select(
      col("doc_id"), col("lang"),
      array_distinct(expr(
        "transform(sequence(1, greatest(length(trim(regexp_replace(lower(text), " +
          "'[^a-z0-9]+', ' '))) - 2, 0)), " +
          "i -> substring(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), i, 3))"))
        .as("grams"))
      .where(size(col("grams")) > 0)
      .repartition(parallelism)

    g.as("a")
      .join(g.as("b"), col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(size(array_intersect(col("a.grams"), col("b.grams"))) /
          size(array_union(col("a.grams"), col("b.grams"))).cast("double"), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
