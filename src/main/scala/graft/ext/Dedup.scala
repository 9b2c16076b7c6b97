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
  *
  * Performance shape: shingles are built RELATIONALLY — posexplode the
  * token array once, pair adjacent tokens with a window `lead`, distinct
  * the (doc, shingle) rows — so every hot step is whole-stage-codegen'd
  * column work. The tempting alternative, `transform(sequence(...), i ->
  * f(arrayCol, i))`, is a trap twice over: higher-order functions are
  * interpreted (CodegenFallback), and a lambda body that references the
  * outer column re-evaluates that column's whole expression tree (the
  * tokenizing regex!) per element once projection collapsing inlines it —
  * measured as minutes instead of seconds on sf0.1.
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

  /** Distinct 2-word shingles as rows (doc_id, s) — the shared, fully
    * codegen'd shingle pipeline for MinHash and SimHash.
    */
  private def shingleRows(docs: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("nxt", lead("tok", 1).over(byDoc))
      .where(col("nxt").isNotNull)
      .select(col("doc_id"), concat(col("tok"), lit(" "), col("nxt")).as("s"))
      .distinct()
  }

  /** Per-document distinct shingle SETS (doc_id, shingles) for the exact
    * Jaccard verification step.
    */
  private def shingleSets(docs: DataFrame): DataFrame =
    shingleRows(docs).groupBy("doc_id").agg(collect_list("s").as("shingles"))

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
    // 16 codegen'd min-aggregates over the shingle rows, one shuffle row
    // per document after the map-side partial aggregate. Each minhash is
    // NUMERIC — the top 60 bits of the md5 as a BIGINT — because min over
    // longs is a register compare, while min over hex strings pays
    // UTF8String.compareTo (and its per-call getenv guard) 16× per
    // shingle row. 60 bits preserve the uniform-min property; DuckDB
    // parses the same value with ('0x' || substr(md5, 1, 15))::BIGINT.
    val sr = shingleRows(docs)
    val sigAggs = (0 until SigCount).map { i =>
      min(conv(substring(md5(concat(lit(s"$i|"), col("s")).cast("binary")), 1, 15), 16, 10)
        .cast("long")).as(s"sig$i")
    }
    val sig = sr.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
    val bandCols = (0 until BandCount).map { j =>
      val parts = (0 until rows).map(r => s"cast(sig${j * rows + r} AS string)").mkString(", ")
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

    val sh = shingleSets(docs)
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
    * digit's high bit as the per-shingle ±1 vote).
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
    val highSet = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    // md5 once per shingle row, then 32 codegen'd sum-aggregates; the
    // aggregate is also the materialization barrier — each document's
    // fingerprint exists once before the banded self-join.
    val hx = shingleRows(docs).select(col("doc_id"), md5(col("s").cast("binary")).as("h"))
    val bitSums = (1 to SimhashBits).map { b =>
      sum(when(substring(col("h"), b, 1).isin(highSet: _*), 1).otherwise(-1)).as(s"b$b")
    }
    val fp = hx.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        concat_ws("", (1 to SimhashBits).map(b =>
          when(col(s"b$b") > 0, "1").otherwise("0")): _*).as("fp"))

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
    // Normalize once, filter on the cheap scalar (length ≥ 3 ⟺ grams
    // non-empty — a filter on size(grams) would be pushed below the
    // exchange with the gram expression inlined, recreating the
    // per-element-recompute trap), round-robin repartition so the gram
    // arrays materialize once per document on all cores, THEN build grams
    // from the shuffled attribute.
    val base = docs
      .select(col("doc_id"), col("lang"), TextOps.normalized(col("text")).as("s"))
      .where(length(col("s")) >= 3)
      .repartition(parallelism)
    // Sorted distinct grams, INT-encoded (the normalized alphabet is
    // ASCII, so a 3-gram packs into ascii*65536 + ascii*256 + ascii):
    // sorting and merging ints skips per-comparison string overhead
    // entirely, and sorted distinct input lets the verification use the
    // codegen'd linear-merge SortedIntersectSize instead of per-pair hash
    // sets (|A ∪ B| = |A| + |B| − |A ∩ B| for sets).
    val g = base.select(
      col("doc_id"), col("lang"),
      array_sort(array_distinct(expr(
        "transform(sequence(1, length(s) - 2), i -> " +
          "ascii(substring(s, i, 1)) * 65536 + " +
          "ascii(substring(s, i + 1, 1)) * 256 + " +
          "ascii(substring(s, i + 2, 1)))"))).as("grams"))

    // The ENTIRE predicate lives in the join condition, cheapest first:
    // id ordering and the lossless size-ratio prefilter (jaccard ≤
    // min/max of the sizes, so jaccard ≥ t needs each side ≥ t × the
    // other) short-circuit before the merge runs. A separate `.where`
    // on the computed jaccard would be PUSHED into the join condition
    // ahead of the cheap predicates — measured as the merge running on
    // every lang-matched pair, ~100× the work.
    val inter = graft.functions.SortedIntersectSize(col("a.grams"), col("b.grams"))
    val jaccard = round(
      inter / (size(col("a.grams")) + size(col("b.grams")) - inter).cast("double"), 6)
    g.as("a")
      .join(g.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id") &&
          size(col("a.grams")) >= lit(threshold) * size(col("b.grams")) &&
          size(col("b.grams")) >= lit(threshold) * size(col("a.grams")) &&
          jaccard >= threshold)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        jaccard.as("jaccard"))
  }
}
