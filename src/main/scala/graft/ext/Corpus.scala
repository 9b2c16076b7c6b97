package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators over the `documents` table — the
  * remaining plumbing of an LLM-training-data pipeline around the dedup
  * ([[Dedup]]) and text-quality ([[TextOps]]) families: deterministic
  * dataset splitting, overlapping chunking, salient-term extraction, and
  * per-language profiling.
  *
  * Scale design (100 TB): every operator here is either a pure map over
  * documents (split, chunks — embarrassingly parallel, zero shuffle) or a
  * bounded number of hash aggregates on keys that grow with the corpus
  * (tf_idf on (doc, term) / term, profile on lang) — no self-joins, no
  * driver-side data movement. Cross-engine determinism follows the
  * house rules: md5 for hash parity, integer arithmetic wherever
  * possible, floor-truncation (never `round`) for oracle-compared doubles,
  * and no `log()` (JVM `Math.log` is only 1-ulp-accurate, not correctly
  * rounded, so its results are not guaranteed bit-identical to libm's).
  */
object Corpus {

  /** Deterministic train/val/test assignment: bucket = md5(doc_id) mod
    * 100, split by percentile thresholds. Hash-based (not random-number)
    * splitting is the scale idiom: assignment is reproducible run-over-
    * run, stable under corpus growth (old docs never migrate splits when
    * new docs arrive), needs no seed coordination across executors, and
    * joins back to any other per-doc table without storing the split.
    * Output: doc_id, lang, bucket, split.
    */
  def datasetSplit(docs: DataFrame, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split percentages ($trainPct, $valPct)")
    docs
      .select(col("doc_id"), col("lang"),
        (Dedup.hash60(col("doc_id").cast("string")) % 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Token window length and stride for [[docChunks]]: 64-token chunks
    * every 48 tokens = 16 tokens of overlap, the context-window packing
    * shape (overlap preserves cross-boundary n-grams for training).
    */
  val ChunkSize = 64
  val ChunkStride = 48

  /** Overlapping token-window chunking: split each document into
    * [[ChunkSize]]-token windows starting every [[ChunkStride]] tokens;
    * the last window is the one that first covers the tail (no trailing
    * sub-windows fully contained in their predecessor). Emits chunk
    * digests, not chunk text — at 100 TB the chunk table is larger than
    * the corpus, so downstream consumers re-slice from the document
    * store by (doc_id, chunk_no) and the digest is the integrity key.
    * Output: doc_id, chunk_no, n_chunk_tokens, chunk_md5.
    *
    * Plan shape: pure map + Generate (posexplode of a chunk-count
    * sequence), zero shuffle. The slice/concat runs on the `toks`
    * attribute carried through the Generate — evaluated once per
    * document row, not per chunk (the HOF-recompute trap does not bite:
    * there is no lambda, and Generate copies required child output per
    * emitted row instead of re-evaluating it).
    */
  def docChunks(docs: DataFrame): DataFrame = {
    val c = ChunkSize
    val s = ChunkStride
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      // n ≤ C → one chunk; else first index i with i·S + C ≥ n, plus one.
      .withColumn("n_chunks",
        when(col("n_tokens") <= c, lit(1L))
          .otherwise(expr(s"(n_tokens - $c + $s - 1) div $s") + 1L))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0L), col("n_chunks") - 1L)).as(Seq("ord", "chunk_no")))
      .withColumn("chunk",
        slice(col("toks"), (col("chunk_no") * s + 1).cast("int"), lit(c)))
      .select(
        col("doc_id"),
        col("chunk_no"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("chunk")).cast("binary")).as("chunk_md5"))
  }

  /** Per-document salient terms: top-`k` tokens by a TF·IDF-style score,
    * score = tf · N / df with N the corpus size and df the term's
    * document frequency. The IDF is the LINEAR ratio N/df, not
    * log(N/df): ranking is identical (log is monotone) and the linear
    * form is exact IEEE arithmetic on integers — bit-identical in every
    * engine, where `log` differs in the last ulp between JVM and libm.
    * Output: doc_id, term, tf, df, score, rank (1..k by score desc,
    * term asc).
    *
    * Plan shape: explode → (doc, term) hash aggregate → term-level
    * aggregate for df → one broadcast-able join back (df table = corpus
    * vocabulary, bounded by the token space, shrinks relative to the
    * corpus as it grows) → per-doc window top-k. The corpus count N
    * joins in as a 1-row broadcast, never a driver round-trip.
    */
  def tfIdf(docs: DataFrame, k: Int = 5): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val score = TextOps.trunc6((col("tf") * col("n_docs")).cast("double") / col("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("doc_id", "term", "tf", "df", "score", "rank")
  }

  /** Per-language corpus profile: document count, median and p90
    * whitespace-token counts, mean and max character lengths — the
    * summary a pipeline checkpoints before/after each filter stage.
    * Percentiles are DISCRETE (value at rank ⌈p·n⌉ in (value, doc_id)
    * order): integer-exact and engine-portable, where interpolated
    * percentiles hinge on each engine's interpolation arithmetic
    * agreeing to the last ulp. Output: lang, n_docs, med_tokens,
    * p90_tokens, avg_chars, max_chars.
    *
    * Plan shape: one shuffle on lang for the rank window, reused by the
    * final aggregate (same key, exchange reuse) — at 100 TB lang has
    * low cardinality, so the window sort runs on few large partitions;
    * if a profile key were high-skew the [[SaltedJoin]]-style two-level
    * aggregate is the drop-in.
    */
  /** Shingle width for [[decontaminate]]: 8 consecutive tokens, the
    * benchmark-decontamination convention — long enough that a match is
    * evidence of copied text, not shared vocabulary.
    */
  val DecontamShingle = 8

  /** Benchmark decontamination: flag corpus documents sharing any
    * [[DecontamShingle]]-token shingle with a benchmark/eval set — the
    * filter every training pipeline runs so held-out benchmarks don't
    * leak into training data. Output: doc_id, n_shared_shingles (distinct
    * shared shingles), for contaminated documents only.
    *
    * Scale design: the benchmark side is small by nature (eval sets are
    * MB-scale against a 100 TB corpus), so its distinct shingle-hash set
    * is BROADCAST — the corpus side is a pure map (tokenize → slice →
    * hash) into a broadcast-hash semi-join, zero corpus shuffle until the
    * per-doc count aggregate over only the matching rows. Shingles are
    * compared as [[Dedup.hash60]] longs, never strings.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      k: Int = DecontamShingle): DataFrame = {
    // k-token shingle hashes as rows (doc_id, h) — the docChunks Generate
    // pattern: posexplode the start positions, slice from the carried
    // token array (copied per emitted row by Generate, not re-evaluated).
    def shingleHashes(df: DataFrame): DataFrame =
      df.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .where(size(col("toks")) >= k)
        .select(col("doc_id"), col("toks"),
          posexplode(sequence(lit(1), size(col("toks")) - (k - 1))).as(Seq("ord", "i")))
        .select(col("doc_id"),
          Dedup.hash60(concat_ws(" ", slice(col("toks"), col("i"), lit(k)))).as("h"))
    val bench = broadcast(shingleHashes(benchmark).select("h").distinct())
    // Join BEFORE the distinct: the broadcast-hash join filters the
    // corpus's shingle stream map-side, so the only rows that ever
    // shuffle are the (rare) matches — a distinct over all corpus
    // shingles first would shuffle the whole corpus's shingle set.
    shingleHashes(corpus)
      .join(bench, "h")
      .distinct() // (doc_id, h): count each shared shingle once per doc
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_shingles"))
  }

  /** Gopher-style repetition signals: per-document duplicate-bigram
    * fraction (1 − distinct/total) and most-frequent-bigram fraction —
    * the "is this document mostly the same phrase repeated" quality
    * signals. Documents with fewer than two tokens have no bigrams and
    * are omitted. Output: doc_id, n_bigrams, n_distinct_bigrams,
    * dup_bigram_frac, top_bigram_frac (floor-truncated 4dp).
    *
    * Plan shape: the shared shingle pipeline (one doc_id window shuffle)
    * → (doc, bigram) count → per-doc aggregate. Both aggregates hash on
    * keys that grow with the corpus; nothing is quadratic and nothing
    * leaves codegen.
    */
  def repetitionScore(docs: DataFrame): DataFrame =
    Dedup.shingleRows(docs)
      .groupBy("doc_id", "s").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        max("c").as("max_c"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct_bigrams"),
        TextOps.trunc4((col("n_bigrams") - col("n_distinct_bigrams")) /
          col("n_bigrams").cast("double")).as("dup_bigram_frac"),
        TextOps.trunc4(col("max_c") / col("n_bigrams").cast("double"))
          .as("top_bigram_frac"))

  /** Deterministic stratified sampling by `source`: per-document hash
    * bucket (salted with the stratum so buckets are independent across
    * strata), kept when bucket < the stratum's percentage — `overrides`
    * per source, `defaultPct` elsewhere. The hash-based form has the same
    * properties as [[datasetSplit]]: reproducible, stable under corpus
    * growth, joinable back to any per-doc table, no seed coordination —
    * and it is a pure map (zero shuffle), so re-weighting a 100 TB corpus
    * by source is one scan. Output: doc_id, source, lang, bucket.
    */
  def stratifiedSample(docs: DataFrame, defaultPct: Int = 20,
      overrides: Map[String, Int] = Map.empty): DataFrame = {
    require(defaultPct >= 0 && defaultPct <= 100 &&
      overrides.values.forall(p => p >= 0 && p <= 100), "percentages must be 0..100")
    // Build the per-row rate via chained when(): overrides are a handful
    // of literals, so this stays one codegen'd case expression.
    val rate = overrides.foldLeft(lit(defaultPct): org.apache.spark.sql.Column) {
      case (acc, (src, pct)) => when(col("source") === src, lit(pct)).otherwise(acc)
    }
    docs
      .select(col("doc_id"), col("source"), col("lang"),
        (Dedup.hash60(concat(col("source"), lit(":"), col("doc_id").cast("string")))
          % 100).as("bucket"))
      .where(col("bucket") < rate)
  }

  def corpusProfile(docs: DataFrame): DataFrame = {
    val base = docs.select(
      col("doc_id"), col("lang"),
      regexp_count(col("text"), lit("\\S+")).cast("long").as("ws_tokens"),
      length(col("text")).cast("long").as("n_chars"))
    val byLang = Window.partitionBy("lang")
    val ranked = base
      .withColumn("rk", row_number().over(byLang.orderBy(col("ws_tokens"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(byLang))
    ranked.groupBy("lang")
      .agg(
        max(col("n")).as("n_docs"),
        max(when(col("rk") === ceil(col("n") * 0.5), col("ws_tokens"))).as("med_tokens"),
        max(when(col("rk") === ceil(col("n") * 0.9), col("ws_tokens"))).as("p90_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        count(lit(1)).as("cnt"),
        max(col("n_chars")).as("max_chars"))
      .select(col("lang"), col("n_docs"), col("med_tokens"), col("p90_tokens"),
        TextOps.trunc4(col("sum_chars").cast("double") / col("cnt")).as("avg_chars"),
        col("max_chars"))
  }
}
