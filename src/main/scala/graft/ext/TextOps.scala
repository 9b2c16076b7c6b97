package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (SURVEY.md §2.11 X2)
  * — the text half of an LLM-training-data pipeline: normalization,
  * per-document statistics, quality scoring, language ID, token counting,
  * fingerprinting, corpus word frequencies.
  *
  * Everything is built from codegen'd built-ins (no UDFs): tokenization is
  * `regexp_replace` + `split`, per-token math uses higher-order functions
  * (`transform`/`filter`/`aggregate`), so every operator stays inside
  * whole-stage codegen and scales embarrassingly parallel — a pure map
  * over documents, no shuffle at all except where a groupBy is the point
  * (word_freq).
  */
object TextOps {

  /** Canonical normalization: lowercase, strip non-alphanumerics to single
    * spaces, trim. The shared first step of every text operator.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalized(text), " ")

  /** SQL snippet for the distinct word n-gram shingles ("a b", "b c", ...
    * for n=2) over an existing array column named `toksCol`.
    */
  def shinglesSql(toksCol: String, n: Int): String =
    s"array_distinct(transform(sequence(1, greatest(size($toksCol) - ${n - 1}, 0)), " +
      s"i -> concat_ws(' ', slice($toksCol, i, $n))))"

  /** Column form of [[shinglesSql]]. */
  def shingles(toksCol: String, n: Int): Column = expr(shinglesSql(toksCol, n))

  /** Small per-language stopword profiles for the language-ID heuristic. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "on", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "es", "un", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "dans"))

  private def inList(vals: Seq[String]): String =
    vals.map(v => s"'$v'").mkString("(", ", ", ")")

  /** 4-decimal truncation via floor — NOT `round`: Spark rounds
    * HALF_UP on the decimal rendering while DuckDB rounds the raw double,
    * so boundary values (x.yyyy5) disagree; floor of the identical IEEE
    * product is bit-stable across engines.
    */
  def trunc4(c: Column): Column = floor(c * 10000) / 10000

  /** 6-decimal floor truncation for oracle-compared ratios (jaccard,
    * cosine) — same reasoning as [[trunc4]]: `round` renders HALF_UP on
    * Spark but rounds the raw double on DuckDB, so boundary values
    * diverge; floor of the identical IEEE product is bit-stable.
    */
  def trunc6(c: Column): Column = floor(c * 1000000) / 1000000

  /** Per-document statistics + composite quality score.
    * Output: doc_id[, carry…], n_tokens, n_distinct_tokens, n_chars,
    * avg_token_len, punct_ratio, stopword_ratio, quality_score.
    *
    * `carry` names input columns to pass through beside doc_id — the
    * zero-join way for a grouped consumer (quality_by_source's
    * per-source histogram) to keep its group key: re-uniting stats
    * with the corpus by a doc_id join costs a corpus-wide exchange of
    * BOTH sides at any scale where neither broadcasts, for a column
    * the scan already had in hand.
    */
  def textStats(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    // Carry columns pass through the two projections below unrenamed, so
    // a collision with the working columns (doc_id/text/toks) or a stat
    // output would produce ambiguous or silently-shadowed columns.
    val reserved = Set("doc_id", "text", "toks", "n_tokens",
      "n_distinct_tokens", "n_chars", "avg_token_len", "punct_ratio",
      "stopword_ratio", "quality_score")
    require(!carry.exists(reserved),
      s"textStats carry columns ${carry.filter(reserved).mkString(", ")} " +
        "collide with reserved input/output column names")
    val en = inList(langProfiles.head._2)
    docs
      .select(Seq(col("doc_id"), col("text"), tokens(col("text")).as("toks")) ++
        carry.map(col): _*)
      .select(
        Seq(col("doc_id")) ++ carry.map(col) ++ Seq(
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct_tokens"),
        length(col("text")).as("n_chars"),
        trunc4(expr("aggregate(transform(toks, t -> length(t)), 0, (a, x) -> a + x)") /
          size(col("toks")).cast("double")).as("avg_token_len"),
        // greatest(…, 1): an empty text has zero characters and must
        // yield punct_ratio 0, not an ANSI divide-by-zero crash.
        trunc4((length(col("text")) -
          length(regexp_replace(col("text"), "[^A-Za-z0-9\\s]", ""))) /
          greatest(length(col("text")), lit(1)).cast("double")).as("punct_ratio"),
        trunc4(expr(s"size(filter(toks, t -> t IN $en))") /
          size(col("toks")).cast("double")).as("stopword_ratio")): _*)
      .withColumn("quality_score", trunc4(
        lit(0.4) * least(lit(1.0), col("n_tokens") / lit(50.0)) +
          lit(0.3) * (lit(1.0) - col("punct_ratio")) +
          lit(0.3) * least(lit(1.0), col("stopword_ratio") * 5)))
  }

  /** n-gram-profile language ID: score each language by stopword hits,
    * argmax with a fixed tie-break order (en > es > de > fr > und).
    * Output: doc_id, lang (labeled), predicted_lang, agree.
    */
  def langId(docs: DataFrame): DataFrame = {
    val scored = langProfiles.foldLeft(
      docs.select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))) {
      case (df, (code, words)) =>
        df.withColumn(s"s_$code", expr(s"size(filter(toks, t -> t IN ${inList(words)}))"))
    }
    scored
      .withColumn("predicted_lang",
        when(col("s_en") + col("s_es") + col("s_de") + col("s_fr") === 0, "und")
          .when(col("s_en") >= greatest(col("s_es"), col("s_de"), col("s_fr")), "en")
          .when(col("s_es") >= greatest(col("s_de"), col("s_fr")), "es")
          .when(col("s_de") >= col("s_fr"), "de")
          .otherwise("fr"))
      .select(col("doc_id"), col("lang"), col("predicted_lang"),
        (col("lang") === col("predicted_lang")).as("agree"))
  }

  /** Token counting two ways: whitespace tokens and BPE-ish pieces
    * (letter runs / digit runs / single punctuation marks — the shape a
    * byte-pair pre-tokenizer produces). Output: doc_id, ws_tokens,
    * bpe_pieces, n_chars.
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit("\\S+")).as("ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).as("bpe_pieces"),
      length(col("text")).as("n_chars"))

  /** Document fingerprints: content hash of the normalized text (exact-dup
    * key) and an order-insensitive fingerprint over the sorted distinct
    * token set (the OpenRefine-style canonical fingerprint).
    * Output: doc_id, content_md5, fingerprint_md5.
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(normalized(col("text")).cast("binary")).as("content_md5"),
      md5(concat_ws(" ",
        array_sort(array_distinct(tokens(col("text"))))).cast("binary")).as("fingerprint_md5"))

  /** Corpus-level word frequency: top-k tokens by count (count desc, token
    * asc tie-break). The one text operator that shuffles — a single hash
    * aggregate on token, then a bounded top-k (TakeOrderedAndProject).
    */
  def wordFreq(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Vocabulary richness per source: distinct-token count, hapax count
    * (tokens occurring exactly ONCE across the source), and the hapax
    * share in exact ppm (BIGINT multiply, floor division — positives,
    * Spark `div` ≡ DuckDB `//`). A high hapax share fingerprints rich /
    * noisy text (OCR junk, random ids); near-zero fingerprints template
    * spam — a corpus-health dial next to [[langId]] and quality scores.
    *
    * Scale: token explode → ONE (source, token) hash aggregate (map-side
    * partials collapse repeats before the shuffle) → one |sources|-key
    * rollup. Nothing is corpus-sized after the first aggregate.
    */
  def hapaxBySource(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("n"))
      .groupBy("source").agg(
        count(lit(1)).as("n_distinct_tokens"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("hapax_ppm",
        expr("CAST(n_hapax * 1000000 DIV n_distinct_tokens AS BIGINT)"))
}
