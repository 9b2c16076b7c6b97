package graft.ext

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Degenerate-input hardening: empty corpora, empty strings, single
  * documents. Every operator must return its declared schema with zero
  * or well-defined rows — not throw — because at 100 TB a partition,
  * source stratum, or incremental batch being empty is routine.
  */
class CorpusEdgeSpec extends SparkSpec {
  import spark.implicits._

  private val empty: DataFrame =
    Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
  private val one = Seq((1L, "the lonely document", "en"))
    .toDF("doc_id", "text", "lang")
  private val blank = Seq((1L, "", "en"), (2L, "   ", "en"))
    .toDF("doc_id", "text", "lang")

  test("corpus operators return empty results on an empty corpus") {
    assert(Corpus.qualityFilter(empty).count() === 0)
    assert(Corpus.packSequences(empty).count() === 0)
    assert(Corpus.vocabCoverage(empty).count() === 0)
    assert(Corpus.shingleNovelty(empty).count() === 0)
    assert(Corpus.repetitionScore(empty).count() === 0)
    assert(Corpus.docChunks(empty).count() === 0)
    assert(Dedup.exact(empty).count() === 0)
    assert(Dedup.nearDupMinhash(empty).count() === 0)
    assert(Corpus.duplicatedSpans(empty).count() === 0)
    assert(Dedup.nearDupRetain(empty).count() === 0)
  }

  test("nearDupRetain keeps everything when no near-dup pairs exist") {
    val distinctDocs = Seq(
      (1L, "entirely different words about gardening tools and soil", "en"),
      (2L, "unrelated discussion of maritime navigation techniques", "en"))
      .toDF("doc_id", "text", "lang")
    val out = Dedup.nearDupRetain(distinctDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(out.toSeq === Seq((1L, 1L, true), (2L, 2L, true)))
  }

  test("duplicatedSpans omits docs shorter than the span width") {
    val d = Seq((1L, "short", "en"), (2L, "also tiny", "en"))
      .toDF("doc_id", "text", "lang")
    assert(Corpus.duplicatedSpans(d).count() === 0)
  }

  test("sourceOverlap is empty when no pairs exist, keyed when they do") {
    val noPairs = Seq(
      (1L, "entirely different words about gardening tools and soil", "s0"),
      (2L, "unrelated discussion of maritime navigation techniques", "s1"))
      .toDF("doc_id", "text", "source")
    assert(Dedup.sourceOverlap(noPairs).count() === 0)
    val twins = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "s1"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "s0"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlap(twins).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // Unordered pair normalizes to (s0, s1); identical docs → J = 1.
    assert(out.toSeq === Seq(("s0", "s1", 1L, 1000000L)))
  }

  test("manifest of a single clean-or-not document never throws") {
    val m = Corpus.corpusManifest(one, empty).collect()
    assert(m.length === 1)
    // 3 tokens → too_short fires; never flagged as any kind of dup.
    val reasons = m.head.getString(1).split(",").toSet
    assert(reasons.contains("too_short"))
    assert(!reasons.contains("exact_dup") && !reasons.contains("near_dup"))
  }

  test("incremental dedup with an empty existing corpus = within-batch only") {
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta", "en"),
      (11L, "alpha beta gamma delta epsilon zeta eta iota", "en"))
      .toDF("doc_id", "text", "lang")
    val out = Dedup.nearDupIncremental(empty, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((11L, 10L))) // later doc matches earlier only
  }

  test("blank/whitespace-only texts stay in per-doc ops with defined values") {
    // tokens("") = [""] (1 token), so the stats row exists; fractions
    // must be finite, not NaN/null.
    val stats = TextOps.textStats(blank).orderBy("doc_id").collect()
    assert(stats.length === 2)
    stats.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("n_tokens")))
    }
    assert(Corpus.packSequences(blank).count() === 2)
  }
}
