package graft.ext

import graft.SparkSpec

/** Specs for the round-4 corpus-prep additions: decontamination,
  * repetition signals, stratified sampling, incremental dedup.
  */
class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en") }.toDF("doc_id", "text", "lang")

  // --------------------------------------------------------- decontaminate

  test("decontaminate flags an 8-token overlap, ignores a 7-token overlap") {
    val benchText = (1 to 20).map(i => s"w$i").mkString(" ")
    val eightRun = (5 to 12).map(i => s"w$i").mkString(" ")  // 8 shared tokens
    val sevenRun = (5 to 11).map(i => s"w$i").mkString(" ")  // 7 shared tokens
    val corpus = docs(
      (10L, s"u1 u2 $eightRun u3 u4"),
      (11L, s"v1 v2 $sevenRun v3 v4"),
      (12L, "entirely different tokens only"))
    val bench = docs((1L, benchText))
    val out = Corpus.decontaminate(corpus, bench).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((10L, 1L)))
  }

  test("decontaminate counts distinct shared shingles per doc") {
    val benchText = (1 to 30).map(i => s"w$i").mkString(" ")
    // Shares tokens 1..10: windows starting at 1, 2, 3 → 3 shared shingles.
    val corpus = docs((10L, (1 to 10).map(i => s"w$i").mkString(" ")))
    val out = Corpus.decontaminate(corpus, docs((1L, benchText))).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((10L, 3L)))
  }

  // ------------------------------------------------------- repetitionScore

  test("repetitionScore on a fully-repeated doc and a distinct doc") {
    val out = Corpus.repetitionScore(docs(
        (1L, "x x x x x"),   // 4 bigrams, all "x x"
        (2L, "a b c d"),     // 3 distinct bigrams
        (3L, "single")))     // no bigrams → omitted
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (1L, 4L, 1L, 0.75, 1.0),
      (2L, 3L, 3L, 0.0, math.floor(1.0 / 3 * 10000) / 10000)))
  }

  // ------------------------------------------------------ stratifiedSample

  private val srcDocs = (0L until 300L)
    .map(i => (i, s"text $i", "en", s"src${i % 3}"))
    .toDF("doc_id", "text", "lang", "source")

  test("stratifiedSample: zero-rate stratum drops out; buckets bound the rate") {
    val out = Corpus.stratifiedSample(srcDocs, 20, Map("src0" -> 50, "src1" -> 0))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(!out.exists(_._2 == "src1"))
    out.foreach { case (_, src, bucket) =>
      val rate = if (src == "src0") 50 else 20
      assert(bucket >= 0 && bucket < rate)
    }
  }

  test("stratifiedSample is monotone in the rate (20% sample ⊆ 50% sample)") {
    def ids(pct: Int) = Corpus.stratifiedSample(srcDocs, pct)
      .collect().map(_.getLong(0)).toSet
    val (small, large) = (ids(20), ids(50))
    assert(small.subsetOf(large))
    assert(small.nonEmpty && large.size > small.size)
  }

  // ---------------------------------------------------- nearDupIncremental

  test("nearDupAgainstStore: signature tables round-trip through partitioned parquet") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val existing = d.where($"doc_id" % 10 < 8)
    val incoming = d.where($"doc_id" % 10 >= 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-sigstore").toString
    val hrE = Dedup.hashedShingleRows(existing)
    Dedup.minhashBands(hrE).write.partitionBy("band_idx").parquet(s"$dir/bands")
    Dedup.shingleSets(hrE).write.parquet(s"$dir/sets")
    val viaStore = Dedup.nearDupAgainstStore(
        spark.read.parquet(s"$dir/bands"), spark.read.parquet(s"$dir/sets"), incoming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val live = Dedup.nearDupIncremental(existing, incoming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaStore === live)
  }

  test("nearDupIncremental ≡ full-corpus pairs touching the incoming batch") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def isNew(id: Long) = id % 10 >= 8
    val full = Dedup.nearDupMinhash(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // Orient full pairs (a < b) into the incremental contract:
    // both new → (b, a); exactly one new → (new, old); none new → dropped.
    val expected = full.flatMap { case (a, b, j) =>
      (isNew(a), isNew(b)) match {
        case (_, true)      => Some((b, a, j))
        case (true, false)  => Some((a, b, j))
        case (false, false) => None
      }
    }.toSet
    val inc = Dedup.nearDupIncremental(
        d.where($"doc_id" % 10 < 8), d.where($"doc_id" % 10 >= 8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc === expected)
    assert(inc.forall { case (n, _, _) => isNew(n) })
  }
}
