package graft.ext

import graft.SparkSpec

/** Specs for the corpus filtering/packing additions: quality filter,
  * sequence packing, vocabulary coverage, shingle novelty, JSONL export.
  */
class CorpusFilterSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en") }.toDF("doc_id", "text", "lang")

  // ---------------------------------------------------------- bigramLmScore

  test("bigramLmScore: hand-computed conditional frequencies, weighted mean, weakest link") {
    // Corpus: doc 0 = "a b a b" → instances (a,b)×2, (b,a)×1;
    //         doc 1 = "a b c"  → (a,b), (b,c).
    // Counts: c2(a,b)=3, c2(b,a)=1, c2(b,c)=1; c1(a)=3, c1(b)=2.
    // cond: (a,b)=1.0, (b,a)=0.5, (b,c)=0.5.
    val out = Corpus.bigramLmScore(docs((0L, "a b a b"), (1L, "a b c")))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out(0) === ((0L, 3L, 0.833333, 0.5))) // (2·1.0 + 0.5)/3 truncated
    assert(out(1) === ((1L, 2L, 0.75, 0.5)))
    // A doc with one token has no bigrams and is omitted.
    assert(Corpus.bigramLmScore(docs((0L, "solo"))).isEmpty)
  }

  // ---------------------------------------------------------- mixCorpus

  test("mixCorpus: binding source keeps everything, others down-sample to the token recipe") {
    // srcA: 2×10 = 20 tokens at weight 0.5; srcB: 1×40 = 40 tokens at
    // weight 0.5 → K = min(20/0.5, 40/0.5) = 40: srcA is binding
    // (rate exactly 1.0 — powers of two, no fp shave), srcB rate 0.5.
    // srcC carries no weight and must vanish.
    val ten = (1 to 10).map(i => s"t$i").mkString(" ")
    val forty = (1 to 40).map(i => s"f$i").mkString(" ")
    val df = Seq(
      (0L, ten, "en", "srcA"), (1L, ten, "en", "srcA"),
      (2L, forty, "en", "srcB"),
      (3L, ten, "en", "srcC"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Corpus.mixCorpus(df, Map("srcA" -> 0.5, "srcB" -> 0.5))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L), "unweighted srcC must be dropped")
    out.filter(_._2 == "srcA").foreach { case (id, _, n, bucket, keep) =>
      assert(n === 10L && keep, s"binding-source doc $id (bucket $bucket) must be kept")
    }
    val (_, _, nB, bucketB, keepB) = out.find(_._2 == "srcB").get
    assert(nB === 40L)
    assert(keepB === (bucketB < 500000L), "srcB gate must be exactly rate 0.5")
  }

  // ---------------------------------------------------------- collocations

  test("collocations ranks pairs by exact rational lift, gating rare pairs") {
    // doc 0 "x y x y x y": uni x:3 y:3, bigrams (x,y)×3 (y,x)×2;
    // doc 1 "a b a b":     uni a:2 b:2, bigrams (a,b)×2 (b,a)×1.
    // nt = 10 tokens, nb = 8 bigrams. minCount 2 gates (b,a).
    // lift = ((((n_pair·nt)/u1)·nt)/u2)/nb, truncated 6dp:
    //   (a,b): ((2·10/2)·10/2)/8 = 6.25
    //   (x,y): ((3·10/3)·10/3)/8 = 4.166666…
    //   (y,x): ((2·10/3)·10/3)/8 = 2.777777…
    val out = Corpus.collocations(
      docs((0L, "x y x y x y"), (1L, "a b a b")), k = 5, minCount = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(out.toSeq === Seq(
      ("a", "b", 2L, 6.25, 1L),
      ("x", "y", 3L, 4.166666, 2L),
      ("y", "x", 2L, 2.777777, 3L)))
  }

  // ---------------------------------------------------------- qualityFilter

  test("qualityFilter keeps a clean doc, names the failed rules otherwise") {
    val clean = "the alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango " +
      "uniform victor whiskey" // 24 tokens, has a stopword, all bigrams distinct
    val repeated = Seq.fill(30)("the").mkString(" ") // all bigrams identical
    val out = Corpus.qualityFilter(docs(
        (1L, clean), (2L, repeated), (3L, "zulu yankee xray")))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("reasons"), r.getAs[Boolean]("keep")))
    assert(out(0) === ((1L, "", true)))
    assert(out(1) === ((2L, "dup_bigram,top_bigram", false)))
    val (id3, reasons3, keep3) = out(2)
    assert(id3 === 3L && !keep3)
    assert(reasons3.split(",").contains("too_short"))
    assert(reasons3.split(",").contains("no_stopword"))
  }

  // ---------------------------------------------------------- packSequences

  test("packSequences: offsets and sequence spans are exact running sums") {
    val out = Corpus.packSequences(docs(
        (1L, (1 to 4).map(i => s"t$i").mkString(" ")),   // 4 tokens
        (2L, (1 to 8).map(i => s"u$i").mkString(" ")),   // 8 tokens
        (3L, (1 to 7).map(i => s"v$i").mkString(" "))),  // 7 tokens
        seqLen = 10, shards = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, 4L, 0L, 0L, 0L),    // tokens [0, 4)   → seq 0 only
      (2L, 8L, 4L, 0L, 1L),    // tokens [4, 12)  → spans the seq 0/1 cut
      (3L, 7L, 12L, 1L, 1L)))  // tokens [12, 19) → seq 1 only
  }

  test("packSequences shards partition the corpus and offsets are per-shard") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val packed = Corpus.packSequences(d)
    assert(packed.count() === d.count())
    // Within each shard, every document's start_offset equals the sum of
    // the earlier (by doc_id) documents' token counts.
    val rows = packed.orderBy("shard", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).values.foreach { shardRows =>
      var cum = 0L
      shardRows.foreach { case (_, n, start) =>
        assert(start === cum); cum += n
      }
    }
  }

  // ---------------------------------------------------------- vocabCoverage

  test("vocabCoverage counts in-vocabulary tokens against the top-k list") {
    val out = Corpus.vocabCoverage(
        docs((1L, "a a b"), (2L, "c d")), vocabSize = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // Vocabulary = {a (count 2), b (count 1, ties broken token-asc)}.
    assert(out.toSeq === Seq((1L, 3L, 3L, 0.0), (2L, 2L, 0L, 1.0)))
  }

  // --------------------------------------------------------- shingleNovelty

  test("shingleNovelty attributes first occurrence to the smallest doc_id") {
    val out = Corpus.shingleNovelty(
        docs((1L, "a b c"), (2L, "a b d")), k = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc 1 owns {a b, b c}; doc 2 shares "a b", owns "b d".
    assert(out.toSeq === Seq((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5)))
  }

  // -------------------------------------------------------- corpusManifest

  test("corpusManifest agrees with its component operators") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = d.where($"doc_id" % 20 =!= 0)
    val bench = d.where($"doc_id" % 20 === 0)
    val m = Corpus.corpusManifest(corpus, bench).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(m.length === corpus.count())
    m.foreach { case (_, reasons, keep) => assert(keep === reasons.isEmpty) }
    val flagged = m.map { case (id, r, _) => id -> r.split(",").toSet }.toMap
    // near_dup ⟺ non-representative member of a dupGroups component over
    // the QUALITY KEEPERS (filter-then-dedup — the manifest contract).
    val kept = corpus.join(
      Corpus.qualityFilter(corpus).where($"keep").select("doc_id"), "doc_id")
    val nonRep = Dedup.dupGroups(kept).collect()
      .filter(r => r.getLong(1) != r.getLong(0)).map(_.getLong(0)).toSet
    assert(flagged.filter(_._2.contains("near_dup")).keySet === nonRep)
    // A quality-failed doc is never additionally flagged as a duplicate.
    m.foreach { case (_, r, _) =>
      val rs = r.split(",").toSet
      if (rs.exists(Set("too_short", "no_stopword", "dup_bigram"))) {
        assert(!rs.contains("exact_dup"))
      }
    }
    // contaminated ⟺ decontaminate hit.
    val contam = Corpus.decontaminate(corpus, bench).collect().map(_.getLong(0)).toSet
    assert(flagged.filter(_._2.contains("contaminated")).keySet === contam)
  }

  // ----------------------------------------------------------- exportJsonl

  test("exportJsonl round-trips through sharded gzip JSON lines") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    Corpus.exportJsonl(d, dir, shards = 4)
    // Read back through the PINNED-schema source (no inference pass).
    val back = Corpus.readJsonl(spark, dir,
      org.apache.spark.sql.types.StructType(d.schema.fields))
    assert(back.count() === d.count())
    assert(back.schema.fieldNames.toSeq ===
      d.schema.fieldNames.toSeq :+ "shard")
    // Hive-style shard directories exist and carry gzip part files.
    val shardDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(shardDirs.nonEmpty && shardDirs.forall(_.matches("shard=\\d")))
    // Content round-trips (doc_id → text).
    val orig = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = back.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(got === orig)
  }
}
