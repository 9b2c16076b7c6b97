package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus-preparation operator specs: literal-frame edge cases plus
  * equivalence against naive driver-side computations.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  // ---------------------------------------------------------- datasetSplit

  test("datasetSplit assigns every doc exactly once, matching its bucket") {
    val d = docs((0L to 199L).map(i => (i, s"doc number $i", "en")): _*)
    val out = Corpus.datasetSplit(d).collect()
    assert(out.length === 200)
    out.foreach { r =>
      val bucket = r.getLong(2)
      assert(bucket >= 0 && bucket < 100)
      val expected = if (bucket < 80) "train" else if (bucket < 90) "val" else "test"
      assert(r.getString(3) === expected, s"doc ${r.getLong(0)}")
    }
    // Deterministic: the same ids always land in the same split.
    val again = Corpus.datasetSplit(d).collect()
    assert(out.map(r => (r.getLong(0), r.getString(3))).toSet ===
      again.map(r => (r.getLong(0), r.getString(3))).toSet)
  }

  // ------------------------------------------------------------- docChunks

  test("docChunks: short doc is one whole chunk") {
    val text = (1 to 10).map(i => s"tok$i").mkString(" ")
    val out = Corpus.docChunks(docs((1L, text, "en"))).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 0L) // chunk_no
    assert(out.head.getLong(2) === 10L) // n_chunk_tokens
  }

  test("docChunks: 150 tokens -> 3 chunks of 64/64/54 covering the tail") {
    val toks = (1 to 150).map(i => s"t$i")
    val out = Corpus.docChunks(docs((1L, toks.mkString(" "), "en")))
      .orderBy("chunk_no").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(0L, 1L, 2L))
    assert(out.map(_.getLong(2)).toSeq === Seq(64L, 64L, 54L))
    // Digest of the last chunk = md5 of tokens 97..150 (1-based), i.e.
    // the window starting at 2*48.
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(toks.slice(96, 150).mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out.last.getString(3) === expect)
  }

  test("docChunks: exact-size doc (64 tokens) is a single chunk") {
    val text = (1 to 64).map(i => s"t$i").mkString(" ")
    val out = Corpus.docChunks(docs((1L, text, "en"))).collect()
    assert(out.length === 1 && out.head.getLong(2) === 64L)
  }

  test("docChunks: 65 tokens spills into a second chunk carrying the tail") {
    val out = Corpus.docChunks(docs((1L, (1 to 65).map(i => s"t$i").mkString(" "), "en")))
      .orderBy("chunk_no").collect()
    // (65-64+47) div 48 + 1 = 2 chunks; second starts at token 49, 17 long.
    assert(out.map(_.getLong(2)).toSeq === Seq(64L, 17L))
  }

  // ----------------------------------------------------------------- tfIdf

  test("tfIdf ranks by linear-IDF score with term tie-break") {
    val d = docs((1L, "a a b", "en"), (2L, "a c", "en"))
    val out = Corpus.tfIdf(d, k = 5).orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    // N=2. doc1: a tf=2 df=2 -> 2.0; b tf=1 df=1 -> 2.0; tie -> 'a' first.
    // doc2: c tf=1 df=1 -> 2.0; a tf=1 df=2 -> 1.0.
    assert(out.toSeq === Seq(
      (1L, "a", 2L, 2L, 2.0, 1L), (1L, "b", 1L, 1L, 2.0, 2L),
      (2L, "c", 1L, 1L, 2.0, 1L), (2L, "a", 1L, 2L, 1.0, 2L)))
  }

  test("tfIdf keeps at most k terms per doc") {
    val text = ('a' to 'z').map(_.toString).mkString(" ")
    val out = Corpus.tfIdf(docs((1L, text, "en"), (2L, "a b c", "en")), k = 5)
    val counts = out.groupBy("doc_id").count().collect()
    assert(counts.forall(_.getLong(1) <= 5))
  }

  // --------------------------------------------------------- corpusProfile

  test("corpusProfile: discrete percentiles at rank ceil(p*n)") {
    // ws token counts 1..10 in one lang: median = rank 5 -> 5,
    // p90 = rank 9 -> 9.
    val rows = (1L to 10L).map(i => (i, (1L to i).map(j => s"w$j").mkString(" "), "en"))
    val out = Corpus.corpusProfile(docs(rows: _*)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "en")
    assert(r.getLong(1) === 10L) // n_docs
    assert(r.getLong(2) === 5L) // med_tokens
    assert(r.getLong(3) === 9L) // p90_tokens
    val lens = rows.map(_._2.length)
    assert(r.getLong(5) === lens.max.toLong) // max_chars
    val avg = math.floor(lens.sum.toDouble / lens.length * 10000) / 10000
    assert(r.getDouble(4) === avg)
  }

  test("corpusProfile groups by lang") {
    val out = Corpus.corpusProfile(docs(
      (1L, "uno dos tres", "es"), (2L, "one two", "en"), (3L, "eins", "de")))
      .orderBy("lang").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("de", "en", "es"))
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 2L, 3L)) // medians = only doc
  }

  // ---------------------------------------------- connectedComponents / CC

  test("connectedComponents labels a path graph with its minimum node") {
    // Path 1-2-3-4-5-6 presented max-first: min label must walk the
    // whole diameter, exercising multi-round propagation.
    val edges = Seq((6L, 5L), (5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L))
      .toDF("a", "b")
    val out = Dedup.connectedComponents(edges, "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === (1L to 6L).map(_ -> 1L).toMap)
  }

  test("connectedComponents separates disjoint components") {
    val edges = Seq((10L, 11L), (12L, 13L), (11L, 14L)).toDF("a", "b")
    val out = Dedup.connectedComponents(edges, "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(10L -> 10L, 11L -> 10L, 14L -> 10L, 12L -> 12L, 13L -> 12L))
  }

  test("connectedComponents matches naive union-find on a pseudo-random graph") {
    val edges = (0 until 30).map(i => (i.toLong, ((i * 7 + 3) % 50).toLong))
    // Naive union-find on the driver as the oracle.
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // Canonical label = min node id per root group.
    val expected = nodes.groupBy(find).flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }
    val out = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === expected)
  }

  test("dupGroups groups exactly the docs that appear in near-dup pairs") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = Dedup.nearDupMinhash(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val groups = Dedup.dupGroups(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = groups.map(g => g._1 -> g._2).toMap
    // Every paired doc appears, pairs share a group, labels are group minima.
    pairs.foreach { case (a, b) =>
      assert(byDoc.contains(a) && byDoc.contains(b))
      assert(byDoc(a) === byDoc(b))
    }
    assert(groups.map(_._1).toSet === pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    groups.groupBy(_._2).foreach { case (label, members) =>
      assert(members.map(_._1).min === label)
      assert(members.forall(_._3 === members.length.toLong)) // group_size
    }
  }

  // --------------------------------------------------------- nearDupRetain

  test("nearDupRetain keeps exactly one doc per component plus all singletons") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Dedup.nearDupRetain(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length === d.count())
    val groups = Dedup.dupGroups(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    out.foreach { case (doc, label, kept) =>
      assert(label === groups.getOrElse(doc, doc), s"doc $doc label")
      assert(kept === (label === doc), s"doc $doc kept flag")
    }
    // Exactly one survivor per component; survivors ∪ dropped = corpus.
    val grouped = out.filter(o => groups.contains(o._1))
    grouped.groupBy(_._2).foreach { case (label, members) =>
      assert(members.count(_._3) === 1)
      assert(members.find(_._3).get._1 === label)
    }
    assert(out.filterNot(o => groups.contains(o._1)).forall(_._3))
  }

  // --------------------------------------------------------- sourceOverlap

  test("sourceOverlap rolls up exactly the near-dup pairs by source pair") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val srcOf = d.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.nearDupMinhash(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = pairs.groupBy { case (a, b, _) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      if (sa <= sb) (sa, sb) else (sb, sa)
    }.map { case (k, v) =>
      val micros = v.map(p => math.round(p._3 * 1000000))
      (k._1, k._2, v.length.toLong, micros.sum / v.length)
    }.toSet
    val got = Dedup.sourceOverlap(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
    assert(got.toSeq.map(_._3).sum === pairs.length.toLong)
  }

  // ------------------------------------------------------- duplicatedSpans

  test("duplicatedSpans flags cross-doc spans, not within-doc repeats") {
    // k=3 spans. Docs 1 and 2 share the span "alpha beta gamma"; doc 3
    // repeats its own span twice but shares nothing; doc 4 is too short.
    val d = docs(
      (1L, "alpha beta gamma delta epsilon", "en"),
      (2L, "zeta alpha beta gamma eta", "en"),
      (3L, "one two three one two three", "en"),
      (4L, "tiny doc", "en"))
    val out = Corpus.duplicatedSpans(d, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // doc 1: 3 spans, 1 shared ("alpha beta gamma"); doc 2: 3 spans,
    // 1 shared; doc 3: 4 windows but only 3 DISTINCT spans, 0 shared.
    assert(out === Seq((1L, 3L, 1L), (2L, 3L, 1L), (3L, 3L, 0L)))
    val fracs = Corpus.duplicatedSpans(d, k = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(fracs(1L) === 0.3333 && fracs(3L) === 0.0)
  }

  test("duplicatedSpans matches a naive driver-side computation on real docs") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val k = Corpus.DecontamShingle
    val toks = d.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val spans = toks.map { case (id, ts) =>
      id -> ts.sliding(k).filter(_.length == k).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val occ = spans.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).map { case (s, v) => s -> v.length }
    val expected = spans.map { case (id, ss) =>
      (id, ss.size.toLong, ss.count(occ(_) >= 2).toLong)
    }.sortBy(_._1).toSeq
    val got = Corpus.duplicatedSpans(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got === expected)
  }

  // -------------------------------------------------------------- lineDedup

  test("lineDedup removes lines shared by more than maxDocs docs, keeps order") {
    // "nav bar" is a complete 2-token line in docs 1-3 (boilerplate at
    // maxDocs=2); each doc keeps its own distinct content lines in order.
    val d = docs(
      (1L, "nav bar alpha beta gamma delta", "en"),
      (2L, "nav bar epsilon zeta", "en"),
      (3L, "nav bar eta theta", "en"))
    val out = Corpus.lineDedup(d, lineTokens = 2, maxDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "alpha beta gamma delta", 3L, 1L),
      (2L, "epsilon zeta", 2L, 1L),
      (3L, "eta theta", 2L, 1L)))
  }

  test("lineDedup: fully-boilerplate doc survives with empty clean_text") {
    val d = docs(
      (1L, "cookie banner", "en"),
      (2L, "cookie banner", "en"),
      (3L, "cookie banner real content", "en"))
    val out = Corpus.lineDedup(d, lineTokens = 2, maxDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "", 1L), (2L, "", 1L), (3L, "real content", 1L)))
  }

  test("lineDedup: ragged tail line is its own (shorter) line") {
    // 5 tokens -> lines "a b", "c d", "e"; nothing repeated, all kept.
    val out = Corpus.lineDedup(docs((1L, "a b c d e", "en")),
      lineTokens = 2, maxDocs = 1).collect().head
    assert(out.getString(1) === "a b c d e")
    assert(out.getLong(2) === 3L && out.getLong(3) === 0L)
  }

  // ------------------------------------------------------------ bpeMerges

  test("bpeMerges counts adjacent char pairs weighted by word frequency") {
    // words: "abab" wc 2 (pairs ab, ba, ab), "ab" wc 1, "cd" wc 1
    // → ab: 2·2 + 1 = 5, ba: 1·2 = 2, cd: 1
    val out = Corpus.bpeMerges(
      docs((1L, "abab abab", "en"), (2L, "ab cd", "en")), 20)
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("ab", 5L), ("ba", 2L), ("cd", 1L)))
  }

  test("bpeMerges: single-char words contribute no pairs; k caps output") {
    val out = Corpus.bpeMerges(
      docs((1L, "a b c xy xy zz", "en")), 1).as[(String, Long)].collect()
    assert(out === Seq(("xy", 2L))) // zz loses the (n desc, pair asc) order
  }
}
