package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Top-level so Spark can derive an Encoder without an outer scope. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Document row for the streaming incremental-dedup spec. */
case class Doc(doc_id: Long, text: String, lang: String)

/** Embedding row for the streaming LSH-ingest spec. */
case class Emb(vec_id: Long, embedding: Array[Float], label: Int)

/** Grouped-value row for the streaming KMV-sketch spec. */
case class GV(g: String, v: Long)

/** Reconciliation row for the streaming alert spec. */
case class ReconRow(date_key: java.sql.Date, sku: String, product_name: String,
    opening_stock: Long, quantity_sold: Long, expected_closing_stock: Long,
    actual_closing_stock: Long, discrepancy_amount: Long)

/** Streaming operators driven end-to-end through MemoryStream →
  * streaming query → memory sink.
  */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch = Seq(
    Ev(1L, ts("2024-01-01 10:05:00"), 100L, "view", 1.0),
    Ev(2L, ts("2024-01-01 10:45:00"), 100L, "purchase", 9.0),
    Ev(3L, ts("2024-01-01 11:10:00"), 100L, "view", 2.0),
    Ev(4L, ts("2024-01-01 10:20:00"), 200L, "view", 3.0))

  test("hourly rollup over a stream matches the batch rollup on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.hourlyRollupStream(mem.toDF())
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    try {
      mem.addData(batch: _*)
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .orderBy("hour_start", "event_type").collect()
      val batched = graft.ext.Events.hourlyRollup(batch.toDF())
        .orderBy("hour_start", "event_type").collect()
      assert(streamed.toSeq === batched.toSeq)
      assert(streamed.length === 3) // (10h view+purchase), (11h view)
    } finally q.stop()
  }

  test("sliding trending windows over a stream match the batch sliding counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.trendingStream(mem.toDF())
      .writeStream.format("memory").queryName("trend_out")
      .outputMode("complete").start()
    try {
      mem.addData(batch: _*)
      q.processAllAvailable()
      val streamed = spark.table("trend_out")
        .orderBy("window_start", "event_type").collect()
      val batched = graft.ext.Events.slidingCounts(batch.toDF())
        .orderBy("window_start", "event_type").collect()
      assert(streamed.toSeq === batched.toSeq)
      // 10:05 view sits in 4 overlapping 1h/15m windows: starts 09:15..10:00.
      assert(streamed.count(r => r.getString(1) == "view" &&
        r.getTimestamp(0).toString.startsWith("2024-01-01 09:15")) === 1)
    } finally q.stop()
  }

  test("streaming dedup emits each event_id once despite duplicate delivery") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(batch: _*)
      q.processAllAvailable()
      mem.addData(batch: _*) // at-least-once redelivery of the same batch
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
      assert(out.length === batch.length)
      assert(out.map(_.getLong(0)).sorted.toSeq === batch.map(_.event_id).sorted)
    } finally q.stop()
  }

  test("session_window groups bursts and closes sessions after the gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.sessionizeStream(mem.toDF(), gap = "30 minutes")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("complete").start()
    try {
      mem.addData(batch: _*)
      q.processAllAvailable()
      val out = spark.table("sessions_out").orderBy("user_id", "session_start").collect()
      // user 100: events at 10:05, 10:45, 11:10 with 30m gap → one chain
      // (10:05→10:45 is 40m > gap? yes → two sessions: [10:05], [10:45,11:10])
      val u100 = out.filter(_.getLong(0) == 100L)
      assert(u100.length === 2)
      assert(u100(0).getLong(3) === 1L) // n_events first session
      assert(u100(1).getLong(3) === 2L)
      assert(u100(1).getLong(4) === 1L) // purchase in second session
      assert(out.count(_.getLong(0) == 200L) === 1)
    } finally q.stop()
  }

  test("streaming incremental dedup per batch ≡ batch operator with a growing store") {
    implicit val sqlCtx = spark.sqlContext
    // Store starts with docs 1-2; the stream delivers 10-11 then 20-21.
    // Doc 10 duplicates store doc 1; doc 21 duplicates STREAM doc 10 —
    // catching it requires the store to have grown between batches.
    val base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3) +
      "one extra tail"
    val store = scala.collection.mutable.ArrayBuffer(
      Doc(1L, base, "en"),
      Doc(2L, "completely different words entirely here now", "en"))
    val results = scala.collection.mutable.Map.empty[Long, Seq[(Long, Long)]]
    val mem = MemoryStream[Doc]
    val writer = StreamingOps.incrementalDedupStream(
      mem.toDF(),
      () => store.toSeq.toDF(),
      (pairs, id) => {
        results(id) = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        // Production contract: append the processed batch to the store.
        // (The test keeps doc rows; at scale you persist signatures.)
      })
    val q = writer.start()
    try {
      val b1 = Seq(Doc(10L, base + " omega", "en"), // near-dup of store doc 1
        Doc(11L, "nothing like anything else at all", "en"))
      mem.addData(b1: _*); q.processAllAvailable()
      store ++= b1
      val b2 = Seq(Doc(20L, "fresh unrelated content again", "en"),
        Doc(21L, base + " omega sigma", "en")) // near-dup of STREAM doc 10
      mem.addData(b2: _*); q.processAllAvailable()
      store ++= b2

      assert(results(0L).toSet === Set((10L, 1L)))
      assert(results(1L).contains((21L, 10L))) // cross-BATCH dup caught
      assert(results(1L).forall(_._1 >= 20L))  // probes are batch-2 docs only
    } finally q.stop()
  }

  test("streaming corpus ingest: quality gate + cross-batch dedup manifest") {
    implicit val sqlCtx = spark.sqlContext
    // Quality-passing texts: ≥20 tokens, a stopword, no repetition.
    val wordsA = "the " + (1 to 24).map(i => s"w$i").mkString(" ")
    val cleanB = "a " + (1 to 24).map(i => s"q$i").mkString(" ")
    val store = scala.collection.mutable.ArrayBuffer(Doc(1L, wordsA, "en"))
    val results = scala.collection.mutable.Map.empty[Long, Map[Long, (String, Boolean)]]
    val mem = MemoryStream[Doc]
    val writer = StreamingOps.corpusIngestStream(
      mem.toDF(),
      () => store.toSeq.toDF(),
      (manifest, id) => results(id) = manifest.collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap)
    val q = writer.start()
    try {
      val b1 = Seq(
        Doc(10L, wordsA + " extra", "en"), // near-dup of STORE doc 1
        Doc(11L, cleanB, "en"),            // clean keeper
        Doc(12L, "x y z", "en"))           // fails quality, never deduped
      mem.addData(b1: _*); q.processAllAvailable()
      store ++= b1.filter(d => results(0L)(d.doc_id)._2) // commit keepers
      val b2 = Seq(Doc(20L, cleanB + " qtail", "en")) // near-dup of STREAM doc 11
      mem.addData(b2: _*); q.processAllAvailable()

      assert(results(0L)(10L) === (("near_dup", false)))
      assert(results(0L)(11L) === (("", true)))
      val (r12, k12) = results(0L)(12L)
      assert(!k12 && r12.split(",").contains("too_short"))
      // Catching 20 ≈ 11 requires the store to have grown after batch 1.
      assert(results(1L)(20L) === (("near_dup", false)))
    } finally q.stop()
  }

  test("streaming ingest splits exact_dup from near_dup like the batch manifest") {
    implicit val sqlCtx = spark.sqlContext
    val wordsA = "the " + (1 to 24).map(i => s"w$i").mkString(" ")
    val cleanB = "a " + (1 to 24).map(i => s"q$i").mkString(" ")
    val store = scala.collection.mutable.ArrayBuffer(Doc(1L, wordsA, "en"))
    val results = scala.collection.mutable.Map.empty[Long, Map[Long, (String, Boolean)]]
    val mem = MemoryStream[Doc]
    val writer = StreamingOps.corpusIngestStream(
      mem.toDF(),
      () => store.toSeq.toDF(),
      (manifest, id) => results(id) = manifest.collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap)
    val q = writer.start()
    try {
      val b1 = Seq(
        Doc(10L, wordsA, "en"),            // EXACT copy of store doc 1
        Doc(11L, cleanB, "en"),            // clean keeper
        Doc(12L, cleanB + " !!", "en"))    // exact copy of 11 modulo
                                           // normalization (punct strips)
      mem.addData(b1: _*); q.processAllAvailable()
      // Exact copies report both flags, exactly like the batch manifest
      // (an exact copy is also a Jaccard-1 near-dup group member).
      assert(results(0L)(10L) === (("exact_dup,near_dup", false)))
      assert(results(0L)(11L) === (("", true)))
      assert(results(0L)(12L) === (("exact_dup,near_dup", false)))
      store ++= b1.filter(d => results(0L)(d.doc_id)._2)
      // A near-but-not-exact copy across batches stays near_dup only.
      mem.addData(Doc(20L, cleanB + " qtail", "en")); q.processAllAvailable()
      assert(results(1L)(20L) === (("near_dup", false)))
    } finally q.stop()
  }

  test("corpus ingest manifest is identical under permuted batch cuts with non-monotone ids") {
    implicit val sqlCtx = spark.sqlContext
    // Similarity family with deliberately out-of-order ids: 5 is the
    // canonical min-id survivor but arrives LAST in one cut; 40 is an
    // exact copy of 5, 30 a near-dup, 50 unrelated. The final manifest
    // (per-doc upsert, demotion rows included) must be the same pure
    // function of the SET for every cut.
    val textA = "the " + (1 to 24).map(i => s"w$i").mkString(" ")
    val textB = "a " + (1 to 24).map(i => s"b$i").mkString(" ")
    val docs = Map(
      5L -> Doc(5L, textA, "en"),
      30L -> Doc(30L, textA + " tail", "en"),
      40L -> Doc(40L, textA, "en"),
      50L -> Doc(50L, textB, "en"))
    def run(cuts: Seq[Seq[Long]]): Map[Long, (String, Boolean)] = {
      val store = scala.collection.mutable.ArrayBuffer.empty[Doc]
      val finalManifest = scala.collection.mutable.Map.empty[Long, (String, Boolean)]
      val mem = MemoryStream[Doc]
      val writer = StreamingOps.corpusIngestStream(
        mem.toDF(),
        () => if (store.isEmpty) Seq.empty[Doc].toDF() else store.toSeq.toDF(),
        (manifest, _) => manifest.collect().foreach(r =>
          finalManifest(r.getLong(0)) = (r.getString(1), r.getBoolean(2))))
      val q = writer.start()
      try {
        cuts.foreach { ids =>
          mem.addData(ids.map(docs): _*); q.processAllAvailable()
          // Cut-invariance contract: EVERY quality-keeper's signatures
          // are committed, dropped and demoted docs included.
          store ++= ids.map(docs)
        }
      } finally q.stop()
      finalManifest.toMap
    }
    val expected = Map(
      5L -> (("", true)),
      30L -> (("near_dup", false)),
      40L -> (("exact_dup,near_dup", false)),
      50L -> (("", true)))
    val cuts = Seq(
      Seq(Seq(40L), Seq(30L), Seq(5L), Seq(50L)), // min-id survivor arrives last
      Seq(Seq(5L), Seq(40L, 30L), Seq(50L)),      // in id order
      Seq(Seq(40L, 30L, 5L, 50L)),                // one batch = the batch oracle
      Seq(Seq(30L, 50L), Seq(40L), Seq(5L)))
    cuts.foreach { cut =>
      assert(run(cut) === expected, s"manifest must be cut-invariant for $cut")
    }
  }

  test("streaming LSH ingest accumulates the exact batch signature store") {
    implicit val sqlCtx = spark.sqlContext
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val all = Seq(
      Emb(0L, v(1, 0, 0, 0), 0), Emb(1L, v(0.9, 0.1, 0, 0), 0),
      Emb(2L, v(-1, 0.2, 0, 0), 1), Emb(3L, v(0, 0, 1, 0), 1),
      Emb(4L, v(0, -1, 0.3, 0), 2), Emb(5L, v(0.2, 0.2, 0.2, 0.2), 2))
    val gotRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    val mem = MemoryStream[Emb]
    val writer = StreamingOps.lshIngestStream(
      mem.toDF(),
      (sigs, _) => gotRows ++= sigs.collect().map(r => (r.getLong(0), r.getInt(1))),
      dim = 4)
    val q = writer.start()
    try {
      mem.addData(all.take(3): _*); q.processAllAvailable()
      mem.addData(all.drop(3): _*); q.processAllAvailable()
      val batchStore = graft.ext.Similarity.lshSignatures(all.toDF(), dim = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      // Signatures are pure per-vector: two micro-batches accumulate
      // exactly the one-pass store, row for row.
      assert(gotRows.toSet === batchStore)
      assert(gotRows.size === all.size)
    } finally q.stop()
  }

  test("streaming KMV ingest: merged batch sketches equal the one-shot sketch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val all = (1L to 800L).map(i => GV(s"g${i % 2}", i % 300))
    var store = Seq.empty[(String, Long)].toDF("g", "kmv_hash")
    val mem = MemoryStream[GV]
    val writer = StreamingOps.kmvIngestStream(
      mem.toDF(), Seq("g"), "v", 32,
      (batchSketch, _) => store = graft.ext.Sketches
        .kmvMerge(store, batchSketch, Seq("g"), 32).localCheckpoint())
    val q = writer.start()
    try {
      mem.addData(all.take(500): _*); q.processAllAvailable()
      mem.addData(all.drop(500): _*); q.processAllAvailable()
      val oneShot = graft.ext.Sketches.kmvSketch(all.toDF(), Seq("g"), "v", 32)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // Merge is associative/commutative: batch-cut invariant store.
      assert(store.collect().map(r => (r.getString(0), r.getLong(1))).toSet === oneShot)
    } finally q.stop()
  }

  test("streaming rollup ingest: folded partial sums equal the one-shot aggregate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val all = (1L to 300L).map(i => (s"SKU-${i % 17}", i))
    var store = Seq.empty[(String, Long)].toDF("sku", "qty")
    val mem = MemoryStream[(String, Long)]
    val writer = StreamingOps.rollupIngestStream(
      mem.toDF().toDF("sku", "qty"), Seq("sku"), "qty",
      (partial, _) => store = StreamingOps
        .mergeRollup(store, partial, Seq("sku"), "qty").localCheckpoint())
    val q = writer.start()
    try {
      // Out-of-order uneven cuts: additivity makes the store cut-invariant.
      mem.addData(all.drop(200): _*); q.processAllAvailable()
      mem.addData(all.take(200): _*); q.processAllAvailable()
      val oneShot = all.toDF("sku", "qty").groupBy("sku")
        .agg(org.apache.spark.sql.functions.sum("qty").cast("long").as("qty"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(store.collect().map(r => (r.getString(0), r.getLong(1))).toSet === oneShot)
    } finally q.stop()
  }

  test("streaming histogram ingest: folded bucket counts equal the one-shot store") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val all = (1L to 400L).map(i => (s"g${i % 3}", (i % 57) * 0.37))
    var store = Seq.empty[(String, Long, Long)].toDF("g", "bucket", "n")
    val mem = MemoryStream[(String, Double)]
    val writer = StreamingOps.histIngestStream(
      mem.toDF().toDF("g", "v"), Seq("g"), "v", 25L,
      (partial, _) => store = StreamingOps
        .mergeRollup(store, partial, Seq("g", "bucket"), "n").localCheckpoint())
    val q = writer.start()
    try {
      // Out-of-order uneven cuts: additivity makes the store cut-invariant.
      mem.addData(all.drop(250): _*); q.processAllAvailable()
      mem.addData(all.take(250): _*); q.processAllAvailable()
      val oneShot = graft.ext.Stats.histogramOf(all.toDF("g", "v"), Seq("g"), "v", 25L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(store.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet === oneShot)
      // The store read is the quantile probe — it must equal the
      // one-shot histogramQuantiles over the full data.
      val probed = graft.ext.Stats.quantilesFromHistogram(
        store, Seq("g"), 25L, Seq(50, 99)).collect().map(_.toSeq).toSet
      val direct = graft.ext.Stats.histogramQuantiles(
        all.toDF("g", "v"), Seq("g"), "v", 25L, Seq(50, 99))
        .collect().map(_.toSeq).toSet
      assert(probed === direct)
    } finally q.stop()
  }

  test("streaming span ingest: merged batch counts equal the one-shot summary") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // 40 docs; doc i repeats a shared phrase when i % 3 == 0. k=3 spans.
    val all = (1L to 40L).map { i =>
      val body = if (i % 3 == 0) "alpha beta gamma shared tail" else s"doc $i unique words here"
      Doc(i, body, "en")
    }
    var store = Seq.empty[(Long, Long)].toDF("h", "n_docs")
    val mem = MemoryStream[Doc]
    val writer = StreamingOps.spanIngestStream(
      mem.toDF(), 3,
      (batchCounts, _) => store = graft.ext.Corpus
        .spanStoreMerge(store, batchCounts).localCheckpoint())
    val q = writer.start()
    try {
      mem.addData(all.take(25): _*); q.processAllAvailable()
      mem.addData(all.drop(25): _*); q.processAllAvailable()
      val oneShot = graft.ext.Corpus.spanCounts(all.toDF(), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // Doc-atomic batches: addition-merged store ≡ one-shot counts.
      assert(store.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === oneShot)
    } finally q.stop()
  }

  test("streaming count-min ingest: summed batch counters equal the one-shot sketch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val all = (1L to 600L).map(i => GV(s"v${i % 37}", i))
    var store = Seq.empty[(Int, Long, Long)].toDF("cms_row", "cms_bucket", "cms_cnt")
    val mem = MemoryStream[GV]
    val writer = StreamingOps.cmsIngestStream(
      mem.toDF(), "g", 4, 256,
      sink = (batchSketch, _) => store = graft.ext.Sketches
        .cmsMerge(store, batchSketch).localCheckpoint())
    val q = writer.start()
    try {
      mem.addData(all.take(250): _*); q.processAllAvailable()
      mem.addData(all.drop(250): _*); q.processAllAvailable()
      val oneShot = graft.ext.Sketches.cmsSketch(all.toDF(), "g", 4, 256)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      // Counters are sums: ANY batch cut is bit-identical to one pass.
      assert(store.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .toSet === oneShot)
    } finally q.stop()
  }

  test("streaming semantic-dedup ingest demotes an undercut store vector") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val centroids = Seq((0, v(1, 0)), (1, v(0, 1))).toDF("cell", "centroid")
    // Batch 1: vec 2 (admitted) + vec 5. Batch 2: vec 1 — a SMALLER-id
    // near-dup of 2 — must be kept while 2 gets a demotion row.
    val b1 = Seq(Emb(2L, v(0.999, 0.01), 0), Emb(5L, v(0, 1), 0))
    val b2 = Seq(Emb(1L, v(1, 0), 0))
    var store = Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "cell")
    val verdicts = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val mem = MemoryStream[Emb]
    val writer = StreamingOps.semDedupIngestStream(
      mem.toDF().select("vec_id", "embedding"),
      () => store, () => centroids,
      (out, _) => verdicts ++= out.collect().map(r => (r.getLong(0), r.getBoolean(2))))
    val q = writer.start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      // Sink contract: every batch vector joins the store.
      store = store.unionByName(
        graft.ext.Similarity.assignCells(b1.toDF().select("vec_id", "embedding"), centroids)
          .join(b1.toDF().select("vec_id", "embedding"), "vec_id")
          .select("vec_id", "embedding", "cell")).localCheckpoint()
      mem.addData(b2: _*); q.processAllAvailable()
      val folded = verdicts.groupBy(_._1).view
        .mapValues(_.forall(_._2)).toMap
      assert(folded === Map(1L -> true, 2L -> false, 5L -> true))
      // The demotion arrived as an explicit second row for vec 2.
      assert(verdicts.count(_._1 == 2L) === 2)
    } finally q.stop()
  }

  test("streaming anomaly gate against frozen moments ≡ batch flags, any cut") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // Frozen moments trained on a reference day: type A spread over
    // 8/10/12 (sd ≈ 1.6), so 9.00 and 10.00 sit well inside 3σ and
    // 500.00 far outside. The moments are FROZEN — the stream's own
    // spike can't shift them.
    val training = (1L to 42L).map(i =>
      Ev(i, ts("2024-01-01 00:00:00"), i, "A", 8.00 + 2 * (i % 3))).toDF()
    val moments = graft.ext.Events.momentsOf(training).localCheckpoint()
    val arrivals = Seq(
      Ev(201L, ts("2024-01-02 00:00:00"), 1L, "A", 10.00), // normal
      Ev(202L, ts("2024-01-02 00:01:00"), 2L, "A", 500.00), // spike
      Ev(203L, ts("2024-01-02 00:02:00"), 3L, "A", 9.00)) // normal
    val expected = graft.ext.Events
      .anomaliesAgainst(arrivals.toDF(), moments)
      .select("event_id").as[Long].collect().toSet
    assert(expected === Set(202L))
    for (cut <- Seq(Seq(arrivals), arrivals.grouped(1).toSeq)) {
      val flagged = scala.collection.mutable.ArrayBuffer.empty[Long]
      val mem = MemoryStream[Ev]
      val q = StreamingOps.anomalyStream(mem.toDF(), () => moments,
        (out, _) => flagged ++= out.select("event_id").as[Long].collect()).start()
      try {
        cut.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        assert(flagged.toSet === expected, s"cut of ${cut.size} batches")
      } finally q.stop()
    }
  }

  test("streaming SCD2 maintenance replays the sequential day merges") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val d = (s: String) => java.sql.Date.valueOf(s)
    val dim = Seq((1L, "widget", 10.0), (2L, "gadget", 20.0))
      .toDF("k", "name", "price")
    var store = graft.etl.Scd2.init(dim, d("2024-01-01")).localCheckpoint()
    val dates = Map(0L -> d("2024-02-01"), 1L -> d("2024-03-01"))
    val mem = MemoryStream[(Long, String, Double)]
    val q = StreamingOps.scd2Stream(
      mem.toDF().toDF("k", "name", "price"), () => store,
      "k", Seq("name", "price"), dates,
      (out, _) => store = out.localCheckpoint()).start()
    try {
      mem.addData((1L, "widget", 15.0)); q.processAllAvailable()
      mem.addData((1L, "widget", 17.0), (9L, "newone", 99.0))
      q.processAllAvailable()
      val versionsOf1 = store.where(col("k") === 1L)
        .collect().map(r => (r.getDouble(2), r.getDate(3), r.getDate(4))).toSet
      assert(versionsOf1 === Set(
        (10.0, d("2024-01-01"), d("2024-02-01")),
        (15.0, d("2024-02-01"), d("2024-03-01")),
        (17.0, d("2024-03-01"), null)))
      assert(store.where(col("k") === 9L).count() === 1)
      assert(store.where(col("k") === 2L && col("is_current")).count() === 1)
    } finally q.stop()
  }

  test("streaming DQ gate passes clean batches and fails dirty ones") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rules = Seq(
      graft.etl.DataQuality.InRange("value", 0.0, 100.0),
      graft.etl.DataQuality.Accepted("event_type", Seq("view", "purchase")))
    val gates = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean, Long)]
    val mem = MemoryStream[Ev]
    val q = StreamingOps.dqGateStream(mem.toDF(), rules,
      (verdicts, ok, id) => gates += ((id,
        ok, verdicts.agg(sum("violations")).as[Long].collect().head))).start()
    try {
      mem.addData(Ev(1L, ts("2024-01-01 10:00:00"), 1L, "view", 5.0))
      q.processAllAvailable()
      mem.addData(
        Ev(2L, ts("2024-01-01 10:01:00"), 1L, "view", 500.0), // range
        Ev(3L, ts("2024-01-01 10:02:00"), 1L, "error", 5.0)) // accepted
      q.processAllAvailable()
      assert(gates.map(g => (g._2, g._3)).toSeq === Seq((true, 0L), (false, 2L)))
    } finally q.stop()
  }

  test("streaming alert gate publishes iff a batch carries discrepancies") {
    implicit val sqlCtx = spark.sqlContext
    val d = java.sql.Date.valueOf("2024-01-02")
    def row(sku: String, disc: Long) =
      ReconRow(d, sku, s"name-$sku", 10L, 5L, 5L, 5L + disc, disc)
    val seen = scala.collection.mutable.ListBuffer.empty[(String, graft.etl.Alerts.AlertReport)]
    val sink = new graft.etl.Alerts.AlertSink {
      override def publish(subject: String, report: graft.etl.Alerts.AlertReport): Unit =
        seen += ((subject, report))
    }
    val mem = MemoryStream[ReconRow]
    val q = StreamingOps.alertStream(mem.toDF(), sink).start()
    try {
      mem.addData(row("A1", 0L), row("B2", 0L)) // clean batch → silence
      q.processAllAvailable()
      assert(seen.isEmpty)
      mem.addData(row("C3", 0L), row("D4", -7L)) // one mismatch → publish
      q.processAllAvailable()
      assert(seen.size === 1)
      val (_, report) = seen.head
      assert(report.count === 1L)
      assert(report.examples === Seq("- SKU: D4, Product: name-D4, Discrepancy: -7"))
      assert(report.message.contains("Total items with discrepancies: 1"))
    } finally q.stop()
  }

  test("streaming quantize ingest accumulates the exact one-pass int8 store") {
    implicit val sqlCtx = spark.sqlContext
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val all = Seq(
      Emb(0L, v(1, 0, -2, 0.5), 0), Emb(1L, v(0.9, 0.1, 0, 0), 0),
      Emb(2L, v(0, 0, 0, 0), 1), // zero vector → scale 0, zero qvec
      Emb(3L, v(-0.3, 0.7, 1.1, -0.2), 1), Emb(4L, v(127, -127, 64, 1), 2))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Seq[Int])]
    val mem = MemoryStream[Emb]
    val writer = StreamingOps.quantizeIngestStream(
      mem.toDF().select("vec_id", "embedding"),
      (st, _) => got ++= st.collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getAs[scala.collection.Seq[Int]](2).toSeq)))
    val q = writer.start()
    try {
      mem.addData(all.take(2): _*); q.processAllAvailable()
      mem.addData(all.drop(2): _*); q.processAllAvailable()
      val onePass = graft.ext.Similarity
        .quantizeEmbeddings(all.toDF().select("vec_id", "embedding"))
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          r.getAs[scala.collection.Seq[Int]](2).toSeq)).toSet
      // Quantization is pure per-vector: two micro-batches accumulate
      // exactly the one-pass store, scale and qvec bit-identical.
      assert(got.toSet === onePass)
      assert(got.size === all.size)
    } finally q.stop()
  }

  test("streaming rolling features match the batch window once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = StreamingOps.rollingFeaturesStream(mem.toDF())
      .writeStream.format("memory").queryName("roll_out")
      .outputMode("append").start()
    try {
      val evs = Seq(
        Ev(1L, ts("2024-01-01 10:00:00"), 1L, "view", 10.00),
        Ev(2L, ts("2024-01-01 10:30:00"), 1L, "click", 20.00),
        Ev(3L, ts("2024-01-01 11:00:00"), 1L, "purchase", 30.00), // frame = 1,2,3
        Ev(4L, ts("2024-01-01 11:30:01"), 1L, "purchase", 5.00), // 10:30:01+ → 2,3,4
        Ev(5L, ts("2024-01-01 10:59:00"), 2L, "purchase", 1.25)) // own frame only
      // Batch 1 keeps the watermark low; batch 2 arrives OUT OF ORDER;
      // sentinels push the watermark past every purchase and fire the
      // re-armed timeout.
      mem.addData(evs(0), evs(4)); q.processAllAvailable()
      mem.addData(evs(3), evs(1), evs(2)); q.processAllAvailable()
      mem.addData(Ev(99L, ts("2024-01-02 12:00:00"), 999L, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Ev(100L, ts("2024-01-02 13:00:00"), 999L, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("roll_out")
        .select("event_id", "user_id", "ts", "n_1h", "sum_1h")
        .orderBy("event_id").collect()
      val batched = graft.ext.Events.rollingFeatures(evs.toDF())
        .orderBy("event_id").collect()
      assert(streamed.toSeq === batched.toSeq)
      assert(streamed.length === 3)
    } finally q.stop()
  }

  test("streaming attribution matches the batch as-of join once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.attributionStream(mem.toDF())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      val evs = Seq(
        Ev(1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
        Ev(2L, ts("2024-01-01 10:30:00"), 1L, "purchase", 5.0),
        Ev(3L, ts("2024-01-01 10:20:00"), 1L, "view", 0.0),
        Ev(4L, ts("2024-01-01 09:00:00"), 2L, "purchase", 7.0), // no view
        Ev(5L, ts("2024-01-01 10:30:00"), 1L, "view", 0.0),    // tie with purchase 2
        Ev(6L, ts("2024-01-01 11:00:00"), 1L, "purchase", 9.0))
      // Batch 1 keeps the watermark low so batch 2's rows are not late;
      // batch 2 arrives OUT OF EVENT-TIME ORDER; the sentinel pushes the
      // watermark past every real event so all purchases finalize.
      mem.addData(evs(3), evs(0)); q.processAllAvailable()
      mem.addData(evs(5), evs(2), evs(1), evs(4)); q.processAllAvailable()
      mem.addData(Ev(99L, ts("2024-01-02 12:00:00"), 999L, "view", 0.0))
      q.processAllAvailable()
      // One more batch so the timeout fires after the watermark update.
      mem.addData(Ev(100L, ts("2024-01-02 13:00:00"), 999L, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("attr_out").orderBy("event_id").collect()

      val df = evs.toDF()
      val purchases = df.where($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"value".as("purchase_value"))
      val views = df.where($"event_type" === "view")
        .groupBy($"user_id", $"ts".as("vts")).agg(max($"event_id").as("view_id"))
        .withColumn("view_ts", $"vts")
      val batched = graft.ext.AsOfJoin
        .asOf(purchases, views, "user_id", "ts", "vts", Seq("view_id", "view_ts"))
        .orderBy("event_id").collect()

      assert(streamed.toSeq === batched.toSeq)
      assert(streamed.length === 3)
      // tie view (id 5, ts 10:30) wins for purchase 2; carried for purchase 6
      assert(streamed(0).getLong(4) === 5L)
      assert(streamed(2).getLong(4) === 5L)
      assert(streamed(1).isNullAt(4)) // user 2 purchase has no view
    } finally q.stop()
  }

  test("streaming attribution with tolerance matches batch asOfTolerance") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // 20-minute TTL: purchase 2 (10:30) may match views >= 10:10 —
    // view 5 at 10:30 qualifies; purchase 6 (11:00) reaches back to
    // 10:40, so view 5 is STALE for it and it must emit unmatched.
    val q = StreamingOps.attributionStream(mem.toDF(), toleranceSec = Some(20 * 60))
      .writeStream.format("memory").queryName("attr_tol_out")
      .outputMode("append").start()
    try {
      val evs = Seq(
        Ev(1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
        Ev(2L, ts("2024-01-01 10:30:00"), 1L, "purchase", 5.0),
        Ev(3L, ts("2024-01-01 10:20:00"), 1L, "view", 0.0),
        Ev(4L, ts("2024-01-01 09:00:00"), 2L, "purchase", 7.0), // no view
        Ev(5L, ts("2024-01-01 10:30:00"), 1L, "view", 0.0),    // tie with purchase 2
        Ev(6L, ts("2024-01-01 11:00:00"), 1L, "purchase", 9.0)) // stale-only views
      mem.addData(evs(3), evs(0)); q.processAllAvailable()
      mem.addData(evs(5), evs(2), evs(1), evs(4)); q.processAllAvailable()
      mem.addData(Ev(99L, ts("2024-01-02 12:00:00"), 999L, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Ev(100L, ts("2024-01-02 13:00:00"), 999L, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("attr_tol_out").orderBy("event_id").collect()

      val df = evs.toDF()
      val purchases = df.where($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"value".as("purchase_value"))
      val views = df.where($"event_type" === "view")
        .groupBy($"user_id", $"ts".as("vts")).agg(max($"event_id").as("view_id"))
        .withColumn("view_ts", $"vts")
      val batched = graft.ext.AsOfJoin
        .asOfTolerance(purchases, views, "user_id", "ts", "vts",
          Seq("view_id", "view_ts"), toleranceSec = 20 * 60)
        .orderBy("event_id").collect()

      assert(streamed.toSeq === batched.toSeq)
      assert(streamed.length === 3)
      assert(streamed(0).getLong(4) === 5L) // fresh tie view matches p2
      assert(streamed(1).isNullAt(4))       // user 2: no view at all
      assert(streamed(2).isNullAt(4))       // p6: only stale views → null
    } finally q.stop()
  }

  test("streaming conversion anchors: permuted cuts merge to the one-shot report") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // u1 converts (90 s), u2 views only, u3 purchased before any view,
    // u4 instant. The view/purchase of u1 land in DIFFERENT batches in
    // reverse order — the column-wise min merge must still converge.
    val evs = Seq(
      Ev(1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      Ev(2L, ts("2024-01-01 10:01:30"), 1L, "purchase", 5.0),
      Ev(3L, ts("2024-01-01 10:00:00"), 2L, "view", 0.0),
      Ev(4L, ts("2024-01-01 09:00:00"), 3L, "purchase", 7.0),
      Ev(5L, ts("2024-01-01 10:00:00"), 3L, "view", 0.0),
      Ev(6L, ts("2024-01-01 12:00:00"), 4L, "view", 0.0),
      Ev(7L, ts("2024-01-01 12:00:00"), 4L, "purchase", 1.0))
    var store = Seq.empty[(Long, Timestamp, Timestamp)]
      .toDF("user_id", "first_view", "first_purchase")
    val mem = MemoryStream[Ev]
    val writer = StreamingOps.convertIngestStream(
      mem.toDF(),
      (partial, _) => store = StreamingOps
        .mergeConvertStore(store, partial).localCheckpoint())
    val q = writer.start()
    try {
      mem.addData(evs(1), evs(4), evs(6)); q.processAllAvailable()
      mem.addData(evs(0), evs(2), evs(3), evs(5)); q.processAllAvailable()
      val streamed = graft.ext.Events.convertFromPartials(store)
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      val oneShot = graft.ext.Events.timeToConvert(evs.toDF())
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(streamed === oneShot)
      assert(streamed.map(r => (r._1, r._4)) === Set((1L, 90L), (4L, 0L)))
    } finally q.stop()
  }

  test("native stream-stream interval join matches the batch join, out-of-order") {
    implicit val sqlCtx = spark.sqlContext
    // u1: two views inside the 1h window of its purchase (both pairs
    // emit), one view after the purchase (excluded). u2: view exactly
    // AT the window boundary (inclusive). u3: view 61m before the
    // purchase (outside). u4: purchase with no view. Delivery is split
    // across batches with the purchase arriving BEFORE its views.
    val evs = Seq(
      Ev(1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      Ev(2L, ts("2024-01-01 10:30:00"), 1L, "view", 0.0),
      Ev(3L, ts("2024-01-01 10:45:00"), 1L, "purchase", 9.0),
      Ev(4L, ts("2024-01-01 11:00:00"), 1L, "view", 0.0),
      Ev(5L, ts("2024-01-01 09:00:00"), 2L, "view", 0.0),
      Ev(6L, ts("2024-01-01 10:00:00"), 2L, "purchase", 5.0),
      Ev(7L, ts("2024-01-01 09:59:00"), 3L, "view", 0.0),
      Ev(8L, ts("2024-01-01 11:00:00"), 3L, "purchase", 7.0),
      Ev(9L, ts("2024-01-01 12:00:00"), 4L, "purchase", 1.0))
    val mem = MemoryStream[Ev]
    val q = StreamingOps.viewPurchaseJoinStream(mem.toDF())
      .writeStream.format("memory").queryName("ssjoin_out")
      .outputMode("append").start()
    try {
      mem.addData(evs(2), evs(5), evs(7), evs(8)) // purchases first
      q.processAllAvailable()
      mem.addData(evs(0), evs(1), evs(3), evs(4), evs(6))
      q.processAllAvailable()
      val streamed = spark.table("ssjoin_out")
        .select("event_id", "view_id").as[(Long, Long)].collect().toSet
      // Batch equivalent: same inner join on the static frame.
      val df = evs.toDF()
      val v = df.where($"event_type" === "view")
        .select($"event_id".as("view_id"), $"ts".as("view_ts"),
          $"user_id".as("view_user"))
      val p = df.where($"event_type" === "purchase")
        .select($"event_id", $"ts", $"user_id")
      val batched = p.join(v, $"view_user" === $"user_id" &&
          $"view_ts" <= $"ts" &&
          $"view_ts" >= $"ts" - org.apache.spark.sql.functions.expr("INTERVAL 3600 SECOND"))
        .select("event_id", "view_id").as[(Long, Long)].collect().toSet
      assert(streamed === batched)
      assert(streamed === Set((3L, 1L), (3L, 2L), (6L, 5L)))
    } finally q.stop()
  }

  test("late data past the watermark is DROPPED and ACCOUNTED, not silently merged") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.hourlyRollupStream(mem.toDF())
      .writeStream.format("memory").queryName("late_out")
      .outputMode("update").start()
    try {
      // Advance the watermark to 11:30 (12:00 − 30m lateness).
      mem.addData(Ev(1L, ts("2024-01-01 12:00:00"), 1L, "view", 1.0))
      q.processAllAvailable()
      // 09:00 is hopelessly late → dropped, and the drop must be
      // VISIBLE in the progress metrics (the ops contract: silent loss
      // is unacceptable on a 100 TB/day feed — this metric is what a
      // monitor alerts on).
      mem.addData(Ev(2L, ts("2024-01-01 09:00:00"), 1L, "view", 5.0))
      q.processAllAvailable()
      val hours = spark.table("late_out")
        .select("hour_start").as[Timestamp].collect().map(_.toString).toSet
      assert(hours.forall(_.startsWith("2024-01-01 12")), s"late row leaked: $hours")
      val dropped = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped === 1L, s"expected 1 accounted drop, metrics said $dropped")
    } finally q.stop()
  }

  test("IdempotentSink: a replayed batchId is a no-op for addition merges") {
    import org.apache.spark.sql.DataFrame
    var store = Seq.empty[(String, Long)].toDF("k", "v")
    val sink = new StreamingOps.IdempotentSink((partial: DataFrame, _: Long) =>
      store = StreamingOps.mergeRollup(store, partial, Seq("k"), "v")
        .localCheckpoint())
    val b0 = Seq(("a", 2L), ("b", 3L)).toDF("k", "v")
    val b1 = Seq(("a", 5L)).toDF("k", "v")
    sink(b0, 0L); sink(b1, 1L)
    sink(b0, 0L) // crash-replay of batch 0 — must not double-count
    val got = store.as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 7L, "b" -> 3L))
    assert(sink.appliedBatches === Set(0L, 1L))
    // Without the ledger the same replay WOULD corrupt the store.
    var naive = Seq.empty[(String, Long)].toDF("k", "v")
    def rawSink(partial: DataFrame): Unit =
      naive = StreamingOps.mergeRollup(naive, partial, Seq("k"), "v")
        .localCheckpoint()
    rawSink(b0); rawSink(b1); rawSink(b0)
    assert(naive.as[(String, Long)].collect().toMap === Map("a" -> 9L, "b" -> 6L))
  }

  test("streaming multi-touch credits match the batch operator and conserve 1e6") {
    implicit val sqlCtx = spark.sqlContext
    // user 1: three in-window views (333333+333333+333334); user 2: one
    // boundary view; user 3: view outside the window (no rows).
    val evs = Seq(
      Ev(1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      Ev(2L, ts("2024-01-01 10:10:00"), 1L, "view", 0.0),
      Ev(3L, ts("2024-01-01 10:20:00"), 1L, "view", 0.0),
      Ev(4L, ts("2024-01-01 10:30:00"), 1L, "purchase", 9.0),
      Ev(5L, ts("2024-01-01 09:00:00"), 2L, "view", 0.0),
      Ev(6L, ts("2024-01-01 10:00:00"), 2L, "purchase", 5.0),
      Ev(7L, ts("2024-01-01 08:00:00"), 3L, "view", 0.0),
      Ev(8L, ts("2024-01-01 10:00:00"), 3L, "purchase", 7.0))
    val mem = MemoryStream[Ev]
    val q = StreamingOps.multiTouchStream(mem.toDF())
      .writeStream.format("memory").queryName("mtouch_out")
      .outputMode("append").start()
    try {
      // One batch, scrambled: purchases listed before their views —
      // in-batch disorder is the out-of-order case the state must
      // absorb (cross-batch, views behind an already-advanced watermark
      // would be DROPPED AS LATE, by design — that is watermark
      // semantics, not an operator property to test around).
      mem.addData(evs(3), evs(5), evs(7), evs(0), evs(1), evs(2), evs(4), evs(6))
      q.processAllAvailable()
      // Advance the watermark decisively past every purchase.
      mem.addData(Ev(99L, ts("2024-01-01 12:00:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Ev(100L, ts("2024-01-01 13:00:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("mtouch_out")
        .select("event_id", "view_id", "credit_ppm")
        .as[(Long, Long, Long)].collect().toSet
      val batched = graft.ext.Events.multiTouchAttribution(evs.toDF())
        .select("event_id", "view_id", "credit_ppm")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed === batched)
      assert(streamed === Set(
        (4L, 1L, 333333L), (4L, 2L, 333333L), (4L, 3L, 333334L),
        (6L, 5L, 1000000L)))
    } finally q.stop()
  }

  test("left-outer stream-stream join emits viewless purchases after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    // u1 purchase with a view in-window (matches); u2 purchase with no
    // view at all. The outer row for u2 may only emit once the
    // watermark proves no view can still arrive — advanced by a late
    // sentinel event far in the future.
    val evs = Seq(
      Ev(1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      Ev(2L, ts("2024-01-01 10:30:00"), 1L, "purchase", 9.0),
      Ev(3L, ts("2024-01-01 10:40:00"), 2L, "purchase", 5.0))
    val mem = MemoryStream[Ev]
    val q = StreamingOps.viewPurchaseJoinStream(mem.toDF(),
        joinType = "left_outer")
      .writeStream.format("memory").queryName("ssouter_out")
      .outputMode("append").start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      // Watermark still at 10:40 − 30m: only the inner match is out.
      val early = spark.table("ssouter_out")
        .select("event_id").as[Long].collect().toSet
      assert(early === Set(2L))
      // Push the GLOBAL watermark (min across both sides) past
      // 10:40 + 1h window + 30m lateness: sentinels on BOTH streams,
      // distinct users so they never join each other.
      mem.addData(
        Ev(98L, ts("2024-01-01 14:00:00"), 8L, "view", 0.0),
        Ev(99L, ts("2024-01-01 14:00:00"), 9L, "purchase", 0.0))
      q.processAllAvailable()
      mem.addData(
        Ev(100L, ts("2024-01-01 15:00:00"), 8L, "view", 0.0),
        Ev(101L, ts("2024-01-01 15:00:00"), 9L, "purchase", 0.0))
      q.processAllAvailable()
      val out = spark.table("ssouter_out")
        .where(col("user_id") <= 2L) // drop watermark sentinels
        .select("event_id", "view_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet
      assert(out === Set((2L, Some(1L)), (3L, None)))
    } finally q.stop()
  }

  test("view-only user state self-evicts once the watermark passes its window") {
    // Regression: a user whose LAST events are views used to pin its
    // buffer in the state store forever (no timeout was armed unless a
    // purchase was pending), breaking the O((lateness+window)×rate)
    // state bound. Eviction must be watermark-driven, not
    // arrival-driven — assert via the state-operator row count.
    implicit val sqlCtx = spark.sqlContext
    def evictedRows(mk: DataFrame => org.apache.spark.sql.streaming.DataStreamWriter[_],
        name: String): Long = {
      val mem = MemoryStream[Ev]
      val q = mk(mem.toDF()).queryName(name).start()
      try {
        // User 1 only ever views — nothing will ever emit for it.
        mem.addData(Ev(1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0))
        q.processAllAvailable()
        // Far-future sentinels (distinct user) march the watermark days
        // past 10:00 + window + lateness; the armed timeout must fire
        // and clear user 1. Two extra batches: one to advance the
        // watermark, one for the timeout to run against it.
        Seq("12:00:00", "13:00:00", "14:00:00").foreach { t =>
          mem.addData(Ev(99L, ts(s"2024-01-05 $t"), 999L, "view", 0.0))
          q.processAllAvailable()
        }
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      } finally q.stop()
    }
    // Only the still-live sentinel key may remain in each store.
    assert(evictedRows(df => StreamingOps.multiTouchStream(df)
      .writeStream.format("memory").outputMode("append"), "mt_evict") === 1L)
    assert(evictedRows(df => StreamingOps.rollingFeaturesStream(df)
      .writeStream.format("memory").outputMode("append"), "roll_evict") === 1L)
    assert(evictedRows(df => StreamingOps.attributionStream(df,
        toleranceSec = Some(20 * 60))
      .writeStream.format("memory").outputMode("append"), "attr_tol_evict") === 1L)
    // WITHOUT a tolerance the newest view legitimately lives forever
    // (it matches any future purchase): 2 keys is the designed bound.
    assert(evictedRows(df => StreamingOps.attributionStream(df)
      .writeStream.format("memory").outputMode("append"), "attr_evict") === 2L)
  }

  test("no-tolerance attribution collapses a view-rich final batch to one view") {
    // ADVICE r9: a key whose FINAL batch carries several at-or-after-
    // watermark views and no pending purchase used to arm no timeout,
    // so the whole view buffer persisted instead of settling to the
    // single dominant view. The one-shot collapse timeout must shrink
    // the buffer to exactly one view with no further arrivals for the
    // key. numRowsTotal cannot see inside the buffer — read the state
    // store itself from the checkpoint.
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("attr_collapse").toString
    val mem = MemoryStream[Ev]
    val q = StreamingOps.attributionStream(mem.toDF())
      .writeStream.format("memory").outputMode("append")
      .option("checkpointLocation", ckpt).queryName("attr_collapse").start()
    try {
      // User 1's ONLY batch: three views, no purchase — then silence.
      mem.addData(
        Ev(1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
        Ev(2L, ts("2024-01-01 10:05:00"), 1L, "view", 0.0),
        Ev(3L, ts("2024-01-01 10:10:00"), 1L, "view", 0.0))
      q.processAllAvailable()
      // Sentinels (other key) march the watermark past 10:10 and give
      // the armed collapse timeout a batch to fire in.
      Seq("12:00:00", "13:00:00", "14:00:00").foreach { t =>
        mem.addData(Ev(99L, ts(s"2024-01-05 $t"), 999L, "view", 0.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    val buf = spark.read.format("statestore").load(ckpt)
      .selectExpr("key.value AS user_id",
        "size(value.groupState.views) AS n_views")
      .where(col("user_id") === 1L)
      .select("n_views").collect().map(_.getInt(0)).toSeq
    assert(buf === Seq(1),
      s"user 1's buffer should have collapsed to its newest view, got $buf")
  }
}
