package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row of [[StreamingOps.attributionStream]] (top-level so Spark
  * derives the Encoder without an outer scope).
  */
case class AsOfEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Buffered view candidate / not-yet-final purchase, and the per-user
  * state both live in.
  */
case class AsOfView(view_id: Long, view_ts: Timestamp)
case class AsOfPending(event_id: Long, ts: Timestamp, purchase_value: Double)
case class AsOfBuf(views: Seq[AsOfView], pending: Seq[AsOfPending])

/** Output row — the streaming twin of the batch `event_attribution`
  * columns.
  */
case class Attribution(event_id: Long, user_id: Long, ts: Timestamp,
    purchase_value: Double, view_id: Option[Long], view_ts: Option[Timestamp])

/** Output row of [[StreamingOps.multiTouchStream]] — the streaming twin
  * of the batch `multi_touch` columns plus the view timestamp.
  */
case class TouchCredit(event_id: Long, user_id: Long, ts: Timestamp,
    view_id: Long, view_ts: Timestamp, credit_ppm: Long)

/** Input / state / output rows of [[StreamingOps.rollingFeaturesStream]]
  * (top-level for Encoder derivation, like the AsOf* family).
  */
case class RollEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, cents: Long)
case class RollEv(ts: Timestamp, cents: Long)
case class RollPending(event_id: Long, ts: Timestamp)
case class RollBuf(events: Seq[RollEv], pending: Seq[RollPending])
case class RollFeature(event_id: Long, user_id: Long, ts: Timestamp,
    n_1h: Long, sum_1h: Double)

/** Structured Streaming forms of the event operators (SURVEY.md §2.11
  * X6 + the north-star streaming surface). The reference is batch-only —
  * its freshness model is per-date re-runs (dags/retail_pipeline_dag
  * .py:19,35) — so these are the additive streaming counterparts of
  * `graft.ext.Events`: the SAME transformations expressed over an
  * unbounded source, sharing semantics with the batch forms (asserted in
  * tests against `Events.hourlyRollup`).
  *
  * Scale notes: both are keyed stateful aggregations — state is
  * partitioned by (window, event_type) / (user_id, session_window) across
  * executors, bounded by the watermark which lets Spark drop state for
  * windows older than the lateness bound. Output mode `update`/`append`
  * works against any sink; checkpointing gives exactly-once.
  */
object StreamingOps {

  /** Tumbling 1-hour rollup by event type over a stream, 30-minute
    * watermark for late data. Streaming twin of `Events.hourlyRollup`.
    */
  def hourlyRollupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** SLIDING-window trending counts — the streaming twin of
    * [[graft.ext.Events.slidingCounts]]: overlapping 1h windows every
    * 15min, so a burst straddling a tumbling boundary still surfaces.
    * State is (windows-in-flight × types) — the watermark closes
    * windows older than the lateness bound, exactly as for the
    * tumbling rollup, just with dur/slide× more live windows.
    */
  def trendingStream(events: DataFrame, windowDur: String = "1 hour",
      slide: String = "15 minutes", lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowDur, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Streaming exact dedup — the X1 twin for unbounded sources: an
    * at-least-once stream becomes effectively-once by key.
    * `dropDuplicatesWithinWatermark` keeps per-key state only until the
    * watermark passes the key's first-seen event time, so state is
    * bounded by (arrival rate × lateness bound) instead of growing with
    * the stream — the property that makes exact dedup viable on an
    * unbounded 100 TB/day feed where batch X1 would need the full
    * history.
    */
  def dedupStream(events: DataFrame, keys: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark(keys)

  /** Session aggregation via the native `session_window` (6h gap to
    * mirror `Events.SessionGapSeconds`): sessions close when no event
    * arrives within the gap; the watermark bounds session state.
    * Streaming twin of `Events.sessionize`.
    */
  def sessionizeStream(events: DataFrame, gap: String = "6 hours"): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        round(sum("value"), 4).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("n_purchases"),
        col("sum_value"))

  /** Streaming twin of the batch as-of join (`ext.AsOfJoin` /
    * `event_attribution`): attribute each purchase to the same user's
    * most recent view at or before it, over an unbounded out-of-order
    * stream. This is a temporal join, which Structured Streaming has no
    * native operator for — so it is custom keyed state
    * (`flatMapGroupsWithState`, event-time timeout):
    *
    *  - a purchase is FINAL only once the watermark passes its event
    *    time (no earlier view can still arrive), at which point it is
    *    emitted exactly once with its match — append-mode, arrival-order
    *    independent;
    *  - per-user state is BOUNDED: views the watermark has passed are
    *    evicted except the single newest one (any still-pending purchase
    *    has ts ≥ watermark ≥ every old view, so the newest old view
    *    dominates the evicted ones for every future decision), plus
    *    whatever sits inside the lateness window — state is O(lateness ×
    *    rate), never O(history);
    *  - the event-time timeout re-arms while purchases are pending, so
    *    finalization happens when the WATERMARK advances, with or
    *    without new data for that user.
    *
    * `toleranceSec` (the batch `AsOfJoin.asOfTolerance` twin) discards a
    * match older than the tolerance — and TIGHTENS the state bound:
    * a view older than `watermark − tolerance` can no longer match any
    * unfinalized purchase (all sit at-or-after the watermark), so even
    * the carried newest-passed view evicts once it ages out. State drops
    * from O(lateness × rate) + 1 carried view to a hard
    * O((lateness + tolerance) × rate) window with no carried remnant.
    */
  def attributionStream(events: DataFrame, lateness: String = "30 minutes",
      toleranceSec: Option[Long] = None): Dataset[Attribution] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .where(col("event_type").isin("view", "purchase"))
      .withWatermark("ts", lateness)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[AsOfEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        attributeUser(toleranceSec.map(_ * 1000000L)))
  }

  /** NATIVE stream-stream interval join — the Structured Streaming twin
    * of [[graft.ext.RangeJoin.pointInInterval]]'s semantics restricted
    * to the conversion window: every (purchase ⋈ view) pair of the same
    * user with the view inside `[purchase − windowSeconds, purchase]`.
    * Unlike [[attributionStream]] (custom state picking ONE latest
    * view), this emits ALL qualifying pairs through Spark's built-in
    * stream-stream inner join: both sides carry a watermark and the
    * join condition is an equi key (user) PLUS an event-time range, so
    * the state store holds only rows inside `lateness + windowSeconds`
    * of the watermark — Spark derives the state eviction bound from the
    * range predicate itself. At 100 TB/day this is the scalable shape:
    * state is O((lateness + window) × rate) per side, partitioned by
    * user across executors, with no custom state code to get wrong.
    *
    * The range predicate must reference the two watermarked time
    * columns directly (an `unix_micros` rewrite would defeat the
    * constraint detection), hence the INTERVAL literal arithmetic.
    */
  /** `joinType` "inner" (default) emits matched pairs as they meet;
    * "left_outer" ALSO emits a null-extended row for every purchase the
    * watermark has proven viewless — the streaming census of
    * unattributed conversions. Outer rows can only emit once the
    * watermark passes `purchase_ts + window` (before that a matching
    * view could still arrive), so they trail the event time by
    * `lateness + window` — the price of a correct outer result on an
    * unbounded stream.
    */
  def viewPurchaseJoinStream(events: DataFrame, windowSeconds: Long = 3600L,
      lateness: String = "30 minutes", joinType: String = "inner"): DataFrame = {
    val views = events.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
        col("user_id").as("view_user"))
      .withWatermark("view_ts", lateness)
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("value").as("purchase_value"))
      .withWatermark("ts", lateness)
    purchases.join(views,
      col("view_user") === col("user_id") &&
        col("view_ts") <= col("ts") &&
        col("view_ts") >= col("ts") - expr(s"INTERVAL $windowSeconds SECOND"),
      joinType)
      .select("event_id", "user_id", "ts", "purchase_value", "view_id", "view_ts")
  }

  /** Streaming POINT-IN-TIME rolling features — the stateful twin of
    * [[graft.ext.Events.rollingFeatures]]: per purchase (label) event,
    * the user's preceding-hour activity (count + exact integer-cents
    * sum), emitted exactly once when the WATERMARK passes the purchase —
    * at which point every in-order event of its frame has arrived, so
    * the streamed features equal the batch window's (asserted in
    * StreamingOpsSpec over out-of-order arrivals).
    *
    * State per user is the [[attributionStream]] discipline: buffered
    * events evict once `ts + window < watermark` (they can no longer
    * fall in any unfinalized purchase's frame, since pending purchases
    * all sit at-or-after the watermark) — O(window × rate), never
    * O(history); the event-time timeout re-arms while purchases are
    * pending so finalization rides the watermark, with or without new
    * data for the user. Frame arithmetic is integer MICROseconds
    * (timestamps carry sub-millisecond components; `getTime` alone
    * would misplace frame-boundary events), matching the batch
    * `rangeBetween` frame exactly.
    */
  def rollingFeaturesStream(events: DataFrame,
      lateness: String = "30 minutes",
      windowSeconds: Long = 3600L): Dataset[RollFeature] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", lateness)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[RollEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        rollUser(windowSeconds * 1000000L))
  }

  /** Streaming incremental near-dup dedup: every micro-batch of arriving
    * documents is deduped against the existing corpus's signature store
    * AND within itself by the batch operator
    * [[graft.ext.Dedup.nearDupIncremental]], via `foreachBatch` — the
    * idiomatic Structured Streaming shape for "run a relational batch
    * pipeline per micro-batch, then commit side effects".
    *
    * `existingDocs` is a THUNK re-evaluated per batch so the caller's
    * `sink` can append each processed batch's documents/signatures to the
    * store and the next batch dedupes against the grown corpus — with
    * that contract, the SET of detected duplicates is independent of how
    * the stream is cut into batches (asserted in StreamingOpsSpec). The
    * emitted pairs carry BOTH id orders — doc_match may be a store doc
    * with a LARGER id than the arrival — so a sink that wants the
    * canonical min-id survivor re-elects from the pairs themselves;
    * [[corpusIngestStream]] does exactly that (demotion rows), making
    * its manifest batch-cut invariant even for out-of-id-order arrivals. At scale the store read is a
    * band_val-partitioned parquet/bucketed table, so each batch's probe
    * is a partition-pruned lookup, cost O(batch + collisions) — the
    * unbounded-feed form of dedup where any full-corpus re-pairing would
    * be O(history) per batch.
    *
    * Returns the configured writer; callers `.start()` it (and own
    * checkpointing for exactly-once).
    */
  def incrementalDedupStream(incoming: DataFrame,
      existingDocs: () => DataFrame,
      sink: (DataFrame, Long) => Unit,
      threshold: Double = 0.5): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.ext.Dedup.nearDupIncremental(existingDocs(), batch, threshold),
          batchId)
      }

  /** Streaming corpus INGEST — the end-to-end prep gate run per arriving
    * micro-batch of documents, composing the batch operators the way a
    * production feed would: quality-filter the batch
    * ([[graft.ext.Corpus.qualityFilter]]), dedupe only the quality
    * keepers against the existing corpus and within the batch
    * ([[graft.ext.Dedup.nearDupIncremental]] — drop-then-dedup, so
    * rejected docs never pay signature cost), and hand the sink one
    * MANIFEST row per document (doc_id, reasons, keep) — the streaming
    * twin of the batch `corpus_manifest`, with the SAME reason
    * vocabulary: content-key collisions are reported `exact_dup`
    * (usually alongside `near_dup`, since an exact copy is also a
    * Jaccard-1 near-dup — exactly how the batch manifest flags them),
    * near-only matches just `near_dup`.
    *
    * SURVIVOR ELECTION is batch-cut invariant, including out-of-id-order
    * arrivals: the drop rule is "a document is a duplicate iff a similar
    * document with a SMALLER doc_id exists anywhere in the stream" — a
    * pure function of the document SET, so any cut of the stream into
    * batches converges to the same manifest (StreamingOpsSpec asserts
    * identical manifests under permuted cuts with non-monotone ids).
    * Mechanically: an incoming doc only loses to smaller-id matches
    * (store or batch), and when an incoming doc UNDERCUTS a store doc
    * (matches it with a smaller id) the manifest emits a DEMOTION row
    * for the store doc — (doc_id, reasons, keep = false) — letting the
    * sink re-elect the canonical min-id survivor it had previously
    * admitted. Within one batch the same rule applies pairwise, so a
    * batch of two copies keeps exactly the smaller id.
    *
    * The caller's `sink` owns committing processed documents (and their
    * signatures) to the store; `existingDocs` is the per-batch re-read of
    * that store, exactly the [[incrementalDedupStream]] contract. For
    * full cut invariance the sink must commit EVERY quality-keeper's
    * signatures — kept, dropped and demoted alike (the signature store
    * covers the corpus, exactly like the batch store; a dropped doc can
    * still be the smaller-id witness that drops a later arrival).
    * Per-batch cost stays O(batch + collisions), never O(corpus).
    */
  def corpusIngestStream(incoming: DataFrame,
      existingDocs: () => DataFrame,
      sink: (DataFrame, Long) => Unit,
      threshold: Double = 0.5): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Materialized once per batch: the verdict table feeds BOTH the
        // manifest and (via `kept`) the dedup branch of the same action,
        // and Spark does not share subtrees across join branches — an
        // unmaterialized `q` would run the quality aggregates twice.
        val q = graft.ext.Corpus.qualityFilter(batch)
          .select(col("doc_id"), col("reasons"), col("keep"))
          .localCheckpoint()
        val kept = batch.join(q.where(col("keep")).select("doc_id"), "doc_id")
        val existing = existingDocs()
        // Exact-dup split (the batch manifest's `exact_dup` flag): a
        // keeper whose normalized-content key collides with the store or
        // with a smaller-id keeper in the same batch. Recomputed from
        // the doc store here like the incremental signatures; at rest
        // the content key is one more column of the signature store.
        def keyed(df: DataFrame) = df.select(col("doc_id"),
          graft.ext.Dedup.contentKey(col("text")).as("ck"))
        val kk = keyed(kept)
        val allKeys = keyed(existing).withColumn("is_new", lit(false))
          .unionByName(kk.withColumn("is_new", lit(true)))
        // All content-key collisions of batch keepers, BOTH id orders
        // (materialized once: the drop and demotion branches both read
        // it). A batch keeper DROPS iff some smaller-id doc shares its
        // key; a STORE doc is DEMOTED iff a smaller-id batch keeper
        // undercuts it (in-batch larger-side pairs need no demotion row
        // — the larger doc's own a-side row drops it).
        val exactPairs = kk.as("a")
          .join(allKeys.as("b"),
            col("a.ck") === col("b.ck") && col("a.doc_id") =!= col("b.doc_id"))
          .select(col("a.doc_id").as("doc_new"),
            col("b.doc_id").as("doc_match"), col("b.is_new"))
          .localCheckpoint()
        val exactIds = exactPairs.where(col("doc_match") < col("doc_new"))
          .select(col("doc_new").as("doc_id")).distinct()
          .withColumn("is_exact", lit(true))
        val demotedExact = exactPairs
          .where(!col("is_new") && col("doc_match") > col("doc_new"))
          .select(col("doc_match").as("doc_id"))
        // Near-dup pairs likewise feed both branches. nearDupIncremental
        // emits (doc_new ∈ batch, doc_match ∈ store at any id, or a
        // smaller in-batch id) — so doc_match > doc_new identifies
        // exactly the store docs an arrival undercuts.
        val dupPairs = graft.ext.Dedup
          .nearDupIncremental(existing, kept, threshold)
          .select("doc_new", "doc_match")
          .localCheckpoint()
        val dupIds = dupPairs.where(col("doc_match") < col("doc_new"))
          .select(col("doc_new").as("doc_id")).distinct()
          .withColumn("is_dup", lit(true))
        val demotedNear = dupPairs.where(col("doc_match") > col("doc_new"))
          .select(col("doc_match").as("doc_id"))
        // Demotion rows: keep = false with the dup flags that fired
        // (alphabetical concat yields the batch manifest's
        // "exact_dup,near_dup" for exact copies, which are also
        // Jaccard-1 near-dups).
        val demoted = demotedExact.withColumn("flag", lit("exact_dup"))
          .union(demotedNear.withColumn("flag", lit("near_dup")))
          .groupBy("doc_id")
          .agg(concat_ws(",", array_sort(collect_set(col("flag")))).as("reasons"))
          .select(col("doc_id"), col("reasons"), lit(false).as("keep"))
        val manifest = q.join(exactIds, Seq("doc_id"), "left")
          .join(dupIds, Seq("doc_id"), "left")
          .withColumn("reasons", concat_ws(",",
            when(col("reasons") =!= "", col("reasons")),
            when(col("is_exact").isNotNull, "exact_dup"),
            when(col("is_dup").isNotNull, "near_dup")))
          .select(col("doc_id"), col("reasons"),
            (col("reasons") === "").as("keep"))
          .unionByName(demoted)
        sink(manifest, batchId)
      }

  /** Streaming LSH-ANN ingest — maintain the
    * [[graft.ext.Similarity.lshSignatures]] store per arriving
    * micro-batch of embeddings, the vector-side twin of the minhash
    * signature maintenance in [[incrementalDedupStream]]. The bucket is
    * a pure per-vector function, so the store built batch-by-batch
    * equals the store built over the union in one pass (asserted in
    * StreamingOpsSpec) — and a [[graft.ext.Similarity.topKLsh]] probe
    * against the accumulated store never recomputes a signature. The
    * caller's `sink` owns the bucketed-by-`bkt` persisted layout.
    */
  def lshIngestStream(incoming: DataFrame,
      sink: (DataFrame, Long) => Unit,
      dim: Int = graft.ext.Similarity.EmbDim): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.ext.Similarity.lshSignatures(batch, dim), batchId)
      }

  /** Streaming QUANTIZED-store ingest — maintain the
    * [[graft.ext.Similarity.quantizeEmbeddings]] int8 store per arriving
    * micro-batch of embeddings, the third ingest-store twin beside
    * [[lshIngestStream]] and the minhash signature maintenance.
    * Quantization is a pure per-vector map (scale and qvec are functions
    * of the one vector), so the store built batch-by-batch equals the
    * store built over the union in one pass (asserted in
    * StreamingOpsSpec) — and a
    * [[graft.ext.Similarity.topKQuantized]] /
    * [[graft.ext.Similarity.topKIvfQuantized]] probe against the
    * accumulated store never re-quantizes a vector. The caller's `sink`
    * owns the persisted layout.
    */
  def quantizeIngestStream(incoming: DataFrame,
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.ext.Similarity.quantizeEmbeddings(batch), batchId)
      }

  /** Streaming KMV-sketch maintenance — per arriving micro-batch, the
    * batch's k-minimum-values distinct-count sketch
    * ([[graft.ext.Sketches.kmvSketch]]) handed to the caller's `sink`,
    * which folds it into the persisted sketch store with
    * [[graft.ext.Sketches.kmvMerge]] (union, keep k smallest). Merge is
    * associative + commutative, so ANY batch cut converges to the
    * one-shot sketch of the union (StreamingOpsSpec asserts two-batch
    * accumulation ≡ one pass) — the cardinality twin of the minhash /
    * LSH / quantized ingest stores: estimates at any moment read the
    * ≤ k-row-per-group store, never the stream's history.
    */
  def kmvIngestStream(incoming: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Int,
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.ext.Sketches.kmvSketch(batch, groupCols, valueCol, k), batchId)
      }

  /** Streaming span-store maintenance — per arriving micro-batch of
    * documents, the batch's (h, n_docs) span-occurrence summary
    * ([[graft.ext.Corpus.spanCounts]]) handed to the caller's `sink`,
    * which folds it with [[graft.ext.Corpus.spanStoreMerge]]. Under the
    * document-atomic ingest contract (a doc arrives whole in one batch)
    * counts merge by addition, so any batch cut equals the one-shot
    * summary — the repeated-span twin of [[cmsIngestStream]]'s frequency
    * store: boilerplate checks (`n_docs ≥ 2`) and new-doc scoring read
    * the store, never the stream's history.
    */
  def spanIngestStream(incoming: DataFrame,
      k: Int = graft.ext.Corpus.DecontamShingle,
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.ext.Corpus.spanCounts(batch, k), batchId)
      }

  /** Streaming conversion-anchor maintenance — per arriving micro-batch
    * of events, the batch's per-user first-view/first-purchase partials
    * ([[graft.ext.Events.convertPartials]]) handed to the caller's
    * `sink`, which folds them into the persisted anchor store with
    * [[mergeConvertStore]]. Conditional MINS are associative +
    * commutative, so any batch cut — including out-of-order arrival —
    * converges to the one-shot aggregate; the latency report at any
    * moment is [[graft.ext.Events.convertFromPartials]] over the
    * user-scale store, never a replay of the event history. Per-user
    * state is two timestamps — O(users), no window retention at all.
    */
  def convertIngestStream(incoming: DataFrame,
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.ext.Events.convertPartials(batch), batchId)
      }

  /** Fold a batch's anchor partials into the store — column-wise min on
    * the user key (min ignores nulls, so a user seen only as a viewer
    * merges cleanly with a later purchase-only partial).
    */
  def mergeConvertStore(store: DataFrame, partial: DataFrame): DataFrame =
    store.unionByName(partial)
      .groupBy("user_id")
      .agg(min("first_view").as("first_view"),
        min("first_purchase").as("first_purchase"))

  /** Streaming count-min maintenance — per arriving micro-batch, the
    * batch's d×w counter table ([[graft.ext.Sketches.cmsSketch]])
    * handed to the caller's `sink`, which folds it into the persisted
    * counter store with [[graft.ext.Sketches.cmsMerge]]. Counters are
    * SUMS, so merge is associative + commutative and any batch cut is
    * bit-identical to the one-shot sketch — the frequency twin of
    * [[kmvIngestStream]]'s cardinality store; estimates at any moment
    * point-query the ≤ d·w-row store, never the stream's history.
    */
  def cmsIngestStream(incoming: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 4096,
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.ext.Sketches.cmsSketch(batch, valueCol, depth, width), batchId)
      }

  /** Streaming histogram maintenance — per arriving micro-batch, the
    * batch's (groupCols…, bucket, n) equi-width cents histogram
    * ([[graft.ext.Stats.histogramOf]]) handed to the caller's `sink`,
    * which folds it into the persisted store with [[mergeRollup]] on
    * the (groupCols…, bucket) key. Bucket counts are SUMS, so the
    * merge is associative + commutative and any batch cut is
    * bit-identical to the one-shot histogram; quantile reads probe the
    * bucket-scale store
    * ([[graft.ext.Stats.quantilesFromHistogram]]), never the stream's
    * history — the QUANTILE member of the mergeable-store family
    * beside [[kmvIngestStream]] (cardinality) and [[cmsIngestStream]]
    * (frequency).
    */
  def histIngestStream(incoming: DataFrame, groupCols: Seq[String],
      valueCol: String, widthCents: Long,
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.ext.Stats.histogramOf(batch, groupCols, valueCol, widthCents),
          batchId)
      }

  /** Streaming incremental materialized-aggregate maintenance — the
    * ingest face of the batch `rollup_maintenance` query: each arriving
    * micro-batch collapses to per-key partial sums (map-side
    * combinable, so the per-batch cost is one aggregate of batch-sized
    * input), and the caller's sink folds them into the stored rollup
    * with [[mergeRollup]] — union + re-agg over |store| + |batch keys|
    * rows, never a history rescan. Sum is associative/commutative, so
    * any batch cut converges to the one-shot aggregate
    * (StreamingOpsSpec asserts permuted two-batch cuts).
    */
  def rollupIngestStream(incoming: DataFrame, keys: Seq[String], measure: String,
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(batch.groupBy(keys.map(col): _*)
          .agg(sum(col(measure)).cast("long").as(measure)), batchId)
      }

  /** Fold a batch's per-key partials into the stored rollup — the
    * addition-merge every mergeable-store twin uses (KMV / CMS / span
    * counts), here for plain sums.
    */
  def mergeRollup(store: DataFrame, partial: DataFrame,
      keys: Seq[String], measure: String): DataFrame =
    store.unionByName(partial)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(measure)).cast("long").as(measure))

  /** Streaming SEMANTIC-dedup ingest — per arriving micro-batch of
    * embeddings, verdicts from
    * [[graft.ext.Similarity.semDedupIncremental]] against the growing
    * vector store: route the batch to FROZEN trained cells, drop
    * arrivals that a smaller-id similar vector (store or batch)
    * undercuts, and emit demotion rows for store vectors the batch
    * undercuts — the embedding-space twin of [[corpusIngestStream]]'s
    * survivor election, batch-cut invariant for the same reason (the
    * verdict is a pure function of the vector set once centroids are
    * frozen; StreamingOpsSpec asserts permuted cuts converge). The
    * caller's `sink` owns committing EVERY batch vector to the store
    * (dropped included — a dropped vector can still witness-drop a
    * later arrival) and folding demotions; `existingVectors`/`centroids`
    * are the per-batch store re-reads, the [[incrementalDedupStream]]
    * contract.
    */
  def semDedupIngestStream(incoming: DataFrame,
      existingVectors: () => DataFrame,
      centroids: () => DataFrame,
      sink: (DataFrame, Long) => Unit,
      threshold: Double = 0.97): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.ext.Similarity.semDedupIncremental(
          existingVectors(), batch, centroids(), threshold), batchId)
      }

  /** Streaming anomaly gate — per arriving micro-batch of events, the
    * exact-arithmetic z² flags of [[graft.ext.Events.anomaliesAgainst]]
    * scored against a FROZEN per-type moment table (the offline
    * training job's output, the same frozen-store discipline as trained
    * centroids). Scoring is a pure per-row function of the frozen
    * moments, so verdicts are batch-cut invariant by construction; a
    * LIVE-moments variant would make early batches score against
    * immature statistics — the documented trade, not offered here.
    */
  def anomalyStream(events: DataFrame, moments: () => DataFrame,
      sink: (DataFrame, Long) => Unit,
      zSq: Int = 9): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.ext.Events.anomaliesAgainst(batch, moments(), zSq), batchId)
      }

  /** Streaming SCD2 maintenance — each arriving micro-batch of
    * dimension rows is a day-delta merged into the versioned store with
    * the batch operator ([[graft.etl.Scd2.merge]]): changed keys close
    * and reopen as of the batch's date, new keys open, history passes
    * through. `current` re-reads the store per batch and `sink`
    * replaces it — the [[incrementalDedupStream]] store contract;
    * `asOfDate` maps the batch id to its business date (batch order IS
    * meaningful here: SCD2 history is inherently sequential, unlike the
    * set-pure dedup twins).
    */
  def scd2Stream(updates: DataFrame, current: () => DataFrame,
      key: String, attrs: Seq[String],
      asOfDate: Long => java.sql.Date,
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    updates.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(graft.etl.Scd2.merge(current(), batch, key, attrs,
          asOfDate(batchId)), batchId)
      }

  /** Streaming data-quality gate — each arriving micro-batch is checked
    * against the declared [[graft.etl.DataQuality]] rules BEFORE the
    * caller commits it: `sink` receives the per-rule verdict frame plus
    * the boolean gate (true = clean), and owns the commit/quarantine
    * decision — the pre-load guardrail run continuously. The verdict
    * frame is localCheckpoint'd so the gate boolean and the sink's own
    * reads share one evaluation of the batch.
    */
  def dqGateStream(rows: DataFrame,
      rules: Seq[graft.etl.DataQuality.Rule],
      sink: (DataFrame, Boolean, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val verdicts = graft.etl.DataQuality.check(batch, rules).localCheckpoint()
        sink(verdicts, graft.etl.DataQuality.passes(verdicts), batchId)
      }

  /** Streaming K5 — the discrepancy alert gate run CONTINUOUSLY: per
    * arriving micro-batch of reconciliation rows, build the alert with
    * the batch operator ([[graft.etl.Alerts.build]] — in-plan count +
    * examples + reference-format body) and publish through the injected
    * [[graft.etl.Alerts.AlertSink]] iff discrepancies exist, exactly
    * the batch job's conditional. `foreachBatch` because the publish is
    * a SIDE EFFECT — it stays outside the streaming plan, so retries of
    * the plan can never double-publish beyond the sink's own
    * idempotency, the same contract as the batch [[graft.etl.Alerts]].
    */
  def alertStream(recon: DataFrame, sink: graft.etl.Alerts.AlertSink,
      k: Int = 5, subject: String = "Inventory discrepancies found"): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    recon.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.etl.Alerts.notify(graft.etl.Alerts.build(batch, k), sink, subject)
        ()
      }

  /** Exact event-time micros — `getTime` truncates the sub-millisecond
    * part `Timestamp` carries in nanos; the batch frame is defined in
    * micros, so the streaming frame must be too.
    */
  private def micros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** Per-user state transition of [[rollingFeaturesStream]]; also
    * invoked on event-time timeout with an empty iterator.
    */
  private def rollUser(frameUs: Long)(userId: Long, rows: Iterator[RollEvent],
      state: GroupState[RollBuf]): Iterator[RollFeature] = {
    val prev = state.getOption.getOrElse(RollBuf(Nil, Nil))
    val in = rows.toVector
    val evs = prev.events ++ in.map(e => RollEv(e.ts, e.cents))
    val pending = prev.pending ++
      in.filter(_.event_type == "purchase").map(e => RollPending(e.event_id, e.ts))
    val wm = state.getCurrentWatermarkMs()
    // Strictly-before-watermark purchases are final: every non-late
    // frame member (ts ≤ p.ts < wm) has arrived.
    val (ready, stillPending) = pending.partition(_.ts.getTime < wm)
    val out = ready.sortBy(p => (p.ts.getTime, p.event_id)).map { p =>
      val pUs = micros(p.ts)
      val frame = evs.filter { e =>
        val t = micros(e.ts); t >= pUs - frameUs && t <= pUs
      }
      RollFeature(p.event_id, userId, p.ts,
        frame.size.toLong, frame.map(_.cents).sum / 100.0)
    }
    // An event can still serve any purchase with p.ts ∈ [t, t + frame];
    // unfinalized purchases sit at-or-after the watermark.
    val keep = evs.filter(e => micros(e.ts) + frameUs >= wm * 1000L)
    if (keep.isEmpty && stillPending.isEmpty) state.remove()
    else {
      state.update(RollBuf(keep, stillPending))
      // Event-only state must self-evict too: without a timeout a key
      // whose last arrival is a non-purchase event holds its buffer
      // until new data happens to arrive for it, breaking the
      // O((frame)×rate) state bound. The expiry instant is when the
      // newest kept event falls out of every possible future frame.
      val evictAt =
        if (keep.isEmpty) Long.MaxValue
        else (keep.map(e => micros(e.ts)).max + frameUs) / 1000L + 1
      val pendAt =
        if (stillPending.isEmpty) Long.MaxValue
        else stillPending.map(_.ts.getTime).min + 1
      state.setTimeoutTimestamp(math.max(wm + 1, math.min(evictAt, pendAt)))
    }
    out.iterator
  }

  /** Per-user state transition; also invoked on event-time timeout with
    * an empty iterator.
    */
  /** Streaming MULTI-touch attribution — the stateful twin of
    * [[graft.ext.Events.multiTouchAttribution]]: once the watermark
    * finalizes a purchase, ALL views inside its lookback window emit
    * with exact-ppm credit (⌊1e6/n⌋ each, latest view + remainder —
    * per-purchase credit sums to exactly 1 000 000, the batch
    * conservation law). Unlike [[attributionStream]] (one winner), the
    * full pair set emits, so the per-user state must hold every view
    * still inside `watermark − window` — O((lateness + window) × rate),
    * the same bound the native stream-stream join derives from its
    * range condition; this operator adds what the join cannot: the
    * per-purchase VIEW COUNT, which is only final when the watermark
    * passes the purchase.
    */
  def multiTouchStream(events: DataFrame, windowSeconds: Long = 3600L,
      lateness: String = "30 minutes"): Dataset[TouchCredit] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .where(col("event_type").isin("view", "purchase"))
      .withWatermark("ts", lateness)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[AsOfEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        creditUser(windowSeconds * 1000000L))
  }

  private def creditUser(winMicros: Long)(userId: Long,
      rows: Iterator[AsOfEvent],
      state: GroupState[AsOfBuf]): Iterator[TouchCredit] = {
    val prev = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
    val in = rows.toVector
    val views = prev.views ++
      in.filter(_.event_type == "view").map(e => AsOfView(e.event_id, e.ts))
    val pending = prev.pending ++
      in.filter(_.event_type == "purchase").map(e => AsOfPending(e.event_id, e.ts, e.value))
    val wm = state.getCurrentWatermarkMs()
    // A purchase strictly before the watermark is final: any view that
    // could still arrive for it would be dropped as late.
    val (ready, stillPending) = pending.partition(_.ts.getTime < wm)
    val out = ready.sortBy(p => (p.ts.getTime, p.event_id)).flatMap { p =>
      val ms = views
        .filter(v => !v.view_ts.after(p.ts) &&
          micros(v.view_ts) >= micros(p.ts) - winMicros)
        .sortBy(v => (v.view_ts.getTime, v.view_id))
      val n = ms.size.toLong
      ms.zipWithIndex.map { case (v, i) =>
        val credit = 1000000L / n + (if (i == n - 1) 1000000L % n else 0L)
        TouchCredit(p.event_id, userId, p.ts, v.view_id, v.view_ts, credit)
      }
    }
    // A view can still credit a purchase at or after the watermark iff
    // view_ts ≥ wm − window; everything older evicts (pending purchases
    // all sit at-or-after the watermark, so the same bound covers them).
    val keep = views.filter(v => micros(v.view_ts) >= wm * 1000L - winMicros)
    if (keep.isEmpty && stillPending.isEmpty) state.remove()
    else {
      state.update(AsOfBuf(keep, stillPending))
      // View-only state self-evicts: a kept view dies once
      // micros(view_ts) < wm·1000 − window, so schedule the timeout at
      // that instant (the timeout callback re-runs this handler with an
      // empty iterator, the keep filter drops it, state removes).
      // Without this, a user whose last events are views pins the
      // buffer forever — the O((lateness+window)×rate) bound only
      // holds if eviction is watermark-driven, not arrival-driven.
      val evictAt =
        if (keep.isEmpty) Long.MaxValue
        else (keep.map(v => micros(v.view_ts)).max + winMicros) / 1000L + 1
      val pendAt =
        if (stillPending.isEmpty) Long.MaxValue
        else stillPending.map(_.ts.getTime).min + 1
      state.setTimeoutTimestamp(math.max(wm + 1, math.min(evictAt, pendAt)))
    }
    out.iterator
  }

  private def attributeUser(tolMicros: Option[Long])(userId: Long,
      rows: Iterator[AsOfEvent],
      state: GroupState[AsOfBuf]): Iterator[Attribution] = {
    val prev = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
    val in = rows.toVector
    val views = prev.views ++
      in.filter(_.event_type == "view").map(e => AsOfView(e.event_id, e.ts))
    val pending = prev.pending ++
      in.filter(_.event_type == "purchase").map(e => AsOfPending(e.event_id, e.ts, e.value))
    val wm = state.getCurrentWatermarkMs()
    // Strictly-before-watermark purchases are final: a view with
    // view_ts ≤ p.ts < wm would be dropped as late if it arrived now.
    val (ready, stillPending) = pending.partition(_.ts.getTime < wm)
    val out = ready.sortBy(p => (p.ts.getTime, p.event_id)).map { p =>
      // Batch tie rules exactly: view_ts ≤ purchase ts qualifies; among
      // ties the max (view_ts, view_id) wins (the batch side pre-dedups
      // per (user, ts) to max event_id). The tolerance bound is exact
      // micros, mirroring asOfTolerance's inclusive >= t − tolerance.
      val m = views.filter(v => !v.view_ts.after(p.ts) &&
          tolMicros.forall(t => micros(v.view_ts) >= micros(p.ts) - t))
        .maxByOption(v => (v.view_ts.getTime, v.view_id))
      Attribution(p.event_id, userId, p.ts, p.purchase_value,
        m.map(_.view_id), m.map(_.view_ts))
    }
    val (oldViews, liveViews) = views.partition(_.view_ts.getTime < wm)
    // Newest passed view carries (it dominates every future decision) —
    // unless a tolerance says it can never match a purchase at or after
    // the watermark again, in which case nothing old survives.
    val keep = oldViews.sortBy(v => (v.view_ts.getTime, v.view_id)).takeRight(1)
      .filter(v => tolMicros.forall(t => micros(v.view_ts) >= wm * 1000L - t)) ++
      liveViews
    if (keep.isEmpty && stillPending.isEmpty) state.remove()
    else {
      state.update(AsOfBuf(keep, stillPending))
      // With a tolerance, every kept view has a finite horizon
      // (micros ≥ wm·1000 − tol), so schedule eviction at that instant;
      // the timeout re-invokes this handler with no rows and the keep
      // filter clears the buffer. Without a tolerance the newest view
      // legitimately lives forever (it matches any future purchase) —
      // that state is a single view per key, O(1), and only a pending
      // purchase needs a wake-up.
      val evictAt = tolMicros match {
        case Some(t) if keep.nonEmpty =>
          (keep.map(v => micros(v.view_ts)).max + t) / 1000L + 1
        case None if keep.length > 1 =>
          // No tolerance: the newest view lives forever (it matches any
          // future purchase — O(1), fine), but MULTIPLE buffered views
          // only collapse to that single dominant one when the handler
          // re-runs after the watermark passes them. A key whose FINAL
          // batch is view-rich would otherwise pin the whole buffer
          // until some future arrival (ADVICE r9): arm a one-shot
          // collapse at the newest view's horizon so the timeout
          // callback's keep-filter settles the key to its single-view
          // steady state unprompted.
          keep.map(_.view_ts.getTime).max + 1
        case _ => Long.MaxValue
      }
      val pendAt =
        if (stillPending.isEmpty) Long.MaxValue
        else stillPending.map(_.ts.getTime).min + 1
      val at = math.min(evictAt, pendAt)
      if (at != Long.MaxValue)
        state.setTimeoutTimestamp(math.max(wm + 1, at))
    }
    out.iterator
  }

  /** EXACTLY-ONCE guard for addition-merge sinks: `foreachBatch`
    * guarantees at-LEAST-once — after a crash between the sink's commit
    * and the checkpoint's, the same batchId REPLAYS, and a non-
    * idempotent merge (mergeRollup, KMV/CMS folds — addition is not
    * idempotent) would double-count it. The standard fix is a batchId
    * LEDGER committed atomically with the store: wrap the sink so a
    * batchId already in the ledger is skipped. This class is the
    * in-memory form of that contract (a real deployment puts ledger +
    * store in one transactional table write); `StreamingOpsSpec`
    * asserts replay is a no-op through it.
    */
  final class IdempotentSink(inner: (DataFrame, Long) => Unit)
      extends ((DataFrame, Long) => Unit) {
    private val applied = scala.collection.mutable.Set.empty[Long]
    def apply(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (applied.add(batchId)) inner(batch, batchId)
    }
    def appliedBatches: Set[Long] = synchronized(applied.toSet)
  }
}
