package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOfJoin, BloomJoin, Corpus, Dedup, Events, Hierarchy, Multimodal, Privacy, RangeJoin, Retail, SaltedJoin, Similarity, Sketches, Stats, StockSim, TextOps}
import graft.etl.ZOrder

/** Mergeable summaries (KMV cardinality, CMS frequency,
  * histogram quantiles) and the streaming ingest-replay twins that
  * DuckDB-check each store's fold path.
  *
  * Registry object: entry/oracle blocks moved verbatim from the
  * pre-r12 ExtQueries monolith (plans unchanged); ExtQueries
  * composes every family back into the driver-contract maps and
  * still owns the shared session stores and SQL fragments.
  */
private[graft] object QueriesSketches {
  import ExtQueries._

  def entries: Map[String, Q] = Map[String, Q](
    // Sketch quantiles — per-priority p50/p90/p99 of order value from a
    // mergeable equi-width cents histogram ($100 buckets): the 100 TB
    // quantile path (see Stats.histogramQuantiles; order_quantiles is
    // the exact-sort small-group tool it contrasts with).
    "hist_quantiles" -> ((s, dir) =>
      ext.Stats.histogramQuantiles(Tables.orders(s, dir),
          Seq("o_orderpriority"), "o_totalprice", 10000L, Seq(50, 90, 99))
        .orderBy("o_orderpriority")),

    // X2 × sketch — corpus-health drill-down: median / p90 quality
    // score per source from the centi-score histogram (the per-source
    // twin of quality_calibration's per-language percentiles; one
    // histogram aggregate, bucket-scale windows). `source` rides the
    // stats projection (textStats carry param, r13): the former
    // doc_id reunite join shuffled BOTH corpus-scale sides at any
    // scale where neither broadcasts — the audited super-linear knee
    // of the r12 sf10 run (12.8×/decade vs the ~10× map floor).
    "quality_by_source" -> ((s, dir) => {
      val scored = TextOps.textStats(Tables.documents(s, dir), carry = Seq("source"))
        .select(col("source"), col("quality_score"))
      ext.Stats.histogramQuantiles(scored, Seq("source"), "quality_score", 1L,
          Seq(50, 90))
        .orderBy("source")
    }),

    // Sketch-guided outlier scan: per-brand p99 price from the $10
    // histogram, broadcast back (|brands| rows — bounded) onto a second
    // fact pass that counts the tail above the estimate. The pattern a
    // 100 TB anomaly sweep runs: sketch pass + filtered scan, never a
    // per-group sort of the fact.
    "price_outliers" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).select("p_partkey", "p_brand"),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("l_extendedprice"))
      val p99 = ext.Stats.histogramQuantiles(li, Seq("p_brand"),
        "l_extendedprice", 1000L, Seq(99))
      li.join(broadcast(p99), "p_brand")
        .where(expr("CAST(round(l_extendedprice * 100) AS BIGINT)") >= col("p99_cents"))
        .groupBy("p_brand", "p99_cents")
        .agg(count(lit(1)).as("n_above"),
          max(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("max_cents"))
        .orderBy("p_brand")
    }),

    // X6 × sketch — session duration percentiles from the minute-bucket
    // histogram (centi-second grid): sessionization's one user-key
    // exchange + a bucket-scale histogram — no per-session sort at any
    // corpus size.
    "session_quantiles" -> ((s, dir) => {
      val sess = Events.sessionize(Tables.events(s, dir))
        .select(expr(
          "CAST((unix_micros(session_end) - unix_micros(session_start)) DIV 1000000 AS BIGINT)")
          .as("duration_secs"))
        .withColumn("scope", lit("all"))
      ext.Stats.histogramQuantiles(sess, Seq("scope"), "duration_secs", 6000L,
          Seq(50, 90, 99))
        .orderBy("scope")
    }),

    // Sketch — rolling 7-day distinct users via per-day KMV sketches
    // merged across the trailing window (mergeability payoff: the
    // rolling distinct never re-touches raw events).
    "rolling_active_users" -> ((s, dir) =>
      Sketches.rollingActiveUsers(Tables.events(s, dir), k = 64, windowDays = 7)
        .orderBy("day")),

    // Sketch — KMV distinct-count estimate: per event type, the
    // estimated distinct-user cardinality from a 64-hash k-minimum-
    // values sketch (bounded, mergeable; see Sketches scaladoc). The
    // oracle replays the same order statistics + integer estimator.
    "kmv_distinct" -> ((s, dir) =>
      Sketches.kmvDistinct(Tables.events(s, dir), Seq("event_type"), "user_id", 64)
        .orderBy("event_type")),

    // Sketch — KMV set-intersection estimate: per day, distinct users
    // who BOTH viewed and purchased, from two per-segment k-min
    // sketches (exact below saturation — the set-algebra payoff KMV
    // has over HLL).
    "kmv_overlap" -> ((s, dir) => {
      // The benched plan is the deployment plan: per-segment sketches
      // come from the session-scoped ingest store (built once per
      // corpus), so the estimate joins k-row frames — no fact scan per
      // question.
      def sk(t: String) = store(s, dir, s"kmv_$t") {
        Sketches.kmvSketch(Tables.events(s, dir)
            .where(col("event_type") === t)
            .select(to_date(col("ts")).as("day"), col("user_id")),
          Seq("day"), "user_id", 64)
      }
      Sketches.kmvIntersectEstimate(sk("view"), sk("purchase"), Seq("day"), 64)
        .orderBy("day")
    }),

    // Sketch — count-min frequency estimates for the exact top-20
    // tokens: the d×w counter table is built once over all token
    // occurrences (mergeable by addition), then point-queried for the
    // heavy hitters; est ≥ exact always, overshoot bounded by εN. The
    // oracle replays the same md5-based bucket chain and min.
    "cms_freq" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // ONE tokenize pass + one token aggregate feed BOTH halves (r17,
      // guide §2.3): the sketch adds each distinct token's count to its
      // d counters (cmsSketchWeighted ≡ per-occurrence cmsSketch — the
      // counters are sums) and the top-20 probe list is the same count
      // table's TakeOrdered (≡ TextOps.wordFreq). The former shape
      // tokenized the corpus twice and ran the md5 bucket chain per
      // OCCURRENCE. Checkpoint: the count table is vocabulary-scale and
      // feeds two consumers.
      val counts = graft.ext.Ckpt.ser(
        docs.select(explode(TextOps.tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n")))
      val top = counts.orderBy(col("n").desc, col("token")).limit(20)
      Sketches.cmsEstimate(Sketches.cmsSketchWeighted(counts, "token", "n"),
          top, "token")
        .orderBy(col("n").desc, col("token"))
    }),

    // §2.11 [Q] — streaming-ingest REPLAY twins (VERDICT r9 ask #7):
    // the deterministic foreachBatch fold path of the KMV / CMS /
    // conversion-anchor ingest streams, executed as a batch query over
    // N FIXED micro-batch cuts (pure id-residue functions, so the cut
    // is engine-independent). Each replay folds per-batch partials
    // through the EXACT merge the streaming sink uses
    // (kmvMerge / cmsMerge / mergeConvertStore) and finalizes the
    // store; the oracle is the ONE-SHOT recomputation — green means
    // the fold path is bit-identical to the union semantics under a
    // real batch cut, cross-engine, which is the mergeable-store
    // contract the streaming twins rely on.
    "kmv_ingest_replay" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      (0 until 4)
        .map(i => Sketches.kmvSketch(
          ev.where(pmod(col("event_id"), lit(4)) === i),
          Seq("event_type"), "user_id", 64))
        .reduce((a, b) => Sketches.kmvMerge(a, b, Seq("event_type"), 64))
        .transform(st => Sketches.kmvEstimate(st, Seq("event_type"), 64))
        .orderBy("event_type")
    }),

    "cms_ingest_replay" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // Document-atomic batches (the spanIngest/cmsIngest contract):
      // cut on doc_id residue, tokens explode inside each batch. Each
      // batch builds its counters from its own token-count aggregate
      // (cmsSketchWeighted ≡ per-occurrence within the batch — sums
      // commute), so the per-batch md5 bucket chain runs per distinct
      // token, not per occurrence (the cms_freq r17 shape); the fold
      // across batches is the same cmsMerge addition.
      val store = (0 until 3)
        .map(i => Sketches.cmsSketchWeighted(
          docs.where(pmod(col("doc_id"), lit(3)) === i)
            .select(explode(TextOps.tokens(col("text"))).as("token"))
            .groupBy("token").agg(count(lit(1)).as("n")),
          "token", "n"))
        .reduce(Sketches.cmsMerge)
      Sketches.cmsEstimate(store, TextOps.wordFreq(docs, 20), "token")
        .orderBy(col("n").desc, col("token"))
    }),

    "convert_ingest_replay" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      (0 until 3)
        .map(i => Events.convertPartials(
          ev.where(pmod(col("event_id"), lit(3)) === i)))
        .reduce(graft.streaming.StreamingOps.mergeConvertStore)
        .transform(Events.convertFromPartials)
        .orderBy("user_id")
    }),

    // §2.11 [Q] — round-11 replay twins (VERDICT r10 ask #4): the four
    // remaining ingest-STORE maintenance paths, batch-folded under
    // fixed id-residue cuts and finalized with the store's real read.
    // LSH signatures and int8 quantization are pure per-vector
    // functions (batch-union ≡ one-pass store, the lshIngestStream /
    // quantizeIngestStream contract); the probe against the folded
    // store must therefore hash-match the one-shot ANN oracle.
    "lsh_ingest_replay" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val sigs = (0 until 3)
        .map(i => Similarity.lshSignatures(
          emb.where(pmod(col("vec_id"), lit(3)) === i)))
        .reduce(_.unionByName(_))
      castLongs(Similarity.topKLsh(emb, signatures = Some(sigs)), "rank")
        .orderBy("probe_id", "rank")
    }),

    "quantize_ingest_replay" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val st = (0 until 3)
        .map(i => Similarity.quantizeEmbeddings(
          emb.where(pmod(col("vec_id"), lit(3)) === i)))
        .reduce(_.unionByName(_))
      castLongs(Similarity.topKQuantized(emb, store = Some(st)), "rank")
        .orderBy("probe_id", "rank")
    }),

    // Span store: per-batch (h, n_docs) summaries fold by addition
    // (spanIngestStream's document-atomic contract); the finalized read
    // is the shared-span census (n_docs ≥ 2) the boilerplate gate
    // consumes, oracled one-shot in DuckDB.
    "span_ingest_replay" -> ((s, dir) => {
      // Each batch's (doc_id, h) spans come from the k-shingle store
      // sliced by the batch's doc-id residue (per-doc purity: slice ≡
      // shingleHashes of the batch, the decontaminate discipline) — the
      // replay still folds three real batch summaries through the
      // store's addition merge, it just no longer re-tokenizes the
      // corpus three times per probe (r17).
      val sh = k8ShingleStore(s, dir)
      (0 until 3)
        .map(i => Corpus.spanCountsFromHashes(
          sh.where(pmod(col("doc_id"), lit(3)) === i)))
        .reduce(Corpus.spanStoreMerge)
        .where(col("n_docs") >= 2)
        .select(col("h"), col("n_docs").cast("long").as("n_docs"))
        .orderBy("h")
    }),

    // Histogram-quantile store: per-batch (group, bucket, n) equi-width
    // histograms fold by addition (histIngestStream's contract — the
    // quantile member of the mergeable-store family beside KMV and
    // CMS); the finalized read is the same p50/p90/p99 probe
    // hist_quantiles runs one-shot, so the oracle is shared.
    "quantile_ingest_replay" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      (0 until 3)
        .map(i => ext.Stats.histogramOf(
          o.where(pmod(col("o_orderkey"), lit(3)) === i),
          Seq("o_orderpriority"), "o_totalprice", 10000L))
        .reduce((a, b) => graft.streaming.StreamingOps.mergeRollup(
          a, b, Seq("o_orderpriority", "bucket"), "n"))
        .transform(st => ext.Stats.quantilesFromHistogram(
          st, Seq("o_orderpriority"), 10000L, Seq(50, 90, 99)))
        .orderBy("o_orderpriority")
    }),

    // SemDeDup: verdicts folded through semDedupIncremental under a
    // 3-cut replay — kept can only be REVOKED (demotion rows), never
    // re-granted, and every batch vector joins the store dropped or
    // not (the semDedupIngestStream sink contract). Routing probes the
    // frozen trained-assignment store, so the fold must converge to
    // the one-shot semantic_dedup verdicts. Re-based r13 onto the
    // SCALED cell stores (cells = n/200 — knn_join_scaled's rationale):
    // the r12 sf10 run measured the 10-cell fixture replay at
    // 17.4×/decade because batch × shared-cell volume is Σ|cell|²;
    // occupancy-pinned cells make the fold linear per decade, and the
    // one-shot oracle is semantic_dedup_scaled's.
    "semdedup_ingest_replay" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val asg = scaledCellsStore(s, dir, emb)
      val cent = scaledCentroidsStore(s, dir, emb)
      val routed = emb.join(asg.select("vec_id", "cell"), "vec_id")
        .select("vec_id", "embedding", "cell")
      val empty = routed.where(lit(false)).localCheckpoint()
      val (_, verdicts) = (0 until 3).foldLeft((empty, Seq.empty[DataFrame])) {
        case ((st, acc), i) =>
          val inBatch = pmod(col("vec_id"), lit(3)) === i
          val v = Similarity.semDedupIncremental(
            st, emb.where(inBatch), cent, threshold = 0.3,
            assignments = Some(asg))
          (st.unionByName(routed.where(inBatch)).localCheckpoint(), acc :+ v)
      }
      verdicts.reduce(_.unionByName(_))
        .groupBy("vec_id")
        .agg(min(col("cell")).as("cell"), min(col("kept")).as("kept"))
        .orderBy("vec_id")
    }),
  )

  def oracles: Map[String, String] = Map(
    "hist_quantiles" ->
      s"""WITH h AS (SELECT o_orderpriority,
         |    CAST(round(o_totalprice * 100) AS BIGINT) // 10000 AS bucket,
         |    count(*) AS n
         |  FROM orders GROUP BY 1, 2),
         |c AS (SELECT o_orderpriority, bucket, n,
         |    sum(n) OVER (PARTITION BY o_orderpriority ORDER BY bucket
         |      ROWS UNBOUNDED PRECEDING) AS cum,
         |    sum(n) OVER (PARTITION BY o_orderpriority) AS nt
         |  FROM h)
         |SELECT o_orderpriority,
         |  CAST(min(CASE WHEN cum >= (nt * 50 + 99) // 100
         |    THEN bucket * 10000 END) AS BIGINT) AS p50_cents,
         |  CAST(min(CASE WHEN cum >= (nt * 90 + 99) // 100
         |    THEN bucket * 10000 END) AS BIGINT) AS p90_cents,
         |  CAST(min(CASE WHEN cum >= (nt * 99 + 99) // 100
         |    THEN bucket * 10000 END) AS BIGINT) AS p99_cents
         |FROM c GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "quality_by_source" ->
      s"""WITH ${qualityCtes("documents")},
         |q AS (SELECT doc_id, floor((0.4 * least(1.0, n_tokens / 50.0)
         |    + 0.3 * (1.0 - punct_ratio)
         |    + 0.3 * least(1.0, stopword_ratio * 5)) * 10000) / 10000
         |    AS quality_score
         |  FROM qs),
         |j AS (SELECT d.source, q.quality_score
         |      FROM documents d JOIN q USING (doc_id)),
         |h AS (SELECT source, CAST(round(quality_score * 100) AS BIGINT) // 1
         |    AS bucket, count(*) AS n FROM j GROUP BY 1, 2),
         |c AS (SELECT source, bucket, n,
         |    sum(n) OVER (PARTITION BY source ORDER BY bucket
         |      ROWS UNBOUNDED PRECEDING) AS cum,
         |    sum(n) OVER (PARTITION BY source) AS nt
         |  FROM h)
         |SELECT source,
         |  CAST(min(CASE WHEN cum >= (nt * 50 + 99) // 100
         |    THEN bucket * 1 END) AS BIGINT) AS p50_cents,
         |  CAST(min(CASE WHEN cum >= (nt * 90 + 99) // 100
         |    THEN bucket * 1 END) AS BIGINT) AS p90_cents
         |FROM c GROUP BY 1 ORDER BY source""".stripMargin,

    "price_outliers" ->
      s"""WITH li AS (SELECT p_brand,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |h AS (SELECT p_brand, price_c // 1000 AS bucket, count(*) AS n
         |      FROM li GROUP BY 1, 2),
         |c AS (SELECT p_brand, bucket, n,
         |    sum(n) OVER (PARTITION BY p_brand ORDER BY bucket
         |      ROWS UNBOUNDED PRECEDING) AS cum,
         |    sum(n) OVER (PARTITION BY p_brand) AS nt
         |  FROM h),
         |p99 AS (SELECT p_brand,
         |    CAST(min(CASE WHEN cum >= (nt * 99 + 99) // 100
         |      THEN bucket * 1000 END) AS BIGINT) AS p99_cents
         |  FROM c GROUP BY 1)
         |SELECT li.p_brand, p99_cents, count(*) AS n_above,
         |  max(price_c) AS max_cents
         |FROM li JOIN p99 USING (p_brand)
         |WHERE price_c >= p99_cents
         |GROUP BY 1, 2 ORDER BY li.p_brand""".stripMargin,

    "session_quantiles" ->
      s"""WITH $sessionCtes,
         |dur AS (SELECT 'all' AS scope,
         |    CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS BIGINT)
         |      AS duration_secs
         |  FROM s GROUP BY user_id, session_no),
         |h AS (SELECT scope,
         |    CAST(round(duration_secs * 100) AS BIGINT) // 6000 AS bucket,
         |    count(*) AS n
         |  FROM dur GROUP BY 1, 2),
         |c AS (SELECT scope, bucket, n,
         |    sum(n) OVER (PARTITION BY scope ORDER BY bucket
         |      ROWS UNBOUNDED PRECEDING) AS cum,
         |    sum(n) OVER (PARTITION BY scope) AS nt
         |  FROM h)
         |SELECT scope,
         |  CAST(min(CASE WHEN cum >= (nt * 50 + 99) // 100
         |    THEN bucket * 6000 END) AS BIGINT) AS p50_cents,
         |  CAST(min(CASE WHEN cum >= (nt * 90 + 99) // 100
         |    THEN bucket * 6000 END) AS BIGINT) AS p90_cents,
         |  CAST(min(CASE WHEN cum >= (nt * 99 + 99) // 100
         |    THEN bucket * 6000 END) AS BIGINT) AS p99_cents
         |FROM c GROUP BY 1 ORDER BY scope""".stripMargin,

    "rolling_active_users" ->
      s"""WITH e AS (SELECT DISTINCT CAST(ts AS DATE) AS day,
         |    ${hash60Sql("user_id::VARCHAR")} AS h FROM events
         |  WHERE user_id IS NOT NULL),
         |d AS (SELECT day, h,
         |    row_number() OVER (PARTITION BY day ORDER BY h) AS rn FROM e),
         |sk AS (SELECT day, h FROM d WHERE rn <= 64),
         |days AS (SELECT DISTINCT day FROM e),
         |contrib AS (SELECT DISTINCT t.day AS day, sk.h
         |  FROM sk JOIN days t ON t.day >= sk.day AND t.day <= sk.day + 6),
         |r AS (SELECT day, h,
         |    row_number() OVER (PARTITION BY day ORDER BY h) AS rn FROM contrib),
         |s AS (SELECT day, count(*) AS cnt, max(h) AS kth
         |    FROM r WHERE rn <= 64 GROUP BY 1)
         |SELECT day,
         |  CASE WHEN cnt < 64 THEN cnt
         |       ELSE (63::HUGEINT * 1152921504606846976 // kth)::BIGINT
         |  END AS users_roll
         |FROM s ORDER BY day""".stripMargin,

    "kmv_distinct" ->
      s"""WITH h AS (SELECT DISTINCT event_type,
         |    ${hash60Sql("user_id::VARCHAR")} AS h FROM events
         |  WHERE user_id IS NOT NULL),
         |r AS (SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
         |s AS (SELECT event_type, count(*) AS cnt, max(h) AS kth
         |    FROM r WHERE rn <= 64 GROUP BY 1)
         |SELECT event_type,
         |  CASE WHEN cnt < 64 THEN cnt
         |       ELSE (63::HUGEINT * 1152921504606846976 // kth)::BIGINT
         |  END AS est_distinct
         |FROM s ORDER BY event_type""".stripMargin,

    "kmv_overlap" ->
      s"""WITH av AS (SELECT DISTINCT CAST(ts AS DATE) AS day,
         |    ${hash60Sql("user_id::VARCHAR")} AS h FROM events
         |  WHERE event_type = 'view' AND user_id IS NOT NULL),
         |ar AS (SELECT day, h,
         |    row_number() OVER (PARTITION BY day ORDER BY h) AS rn FROM av),
         |a AS (SELECT day, h FROM ar WHERE rn <= 64),
         |bv AS (SELECT DISTINCT CAST(ts AS DATE) AS day,
         |    ${hash60Sql("user_id::VARCHAR")} AS h FROM events
         |  WHERE event_type = 'purchase' AND user_id IS NOT NULL),
         |br AS (SELECT day, h,
         |    row_number() OVER (PARTITION BY day ORDER BY h) AS rn FROM bv),
         |b AS (SELECT day, h FROM br WHERE rn <= 64),
         |u0 AS (SELECT day, h FROM a UNION SELECT day, h FROM b),
         |ur AS (SELECT day, h,
         |    row_number() OVER (PARTITION BY day ORDER BY h) AS rn FROM u0),
         |u AS (SELECT day, h FROM ur WHERE rn <= 64),
         |f AS (SELECT u.day, u.h,
         |    CASE WHEN a.h IS NOT NULL THEN 1 ELSE 0 END AS in_a,
         |    CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END AS in_b
         |  FROM u LEFT JOIN a ON u.day = a.day AND u.h = a.h
         |         LEFT JOIN b ON u.day = b.day AND u.h = b.h),
         |s AS (SELECT day, count(*) AS kk, max(h) AS kth,
         |    sum(in_a * in_b) AS n_both FROM f GROUP BY 1)
         |SELECT day,
         |  ((n_both * CASE WHEN kk < 64 THEN kk
         |      ELSE (63::HUGEINT * 1152921504606846976 // kth)::BIGINT
         |    END) // kk)::BIGINT AS est_overlap
         |FROM s ORDER BY day""".stripMargin,

    "cms_freq" ->
      s"""WITH tok AS (SELECT unnest($toksSql) AS token FROM documents),
         |top AS (SELECT token, count(*) AS n FROM tok
         |  GROUP BY 1 ORDER BY n DESC, token LIMIT 20),
         |th AS (SELECT ${hash60Sql("token")} AS h FROM tok),
         |sk AS (SELECT cms_row, cms_bucket, count(*) AS cms_cnt FROM (
         |${cmsArmsSql("th", "")}) GROUP BY 1, 2),
         |ph AS (SELECT token, n, ${hash60Sql("token")} AS h FROM top),
         |pb AS (
         |${cmsArmsSql("ph", "token, n, ")}),
         |est AS (SELECT token, n,
         |    min(coalesce(sk.cms_cnt, 0)) AS cms_est
         |  FROM pb LEFT JOIN sk USING (cms_row, cms_bucket)
         |  GROUP BY 1, 2)
         |SELECT token, n, cms_est FROM est
         |ORDER BY n DESC, token""".stripMargin,
  )
}
