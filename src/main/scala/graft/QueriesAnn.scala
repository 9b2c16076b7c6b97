package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsOfJoin, BloomJoin, Corpus, Dedup, Events, Hierarchy, Multimodal, Privacy, RangeJoin, Retail, SaltedJoin, Similarity, Sketches, Stats, StockSim, TextOps}
import graft.etl.ZOrder

/** X3 similarity search / ANN over embeddings (brute, IVF,
  * LSH, int8, rerank, kNN-join, SemDeDup) + multimodal plumbing.
  *
  * Registry object: entry/oracle blocks moved verbatim from the
  * pre-r12 ExtQueries monolith (plans unchanged); ExtQueries
  * composes every family back into the driver-contract maps and
  * still owns the shared session stores and SQL fragments.
  */
private[graft] object QueriesAnn {
  import ExtQueries._

  def entries: Map[String, Q] = Map[String, Q](
    // X3 DQ — embedding-store audit: the pre-flight QA before any ANN
    // index build. Dimension consistency, zero vectors (cosine is
    // undefined — they poison centroid training), and non-finite
    // elements (the portable predicate NOT(x − x = 0) catches BOTH NaN
    // and ±Inf on either engine), plus the norm envelope. One per-row
    // projection + a 1-row aggregate; norm² is the same sequential
    // left-fold both engines use for the green cosine family.
    "embedding_audit" -> ((s, dir) => {
      val per = Tables.embeddings(s, dir).select(
        size(col("embedding")).as("dims"),
        expr("aggregate(embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
          .as("norm2"),
        expr("exists(embedding, x -> NOT (x - x = CAST(0 AS FLOAT)))")
          .as("nonfinite"))
      per.agg(
        count(lit(1)).as("n_vectors"),
        min("dims").as("min_dims"), max("dims").as("max_dims"),
        sum(when(col("norm2") === 0d, 1L).otherwise(0L)).as("n_zero"),
        sum(when(col("nonfinite"), 1L).otherwise(0L)).as("n_nonfinite"),
        TextOps.trunc6(min(sqrt(col("norm2")))).as("min_norm_6dp"),
        TextOps.trunc6(max(sqrt(col("norm2")))).as("max_norm_6dp"))
        .orderBy("n_vectors")
    }),

    // X3 — brute-force cosine top-k (custom codegen'd expression).
    "ann_topk" -> ((s, dir) =>
      castLongs(Similarity.topKBruteForce(Tables.embeddings(s, dir)), "rank")
        .orderBy("probe_id", "rank")),

    // §2.11 — the SQL ENTRY PATH as a declared query: the same probe
    // search expressed in spark.sql TEXT over a temp view, with the
    // codegen'd custom expression invoked BY NAME through the
    // GraftExtensions registry — the surface a SQL-only user of the
    // library gets (spark.sql.extensions wiring). Result contract ≡
    // ann_topk; the parser/analyzer path is what this query covers.
    "sql_topk" -> ((s, dir) => {
      graft.GraftExtensions.register(s)
      Tables.embeddings(s, dir).createOrReplaceTempView("graft_emb")
      s.sql(s"""
        WITH pairs AS (
          SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
                 floor(cosine_similarity(a.embedding, b.embedding) * 1000000)
                   / 1000000 AS cosine
          FROM graft_emb a JOIN graft_emb b ON a.vec_id != b.vec_id
          WHERE a.vec_id % 50 = 0 AND a.vec_id < ${50L * Similarity.MaxProbes}),
        r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
                ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
        SELECT probe_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine
        FROM r WHERE rank <= 5 ORDER BY probe_id, rank""")
    }),

    // X3 — IVF-style cell-restricted top-k (the scale path).
    "ann_topk_ivf" -> ((s, dir) =>
      castLongs(Similarity.topKIvf(Tables.embeddings(s, dir)), "rank")
        .orderBy("probe_id", "rank")),

    // X3 — IVF top-k over TRAINED cells: two deterministic Lloyd
    // iterations seeded from the label column (the offline training
    // job, run once per corpus into the assignment store), then
    // cell-restricted search PROBING the store — the plan a real ANN
    // user runs per query.
    "ann_topk_ivf_trained" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val asg = store(s, dir, "ivf_cells")(Similarity.kmeansCells(emb))
      castLongs(Similarity.topKIvfTrained(emb, assignments = Some(asg)), "rank")
        .orderBy("probe_id", "rank")
    }),

    // X3 — corpus-wide kNN SELF-join over the trained cells (the batch
    // retrieval workhorse): every vector's top-3 in-cell neighbors.
    // Σ|cell|² pair volume, cell-keyed shuffle join, nothing broadcast.
    "knn_join" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val asg = store(s, dir, "ivf_cells")(Similarity.kmeansCells(emb))
      castLongs(Similarity.knnJoin(emb, assignments = Some(asg)), "rank")
        .orderBy("probe_id", "rank")
    }),

    // X3 — the SCALED-CELLS kNN join: same contract as knn_join but the
    // cell count grows with the corpus (cells = max(n/200, 1), the IVF
    // design point — Similarity.kmeansCellsByOccupancy), so Σ|cell|²
    // pair volume stays linear per corpus decade where the pinned
    // 10-cell fixture is quadratic (r12: 12×/decade measured, 4e9 pairs
    // at sf10). THIS is the plan a production user runs at scale; the
    // fixture twin stays declared as the small-corpus form.
    "knn_join_scaled" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val asg = scaledCellsStore(s, dir, emb)
      castLongs(Similarity.knnJoin(emb, assignments = Some(asg)), "rank")
        .orderBy("probe_id", "rank")
    }),

    // X4 — SemDeDup over the scaled cells (see knn_join_scaled): the
    // occupancy-pinned assignment keeps the within-cell pair join linear
    // per decade; semdedup_ingest_replay folds against the SAME stores.
    "semantic_dedup_scaled" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val asg = scaledCellsStore(s, dir, emb)
      Similarity.semDedup(emb, threshold = 0.3, assignments = Some(asg))
        .orderBy("vec_id")
    }),

    // X3 — hard-negative mining: per anchor, top-3 most-similar
    // DIFFERENT-label vectors within its trained cell (the contrastive-
    // training pair miner; see Similarity.hardNegatives). Shares the
    // IVF cell store with knn_join.
    "hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val asg = store(s, dir, "ivf_cells")(Similarity.kmeansCells(emb))
      castLongs(Similarity.hardNegatives(emb, assignments = Some(asg)), "rank")
        .orderBy("probe_id", "rank")
    }),

    // X3 — hard-negative mining over the OCCUPANCY-SCALED cells (the
    // knn_join_scaled twin): the pinned 10-cell fixture above is
    // Σ|cell|² = n²/10 (skipped at sf10); with cells = max(n/200, 1)
    // the different-label pair join stays linear per corpus decade.
    // THIS is the production miner; the fixture twin stays declared as
    // the small-corpus form. Shares the ivf_cells_scaled store.
    "hard_negatives_scaled" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val asg = scaledCellsStore(s, dir, emb)
      castLongs(Similarity.hardNegatives(emb, assignments = Some(asg)), "rank")
        .orderBy("probe_id", "rank")
    }),

    // X1/X4 × corpus — LEAKAGE-SAFE dataset split: the hash split keyed
    // by each document's near-dup COMPONENT label instead of its own id,
    // so near-duplicates always land in the same split (doc-id hashing
    // puts a train copy of a test document in the training set — the
    // classic eval leak). Components come from the shared signature
    // store; singletons anchor on themselves. Output is the per-split
    // census; LeakageSpec pins the zero-leak invariant itself.
    "leakage_safe_split" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val groups = dupGroupsStore(s, dir)
      docs.select("doc_id")
        .join(groups.select("doc_id", "group_id"), Seq("doc_id"), "left")
        .withColumn("anchor", coalesce(col("group_id"), col("doc_id")))
        .withColumn("bucket",
          Dedup.hash60(col("anchor").cast("string")) % 100)
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("anchor")).as("n_components"))
        .orderBy("split")
    }),

    // X3 — random-hyperplane LSH-bucketed top-k (the trained-index-free
    // scale path), probing the ingest-time signature store.
    "ann_topk_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val sigs = store(s, dir, "lsh_sigs")(Similarity.lshSignatures(emb))
      castLongs(Similarity.topKLsh(emb, signatures = Some(sigs)), "rank")
        .orderBy("probe_id", "rank")
    }),

    // X3 — multi-probe IVF: each probe searches its 2 nearest trained
    // cells (the standard IVF recall knob), probing the persisted
    // assignment + centroid stores.
    "ann_topk_ivf_multiprobe" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val asg = store(s, dir, "ivf_cells")(Similarity.kmeansCells(emb))
      val cent = store(s, dir, "ivf_centroids")(Similarity.trainedCentroids(emb, asg))
      castLongs(Similarity.topKIvfMultiProbe(emb, nprobe = 2,
        assignments = Some(asg), centroids = Some(cent)), "rank")
        .orderBy("probe_id", "rank")
    }),

    // X3 — IVF-PQ-lite: trained-cell-restricted search over the int8
    // quantized store (both stores probed — the composed 100 TB shape).
    "ann_topk_ivf_quantized" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val asg = store(s, dir, "ivf_cells")(Similarity.kmeansCells(emb))
      val qst = store(s, dir, "quant_store")(Similarity.quantizeEmbeddings(emb))
      castLongs(Similarity.topKIvfQuantized(emb,
        assignments = Some(asg), store = Some(qst)), "rank")
        .orderBy("probe_id", "rank")
    }),

    // X3 — ANN STORE ingest replay (VERDICT r15 ask #8; RE-SCOPED r17
    // per VERDICT r16 ask #2): the at-rest medium pinned for the ANN
    // store KINDS the way DiskStoreSpec pins the pair family. Probes
    // all three trained-IVF stores end-to-end — the scaled assignment,
    // its centroid table, and the int8 quantized corpus — in two
    // halves with different scopes:
    //   (a) LINEAR, corpus-wide: per-cell member count plus the exact
    //       6dp-floored sum of the quantized store's scales (pins the
    //       stores' content, not just row counts) — narrow vec_id
    //       joins and one aggregate, no cosines, O(n) per decade.
    //   (b) BOUNDED routing replay: the family's standard probe set
    //       (vec_id % 50 == 0, first MaxProbes) re-routes via
    //       assignCells against the frozen centroid store — exactly
    //       what an arriving batch does — and the audit counts the
    //       probes whose next-step cell differs (boundary mass).
    //       |probes|·|cells| cosines: linear in cells per decade, vs
    //       the r16 form's corpus-wide re-route (n·|cells| — quadratic
    //       at cells ∝ n, 314.6 s at sf100; see BASELINE.md's
    //       "ann_store_replay re-scope" note).
    // Output is |cells| rows: n_vectors, scale_sum_6dp, n_probed,
    // n_moved (cells without probes report 0/0).
    "ann_store_replay" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val asg = scaledCellsStore(s, dir, emb)
      val cent = scaledCentroidsStore(s, dir, emb)
      val qst = store(s, dir, "quant_store")(Similarity.quantizeEmbeddings(emb))
      val probeRouted = Similarity.assignCells(Similarity.probes(emb, 50), cent)
        .withColumnRenamed("cell", "routed_cell")
      asg.select(col("vec_id"), col("cell"))
        .join(qst.select(col("vec_id"), col("scale")), "vec_id")
        .join(probeRouted, Seq("vec_id"), "left")
        .groupBy("cell")
        .agg(count(lit(1)).as("n_vectors"),
          sum(floor(col("scale") * 1000000).cast("long")).as("scale_sum_6dp"),
          sum(when(col("routed_cell").isNotNull, 1L).otherwise(0L))
            .as("n_probed"),
          sum(when(col("routed_cell").isNotNull &&
              col("routed_cell") =!= col("cell"), 1L).otherwise(0L))
            .as("n_moved"))
        .orderBy("cell")
    }),

    // X3 DQ (r17) — IVF store BALANCE audit: the occupancy census of
    // the scaled assignment store — cell count, corpus coverage,
    // min/max occupancy, and Σ occ² (the pair-volume driver every
    // Σ|cell|²-scoped consumer pays). THE post-retrain gate a real ANN
    // operator runs before swapping a store in: this round's campaign
    // ran exactly this census by hand (DuckDB, BASELINE.md r17 stage 2
    // — Σ occ² 429M vs the 400M ideal) to adjudicate whether a probe
    // regression was cell skew; now it is a declared, oracle-checked
    // query over the same store every probe rides. One narrow
    // aggregate over the (vec_id, cell) store — no embeddings touched.
    "ivf_balance_audit" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val asg = scaledCellsStore(s, dir, emb)
      asg.groupBy("cell").agg(count(lit(1)).as("occ"))
        .agg(count(lit(1)).as("n_cells"),
          sum(col("occ")).as("n_vectors"),
          min(col("occ")).as("min_occ"),
          max(col("occ")).as("max_occ"),
          sum(col("occ") * col("occ")).as("sum_occ2"))
        .orderBy("n_cells")
    }),

    // X3 — embedding-space decontamination: corpus vectors (vec_id % 20
    // != 0) too cosine-similar to the benchmark slice (% 20 == 0,
    // BOUNDED to the first 256 such ids) — the shingle-decontaminate
    // convention on the embedding table. The bound is the operator's
    // actual contract (decontaminateEmbeddings broadcasts the benchmark
    // because eval sets do not grow with the training corpus); the
    // former unbounded %-slice grew ∝ n and measured 59×/decade at the
    // r13 full sf10 run — a fixture artifact, not an operator cost.
    // Threshold 0.35 exercises the op on the synthetic vectors (real
    // embedding spaces run ~0.9).
    "embedding_decontaminate" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      castLongs(Similarity.decontaminateEmbeddings(
        emb.where(pmod(col("vec_id"), lit(20)) =!= 0),
        emb.where(pmod(col("vec_id"), lit(20)) === 0 &&
          col("vec_id") < lit(20L * Similarity.MaxProbes)),
        threshold = 0.35), "n_hits")
        .orderBy("vec_id")
    }),

    // X3 — multi-table LSH top-k: candidates share a bucket in either
    // of 2 independent hyperplane families (the LSH recall knob),
    // probing the multi-table signature store.
    "ann_topk_lsh_multi" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val sigs = store(s, dir, "lsh_sigs_multi")(Similarity.lshSignaturesMulti(emb))
      castLongs(Similarity.topKLshMulti(emb, signatures = Some(sigs)), "rank")
        .orderBy("probe_id", "rank")
    }),

    // X3 — embedding-cosine near-dup pairs, blocked on the OCCUPANCY-
    // SCALED trained cells (r14 re-base: the former 10-fixed-label
    // blocking was Σ|block|² = n²/10 — quadratic per decade, skipped at
    // sf10; scaled cells pin occupancy so the pair join is linear per
    // decade, the knn_join_scaled design point). Shares the
    // ivf_cells_scaled store; the label-blocked triangle join remains
    // the small-corpus API (Similarity.nearDupCosine, spec-covered).
    "embedding_near_dup" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val asg = scaledCellsStore(s, dir, emb)
      Similarity.nearDupCosineCells(emb, assignments = Some(asg))
        .orderBy("vec_a", "vec_b")
    }),

    // X3 — int8 quantized embedding store (digested for the scalar-only
    // oracle compare; the operator itself returns the raw qvec array).
    "embedding_quantize" -> ((s, dir) =>
      Similarity.quantizeEmbeddings(Tables.embeddings(s, dir))
        .select(col("vec_id"), col("scale"),
          md5(concat_ws(",",
            transform(col("qvec"), x => x.cast("string"))).cast("binary")).as("q_md5"),
          aggregate(col("qvec"), lit(0L), (a, x) => a + x).as("q_sum"),
          array_max(col("qvec")).cast("long").as("q_max"))
        .orderBy("vec_id")),

    // X3 — cosine top-k over the int8 quantized store (search never
    // touches the float embeddings).
    "ann_topk_quantized" -> ((s, dir) =>
      castLongs(Similarity.topKQuantized(Tables.embeddings(s, dir)), "rank")
        .orderBy("probe_id", "rank")),

    // X3 — two-stage retrieval: coarse int8 candidates, exact re-rank.
    "ann_topk_rerank" -> ((s, dir) =>
      castLongs(Similarity.topKRerank(Tables.embeddings(s, dir)), "rank")
        .orderBy("probe_id", "rank")),

    // X3 — per-(label, dim) centroid components (exact-decimal mean).
    "label_centroids" -> ((s, dir) =>
      Similarity.labelCentroids(Tables.embeddings(s, dir)).orderBy("label", "dim")),

    // X3 — per-label cohesion: mean/min cosine to the label centroid.
    "label_cohesion" -> ((s, dir) =>
      Similarity.labelCohesion(Tables.embeddings(s, dir)).orderBy("label")),

    // X3 — one k-means assignment step against the label centroids.
    "kmeans_assign" -> ((s, dir) =>
      Similarity.kmeansAssign(Tables.embeddings(s, dir)).orderBy("vec_id")),

    // X3 — embedding drift audit: per-label centroid cosine between the
    // two parity halves of the corpus (see Similarity.centroidShift).
    "centroid_shift" -> ((s, dir) =>
      Similarity.centroidShift(Tables.embeddings(s, dir)).orderBy("label")),

    // X3 — ANN EVALUATION as a query: per-probe recall of the IVF
    // search against the brute-force ground truth, in exact ppm — the
    // "is the index good enough" gate run after every re-train, as one
    // plan (semi-join on the two top-k tables, both bounded by
    // probes·k rows).
    "ann_recall" -> ((s, dir) => {
      val brute = Similarity.topKBruteForce(Tables.embeddings(s, dir))
        .select(col("probe_id"), col("neighbor_id"))
      val ivf = Similarity.topKIvf(Tables.embeddings(s, dir))
        .select(col("probe_id"), col("neighbor_id"))
      val hits = ivf.join(brute, Seq("probe_id", "neighbor_id"), "left_semi")
        .groupBy("probe_id").agg(count(lit(1)).as("n_hit"))
      brute.groupBy("probe_id").agg(count(lit(1)).as("n_true"))
        .join(hits, Seq("probe_id"), "left")
        .na.fill(0L, Seq("n_hit"))
        .withColumn("recall_ppm",
          expr("CAST(n_hit * 1000000 DIV n_true AS BIGINT)"))
        .orderBy("probe_id")
    }),

    // X4 — SemDeDup: cluster-scoped semantic dedup over the trained
    // cell store (threshold tuned to this corpus's cosine scale).
    "semantic_dedup" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val asg = store(s, dir, "ivf_cells")(Similarity.kmeansCells(emb))
      Similarity.semDedup(emb, threshold = 0.3, assignments = Some(asg))
        .orderBy("vec_id")
    }),

    // Multimodal — binary payload + stubbed decode, expression variant.
    "multimodal_features" -> ((s, dir) =>
      castLongs(Multimodal.featurizeExpr(Tables.documents(s, dir)), "n_bytes")
        .orderBy("doc_id")),

    // Multimodal — REAL image decode: each doc's text bytes become a
    // self-describing binary PGM file (dimensions live only inside the
    // payload), then PgmDecode parses the header back out of the bytes
    // and aggregates pixel stats in one codegen'd pass. The oracle
    // recomputes the expected stats from the text by mirroring the
    // encode arithmetic — agreement proves the parser genuinely
    // recovered dimensions + raster offset from the binary. Both
    // engines gate on printable ASCII (ADVICE r15): the Spark side
    // rasters UTF-8 BYTES while the oracle sums per-CHARACTER
    // codepoints, which agree only on single-byte text — the filter
    // makes a future non-ASCII corpus shrink the result identically on
    // both sides instead of surfacing as an opaque hash mismatch.
    // Anchors are the terminator-proof \A..\z (ADVICE r16): Java's $
    // also matches before a final line terminator, so text ending in
    // \n would pass rlike("^...$") but fail DuckDB's full match.
    "image_stats" -> ((s, dir) =>
      castLongs(
        Multimodal.imageStats(Multimodal.encodePgm(
          Tables.documents(s, dir).where(col("text").rlike("\\A[ -~]*\\z")))),
        "width", "height", "maxval", "n_pixels", "pixel_min", "pixel_max")
        .orderBy("doc_id")),

    // Multimodal — frame sampling + fit-box resize planning.
    "frame_sample" -> ((s, dir) =>
      castLongs(Multimodal.frameSample(Tables.documents(s, dir)),
        "frame_no", "frame_offset", "out_w", "out_h")
        .orderBy("doc_id", "frame_no")),

    // Multimodal × dedup — cross-video duplicate FRAME detection: hash
    // each sampled frame's byte slice (the decode stub's stand-in for a
    // perceptual hash), census of hashes appearing in ≥ 2 distinct
    // docs — how video-corpus dedup finds shared segments/intro cards
    // without ever comparing frames pairwise. Distinct + two hash
    // aggregates; the payload never shuffles (hash computed in the
    // scan projection).
    // (The stand-in payload is the ASCII text, so the character slice
    // below equals the byte slice a real frame extractor would hash —
    // DuckDB cannot slice BLOBs, and the decode step is a stub anyway.)
    "frame_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val frames = Multimodal.frameSample(docs)
        .join(Multimodal.featurizeExpr(docs).select("doc_id", "frame_stride"), "doc_id")
        .join(docs.select("doc_id", "text"), "doc_id")
        .select(col("doc_id"),
          md5(expr("CAST(substring(text, frame_offset + 1, frame_stride) AS BINARY)")).as("fh"))
        .distinct()
      frames.groupBy("fh").agg(count(lit(1)).as("n_docs"))
        .where(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("fh"))
    }),
  )

  def oracles: Map[String, String] = Map(
    "ann_topk_quantized" ->
      s"""WITH $dequantCtes,
         |pairs AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, $cosSql AS cosine
         |  FROM dq a JOIN dq b ON a.vec_id != b.vec_id
         |  WHERE a.vec_id % 50 = 0 AND a.vec_id < ${50L * Similarity.MaxProbes}),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, rank, neighbor_id, cosine FROM r
         |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,

    // Coarse-then-rerank: quantized-cosine candidate rank ≤ 25 from the
    // dq store, exact float cosine re-rank of just those pairs.
    "ann_topk_rerank" ->
      s"""WITH $dequantCtes,
         |cp AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, $cosSql AS cosine
         |  FROM dq a JOIN dq b ON a.vec_id != b.vec_id
         |  WHERE a.vec_id % 50 = 0 AND a.vec_id < ${50L * Similarity.MaxProbes}),
         |cr AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY cosine DESC, neighbor_id) AS crank FROM cp),
         |ex AS (
         |  SELECT c.probe_id, c.neighbor_id, $cosSql AS cosine
         |  FROM (SELECT probe_id, neighbor_id FROM cr WHERE crank <= 25) c
         |  JOIN embeddings a ON a.vec_id = c.probe_id
         |  JOIN embeddings b ON b.vec_id = c.neighbor_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank FROM ex)
         |SELECT probe_id, rank, neighbor_id, cosine FROM r
         |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,

    "embedding_quantize" ->
      s"""WITH s AS (SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS scale
         |  FROM embeddings),
         |q AS (SELECT vec_id, scale,
         |    CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0)
         |         ELSE list_transform(embedding,
         |                x -> CAST(floor(x::DOUBLE / scale + 0.5) AS INTEGER)) END AS qvec
         |  FROM s)
         |SELECT vec_id, scale,
         |  md5(array_to_string(qvec, ',')) AS q_md5,
         |  CAST(list_sum(qvec) AS BIGINT) AS q_sum,
         |  CAST(list_max(qvec) AS BIGINT) AS q_max
         |FROM q ORDER BY vec_id""".stripMargin,

    "embedding_audit" ->
      s"""WITH per AS (SELECT len(embedding) AS dims,
         |    list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))
         |      AS norm2,
         |    len(list_filter(embedding, x -> NOT (x - x = 0))) > 0
         |      AS nonfinite
         |  FROM embeddings)
         |SELECT count(*) AS n_vectors,
         |  min(dims) AS min_dims, max(dims) AS max_dims,
         |  CAST(sum(CASE WHEN norm2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         |  CAST(sum(CASE WHEN nonfinite THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_nonfinite,
         |  floor(min(sqrt(norm2)) * 1000000) / 1000000 AS min_norm_6dp,
         |  floor(max(sqrt(norm2)) * 1000000) / 1000000 AS max_norm_6dp
         |FROM per ORDER BY n_vectors""".stripMargin,

    "ann_topk" -> bruteTopkSql,

    // Same result contract as ann_topk — the Spark side differs only in
    // ENTRY PATH (SQL text + registered function vs Column API).
    "sql_topk" -> bruteTopkSql,

    "ann_topk_ivf_trained" ->
      s"""WITH ${kmeansCtes(Similarity.IvfTrainRounds)},
         |e2 AS (SELECT e.vec_id, e.embedding, a.cell
         |  FROM embeddings e JOIN a${Similarity.IvfTrainRounds} a USING (vec_id)),
         |pairs AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, $cosSql AS cosine
         |  FROM e2 a JOIN e2 b ON a.cell = b.cell AND a.vec_id != b.vec_id
         |  WHERE a.vec_id % 50 = 0 AND a.vec_id < ${50L * Similarity.MaxProbes}),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, rank, neighbor_id, cosine FROM r
         |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,

    // Scaled-cells twins: the same pair-join SQL over the COARSE-ROUTED
    // occupancy-seeded k-means chain (cells = max(n/200, 1) as a scalar
    // subquery; the two-level build of kmeansCellsByOccupancyCoarse
    // unrolled step for step — deterministic on both engines).
    "knn_join_scaled" ->
      s"""WITH ${kmeansCoarseCtes(Similarity.IvfTrainRounds, scaledSeedSql(200))},
         |e2 AS (SELECT e.vec_id, e.embedding, a.cell
         |  FROM embeddings e JOIN a${Similarity.IvfTrainRounds} a USING (vec_id)),
         |pairs AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, $cosSql AS cosine
         |  FROM e2 a JOIN e2 b ON a.cell = b.cell AND a.vec_id != b.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, rank, neighbor_id, cosine FROM r
         |WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin,

    "semantic_dedup_scaled" -> {
      val r = Similarity.IvfTrainRounds
      s"""WITH ${kmeansCoarseCtes(r, scaledSeedSql(200))},
         |e2 AS (SELECT e.vec_id, e.embedding, a.cell
         |  FROM embeddings e JOIN a$r a USING (vec_id)),
         |d AS (SELECT DISTINCT b.vec_id FROM e2 a JOIN e2 b
         |  ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE $cosSql >= 0.3)
         |SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS kept
         |FROM a$r a LEFT JOIN d ON a.vec_id = d.vec_id
         |ORDER BY a.vec_id""".stripMargin
    },

    // Stored assignment = a_r of the coarse chain; `finalCentroids`
    // emits cent_{r+1} — exactly trainedCentroids of a_r, the frozen
    // centroid store — and the bounded probe re-route is one FULL-WIDTH
    // argmax of the probe set against it (assignCells: same floored
    // cosine, same smaller-cell tie-break). The quantized store's scale
    // is max|x|/127, one IEEE division.
    "ann_store_replay" -> {
      val r = Similarity.IvfTrainRounds
      s"""WITH ${kmeansCoarseCtes(r, scaledSeedSql(200), finalCentroids = true)},
         |q AS (SELECT vec_id,
         |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0
         |      AS scale
         |  FROM embeddings),
         |pr AS (SELECT vec_id, c_cell AS routed_cell FROM (
         |    SELECT e.vec_id, c.c_cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosListsSql("e.embedding", "c.cen")} DESC, c.c_cell)
         |        AS rn
         |    FROM embeddings e CROSS JOIN cent${r + 1} c
         |    WHERE e.vec_id % 50 = 0
         |      AND e.vec_id < ${50L * Similarity.MaxProbes}) WHERE rn = 1)
         |SELECT s.cell,
         |  CAST(count(*) AS BIGINT) AS n_vectors,
         |  CAST(sum(CAST(floor(scale * 1000000) AS BIGINT)) AS BIGINT)
         |    AS scale_sum_6dp,
         |  CAST(sum(CASE WHEN pr.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_probed,
         |  CAST(sum(CASE WHEN pr.routed_cell IS NOT NULL
         |      AND pr.routed_cell != s.cell THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_moved
         |FROM a$r s JOIN q USING (vec_id) LEFT JOIN pr USING (vec_id)
         |GROUP BY s.cell ORDER BY s.cell""".stripMargin
    },

    // The trained-cell pair join with NO probe filter: every vector is
    // a probe, top-3 per vector.
    "knn_join" ->
      s"""WITH ${kmeansCtes(Similarity.IvfTrainRounds)},
         |e2 AS (SELECT e.vec_id, e.embedding, a.cell
         |  FROM embeddings e JOIN a${Similarity.IvfTrainRounds} a USING (vec_id)),
         |pairs AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, $cosSql AS cosine
         |  FROM e2 a JOIN e2 b ON a.cell = b.cell AND a.vec_id != b.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, rank, neighbor_id, cosine FROM r
         |WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin,

    "hard_negatives" ->
      s"""WITH ${kmeansCtes(Similarity.IvfTrainRounds)},
         |e2 AS (SELECT e.vec_id, e.embedding, e.label, a.cell
         |  FROM embeddings e JOIN a${Similarity.IvfTrainRounds} a USING (vec_id)),
         |pairs AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, $cosSql AS cosine
         |  FROM e2 a JOIN e2 b ON a.cell = b.cell AND a.label != b.label),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, rank, neighbor_id, cosine FROM r
         |WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin,

    // Occupancy census over the coarse chain's final assignment.
    "ivf_balance_audit" -> {
      val r = Similarity.IvfTrainRounds
      s"""WITH ${kmeansCoarseCtes(r, scaledSeedSql(200))},
         |occ AS (SELECT cell, count(*) AS occ FROM a$r GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_cells,
         |  CAST(sum(occ) AS BIGINT) AS n_vectors,
         |  CAST(min(occ) AS BIGINT) AS min_occ,
         |  CAST(max(occ) AS BIGINT) AS max_occ,
         |  CAST(sum(occ * occ) AS BIGINT) AS sum_occ2
         |FROM occ ORDER BY n_cells""".stripMargin
    },

    // Same different-label pair join over the coarse-routed
    // occupancy-seeded k-means chain (the knn_join_scaled oracle
    // pattern).
    "hard_negatives_scaled" ->
      s"""WITH ${kmeansCoarseCtes(Similarity.IvfTrainRounds, scaledSeedSql(200))},
         |e2 AS (SELECT e.vec_id, e.embedding, e.label, a.cell
         |  FROM embeddings e JOIN a${Similarity.IvfTrainRounds} a USING (vec_id)),
         |pairs AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, $cosSql AS cosine
         |  FROM e2 a JOIN e2 b ON a.cell = b.cell AND a.label != b.label),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, rank, neighbor_id, cosine FROM r
         |WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin,

    "leakage_safe_split" ->
      s"""WITH RECURSIVE ${minhashCtes()},
         |$dupGroupCtes,
         |an AS (SELECT d.doc_id, COALESCE(lbl.group_id, d.doc_id) AS anchor
         |  FROM documents d LEFT JOIN lbl ON d.doc_id = lbl.doc_id),
         |sp AS (SELECT doc_id, anchor,
         |    CASE WHEN ${hash60Sql("anchor::VARCHAR")} % 100 < 80 THEN 'train'
         |         WHEN ${hash60Sql("anchor::VARCHAR")} % 100 < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM an)
         |SELECT split, count(*) AS n_docs,
         |  CAST(count(DISTINCT anchor) AS BIGINT) AS n_components
         |FROM sp GROUP BY 1 ORDER BY split""".stripMargin,

    // Trained cells + final-assignment centroids; each probe searches
    // its 2 nearest cells — Similarity.topKIvfMultiProbe.
    "ann_topk_ivf_multiprobe" -> {
      val r = Similarity.IvfTrainRounds
      s"""WITH ${kmeansCtes(r)},
         |cxf AS (SELECT a.cell, i - 1 AS dim, e.embedding[i]::DOUBLE AS x
         |  FROM embeddings e JOIN a$r a USING (vec_id),
         |       unnest(range(1, len(e.embedding) + 1)) AS u(i)),
         |csf AS (SELECT cell, dim, sum(x::DECIMAL(30,10)) AS sx, count(*) AS n_vecs
         |  FROM cxf GROUP BY 1, 2),
         |centf AS (SELECT cell AS c_cell,
         |    list((floor(sx::DOUBLE / n_vecs * 1000000) / 1000000)::FLOAT ORDER BY dim)
         |      AS cen
         |  FROM csf GROUP BY cell),
         |pcos AS (SELECT e.vec_id, c_cell, $cosCenSql AS cos
         |  FROM embeddings e CROSS JOIN centf
         |  WHERE e.vec_id % 50 = 0 AND e.vec_id < ${50L * Similarity.MaxProbes}),
         |pc AS (SELECT vec_id AS probe_id, c_cell AS cell FROM (
         |    SELECT vec_id, c_cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_cell) AS rn
         |    FROM pcos) WHERE rn <= 2),
         |e2 AS (SELECT e.vec_id, e.embedding, a.cell
         |  FROM embeddings e JOIN a$r a USING (vec_id)),
         |pairs AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, $cosSql AS cosine
         |  FROM embeddings a
         |  JOIN pc ON pc.probe_id = a.vec_id
         |  JOIN e2 b ON b.cell = pc.cell AND b.vec_id != a.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, rank, neighbor_id, cosine FROM r
         |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin
    },

    // Trained cells (kmeansCtes over the FULL-PRECISION embeddings, the
    // offline IVF build) restricting a search over the dequantized int8
    // store — Similarity.topKIvfQuantized.
    "ann_topk_ivf_quantized" ->
      s"""WITH ${kmeansCtes(Similarity.IvfTrainRounds)},
         |sc AS (SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0 AS scale
         |  FROM embeddings),
         |dq AS (SELECT vec_id,
         |    CASE WHEN scale = 0 THEN list_transform(embedding, x -> CAST(0 AS FLOAT))
         |         ELSE list_transform(embedding,
         |                x -> CAST(CAST(floor(x::DOUBLE / scale + 0.5) AS INTEGER)::DOUBLE
         |                          * scale AS FLOAT)) END AS embedding
         |  FROM sc),
         |e2 AS (SELECT d.vec_id, d.embedding, a.cell
         |  FROM dq d JOIN a${Similarity.IvfTrainRounds} a USING (vec_id)),
         |pairs AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, $cosSql AS cosine
         |  FROM e2 a JOIN e2 b ON a.cell = b.cell AND a.vec_id != b.vec_id
         |  WHERE a.vec_id % 50 = 0 AND a.vec_id < ${50L * Similarity.MaxProbes}),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, rank, neighbor_id, cosine FROM r
         |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,

    "ann_topk_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${rpBucketSql("embedding")} AS bkt
         |    FROM embeddings),
         |pairs AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, $cosSql AS cosine
         |  FROM e a JOIN e b ON a.bkt = b.bkt AND a.vec_id != b.vec_id
         |  WHERE a.vec_id % 50 = 0 AND a.vec_id < ${50L * Similarity.MaxProbes}),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, rank, neighbor_id, cosine FROM r
         |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,

    "ann_topk_lsh_multi" ->
      s"""WITH e AS (SELECT vec_id, embedding,
         |    ${rpBucketSql("embedding", 0)} AS b0,
         |    ${rpBucketSql("embedding", 1)} AS b1
         |    FROM embeddings),
         |pairs AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, $cosSql AS cosine
         |  FROM e a JOIN e b
         |    ON (a.b0 = b.b0 OR a.b1 = b.b1) AND a.vec_id != b.vec_id
         |  WHERE a.vec_id % 50 = 0 AND a.vec_id < ${50L * Similarity.MaxProbes}),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, rank, neighbor_id, cosine FROM r
         |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,

    "centroid_shift" ->
      s"""WITH cxa AS (SELECT label, i - 1 AS dim, embedding[i]::DOUBLE AS x
         |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
         |  WHERE vec_id % 2 = 0),
         |csa AS (SELECT label, dim, sum(x::DECIMAL(30,10)) AS sx, count(*) AS n
         |        FROM cxa GROUP BY 1, 2),
         |ca AS (SELECT label,
         |    list((floor(sx::DOUBLE / n * 1000000) / 1000000)::FLOAT ORDER BY dim)
         |      AS cen_a
         |  FROM csa GROUP BY 1),
         |cxb AS (SELECT label, i - 1 AS dim, embedding[i]::DOUBLE AS x
         |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
         |  WHERE vec_id % 2 = 1),
         |csb AS (SELECT label, dim, sum(x::DECIMAL(30,10)) AS sx, count(*) AS n
         |        FROM cxb GROUP BY 1, 2),
         |cb AS (SELECT label,
         |    list((floor(sx::DOUBLE / n * 1000000) / 1000000)::FLOAT ORDER BY dim)
         |      AS cen_b
         |  FROM csb GROUP BY 1),
         |na AS (SELECT label, count(*) AS n_even FROM embeddings
         |       WHERE vec_id % 2 = 0 GROUP BY 1),
         |nb AS (SELECT label, count(*) AS n_odd FROM embeddings
         |       WHERE vec_id % 2 = 1 GROUP BY 1)
         |SELECT label, n_even, n_odd,
         |  floor(
         |    list_sum(list_transform(range(1, len(cen_a) + 1),
         |      i -> cen_a[i]::DOUBLE * cen_b[i]::DOUBLE)) /
         |    (sqrt(list_sum(list_transform(range(1, len(cen_a) + 1),
         |      i -> cen_a[i]::DOUBLE * cen_a[i]::DOUBLE))) *
         |     sqrt(list_sum(list_transform(range(1, len(cen_b) + 1),
         |      i -> cen_b[i]::DOUBLE * cen_b[i]::DOUBLE))))
         |    * 1000000) / 1000000 AS shift_cos
         |FROM ca JOIN cb USING (label) JOIN na USING (label) JOIN nb USING (label)
         |ORDER BY label""".stripMargin,

    "ann_recall" ->
      s"""WITH bp AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, $cosSql AS cosine
         |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
         |  WHERE a.vec_id % 50 = 0 AND a.vec_id < ${50L * Similarity.MaxProbes}),
         |br AS (SELECT probe_id, neighbor_id, row_number() OVER
         |    (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM bp),
         |bt AS (SELECT probe_id, neighbor_id FROM br WHERE rank <= 5),
         |ip AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, $cosSql AS cosine
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id != b.vec_id
         |  WHERE a.vec_id % 50 = 0 AND a.vec_id < ${50L * Similarity.MaxProbes}),
         |ir AS (SELECT probe_id, neighbor_id, row_number() OVER
         |    (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS rank
         |  FROM ip),
         |it AS (SELECT probe_id, neighbor_id FROM ir WHERE rank <= 5),
         |h AS (SELECT bt.probe_id, count(*) AS n_hit
         |      FROM it JOIN bt USING (probe_id, neighbor_id) GROUP BY 1),
         |t AS (SELECT probe_id, count(*) AS n_true FROM bt GROUP BY 1)
         |SELECT t.probe_id, n_true, COALESCE(n_hit, 0) AS n_hit,
         |  CAST(COALESCE(n_hit, 0) * 1000000 // n_true AS BIGINT) AS recall_ppm
         |FROM t LEFT JOIN h USING (probe_id) ORDER BY probe_id""".stripMargin,

    "ann_topk_ivf" ->
      s"""WITH pairs AS (
         |  SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, $cosSql AS cosine
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id != b.vec_id
         |  WHERE a.vec_id % 50 = 0 AND a.vec_id < ${50L * Similarity.MaxProbes}),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, rank, neighbor_id, cosine FROM r
         |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,

    "embedding_decontaminate" ->
      s"""WITH hits AS (
         |  SELECT a.vec_id, b.vec_id AS bench_id, $cosSql AS cos
         |  FROM (SELECT * FROM embeddings WHERE vec_id % 20 != 0) a,
         |       (SELECT * FROM embeddings WHERE vec_id % 20 = 0
         |          AND vec_id < ${20L * Similarity.MaxProbes}) b
         |  WHERE cos >= 0.35),
         |r AS (SELECT vec_id, bench_id, cos,
         |        count(*) OVER (PARTITION BY vec_id) AS n_hits,
         |        row_number() OVER (PARTITION BY vec_id
         |          ORDER BY cos DESC, bench_id) AS rn
         |      FROM hits)
         |SELECT vec_id, n_hits, cos AS max_cos, bench_id AS nearest_bench
         |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // Within-cell pair join over the coarse-routed occupancy-seeded
    // k-means chain (r14 re-base from the fixed-label blocking — see
    // the entry note; r17 re-base onto the coarse build).
    "embedding_near_dup" ->
      s"""WITH ${kmeansCoarseCtes(Similarity.IvfTrainRounds, scaledSeedSql(200))},
         |e2 AS (SELECT e.vec_id, e.embedding, a.cell
         |  FROM embeddings e JOIN a${Similarity.IvfTrainRounds} a USING (vec_id))
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $cosSql AS cosine
         |FROM e2 a JOIN e2 b
         |  ON a.cell = b.cell AND a.vec_id < b.vec_id
         |WHERE cosine >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,

    "kmeans_assign" ->
      s"""WITH ${centroidCtes("c_label")},
         |p AS (SELECT e.vec_id, e.label, cent.c_label, $cosCenSql AS cos
         |  FROM embeddings e CROSS JOIN cent),
         |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |        ORDER BY cos DESC, c_label) AS rn FROM p)
         |SELECT vec_id, label, c_label AS new_label, cos,
         |  c_label != label AS moved
         |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "label_centroids" ->
      s"""WITH $centroidSumCtes
         |SELECT label, dim, n_vecs,
         |  floor(sx::DOUBLE / n_vecs * 1000000) / 1000000 AS centroid_val
         |FROM cs ORDER BY label, dim""".stripMargin,

    "label_cohesion" ->
      s"""WITH ${centroidCtes("label")},
         |j AS (SELECT e.label, $cosCenSql AS cos_c
         |  FROM embeddings e JOIN cent USING (label))
         |SELECT label, count(*) AS n_vecs,
         |  floor(sum(cos_c::DECIMAL(20,10))::DOUBLE / count(*) * 1000000) / 1000000
         |    AS avg_cos,
         |  min(cos_c) AS min_cos
         |FROM j GROUP BY label ORDER BY label""".stripMargin,

    "multimodal_features" ->
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  64 + (ascii(substr(md5(text), 1, 1)) % 16) * 16 AS width,
         |  64 + (ascii(substr(md5(text), 2, 1)) % 16) * 16 AS height,
         |  1 + ascii(substr(md5(text), 3, 1)) % 8 AS n_frames,
         |  CAST(octet_length(encode(text)) // (1 + ascii(substr(md5(text), 3, 1)) % 8) AS INTEGER)
         |    AS frame_stride
         |FROM documents ORDER BY doc_id""".stripMargin,

    // Mirrors encodePgm's construction (width 32, truncate to full
    // rows) over the text — NOT a byte-level re-parse (DuckDB cannot
    // iterate BLOB bytes); the printable-ASCII gate (shared with the
    // Spark side) is what makes char codepoints equal payload raster
    // bytes exactly, and makes a non-ASCII corpus drop the same rows
    // on both engines instead of diverging.
    "image_stats" ->
      s"""SELECT doc_id,
         |  CAST(32 AS BIGINT) AS width,
         |  CAST(length(text) // 32 AS BIGINT) AS height,
         |  CAST(255 AS BIGINT) AS maxval,
         |  CAST((length(text) // 32) * 32 AS BIGINT) AS n_pixels,
         |  CAST(list_sum([ord(c) FOR c IN
         |    string_split(substr(text, 1, (length(text) // 32) * 32), '')])
         |    AS BIGINT) AS pixel_sum,
         |  CAST(list_min([ord(c) FOR c IN
         |    string_split(substr(text, 1, (length(text) // 32) * 32), '')])
         |    AS BIGINT) AS pixel_min,
         |  CAST(list_max([ord(c) FOR c IN
         |    string_split(substr(text, 1, (length(text) // 32) * 32), '')])
         |    AS BIGINT) AS pixel_max
         |FROM documents
         |WHERE length(text) >= 32 AND regexp_full_match(text, '[ -~]*')
         |ORDER BY doc_id""".stripMargin,

    "semantic_dedup" -> {
      val r = Similarity.IvfTrainRounds
      s"""WITH ${kmeansCtes(r)},
         |e2 AS (SELECT e.vec_id, e.embedding, a.cell
         |  FROM embeddings e JOIN a$r a USING (vec_id)),
         |d AS (SELECT DISTINCT b.vec_id FROM e2 a JOIN e2 b
         |  ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE $cosSql >= 0.3)
         |SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS kept
         |FROM a$r a LEFT JOIN d ON a.vec_id = d.vec_id
         |ORDER BY a.vec_id""".stripMargin
    },

    "frame_sample" ->
      s"""WITH f AS (SELECT doc_id,
         |    64 + (ascii(substr(md5(text), 1, 1)) % 16) * 16 AS width,
         |    64 + (ascii(substr(md5(text), 2, 1)) % 16) * 16 AS height,
         |    1 + ascii(substr(md5(text), 3, 1)) % 8 AS n_frames,
         |    octet_length(encode(text)) // (1 + ascii(substr(md5(text), 3, 1)) % 8)
         |      AS frame_stride
         |  FROM documents)
         |SELECT doc_id, CAST(t.frame_no AS BIGINT) AS frame_no,
         |  CAST(t.frame_no * frame_stride AS BIGINT) AS frame_offset,
         |  CAST((width * 224) // greatest(width, height) AS BIGINT) AS out_w,
         |  CAST((height * 224) // greatest(width, height) AS BIGINT) AS out_h
         |FROM f, unnest(range(0, n_frames, 2)) AS t(frame_no)
         |ORDER BY doc_id, frame_no""".stripMargin,

    "frame_dedup" ->
      s"""WITH f AS (SELECT doc_id, text,
         |    1 + ascii(substr(md5(text), 3, 1)) % 8 AS n_frames,
         |    octet_length(encode(text)) // (1 + ascii(substr(md5(text), 3, 1)) % 8)
         |      AS frame_stride
         |  FROM documents),
         |fr AS (SELECT DISTINCT doc_id,
         |    md5(substr(text, CAST(t.frame_no * frame_stride + 1 AS BIGINT),
         |      frame_stride)) AS fh
         |  FROM f, unnest(range(0, n_frames, 2)) AS t(frame_no))
         |SELECT fh, count(*) AS n_docs
         |FROM fr GROUP BY 1 HAVING count(*) >= 2
         |ORDER BY n_docs DESC, fh""".stripMargin,
  )
}
