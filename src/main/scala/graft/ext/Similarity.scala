package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Ckpt.SerCkptOps

import graft.functions.{CosineSimilarity, TopKByScore}

/** Similarity search over the `embeddings` table (SURVEY.md §2.11 X3):
  * approximate-nearest-neighbor top-k and embedding-cosine near-dup.
  *
  * The cosine kernel is the custom codegen'd Catalyst expression
  * `graft.functions.CosineSimilarity` — one fused loop for dot product
  * and both norms instead of three higher-order-function passes.
  *
  * Scale design (100 TB of vectors):
  *  - `topKBruteForce` broadcasts the probe set against the full corpus —
  *    a map-side join, no shuffle of the corpus; per-probe top-k via
  *    window rank. Correct baseline, O(|probes| × |corpus|), and the
  *    probe set is CONTRACTUALLY bounded ([[MaxProbes]]): the broadcast
  *    side cannot grow with the corpus, so the quadratic blow-up of an
  *    unbounded probe set is excluded by construction, not by hope.
  *  - `topKIvf` is the scale path: vectors are assigned to cells (the
  *    pre-assigned `label` column, or cells TRAINED by `kmeansCells` —
  *    `topKIvfTrained`; at rest, cell = partition key). A probe searches
  *    only its own cell → partition-pruned scan, work divided by the
  *    cell count.
  *  - `nearDupCosine` is a triangle-partitioned blocked self-join: cells
  *    are salted into sub-blocks and joined pairwise, so NO side is ever
  *    broadcast whole (the previous full-corpus broadcast was an executor
  *    OOM at any real scale) and no join group buffers more than
  *    |cell|/N vectors.
  */
object Similarity {

  /** Truncated cosine similarity (floor, 6dp) — truncation makes ranking
    * ties deterministic across engines so results are oracle-comparable
    * (floor, not round: see TextOps.trunc6).
    */
  private def cos6 = TextOps.trunc6(CosineSimilarity(col("a.embedding"), col("b.embedding")))

  /** Per-probe top-k via the bounded [[TopKByScore]] aggregate, not a
    * window rank: the aggregate's map-side partial keeps ≤ k rows per
    * (probe, partition) through the exchange, where the window form
    * shuffles and sorts EVERY candidate row. Equivalent output
    * (score desc, id-asc tie-break).
    */
  private def topK(joined: DataFrame, k: Int): DataFrame =
    joined
      .groupBy("probe_id")
      .agg(TopKByScore(col("cosine"), col("neighbor_id"), k).as("tk"))
      .select(col("probe_id"), posexplode(col("tk")).as(Seq("r", "nb")))
      .select(col("probe_id"), (col("r") + 1).as("rank"),
        col("nb.id").as("neighbor_id"), col("nb.score").as("cosine"))

  /** Hard cap on the brute-force probe set: the broadcast side is at most
    * MaxProbes vectors regardless of corpus size, keeping the O(P×N)
    * baseline linear in the corpus with a fixed constant.
    */
  val MaxProbes = 256

  /** Every `probeEvery`-th vector is a probe (deterministic probe set),
    * bounded to the first [[MaxProbes]] such vectors.
    */
  def probes(embeddings: DataFrame, probeEvery: Int): DataFrame =
    embeddings.where(col("vec_id") % probeEvery === 0 &&
      col("vec_id") < lit(probeEvery.toLong * MaxProbes))

  /** X3 — exact brute-force cosine top-k per probe (the baseline). */
  def topKBruteForce(embeddings: DataFrame, probeEvery: Int = 50, k: Int = 5): DataFrame =
    topK(
      broadcast(probes(embeddings, probeEvery).as("a"))
        .join(embeddings.as("b"), col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("probe_id"), col("b.vec_id").as("neighbor_id"),
          cos6.as("cosine")),
      k)

  /** Random-hyperplane LSH signature width (buckets = 2^LshBits). For a
    * hyperplane family we use DETERMINISTIC ±1 signs derived from integer
    * arithmetic — `sign(i, j) = +1 iff bit 4 of (i·2654435761 + j·40503)`
    * — instead of sampled Gaussians: sign vectors are a valid SimHash
    * family for angular distance, and integer-derived signs make the
    * bucketing bit-identical in any engine (the DuckDB oracle rebuilds
    * the same planes from the same formula; no RNG state to mirror).
    */
  val LshBits = 6

  /** Embedding width the default hyperplane family covers — a PARAMETER
    * of the signature ([[lshSignatures]]' `dim`), not a hard bake: the
    * testdata embeddings are 64-wide, so 64 is the default.
    */
  val EmbDim = 64

  private def lshSign(i: Int, j: Int): Double =
    if (((i * 2654435761L + j * 40503L) & 16L) != 0L) 1.0 else -1.0

  /** Bucket id: bit i set iff the vector's dot product with hyperplane i
    * is strictly positive. Two HOF passes per plane (interpreted — fine
    * for signature computation at INGEST, which is where this belongs:
    * [[lshSignatures]] computes it once per vector into the persisted
    * store, exactly like the IVF cell id, and [[topKLsh]] probes the
    * store instead of recomputing per query). `table` selects an
    * independent hyperplane family (planes table·[[LshBits]] …) — the
    * multi-table recall knob of [[topKLshMulti]]; table 0 is the
    * single-table family.
    */
  private def rpBucket(vec: org.apache.spark.sql.Column,
      dim: Int, table: Int = 0): org.apache.spark.sql.Column =
    (0 until LshBits).map { i =>
      val signs = array((1 to dim).map(j => lit(lshSign(table * LshBits + i, j))): _*)
      when(aggregate(zip_with(vec, signs, (x, s) => x * s),
        lit(0.0d), (acc, x) => acc + x) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** The LSH SIGNATURE STORE: one `(vec_id, bkt)` row per vector — a
    * pure per-vector function (like [[graft.ext.Dedup.minhashBands]]),
    * so signatures computed batch-by-batch equal signatures computed
    * over the union, and at scale this is written once per ingest batch
    * and persisted (bucketed/partitioned by `bkt`, so a probe's
    * candidate fetch is a pruned read). `dim` is the embedding width
    * the hyperplanes cover.
    */
  def lshSignatures(embeddings: DataFrame, dim: Int = EmbDim): DataFrame =
    embeddings.select(col("vec_id"),
      rpBucket(col("embedding"), dim).as("bkt"))

  /** The MULTI-TABLE form of the LSH signature store: `tables`
    * independent hyperplane families, one `(vec_id, tbl, bkt)` row per
    * (vector, table). Table 0's buckets are exactly [[lshSignatures]]'.
    * Still a pure per-vector function (batch-by-batch ≡ one-pass), so
    * the ingest/streaming maintenance story is unchanged; at rest the
    * layout partitions by (tbl, bkt).
    */
  def lshSignaturesMulti(embeddings: DataFrame, tables: Int = 2,
      dim: Int = EmbDim): DataFrame =
    embeddings.select(col("vec_id"),
      posexplode(array((0 until tables).map(t =>
        rpBucket(col("embedding"), dim, t)): _*)).as(Seq("tbl", "bkt")))

  /** X3 — MULTI-TABLE LSH top-k: candidates share a bucket in ANY of
    * `tables` independent hyperplane families — the standard LSH recall
    * knob (the [[topKIvfMultiProbe]] of the data-independent path). A
    * single table misses a true neighbor whenever one of the 6
    * hyperplanes separates the pair; with L tables the miss probability
    * is pₘᵢₛₛᴸ, at a cost multiplier ≤ L on candidates. Pairs colliding
    * in several tables are deduped BEFORE the cosine, so verification
    * pays each candidate once. Only PROBE-scale frames are broadcast
    * (the probe band rows and the probe embeddings — both ≤
    * [[MaxProbes]]·L rows by contract): the CANDIDATE list grows
    * ∝ probes · corpus/2^[[LshBits]] · L, so it flows through shuffle
    * joins — broadcasting it measured a driver maxResultSize abort at
    * the sf10 full-set run (1 GB of candidate×embedding rows collected
    * for the broadcast; the r13 fix). `signatures` probes a persisted
    * [[lshSignaturesMulti]] store; `tables = 1` reproduces [[topKLsh]]
    * exactly (spec-asserted).
    */
  def topKLshMulti(embeddings: DataFrame, probeEvery: Int = 50, k: Int = 5,
      tables: Int = 2, signatures: Option[DataFrame] = None): DataFrame = {
    val sigs = signatures.getOrElse(lshSignaturesMulti(embeddings, tables))
    val pr = probes(embeddings, probeEvery)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    val cand = broadcast(pr.select("probe_id")
        .join(sigs.select(col("vec_id").as("probe_id"), col("tbl"), col("bkt")),
          "probe_id"))
      .join(sigs, Seq("tbl", "bkt"))
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    topK(
      cand
        .join(embeddings.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("n_emb")), "neighbor_id")
        .join(broadcast(pr), "probe_id")
        .select(col("probe_id"), col("neighbor_id"),
          TextOps.trunc6(CosineSimilarity(col("p_emb"), col("n_emb"))).as("cosine")),
      k)
  }

  /** X3 — LSH-bucketed top-k (the second scale path, complementing IVF):
    * candidates are vectors in the probe's random-hyperplane bucket, so a
    * probe touches ~|corpus| / 2^[[LshBits]] vectors. Unlike IVF this
    * needs no trained centroids — the bucketing is data-independent — at
    * the cost of recall near bucket boundaries (the classic trade; both
    * paths share the same verification kernel and top-k aggregate).
    *
    * `signatures` is the persisted [[lshSignatures]] store; when given,
    * buckets come from the store (the 100 TB path — no per-query
    * signature recompute), when absent they are derived inline (the
    * self-contained form; identical output, asserted by spec).
    */
  def topKLsh(embeddings: DataFrame, probeEvery: Int = 50, k: Int = 5,
      signatures: Option[DataFrame] = None): DataFrame = {
    val e = signatures match {
      case Some(store) => embeddings.join(store.select(col("vec_id"), col("bkt")), "vec_id")
      case None => embeddings.withColumn("bkt", rpBucket(col("embedding"), EmbDim))
    }
    topK(
      broadcast(probes(e, probeEvery).as("a"))
        .join(e.as("b"),
          col("a.bkt") === col("b.bkt") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("probe_id"), col("b.vec_id").as("neighbor_id"),
          cos6.as("cosine")),
      k)
  }

  /** X3 — IVF-style cell-restricted top-k over a PRE-ASSIGNED cell id
    * (`label`): the form a store whose cell column was materialized at
    * ingest runs — at scale cells map to storage partitions so the scan
    * itself is pruned. [[topKIvfTrained]] is the same search pattern
    * with the assignment actually TRAINED ([[kmeansCells]]) instead of
    * taken from the stored column.
    */
  def topKIvf(embeddings: DataFrame, probeEvery: Int = 50, k: Int = 5): DataFrame =
    topK(
      broadcast(probes(embeddings, probeEvery).as("a"))
        .join(embeddings.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("probe_id"), col("b.vec_id").as("neighbor_id"),
          cos6.as("cosine")),
      k)

  /** Per-(label, dimension) centroid components — mean pooling over each
    * cell's vectors, the Lloyd's-iteration / cluster-profile primitive of
    * an embedding pipeline. Output: label, dim, n_vecs, centroid_val
    * (truncated 6dp).
    *
    * Determinism at scale: a double sum's value depends on accumulation
    * order, and Spark's partial-aggregate order is nondeterministic — so
    * components are summed as DECIMAL(30,10) (each float rounded once to
    * 10dp, then summed EXACTLY). Decimal addition is associative, so the
    * mean is bit-identical regardless of partitioning, run-to-run and
    * engine-to-engine. Plan shape: posexplode → one hash aggregate on
    * (label, dim) — key space = |labels|·dims, the map side combines, and
    * no row ever carries more than one component. At 100 TB this is the
    * canonical distributed mean: one shuffle of |labels|·dims·partitions
    * partial rows.
    */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("label", "dim")
      .agg(sum(col("x").cast("double").cast("decimal(30,10)")).as("sx"),
        count(lit(1)).as("n_vecs"))
      .select(col("label"), col("dim").cast("long").as("dim"), col("n_vecs"),
        TextOps.trunc6(col("sx").cast("double") / col("n_vecs")).as("centroid_val"))

  /** Per-label cluster cohesion: each vector's cosine to its label
    * centroid (assembled from [[labelCentroids]], cast to float so the
    * codegen'd [[CosineSimilarity]] kernel applies), aggregated to the
    * label's member count, mean and minimum cosine — the cluster-quality
    * gate run after any reclustering, and the assign-score of one k-means
    * step. Output: label, n_vecs, avg_cos, min_cos.
    *
    * The centroid table is |labels|·dims rows — broadcast by
    * construction, never corpus-sized. The mean cosine uses the same
    * exact-decimal trick as [[labelCentroids]] (cosines are 6dp-truncated
    * first, so the 10dp decimal cast is exact on both engines); min needs
    * no such care. One aggregate on label after a map-side broadcast
    * join: the corpus contributes a single scan.
    */
  /** Per-cell float-array centroids of an arbitrary `(cell, embedding)`
    * frame — the [[labelCentroids]] aggregation (exact-decimal sums,
    * trunc6, dim-sorted assembly, float cast so the [[CosineSimilarity]]
    * kernel applies) generalized over any cell assignment, which is what
    * lets the k-means loop re-derive centroids from ITS OWN assignments
    * instead of the static label column. |cells| rows, broadcast by
    * every consumer.
    */
  private def centroidsOf(vecs: DataFrame, cellAlias: String): DataFrame =
    vecs
      .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("cell", "dim")
      .agg(sum(col("x").cast("double").cast("decimal(30,10)")).as("sx"),
        count(lit(1)).as("n_vecs"))
      .select(col("cell"), col("dim"),
        TextOps.trunc6(col("sx").cast("double") / col("n_vecs")).as("cv"))
      .groupBy(col("cell").as(cellAlias))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("cv")))),
        s => s.getField("cv").cast("float")).as("centroid"))

  /** The [[labelCentroids]] rows assembled to one float-array centroid
    * per label — [[centroidsOf]] with the label column as the cell.
    * Shared by [[labelCohesion]] and [[kmeansAssign]].
    */
  private def centroidTable(embeddings: DataFrame, labelAlias: String): DataFrame =
    centroidsOf(embeddings.select(col("label").as("cell"), col("embedding")), labelAlias)

  /** Embedding DRIFT audit: per label, the cosine between the centroids
    * of two deterministic corpus halves (vec_id parity — the stand-in
    * for "last month's batch vs this month's"). A shift cosine well
    * below 1 flags a label whose two halves disagree — upstream encoder
    * change, distribution drift, or a mislabeled ingest — BEFORE anyone
    * retrains on the merged corpus. Output: label, n_even, n_odd,
    * shift_cos (trunc6).
    *
    * Scale: two [[labelCentroids]]-shape aggregates (|labels|·dims keys,
    * map-side combinable, exact-decimal sums) + a |labels|-row join;
    * the corpus contributes two filtered scans and nothing larger than
    * |labels|·dims ever shuffles. The halves generalize to any pure
    * predicate (ingest batch, time window) at no plan change.
    */
  def centroidShift(embeddings: DataFrame): DataFrame = {
    def half(p: Int): DataFrame = centroidsOf(
      embeddings.where(pmod(col("vec_id"), lit(2)) === p)
        .select(col("label").as("cell"), col("embedding")), "label")
    def n(p: Int, as: String): DataFrame =
      embeddings.where(pmod(col("vec_id"), lit(2)) === p)
        .groupBy("label").agg(count(lit(1)).as(as))
    half(0).withColumnRenamed("centroid", "cen_a")
      .join(half(1).withColumnRenamed("centroid", "cen_b"), "label")
      .join(n(0, "n_even"), "label")
      .join(n(1, "n_odd"), "label")
      .select(col("label"), col("n_even"), col("n_odd"),
        TextOps.trunc6(CosineSimilarity(col("cen_a"), col("cen_b"))).as("shift_cos"))
  }

  def labelCohesion(embeddings: DataFrame): DataFrame = {
    val cent = centroidTable(embeddings, "label")
    embeddings.join(broadcast(cent), "label")
      .select(col("label"),
        TextOps.trunc6(CosineSimilarity(col("embedding"), col("centroid"))).as("cos_c"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("cos_c").cast("decimal(20,10)")).as("sc"),
        min(col("cos_c")).as("min_cos"))
      .select(col("label"), col("n_vecs"),
        TextOps.trunc6(col("sc").cast("double") / col("n_vecs")).as("avg_cos"),
        col("min_cos"))
  }

  /** One Lloyd's-style assignment step: each vector is (re)assigned to
    * the label whose [[labelCentroids]] centroid it is most cosine-
    * similar to — with [[labelCentroids]] itself this closes the k-means
    * loop (assign → re-average → repeat), and run once it audits how
    * well the current cell assignment fits the data (`moved` = vectors
    * whose best centroid is not their current cell). Output: vec_id,
    * label, new_label, cos (similarity to the winning centroid,
    * truncated 6dp), moved.
    *
    * Ties break on the smaller label (the [[argmaxKey]] packing) — the
    * cosines on both engines are bit-identical (same index-order
    * kernel), so the argmax is deterministic. Plan shape: the corpus
    * joins the broadcast |labels|·dims centroid table (|labels| rows
    * per vector, never a corpus shuffle) and the per-vector argmax is
    * one HASH-aggregated max over the packed key — each map task
    * collapses a vector's candidate rows to one before any exchange
    * (see [[lloydFromSeed]]: the former window form shuffled the full
    * n·|labels| cross product) — at 100 TB this is one scan plus one
    * narrow-row exchange, the standard distributed k-means assignment.
    */
  def kmeansAssign(embeddings: DataFrame): DataFrame = {
    val cent = centroidTable(embeddings, "c_label")
    embeddings.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"),
        argmaxKey(CosineSimilarity(col("embedding"), col("centroid")),
          col("c_label")).as("k"))
      .groupBy("vec_id", "label")
      .agg(max(col("k")).as("k"))
      .select(col("vec_id"), col("label"), keyCell(col("k")).as("new_label"),
        keyCos(col("k")).as("cos"),
        (keyCell(col("k")) =!= col("label")).as("moved"))
  }

  /** Lloyd iterations run by the trained-IVF query — FIXED (not
    * convergence-tested) so the DuckDB oracle can unroll the identical
    * iterations; each step is deterministic (bit-identical cosines +
    * min-cell tie-break), so a fixed count is reproducible end-to-end.
    */
  val IvfTrainRounds = 2

  /** TRAINED IVF cell assignment: `rounds` full Lloyd iterations —
    * centroids from the current assignment ([[centroidsOf]]), every
    * vector reassigned to its most-similar centroid (argmax cosine,
    * smaller-cell tie-break) — seeded from the stored `label` column
    * (deterministic, no RNG to mirror across engines). Returns the
    * narrow `(vec_id, cell)` assignment.
    *
    * Scale design (100 TB of vectors): per round the corpus contributes
    * ONE scan joined to a broadcast |cells|·dims centroid table — the
    * canonical distributed k-means step ([[kmeansAssign]]'s shape,
    * iterated). Only the narrow assignment is `localCheckpoint`ed
    * between rounds (at rest: a persisted (vec_id, cell) table), never
    * the embeddings — lineage stays flat and nothing corpus-sized is
    * materialized. The driver loop is iteration control only; a cell
    * that loses all members simply drops out of the next centroid table
    * (deterministically, on both engines).
    *
    * CELL-COUNT KNOB (`numCells`): the default label seeding pins
    * |cells| to the label fixture's cardinality, which does NOT grow
    * with the corpus — so every Σ|cell|²-scoped consumer ([[knnJoin]],
    * [[hardNegatives]], [[semDedup]]) sees per-cell occupancy, and
    * therefore pair volume, grow quadratically with corpus size. At
    * scale the IVF design point is cells ∝ n (occupancy ≈ constant,
    * n/|cells|): pass `numCells > 0` to seed from `vec_id mod numCells`
    * instead (equally deterministic and oracle-unrollable — the seed is
    * pure integer arithmetic). Measured (graft.CellKnob, BASELINE.md
    * r12 "ANN cell-count knob" section): with occupancy pinned at ~200
    * (cells = n/200), knn_join costs 0.40 / 0.81 / 3.10 s at
    * sf0.1 / sf1 / sf10 — 2.0× then 3.8× per 10× of corpus, i.e.
    * sublinear-to-linear — where the pinned-10-cells run measured
    * 6.79 s at sf1 (12× for 10× data) and is quadratic-bound at sf10
    * (Σ|cell|² = n²/10 = 4×10⁹ candidate pairs).
    */
  def kmeansCells(embeddings: DataFrame, rounds: Int = IvfTrainRounds,
      numCells: Int = 0): DataFrame =
    lloydFromSeed(embeddings,
      if (numCells > 0)
        embeddings.select(col("vec_id"),
          pmod(col("vec_id"), lit(numCells)).cast("int").as("cell"))
      else embeddings.select(col("vec_id"), col("label").as("cell")),
      rounds)

  /** [[kmeansCells]] with the cell count derived from the CORPUS SIZE
    * instead of passed in: cells = max(⌊n / occupancy⌋, 1), seeded
    * `vec_id mod cells` — the production IVF design point (per-cell
    * occupancy ≈ constant as the corpus grows, so every Σ|cell|²-scoped
    * consumer — [[knnJoin]], [[semDedup]], [[hardNegatives]] — stays
    * linear per corpus decade; see the CELL-COUNT KNOB note above:
    * measured 0.40/0.81/3.10 s across three decades at occupancy 200
    * vs quadratic blow-up under any FIXED cell count). The count is
    * computed IN-PLAN (a 1-row aggregate broadcast into the seed
    * projection — no driver-side action sizes the index) and the seed
    * stays pure integer arithmetic, so the assignment is exactly as
    * deterministic and oracle-unrollable as the fixed-count form:
    * `kmeansCellsByOccupancy(e, o)` ≡ `kmeansCells(e, numCells =
    * max(n/o, 1))` (spec-asserted).
    */
  def kmeansCellsByOccupancy(embeddings: DataFrame, occupancy: Int = 200,
      rounds: Int = IvfTrainRounds): DataFrame = {
    val cells = embeddings.agg(
      greatest(expr(s"count(1) div $occupancy"), lit(1L)).as("__cells"))
    lloydFromSeed(embeddings,
      embeddings.crossJoin(broadcast(cells))
        .select(col("vec_id"),
          pmod(col("vec_id"), col("__cells")).cast("int").as("cell")),
      rounds)
  }

  /** TWO-LEVEL (coarse-quantizer) Lloyd build — the occupancy-scaled
    * training loop with the per-round nearest-centroid pass routed
    * through ~√cells COARSE centroids (VERDICT r15 ask #4).
    *
    * Why: the flat assignment pass scans n·|cells| candidate cosines per
    * round, and at the production design point cells ∝ n (occupancy ≈
    * constant) that is n²/occupancy — quadratic per corpus decade BY
    * CONSTRUCTION even though every search/probe consumer stays linear.
    * The r15 sf100 campaign measured it: 3 passes = 20B cosines ≈ 646 s
    * one-time at 2M vectors × 10k cells. Routing each vector through a
    * coarse quantizer first (g ≈ √cells groups OF the fine centroids,
    * grouped by a centroid-scale mini-Lloyd) brings the per-vector cost
    * to g + coarseProbes·(cells/g) ≈ 2√cells: n^1.5 per decade instead
    * of n² — ~√occupancy·√n fewer cosines per round, 50× at sf100. (An
    * L-level tree with constant branching makes it n·log n; two levels
    * are where the measured wall is.)
    *
    * EXACTNESS: `coarseProbes` is the recall knob of the ASSIGNMENT
    * step. At full width (coarseProbes ≥ g) every fine cell is a
    * candidate again and the loop is BIT-IDENTICAL to
    * [[kmeansCellsByOccupancy]] — same seed, same argmax key, same
    * tie-break, round by round (spec-pinned). At coarseProbes = 1 (the
    * scale campaign setting) a vector whose true nearest fine centroid
    * lives in a non-routed coarse group lands in its best ROUTED cell
    * instead — the standard IVF training approximation; downstream
    * consumers take the assignment as the store contract either way.
    *
    * Per-round plan: centroids as in [[kmeansCells]]; a |cells|-row
    * mini-Lloyd groups them into g coarse groups (|cells|·g cosines —
    * centroid-scale, broadcast); vectors route via one scan × broadcast
    * coarse table into [[graft.functions.TopKByScore]] (top-p groups,
    * map-side partial); the fine argmax joins the routed groups' cells
    * by an equi-join on the group id (broadcast, codegen'd) and reduces
    * through the same packed-BIGINT hash aggregate as the flat loop.
    * The only corpus-sized exchanges are the vec_id re-join of the
    * routing table and the final per-vector max — both narrow.
    *
    * A BUILD job (r17: the ingest path of every `ivf_cells_scaled`
    * store — ExtQueries.scaledCellsStore): the centroid-table count (a
    * |cells|-row action) sizes g driver-side. That is fine for store
    * INGEST, which already materializes checkpoints per round; pure
    * query paths keep [[kmeansCellsByOccupancy]]'s in-plan sizing
    * discipline. The DuckDB oracle twin is
    * ExtQueries.kmeansCoarseCtes, unrolled step for step.
    */
  def kmeansCellsByOccupancyCoarse(embeddings: DataFrame, occupancy: Int = 200,
      rounds: Int = IvfTrainRounds, coarseProbes: Int = 1,
      coarseRounds: Int = 1): DataFrame = {
    require(coarseProbes > 0, s"coarseProbes must be positive, got $coarseProbes")
    val cellsCnt = embeddings.agg(
      greatest(expr(s"count(1) div $occupancy"), lit(1L)).as("__cells"))
    var assign = embeddings.crossJoin(broadcast(cellsCnt))
      .select(col("vec_id"),
        pmod(col("vec_id"), col("__cells")).cast("int").as("cell"))
    for (_ <- 1 to rounds) {
      val cent = centroidsOf(
        embeddings.join(assign, "vec_id").select(col("cell"), col("embedding")),
        "c_cell").serCkpt
      val nCells = cent.count()
      val g = math.max(1L, math.ceil(math.sqrt(nCells.toDouble)).toLong)
      // Mini-Lloyd over the CENTROID table: fine centroids are the
      // "vectors", g groups, same seed/argmax/tie-break machinery.
      var grouping = cent.select(col("c_cell"),
        pmod(col("c_cell"), lit(g)).cast("int").as("cell"))
      for (_ <- 1 to coarseRounds) {
        val cc = centroidsOf(
          cent.join(grouping, "c_cell")
            .select(col("cell"), col("centroid").as("embedding")),
          "g_cell").withColumnRenamed("centroid", "g_centroid")
        grouping = cent.crossJoin(broadcast(cc))
          .select(col("c_cell"),
            argmaxKey(CosineSimilarity(col("centroid"), col("g_centroid")),
              col("g_cell")).as("k"))
          .groupBy("c_cell").agg(max(col("k")).as("k"))
          .select(col("c_cell"), keyCell(col("k")).as("cell"))
      }
      val coarseCent = centroidsOf(
        cent.join(grouping, "c_cell")
          .select(col("cell"), col("centroid").as("embedding")),
        "g_cell").withColumnRenamed("centroid", "g_centroid")
      val routed =
        if (coarseProbes >= g)
          embeddings.select(col("vec_id"))
            .crossJoin(broadcast(grouping.select(col("cell").as("g_cell")).distinct()))
        else
          // Routing score is the FLOORED 6dp cosine (r17): the raw
          // double would make the top-p order hinge on sub-ulp engine
          // agreement; the floored form plus TopKByScore's smaller-id
          // tie-break is the same portable (trunc6 desc, cell asc)
          // ordering every other argmax in the family uses — which is
          // what lets the DuckDB oracle unroll this build verbatim
          // (ExtQueries.kmeansCoarseCtes).
          embeddings.crossJoin(broadcast(coarseCent))
            .select(col("vec_id"),
              floor(CosineSimilarity(col("embedding"), col("g_centroid")) * 1000000)
                .cast("double").as("gcos"),
              col("g_cell"))
            .groupBy("vec_id")
            .agg(graft.functions.TopKByScore(
              col("gcos"), col("g_cell").cast("long"), coarseProbes).as("tk"))
            .select(col("vec_id"), explode(col("tk.id")).as("__g"))
            .select(col("vec_id"), col("__g").cast("int").as("g_cell"))
      val centByGroup = cent.join(
        grouping.select(col("c_cell"), col("cell").as("g_cell")), "c_cell")
      assign = embeddings.join(routed, "vec_id")
        .join(broadcast(centByGroup), "g_cell")
        .select(col("vec_id"),
          argmaxKey(CosineSimilarity(col("embedding"), col("centroid")),
            col("c_cell")).as("k"))
        .groupBy("vec_id")
        .agg(max(col("k")).as("k"))
        .select(col("vec_id"), keyCell(col("k")).as("cell"))
        .serCkpt
    }
    assign
  }

  /** The shared Lloyd loop of [[kmeansCells]] / [[kmeansCellsByOccupancy]]
    * (see kmeansCells' scaladoc for the per-round plan shape).
    */
  private def lloydFromSeed(embeddings: DataFrame, seed: DataFrame,
      rounds: Int): DataFrame = {
    var assign = seed
    for (_ <- 1 to rounds) {
      val cent = centroidsOf(
        embeddings.join(assign, "vec_id").select(col("cell"), col("embedding")),
        "c_cell")
      // Argmax as a HASH-AGGREGATING max over the packed key (see
      // [[argmaxKey]]): a vector's |cells| candidate rows live in ONE
      // map partition (scan × broadcast centroids), so the partial
      // aggregate collapses them to one row per vector BEFORE the
      // exchange and the shuffle carries n narrow rows. The former
      // row_number window shuffled + sorted the FULL n·|cells| cross
      // product — with cells ∝ n (the occupancy-scaled design point)
      // that is n²/occupancy rows: the r15 sf100 ANN campaign measured
      // it as a ~480 GB window exchange at 2M vectors × 10k cells, the
      // round's found-at-third-decade plan defect. (max_by is NOT the
      // fix: its struct buffer forces SortAggregate, which re-sorts the
      // same cross product — thread-dumped mid-spill on the retry.)
      assign = embeddings.crossJoin(broadcast(cent))
        .select(col("vec_id"),
          argmaxKey(CosineSimilarity(col("embedding"), col("centroid")),
            col("c_cell")).as("k"))
        .groupBy("vec_id")
        .agg(max(col("k")).as("k"))
        .select(col("vec_id"), keyCell(col("k")).as("cell"))
        .serCkpt
    }
    assign
  }

  /** Packed argmax key for the nearest-centroid reductions: the trunc6
    * cosine's integral form in the high 32 bits, `CellBias − cell` in
    * the low 32 — ONE comparable BIGINT whose `max` is "highest
    * trunc6(cos), then smallest cell", the family's tie-break, as a
    * FIXED-WIDTH aggregate buffer. That is what keeps the reduction in
    * HashAggregate with map-side partial combine: a window sorts the
    * whole cross product, and max_by's struct buffer silently demotes
    * to SortAggregate, which sorts it too. Exact by construction:
    * floor(cos·10⁶) ∈ [−10⁶, 10⁶] is integral, the shifted sum never
    * overflows, and `(key >> 32) / 10⁶` reproduces trunc6(cos)
    * bit-identically (same integral numerator, same division).
    */
  private val CellBias = 2147483647L
  private def argmaxKey(cosRaw: Column, cell: Column): Column =
    floor(cosRaw * 1000000).cast("long") * lit(4294967296L) +
      (lit(CellBias) - cell.cast("long"))
  private def keyCell(key: Column): Column =
    (lit(CellBias) - key.bitwiseAND(lit(4294967295L))).cast("int")
  private def keyCos(key: Column): Column =
    shiftright(key, 32).cast("double") / 1000000

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * drop every vector whose cosine to some LOWER-id vector in the SAME
    * trained k-means cell reaches `threshold` — near-duplicate MEANING
    * (paraphrases, templated rewrites, translations embedded nearby)
    * that shingle-based near-dup cannot see. The greedy lowest-id
    * survivor inside each duplicate neighborhood is the paper's
    * random-keeper policy made deterministic. Output: vec_id, cell,
    * kept — the full per-vector verdict table (survivors AND drops), the
    * manifest a downstream corpus filter joins against.
    *
    * Scale: clustering is what makes SemDeDup tractable — the pairwise
    * cosine join is scoped WITHIN cells (`a.cell = b.cell`), so the cost
    * is Σ|cell|² instead of corpus², and Lloyd-trained cells keep sizes
    * near corpus/k (the paper's design point; a skew-guard on a
    * pathological cell would salt the same join). Training reuses
    * [[kmeansCells]] or probes a persisted `assignments` store exactly
    * like [[topKIvfTrained]]; the verdict join is a distinct on the
    * dropped ids (bounded by the corpus) followed by one narrow left
    * join — nothing embedding-wide is ever broadcast.
    */
  def semDedup(embeddings: DataFrame, threshold: Double = 0.97,
      rounds: Int = IvfTrainRounds,
      assignments: Option[DataFrame] = None): DataFrame = {
    val asg = assignments.getOrElse(kmeansCells(embeddings, rounds))
    val e = embeddings.join(asg.select(col("vec_id"), col("cell")), "vec_id")
    val dropped = e.as("a")
      .join(e.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id") &&
          cos6 >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    asg.join(dropped.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("dup").isNull.as("kept"))
  }

  /** Incremental [[semDedup]]: verdicts for an arriving batch against a
    * persisted vector store, with the [[graft.streaming.StreamingOps
    * .corpusIngestStream]] batch-cut-invariant survivor contract. Cells
    * come from a FROZEN [[trainedCentroids]] table (training is the
    * offline job; routing via [[assignCells]] is a pure per-vector
    * function of it), so the drop rule — "a vector is a duplicate iff a
    * similar SMALLER-id vector shares its cell anywhere in the stream"
    * — is a pure function of the vector SET and any batch cut converges
    * to the same verdicts. Emits one (vec_id, cell, kept) row per batch
    * vector, plus DEMOTION rows (kept = false) for store vectors a
    * smaller-id arrival undercuts, so the sink re-elects the min-id
    * canonical it had previously admitted. The sink must commit EVERY
    * batch vector's embedding to the store, dropped included — a
    * dropped vector can still be the smaller-id witness that drops a
    * later arrival.
    *
    * Scale: the batch routes via one broadcast centroid join; the pair
    * join is batch × (store ∪ batch) scoped to shared cells — O(batch ·
    * cell-density), never store²; nothing store-wide is broadcast.
    */
  def semDedupIncremental(existing: DataFrame, incoming: DataFrame,
      centroids: DataFrame, threshold: Double = 0.97,
      assignments: Option[DataFrame] = None): DataFrame = {
    // Routing: [[assignCells]] against the frozen centroids, or — when
    // the offline job's (vec_id, cell) assignment STORE already covers
    // the batch (the replay/backfill case) — a probe of that store.
    // Both are the same frozen per-vector routing function; the store
    // probe additionally pins the exact trained labels, where
    // re-assignment against post-update centroids could flip a
    // boundary vector.
    val routed = assignments
      .map(a => incoming.join(a.select(col("vec_id"), col("cell")), "vec_id"))
      .getOrElse(incoming.join(assignCells(incoming, centroids), "vec_id"))
    val inc = routed.select(col("vec_id"), col("embedding"), col("cell"))
    val all = existing.select(col("vec_id"), col("embedding"), col("cell"))
      .withColumn("is_new", lit(false))
      .unionByName(inc.withColumn("is_new", lit(true)))
    // Both id orders, materialized once: the drop and demotion branches
    // both read it (the corpusIngestStream exactPairs discipline).
    val pairs = inc.as("a")
      .join(all.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") =!= col("b.vec_id") &&
          cos6 >= threshold)
      .select(col("a.vec_id").as("vec_new"), col("a.cell").as("cell"),
        col("b.vec_id").as("vec_match"), col("b.is_new"))
      .localCheckpoint()
    val droppedNew = pairs.where(col("vec_match") < col("vec_new"))
      .select(col("vec_new").as("vec_id")).distinct()
      .withColumn("dup", lit(true))
    val demoted = pairs
      .where(!col("is_new") && col("vec_match") > col("vec_new"))
      .select(col("vec_match").as("vec_id"), col("cell")).distinct()
      .withColumn("kept", lit(false))
    inc.select(col("vec_id"), col("cell"))
      .join(droppedNew, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("dup").isNull.as("kept"))
      .unionByName(demoted)
  }

  /** X3 — IVF top-k over TRAINED cells: the [[topKIvf]] search pattern
    * with the cell id coming from [[kmeansCells]] (centroids actually
    * fitted to the data) instead of the pre-assigned label. This closes
    * the loop [[topKIvf]]'s scaladoc promises: train → assign → search
    * own cell. At rest the trained assignment is the storage partition
    * key, so the per-probe scan is pruned to one cell.
    *
    * `assignments` is the persisted trained-assignment STORE — a
    * `(vec_id, cell)` [[kmeansCells]] output written once by the
    * offline training job (at scale, partitioned by cell) — mirroring
    * [[topKLsh]]'s `signatures` / [[topKQuantized]]'s `store` params.
    * When given, the query probes the store and pays NO training;
    * when absent, cells are trained in-query (the self-contained form;
    * identical output, asserted by SimilarityCentroidSpec's parquet
    * round trip). At 100 TB training is an offline job, so the probing
    * form is the plan a real ANN user runs per query.
    */
  def topKIvfTrained(embeddings: DataFrame, probeEvery: Int = 50, k: Int = 5,
      rounds: Int = IvfTrainRounds,
      assignments: Option[DataFrame] = None): DataFrame = {
    val asg = assignments.getOrElse(kmeansCells(embeddings, rounds))
    val e = embeddings.join(asg.select(col("vec_id"), col("cell")), "vec_id")
    topK(
      broadcast(probes(e, probeEvery).as("a"))
        .join(e.as("b"),
          col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("probe_id"), col("b.vec_id").as("neighbor_id"),
          cos6.as("cosine")),
      k)
  }

  /** Corpus-wide k-nearest-neighbor SELF-join over the trained cells —
    * the batch retrieval workhorse (kNN graphs for clustering/UMAP,
    * hard-negative mining, RAG neighbor precompute): EVERY vector gets
    * its k most-cosine-similar neighbors within its trained cell.
    *
    * Scale shape: same cell scoping as [[semDedup]] — pair volume is
    * Σ|cell|², never corpus² — but unlike the bounded-probe searches
    * NOTHING is broadcast: the corpus self-joins on the cell key (one
    * shuffle per side), and [[TopKByScore]]'s map-side partial keeps
    * ≤ k rows per (probe, partition) through the final exchange. Cell
    * granularity is the knob: more cells → smaller Σ|cell|² and lower
    * recall at cell borders (standard IVF trade; recall rescue =
    * multi-probe assignment of each vector to its p nearest cells).
    */
  def knnJoin(embeddings: DataFrame, k: Int = 3, rounds: Int = IvfTrainRounds,
      assignments: Option[DataFrame] = None): DataFrame = {
    val asg = assignments.getOrElse(kmeansCells(embeddings, rounds))
    val e = embeddings.join(asg.select(col("vec_id"), col("cell")), "vec_id")
      .select(col("vec_id"), col("cell"), col("embedding"))
    topK(
      e.as("a").join(e.as("b"),
          col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("probe_id"), col("b.vec_id").as("neighbor_id"),
          cos6.as("cosine")),
      k)
  }

  /** HARD-NEGATIVE MINING for contrastive training — [[knnJoin]]'s
    * different-label restriction: per anchor, the k most-similar
    * vectors carrying a DIFFERENT label. Nearest wrong-label examples
    * are exactly the pairs a contrastive loss learns most from (random
    * negatives are trivially separable); mining them corpus-wide is a
    * batch retrieval job, not a per-row lookup. Same scale shape as
    * knnJoin — IDENTICAL plan skeleton, in fact: candidate volume is
    * Σ|cell|² within trained cells (minus same-label pairs, which the
    * label-differs residual drops before the aggregate), and the
    * per-anchor top-k is the same bounded-heap [[topK]] partial
    * aggregate — nothing broadcast, nothing corpus². Any measured
    * divergence from knnJoin on the same stores is therefore
    * environment, not plan (the r16 4-pass sf100 recording
    * adjudicates the r15 2-pass spread).
    */
  def hardNegatives(embeddings: DataFrame, k: Int = 3,
      rounds: Int = IvfTrainRounds,
      assignments: Option[DataFrame] = None): DataFrame = {
    val asg = assignments.getOrElse(kmeansCells(embeddings, rounds))
    val e = embeddings.join(asg.select(col("vec_id"), col("cell")), "vec_id")
      .select(col("vec_id"), col("cell"), col("label"), col("embedding"))
    topK(
      e.as("a").join(e.as("b"),
          col("a.cell") === col("b.cell") &&
            col("a.label") =!= col("b.label"))
        .select(col("a.vec_id").as("probe_id"),
          col("b.vec_id").as("neighbor_id"), cos6.as("cosine")),
      k)
  }

  /** The CENTROID half of the trained-IVF store: per-cell float-array
    * centroids of an `assignments` table (a [[kmeansCells]] output, or
    * any `(vec_id, cell)` frame) — written beside the assignment at
    * training time so NEW vectors can be routed to cells
    * ([[assignCells]]) without touching the corpus. |cells| rows,
    * broadcast by every consumer. Output: cell, centroid.
    */
  def trainedCentroids(embeddings: DataFrame, assignments: DataFrame): DataFrame =
    centroidsOf(
      embeddings.join(assignments.select(col("vec_id"), col("cell")), "vec_id")
        .select(col("cell"), col("embedding")),
      "cell")

  /** Route arbitrary vectors (an out-of-corpus probe batch, the next
    * ingest batch) to their most-cosine-similar trained cell — the
    * argmax assignment step of [[kmeansCells]] run once against a
    * persisted [[trainedCentroids]] table. Smaller-cell tie-break,
    * matching the training loop, so routing is deterministic. One
    * broadcast join + a hash-aggregated per-vector argmax (the
    * [[lloydFromSeed]] packed-key shape); the corpus is never touched.
    * Output: vec_id, cell.
    */
  def assignCells(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(centroids.select(col("cell"), col("centroid"))))
      .select(col("vec_id"),
        argmaxKey(CosineSimilarity(col("embedding"), col("centroid")),
          col("cell")).as("k"))
      .groupBy("vec_id")
      .agg(max(col("k")).as("k"))
      .select(col("vec_id"), keyCell(col("k")).as("cell"))

  /** Symmetric int8 QUANTIZATION of the embedding store: per-vector
    * scale = max|x| / 127, each component q = ⌊x/scale + 0.5⌋ ∈
    * [−127, 127] — the standard 4× shrink of an ANN store (float32 →
    * int8 + one scale), applied at ingest like the LSH/IVF signatures.
    * Reconstruction error is ≤ scale/2 per component by construction
    * (spec-asserted). All-zero vectors get scale 0 and a zero qvec.
    * Output: vec_id, scale, qvec.
    *
    * Determinism: scale is one IEEE division of the exact component max;
    * q is one divide + add + floor — all exactly-rounded IEEE double
    * ops, so the quantized store is bit-identical across engines (the
    * oracle digests the same arrays). Pure per-vector map, zero shuffle;
    * the HOFs are interpreted but this is a write-once ingest op, the
    * [[lshSignatures]] precedent.
    */
  def quantizeEmbeddings(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding"),
        (array_max(transform(col("embedding"), x => abs(x.cast("double")))) / 127.0d)
          .as("scale"))
      // Two-project stack, scale referenced twice below: CollapseProject's
      // cost check (multi-referenced non-trivial expressions stay put)
      // keeps the max from being inlined into the per-element lambda —
      // the O(dim²) HOF-recompute trap — so scale evaluates once per row.
      .select(col("vec_id"), col("scale"),
        when(col("scale") === 0.0d,
          transform(col("embedding"), _ => lit(0)))
          .otherwise(transform(col("embedding"),
            x => floor(x.cast("double") / col("scale") + 0.5d).cast("int")))
          .as("qvec"))

  /** X3 — cosine top-k over the QUANTIZED store: the search reads only
    * `(vec_id, scale, qvec)` — the 4×-smaller memory-resident form at
    * scale — reconstructing each component as `q·scale` narrowed to
    * float so the same codegen'd [[CosineSimilarity]] kernel (and the
    * whole [[topKBruteForce]] plan) applies unchanged. `store` is the
    * persisted [[quantizeEmbeddings]] table; when absent the store is
    * derived in-query and localCheckpoint'ed — materialization is not
    * optional here, because collapsing the dequant lambda into the
    * quantize projection would inline the qvec expression per element
    * (the O(dim²) HOF-recompute trap), and at scale the store IS a
    * materialized table anyway.
    */
  def topKQuantized(embeddings: DataFrame, probeEvery: Int = 50, k: Int = 5,
      store: Option[DataFrame] = None): DataFrame = {
    val st = store.getOrElse(quantizeEmbeddings(embeddings).serCkpt)
    val deq = st.select(col("vec_id"),
      transform(col("qvec"),
        q => (q.cast("double") * col("scale")).cast("float")).as("embedding"))
    topKBruteForce(deq, probeEvery, k)
  }

  /** X3 — TWO-STAGE retrieval (coarse-then-rerank, the production
    * pattern every quantized index serves): stage 1 scans the int8
    * store for each probe's `coarseK` quantized-cosine candidates
    * ([[topKQuantized]] — the big scan touches only the 4×-smaller
    * form); stage 2 re-scores JUST those P×coarseK candidates against
    * the full-precision float embeddings and keeps the exact top-k. The
    * reported cosines are exact (quantization error confined to
    * candidate SELECTION, where only rank-boundary neighbors can be
    * lost), and `coarseK = corpus` degenerates to exact brute force
    * (spec-asserted).
    *
    * Plan shape: the candidate list is bounded (≤ MaxProbes · coarseK
    * rows), so both re-rank joins broadcast the candidate/probe side;
    * the float store is only ever probed pointwise — at 100 TB the
    * floats can live in cold storage while the int8 form serves the
    * scan.
    */
  def topKRerank(embeddings: DataFrame, probeEvery: Int = 50, k: Int = 5,
      coarseK: Int = 25, store: Option[DataFrame] = None): DataFrame = {
    val cand = topKQuantized(embeddings, probeEvery, coarseK, store)
      .select(col("probe_id"), col("neighbor_id"))
    val exact = cand
      .join(embeddings.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb")), "neighbor_id")
      .join(probes(embeddings, probeEvery).select(col("vec_id").as("probe_id"),
        col("embedding").as("p_emb")), "probe_id")
      .select(col("probe_id"), col("neighbor_id"),
        TextOps.trunc6(CosineSimilarity(col("p_emb"), col("n_emb"))).as("cosine"))
    topK(exact, k)
  }

  /** X3 — MULTI-PROBE IVF: search the `nprobe` cells whose trained
    * centroids are most cosine-similar to each probe, instead of exactly
    * the probe's own cell — the standard IVF recall knob. Single-cell
    * search loses exactly the neighbors that sit across a cell boundary
    * from the probe; widening to the nprobe nearest cells recovers them
    * at a linear cost multiplier (work ≈ nprobe · |corpus|/|cells|),
    * the recall-vs-cost dial every production IVF index exposes.
    *
    * Plan shape: cell ranking is a broadcast |cells|-row centroid table
    * against the BOUNDED probe set (a bounded-width window picks the
    * top nprobe — never a corpus shuffle); candidates come from joining
    * the (probe, cell) list to the assignment store on cell. Each
    * corpus vector lives in exactly one cell and the (probe, cell) list
    * is distinct, so no candidate pair duplicates. `nprobe = |cells|`
    * degenerates to exact brute force (spec-asserted); `nprobe = 1` is
    * [[topKIvfTrained]] up to the final-round centroid refresh the
    * ranking sees. Stores probed via the same optional params.
    */
  def topKIvfMultiProbe(embeddings: DataFrame, probeEvery: Int = 50, k: Int = 5,
      nprobe: Int = 2, rounds: Int = IvfTrainRounds,
      assignments: Option[DataFrame] = None,
      centroids: Option[DataFrame] = None): DataFrame = {
    val asg = assignments.getOrElse(kmeansCells(embeddings, rounds).serCkpt)
    val cent = centroids.getOrElse(trainedCentroids(embeddings, asg))
    val pr = probes(embeddings, probeEvery)
    // Rank cells per probe by centroid cosine (deterministic smaller-cell
    // tie-break, the kmeans convention), keep the nprobe best.
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cell"))
    val probeCells = pr.crossJoin(broadcast(cent.select(col("cell"), col("centroid"))))
      .select(col("vec_id"), col("cell"),
        TextOps.trunc6(CosineSimilarity(col("embedding"), col("centroid"))).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= nprobe)
      .select(col("vec_id").as("probe_id"), col("cell"))
    val e = embeddings.join(asg.select(col("vec_id"), col("cell")), "vec_id")
    topK(
      broadcast(probeCells
        .join(pr.select(col("vec_id").as("probe_id"), col("embedding")), "probe_id")
        .as("a"))
        .join(e.as("b"),
          col("a.cell") === col("b.cell") && col("a.probe_id") =!= col("b.vec_id"))
        .select(col("a.probe_id").as("probe_id"), col("b.vec_id").as("neighbor_id"),
          cos6.as("cosine")),
      k)
  }

  /** X3 — IVF-PQ-lite: cell-restricted top-k over the int8 QUANTIZED
    * store — the composition that is the actual 100 TB ANN shape. The
    * index is [[kmeansCells]]' trained assignment (trained on the
    * full-precision embeddings by the offline job, like every real IVF
    * build); the searched vectors are the [[quantizeEmbeddings]] store
    * reconstructed as `q·scale` — so a probe touches ~|corpus|/|cells|
    * vectors AND reads them from the 4×-smaller int8 form, multiplying
    * the two savings. Both stores are probed via the same optional
    * params as the component operators ([[topKIvfTrained]]'s
    * `assignments`, [[topKQuantized]]'s `store`); absent params derive
    * them in-query (the self-contained oracle-checked form).
    *
    * Recall decomposes cleanly: cell restriction bounds it exactly as
    * [[topKIvfTrained]] (same cells), quantization perturbs each
    * component by ≤ scale/2 (~0.4% relative) on top — spec-asserted
    * ≥ 0.9 against the exact-precision same-cell search.
    */
  def topKIvfQuantized(embeddings: DataFrame, probeEvery: Int = 50, k: Int = 5,
      rounds: Int = IvfTrainRounds, assignments: Option[DataFrame] = None,
      store: Option[DataFrame] = None): DataFrame = {
    val asg = assignments.getOrElse(kmeansCells(embeddings, rounds))
    val st = store.getOrElse(quantizeEmbeddings(embeddings).serCkpt)
    val deq = st.select(col("vec_id"),
      transform(col("qvec"),
        q => (q.cast("double") * col("scale")).cast("float")).as("embedding"))
    val e = deq.join(asg.select(col("vec_id"), col("cell")), "vec_id")
    topK(
      broadcast(probes(e, probeEvery).as("a"))
        .join(e.as("b"),
          col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("probe_id"), col("b.vec_id").as("neighbor_id"),
          cos6.as("cosine")),
      k)
  }

  /** Embedding-space DECONTAMINATION — the X3 twin of
    * [[Corpus.decontaminate]]'s shingle overlap: flag corpus vectors
    * whose cosine to ANY benchmark vector reaches `threshold`, catching
    * paraphrased or reformatted eval leakage that exact n-gram overlap
    * misses. Output (contaminated vectors only): vec_id, n_hits,
    * max_cos, nearest_bench (argmax benchmark id, smaller id on ties).
    *
    * Scale: the benchmark side is BOUNDED by contract (eval sets are
    * thousands of rows, the same bound [[Corpus.decontaminate]] leans
    * on), so it broadcasts and the corpus contributes ONE map-side
    * scan — no shuffle, no blocking, and therefore no recall loss from
    * a blocking scheme: for decontamination a false negative is the
    * expensive error, so exhaustive-vs-benchmark is the right plan
    * shape, O(N·B) with B fixed. Per-vector verdicts aggregate through
    * a bounded window keyed on vec_id (≤ B rows per key).
    */
  def decontaminateEmbeddings(corpus: DataFrame, benchmark: DataFrame,
      threshold: Double = 0.9): DataFrame = {
    val hits = corpus.as("a")
      .crossJoin(broadcast(benchmark.select(col("vec_id").as("bench_id"),
        col("embedding").as("b_emb"))))
      .select(col("a.vec_id").as("vec_id"), col("bench_id"),
        TextOps.trunc6(CosineSimilarity(col("a.embedding"), col("b_emb"))).as("cos"))
      .where(col("cos") >= threshold)
    // One aggregate instead of a count window + rank window over the
    // hit set: n_hits, max_cos and the argmax bench id come from the
    // same partial-combining pass (hits are sparse, but the aggregate
    // form also removes two sorts of the hit set).
    hits
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_hits"), max(col("cos")).as("max_cos"),
        max_by(col("bench_id"),
          struct(col("cos").as("o1"), (-col("bench_id")).as("o2")))
          .as("nearest_bench"))
      .select(col("vec_id"), col("n_hits"), col("max_cos"), col("nearest_bench"))
  }

  /** Embedding-cosine near-dup pairs: all pairs with cosine ≥ threshold,
    * candidates blocked on the cell id. Output: vec_a, vec_b, cosine.
    *
    * Triangle-partitioned execution: each cell is salted into
    * `subBlocks` sub-blocks by vec_id, and the self-join runs per
    * UNORDERED sub-block pair (i ≤ j) — the classic triangle join. Each
    * side replicates ~(N+1)/2×, but every join group holds only
    * |cell|/N vectors (bounded memory; no broadcast of an unbounded
    * side) and parallelism is |cells| · N(N+1)/2 groups instead of
    * |cells|. A pair lands in exactly one group: (blk_a, blk_b) ordered,
    * with the vec_id tiebreak inside the diagonal i = j groups.
    */
  def nearDupCosine(embeddings: DataFrame, threshold: Double = 0.4,
      subBlocks: Int = 8): DataFrame = {
    val ss = embeddings.sparkSession
    import ss.implicits._
    val blockPairs = broadcast(
      (for { i <- 0 until subBlocks; j <- i until subBlocks } yield (i, j))
        .toDF("bi", "bj"))
    val e = embeddings.select(col("vec_id"), col("label"), col("embedding"),
      pmod(col("vec_id"), lit(subBlocks)).cast("int").as("blk"))
    // Left side owns block bi of each pair, right side block bj; the
    // broadcast pair list replicates each vector into its (N−blk) left
    // and (blk+1) right roles.
    val left = e.join(blockPairs, col("blk") === col("bi")).drop("blk")
    val right = e.join(blockPairs, col("blk") === col("bj")).drop("blk")
    left.as("a")
      .join(right.as("b"),
        col("a.label") === col("b.label") &&
          col("a.bi") === col("b.bi") && col("a.bj") === col("b.bj") &&
          // off-diagonal groups pair distinct blocks (every cross pair
          // once); diagonal groups order by vec_id to avoid self/dup.
          (col("a.bi") < col("a.bj") || col("a.vec_id") < col("b.vec_id")))
      .select(least(col("a.vec_id"), col("b.vec_id")).as("vec_a"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("vec_b"),
        cos6.as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** [[nearDupCosine]] blocked on TRAINED OCCUPANCY-SCALED CELLS instead
    * of the stored label — the production form at corpus scale. Label
    * blocking partitions the pair space into a FIXED number of blocks,
    * so Σ|block|² grows n²/|labels| (quadratic per decade — the r13
    * sf10 run had to skip the label-blocked query at 4×10⁹ candidate
    * pairs); [[kmeansCellsByOccupancy]]'s cell count grows with the
    * corpus (cells = max(n/occupancy, 1)), pinning per-cell occupancy —
    * and therefore Σ|cell|² ≈ n·occupancy — linear per decade, the same
    * design point as [[knnJoin]]/[[semDedup]]. Recall is cell-scoped
    * like every IVF consumer: a pair split across a cell border is
    * missed (multi-probe assignment is the standard rescue). Candidates
    * here are one cell-keyed shuffle join — nothing broadcast, no
    * sub-block salting needed because occupancy bounds every join
    * group. Output: vec_a, vec_b, cosine (truncated 6dp).
    */
  def nearDupCosineCells(embeddings: DataFrame, threshold: Double = 0.4,
      occupancy: Int = 200,
      assignments: Option[DataFrame] = None): DataFrame = {
    val asg = assignments.getOrElse(kmeansCellsByOccupancy(embeddings, occupancy))
    val e = embeddings.join(asg.select(col("vec_id"), col("cell")), "vec_id")
      .select(col("vec_id"), col("cell"), col("embedding"))
    e.as("a")
      .join(e.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cos6.as("cosine"))
      .where(col("cosine") >= threshold)
  }
}
