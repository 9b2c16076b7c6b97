package graft.ext

import graft.SparkSpec

/** Specs for the embedding centroid / cohesion operators. */
class SimilarityCentroidSpec extends SparkSpec {
  import spark.implicits._

  private val emb = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(0.0f, 1.0f), 0),
    (2L, Array(2.0f, 0.0f), 1))
    .toDF("vec_id", "embedding", "label")

  test("labelCentroids is the exact per-dimension mean") {
    val out = Similarity.labelCentroids(emb).orderBy("label", "dim").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (0, 0L, 2L, 0.5), (0, 1L, 2L, 0.5),
      (1, 0L, 1L, 2.0), (1, 1L, 1L, 0.0)))
  }

  test("labelCohesion: cosine to the centroid, mean and min") {
    val out = Similarity.labelCohesion(emb).orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // label 0: both members at 45° to the [0.5, 0.5] centroid →
    // cos = 1/√2 truncated to 0.707106; label 1: identical direction → 1.
    assert(out.toSeq === Seq(
      (0, 2L, 0.707106, 0.707106),
      (1, 1L, 1.0, 1.0)))
  }

  test("kmeansAssign reassigns each vector to its most similar centroid") {
    val out = Similarity.kmeansAssign(emb).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getBoolean(4)))
    // vec 0 [1,0] is closer to label 1's centroid [2,0] (cos 1) than to
    // its own cell's [0.5,0.5] (cos 0.707…) → moves; the others stay.
    assert(out.toSeq === Seq(
      (0L, 0, 1, 1.0, true),
      (1L, 0, 0, 0.707106, false),
      (2L, 1, 1, 1.0, false)))
  }

  test("kmeansCells corrects mislabeled vectors on planted clusters; trained IVF recall ≥ untrained") {
    // Three well-separated clusters along orthogonal axes, 8 vectors
    // each, small per-vector noise in an off-axis dimension. Labels are
    // correct EXCEPT the three probe vectors (vec_id 0, 8, 16 — each a
    // multiple of probeEvery = 8), which are planted with the wrong
    // label: untrained IVF searches the wrong cell for every probe, so
    // its neighbors are cross-cluster junk, while training must re-home
    // each probe to its true cluster within IvfTrainRounds rounds.
    def vec(axis: Int, i: Int): Array[Float] = {
      val a = Array.fill(4)(0.0f)
      a(axis) = 1.0f
      a(3) = 0.01f * (i % 8) // tiny per-vector perturbation
      a
    }
    val rows = for (c <- 0 until 3; i <- 0 until 8) yield {
      val id = (c * 8 + i).toLong
      val lbl = if (i == 0) (c + 1) % 3 else c // probes mislabeled
      (id, vec(c, i), lbl)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val cells = Similarity.kmeansCells(emb).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // Trained assignment groups every vector with its true cluster: the
    // three axis clusters stay intact (whatever cell ids they end on).
    for (c <- 0 until 3) {
      val ids = (c * 8 until c * 8 + 8).map(_.toLong)
      assert(ids.map(cells).distinct.size == 1,
        s"cluster $c must land in one trained cell: ${ids.map(cells)}")
    }
    def hits(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Boolean] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)) -> true).toMap
    val brute = hits(Similarity.topKBruteForce(emb, probeEvery = 8, k = 3))
    val trained = hits(Similarity.topKIvfTrained(emb, probeEvery = 8, k = 3))
    val untrained = hits(Similarity.topKIvf(emb, probeEvery = 8, k = 3))
    def recall(got: Map[(Long, Long), Boolean]): Double =
      if (brute.isEmpty) 1.0 else brute.keys.count(got.contains).toDouble / brute.size
    // On the planted fixture the true top-k all live in the probe's own
    // cluster, so trained-cell search recovers brute force exactly;
    // untrained search (wrong cell) can recover none of it.
    assert(recall(trained) == 1.0, s"trained recall ${recall(trained)}")
    assert(recall(untrained) == 0.0, s"untrained recall ${recall(untrained)}")
  }

  test("coarse-routed two-level build: bit-identical to flat at full width; valid at p=1") {
    // Same planted-cluster fixture as the kmeansCells test: three
    // orthogonal-axis clusters of 8, tiny perturbations.
    def vec(axis: Int, i: Int): Array[Float] = {
      val a = Array.fill(4)(0.0f)
      a(axis) = 1.0f
      a(3) = 0.01f * (i % 8)
      a
    }
    val rows = for (c <- 0 until 3; i <- 0 until 8)
      yield ((c * 8 + i).toLong, vec(c, i), c)
    val emb = rows.toDF("vec_id", "embedding", "label")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val flat = asMap(Similarity.kmeansCellsByOccupancy(emb, occupancy = 8))
    // Full width (coarseProbes ≥ g): every fine cell is a candidate in
    // the fine argmax again, so the two-level loop must reproduce the
    // flat loop EXACTLY, round by round — the VERDICT r15 ask #4 pin.
    val full = asMap(Similarity.kmeansCellsByOccupancyCoarse(
      emb, occupancy = 8, coarseProbes = 1000))
    assert(full === flat)
    // p=1 (the scale-campaign setting) is the IVF training
    // approximation: still a total assignment into the same cell id
    // space, one cell per vector.
    val routed = asMap(Similarity.kmeansCellsByOccupancyCoarse(
      emb, occupancy = 8, coarseProbes = 1))
    assert(routed.keySet === flat.keySet)
    assert(routed.values.toSet.subsetOf((0 until 3).toSet),
      s"cells out of the n/occupancy id space: ${routed.values.toSet}")
    // On well-separated planted clusters even p=1 routing keeps each
    // cluster together (coarse groups split along the same axes).
    for (c <- 0 until 3) {
      val ids = (c * 8 until c * 8 + 8).map(_.toLong)
      assert(ids.map(routed).distinct.size == 1,
        s"cluster $c split across cells: ${ids.map(routed)}")
    }
  }

  test("topKLsh against a parquet-round-tripped signature store ≡ inline buckets") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-lshstore").toString
    // Ingest-time write, bucketed layout by bkt (the pruned-probe shape).
    Similarity.lshSignatures(d).write.partitionBy("bkt").parquet(s"$dir/lsh")
    val viaStore = Similarity.topKLsh(d,
        signatures = Some(spark.read.parquet(s"$dir/lsh")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val inline = Similarity.topKLsh(d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaStore === inline && viaStore.nonEmpty)
  }

  test("quantizeEmbeddings: ≤ scale/2 reconstruction error, zero-vector safe, range bounded") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(50)
      .union(Seq((9999L, Array.fill(4)(0.0f), 0)).toDF("vec_id", "embedding", "label")
        .select("vec_id", "embedding", "label"))
    val rows = Similarity.quantizeEmbeddings(d.select("vec_id", "embedding"))
      .join(d, "vec_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val q = r.getAs[scala.collection.Seq[Int]]("qvec")
      val x = r.getAs[scala.collection.Seq[Float]]("embedding")
      assert(q.length == x.length)
      assert(q.forall(v => v >= -127 && v <= 127))
      if (scale == 0.0) assert(q.forall(_ == 0))
      else x.zip(q).foreach { case (xi, qi) =>
        assert(math.abs(xi.toDouble - qi * scale) <= scale / 2 + 1e-12,
          s"component $xi reconstructed as ${qi * scale} with scale $scale")
      }
    }
  }

  test("topKQuantized: int8-store search recovers nearly all exact top-k neighbors") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = hits(Similarity.topKBruteForce(d, probeEvery = 10, k = 5))
    val quant = hits(Similarity.topKQuantized(d, probeEvery = 10, k = 5))
    assert(exact.nonEmpty)
    // int8 symmetric quantization perturbs each component by ≤ scale/2
    // (~0.4% relative), so cosine ranks are near-identical; only exact
    // near-ties may flip.
    val overlap = exact.count(quant.contains).toDouble / exact.size
    assert(overlap >= 0.9, s"quantized recall $overlap")
    // And the store round trip: searching a parquet-persisted store
    // gives exactly the in-query result.
    val dir = java.nio.file.Files.createTempDirectory("graft-qstore").toString
    Similarity.quantizeEmbeddings(d).write.parquet(s"$dir/q")
    val viaStore = hits(Similarity.topKQuantized(d, probeEvery = 10, k = 5,
      store = Some(spark.read.parquet(s"$dir/q"))))
    assert(viaStore === quant)
  }

  test("topKRerank: exact cosines, brute-force equivalence at full coarse width") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Similarity.topKBruteForce(d, probeEvery = 10, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // coarseK ≥ corpus: the coarse stage keeps everything, the re-rank
    // IS brute force — row-identical including the exact cosines.
    val full = Similarity.topKRerank(d, probeEvery = 10, k = 5,
      coarseK = d.count().toInt).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(full.sorted.toSeq === exact.sorted.toSeq)
    // Default narrow coarse stage: scores are still EXACT cosines (the
    // quantization error is confined to candidate selection), and
    // recall stays high.
    val exactScores = exact.map(t => (t._1, t._3) -> t._4).toMap
    val narrow = Similarity.topKRerank(d, probeEvery = 10, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    narrow.foreach { case (p, n, c) =>
      exactScores.get((p, n)).foreach(e => assert(e === c,
        s"rerank must report the exact cosine for ($p, $n)"))
    }
    val hitSet = narrow.map(t => (t._1, t._2)).toSet
    val recall = exact.count(t => hitSet.contains((t._1, t._3))).toDouble / exact.length
    assert(recall >= 0.9, s"rerank recall $recall")
  }

  test("topKIvfTrained against a parquet-round-tripped assignment store ≡ in-query training") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfstore").toString
    // Offline training job: assignment written partitioned by cell (the
    // pruned-probe layout at rest).
    Similarity.kmeansCells(d).write.partitionBy("cell").parquet(s"$dir/cells")
    def res(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val viaStore = res(Similarity.topKIvfTrained(d,
      assignments = Some(spark.read.parquet(s"$dir/cells"))))
    val inQuery = res(Similarity.topKIvfTrained(d))
    assert(viaStore === inQuery && viaStore.nonEmpty)
  }

  test("assignCells routes corpus vectors to their trained cells via the centroid store") {
    // Planted orthogonal clusters (the kmeansCells fixture shape): the
    // centroid table derived from the trained assignment must route
    // every member vector back to its own cluster's cell, and a NEW
    // out-of-corpus vector near axis 1 to cluster 1's cell.
    def vec(axis: Int, i: Int): Array[Float] = {
      val a = Array.fill(4)(0.0f)
      a(axis) = 1.0f
      a(3) = 0.01f * (i % 8)
      a
    }
    val rows = for (c <- 0 until 3; i <- 0 until 8) yield
      ((c * 8 + i).toLong, vec(c, i), c)
    val emb = rows.toDF("vec_id", "embedding", "label")
    val asg = Similarity.kmeansCells(emb).localCheckpoint()
    val cent = Similarity.trainedCentroids(emb, asg).localCheckpoint()
    val trained = asg.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val routed = Similarity.assignCells(emb.select("vec_id", "embedding"), cent)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(routed === trained,
      "routing the corpus through the centroid store must reproduce the trained cells")
    val newVec = Seq((999L, vec(1, 3))).toDF("vec_id", "embedding")
    val newCell = Similarity.assignCells(newVec, cent).collect().head.getInt(1)
    assert(newCell == trained(8L), "a new axis-1 vector must route to cluster 1's cell")
  }

  test("topKIvfQuantized: quantization costs <10% recall vs exact-precision same-cell search") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exactCells = hits(Similarity.topKIvfTrained(d, probeEvery = 10, k = 5))
    val quant = hits(Similarity.topKIvfQuantized(d, probeEvery = 10, k = 5))
    assert(exactCells.nonEmpty)
    val overlap = exactCells.count(quant.contains).toDouble / exactCells.size
    assert(overlap >= 0.9, s"ivf-quantized recall $overlap vs exact-precision ivf")
    // Probing BOTH persisted stores gives exactly the in-query result.
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfq").toString
    Similarity.kmeansCells(d).write.partitionBy("cell").parquet(s"$dir/cells")
    Similarity.quantizeEmbeddings(d).write.parquet(s"$dir/q")
    val viaStores = hits(Similarity.topKIvfQuantized(d, probeEvery = 10, k = 5,
      assignments = Some(spark.read.parquet(s"$dir/cells")),
      store = Some(spark.read.parquet(s"$dir/q"))))
    assert(viaStores === quant)
  }

  test("multi-probe IVF: nprobe = |cells| degenerates to brute force; recall is monotone in nprobe") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val nCells = Similarity.kmeansCells(d).select("cell").distinct().count().toInt
    assert(nCells >= 2, s"fixture needs multiple cells, got $nCells")
    val brute = hits(Similarity.topKBruteForce(d, probeEvery = 10, k = 5))
    // Probing every cell searches every vector — identical result set
    // (same cosine kernel, same tie-breaks) to the exact baseline.
    val all = hits(Similarity.topKIvfMultiProbe(d, probeEvery = 10, k = 5,
      nprobe = nCells))
    assert(all === brute)
    def recall(got: Set[(Long, Long)]): Double =
      brute.count(got.contains).toDouble / brute.size
    val r1 = recall(hits(Similarity.topKIvfMultiProbe(d, probeEvery = 10, k = 5,
      nprobe = 1)))
    val r2 = recall(hits(Similarity.topKIvfMultiProbe(d, probeEvery = 10, k = 5,
      nprobe = 2)))
    // Wider probing can only add candidates; at nprobe = |cells| recall
    // is exactly 1 (asserted above), so the dial is monotone end-to-end.
    assert(r2 >= r1, s"recall must be monotone in nprobe: r1=$r1 r2=$r2")
  }

  test("multi-table LSH: tables = 1 ≡ single-table topKLsh; recall monotone in tables") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def res(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    // Table 0's family IS the single-table family: identical output.
    assert(res(Similarity.topKLshMulti(d, tables = 1)) ===
      res(Similarity.topKLsh(d)))
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = hits(Similarity.topKBruteForce(d, probeEvery = 10, k = 5))
    def recall(got: Set[(Long, Long)]): Double =
      brute.count(got.contains).toDouble / brute.size
    val r1 = recall(hits(Similarity.topKLshMulti(d, probeEvery = 10, k = 5, tables = 1)))
    val r2 = recall(hits(Similarity.topKLshMulti(d, probeEvery = 10, k = 5, tables = 2)))
    assert(r2 >= r1, s"recall must be monotone in tables: r1=$r1 r2=$r2")
    // And the parquet-persisted multi-table store probes identically.
    val dir = java.nio.file.Files.createTempDirectory("graft-lshmulti").toString
    Similarity.lshSignaturesMulti(d).write.partitionBy("tbl", "bkt").parquet(s"$dir/s")
    assert(res(Similarity.topKLshMulti(d,
      signatures = Some(spark.read.parquet(s"$dir/s")))) ===
      res(Similarity.topKLshMulti(d)))
  }

  test("decontaminateEmbeddings flags corpus vectors near any benchmark vector") {
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val corpus = Seq(
      (1L, v(1, 0, 0, 0), 0),   // identical direction to bench 100 AND 102 → tie
      (2L, v(0, 1, 0, 0), 0),   // orthogonal to every bench vector → clean
      (3L, v(0.6, 0, 0.8, 0), 0)) // cos 0.6 to bench 100/102 only
      .toDF("vec_id", "embedding", "label")
    val bench = Seq(
      (100L, v(1, 0, 0, 0), 0),
      (101L, v(0, 0, 0, 1), 0),
      (102L, v(2, 0, 0, 0), 0)) // same direction as 100, different norm
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.decontaminateEmbeddings(corpus, bench, threshold = 0.5)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // vec 1 hits both same-direction bench vectors (cos 1.0 each); the
    // tie breaks to the smaller bench id. vec 2 is clean. vec 3 clears
    // the threshold on the two axis vectors at cos 0.6.
    assert(out.toSeq === Seq(
      (1L, 2L, 1.0, 100L),
      (3L, 2L, 0.6, 100L)))
  }

  test("kmeansCells is invariant to input partitioning (inherits exact decimal sums)") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def cells(df: org.apache.spark.sql.DataFrame) =
      Similarity.kmeansCells(df).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(d) === cells(d.repartition(7)))
  }

  test("kmeansCellsByOccupancy ≡ kmeansCells with numCells = max(n/occupancy, 1)") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = d.count()
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // occupancy small enough to give several cells on the tiny fixture,
    // plus the degenerate 1-cell floor (occupancy > n).
    for (occ <- Seq(5, (n + 1).toInt)) {
      val expectCells = math.max(n / occ, 1L).toInt
      val scaled = m(Similarity.kmeansCellsByOccupancy(d, occupancy = occ))
      val fixed = m(Similarity.kmeansCells(d, numCells = expectCells))
      assert(scaled === fixed, s"occupancy $occ")
    }
  }

  test("labelCentroids is invariant to input partitioning (exact decimal sums)") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Similarity.labelCentroids(d).orderBy("label", "dim")
      .collect().map(_.toSeq).toSeq
    val b = Similarity.labelCentroids(d.repartition(7)).orderBy("label", "dim")
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("coarse p=1 build is deterministic across invocations (sf0.001)") {
    val d = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // The DECLARED ingest (r17): two independent builds must agree cell
    // for cell — the floored routing score and the packed-key argmax
    // leave no RNG or order sensitivity anywhere in the loop, which is
    // exactly what lets the DuckDB oracle unroll it (kmeansCoarseCtes).
    val a = m(Similarity.kmeansCellsByOccupancyCoarse(d))
    val b = m(Similarity.kmeansCellsByOccupancyCoarse(d))
    assert(a === b)
    assert(a.size === d.count())
  }

  test("re-scoped ann_store_replay invariants (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, dir)
    val out = graft.ExtQueries.queries("ann_store_replay")(spark, dir)
      .collect()
    val nVec = out.map(_.getLong(1)).sum
    val nProbed = out.map(_.getLong(3)).sum
    // Linear half covers the whole corpus exactly once; the bounded
    // routing half covers exactly the probe set (vec_id % 50 == 0,
    // first MaxProbes), never more.
    assert(nVec === emb.count())
    assert(nProbed === Similarity.probes(emb, 50).count())
    out.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3),
        s"n_moved > n_probed in cell ${r.get(0)}")
    }
  }
}
