package graft.ext

import java.nio.file.{Files, Paths}

import graft.{SparkEntry, SparkSpec}

/** The at-rest store medium ([[DiskStore]] — partitioned parquet probed
  * by scans) against the session medium ([[Ckpt.ser]] — serialized
  * checkpoint blocks): every declared query of the minhash pair family
  * must produce IDENTICAL rows on both, because the stores are pure
  * per-corpus functions and the medium is an execution choice, not a
  * semantic one. This is the correctness half of the r14 third-decade
  * fix (the sf100 single-JVM store-residency wall): the disk form is
  * only admissible as the scale path if it is result-invariant.
  */
class DiskStoreSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // Two child sessions of the shared context: one on the default
  // (session-memory) medium, one with a disk store root. ExtQueries'
  // store cache keys on the SparkSession instance, so the two sessions
  // build independent stores from the same corpus.
  private lazy val memSession = spark.newSession()
  private lazy val storeRoot =
    Files.createTempDirectory("graft-diskstore").toString
  private lazy val diskSession = {
    val s = spark.newSession()
    s.conf.set("spark.graft.storeDir", storeRoot)
    s.conf.set("spark.graft.storeShards", "4")
    s
  }

  private val pairFamily = Seq("near_dup_minhash", "containment_near_dup",
    "containment_stratified", "probe_near_dups", "dup_groups",
    "source_overlap")

  // The ANN store kinds (trained assignment, centroid table, quantized
  // corpus, LSH signatures) pinned the same way — VERDICT r15 ask #8:
  // the r15 sf100 ANN campaign RAN on disk stores, but no declared
  // query was medium-equality-checked for them until ann_store_replay.
  private val annFamily = Seq("ann_store_replay", "ann_topk_ivf_trained",
    "ann_topk_ivf_quantized", "ann_topk_lsh", "knn_join_scaled",
    "semdedup_ingest_replay")

  for (q <- pairFamily ++ annFamily)
    test(s"$q: disk-store medium ≡ session-store medium") {
      val mem = SparkEntry.queries(q)(memSession, sfDir).collect().toSeq
      val disk = SparkEntry.queries(q)(diskSession, sfDir).collect().toSeq
      assert(disk === mem)
    }

  test("disk stores land as complete partitioned parquet tables") {
    // Trigger at least one family query so the store chain builds.
    SparkEntry.queries("containment_stratified")(diskSession, sfDir).collect()
    for (kind <- Seq("minhash_hr", "minhash_bands", "minhash_sigrows"))
      assert(Files.exists(
        Paths.get(DiskStore.storePath(storeRoot, sfDir, kind), "_SUCCESS")),
        s"store $kind missing or incomplete")
  }

  test("a complete store directory is reused, not rebuilt") {
    SparkEntry.queries("near_dup_minhash")(diskSession, sfDir).collect()
    val marker = Paths.get(
      DiskStore.storePath(storeRoot, sfDir, "minhash_bands"), "_SUCCESS")
    val mtime = Files.getLastModifiedTime(marker)
    // A FRESH session (empty in-JVM cache) pointed at the same root
    // must probe the existing table instead of rewriting it — the
    // cross-run reuse contract of an ingest artifact.
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.storeDir", storeRoot)
    val again = SparkEntry.queries("near_dup_minhash")(s2, sfDir).collect().toSeq
    assert(Files.getLastModifiedTime(marker) === mtime, "store was rebuilt")
    assert(again === SparkEntry.queries("near_dup_minhash")(memSession, sfDir)
      .collect().toSeq)
  }
}
