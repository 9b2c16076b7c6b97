package graft.ext

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** AT-REST form of the session ingest stores (signature tables, band
  * tables, IVF assignments, quantized embeddings, …): partitioned
  * parquet on disk, probed by scans, with ZERO residency in the JVM's
  * unified memory pool.
  *
  * Why this exists: the session-scoped store ([[Ckpt.ser]] — serialized
  * RDD blocks under the unified pool) is the right model while the
  * store fits aggregate memory, which on a cluster it does by
  * construction (per-node residency = store / nodes). On ONE JVM the
  * model breaks exactly when the corpus outgrows the heap: the r14
  * third-decade campaign (sf100, 50M docs) measured `near_dup_minhash`
  * at 26.7×/decade and a `containment_stratified` steady-pass failure
  * because every probe re-read tens of GB of spilled serialized blocks
  * — row-oriented, uncompressed-per-row, unprunable. This is the
  * cluster answer expressed locally: the store is a columnar table on
  * disk (delta/dictionary-encoded, column-pruned and min/max-pruned per
  * probe), the heap belongs to execution, and per-probe residency is
  * bounded by the scan batch, not the corpus.
  *
  * Layout is derived from the store's own join keys so probes are
  * row-group-local:
  *   - band tables (`band_idx`/`band_val`): hash-clustered and sorted
  *     by (band_idx, band_val) — the equality self-join / lookup key;
  *     row-group min/max on band_val makes a point lookup an index
  *     read. On a cluster the same layout is a bucketed table, which
  *     additionally co-locates the self-join; bucket metadata is the
  *     only piece plain parquet files cannot carry.
  *   - signature rows (`sig_idx`/`sig_val`): same, on the sig key.
  *   - per-document stores (`doc_id`): clustered + sorted by doc_id,
  *     so candidate-id semi-joins and groupBy(doc_id) read clustered
  *     row groups.
  *
  * Activation: set `spark.graft.storeDir` (session conf) or the
  * `SPARK_GRAFT_STORE_DIR` env var; unset = the session-scoped
  * in-memory store (the small-corpus default). Results are invariant to
  * the medium — stores are pure per-corpus functions and the write/read
  * round trip is exact for every stored type (DiskStoreSpec pins
  * end-to-end query equality on both media).
  *
  * A store directory carrying parquet's `_SUCCESS` marker is reused
  * across JVMs (corpus dirs are immutable fixtures here; a mutable
  * corpus would key the path by snapshot version the way the ETL
  * snapshot tables do). `spark.graft.storeShards` (default 32) sizes
  * the clustering; at 100 TB it is the bucket count.
  */
object DiskStore {

  /** Bump when the CONTENT of any store kind changes (new minhash
    * params, different band constants, schema change, …): the version
    * rides the on-disk directory name, so an old `_SUCCESS`-marked
    * store from a previous code revision can never be silently reused
    * against new reader expectations (ADVICE r15).
    *
    * v2 (r17): `ivf_cells_scaled` / `ivf_centroids_scaled` content
    * changed — the scaled ANN stores now build with the coarse-routed
    * two-level Lloyd loop (coarseProbes = 1), whose assignment differs
    * from the flat form a v1 store holds.
    */
  val FormatVersion = 2

  /** On-disk location of a (corpus, kind) store under `root`.
    *
    * The corpus tag is the sanitized dir name PLUS an md5 fragment of
    * the raw path: sanitization alone is non-injective (`/a/b` and
    * `/a_b` both fold to `_a_b`), and a store built for one corpus must
    * never answer for another (ADVICE r15).
    */
  def storePath(root: String, corpusDir: String, kind: String): String = {
    val tag = corpusDir.replaceAll("[^A-Za-z0-9._-]", "_") + "-" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(corpusDir.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
    s"$root/$tag/v$FormatVersion-$kind"
  }

  /** Materialize `build` at [[storePath]] (first COMPLETED writer wins;
    * `_SUCCESS` marks a complete store) and return the parquet read —
    * the frame every probe consumes.
    *
    * Concurrency: the store is written to a writer-unique temp dir and
    * RENAMED into place — two JVMs sharing a root can both pass the
    * `_SUCCESS` check, and concurrent `mode(overwrite)` writes into ONE
    * directory would delete each other's in-flight files or leave a
    * mixed store carrying `_SUCCESS` (ADVICE r15). With the rename,
    * first-complete-wins: the loser's rename fails on the existing
    * target, its temp dir is discarded, and it reads the winner's
    * store (stores are pure per-corpus functions, so either copy is
    * correct). On an object store without atomic rename this becomes
    * a lock object / conditional-put — same first-wins contract.
    * A writer that fails (or a JVM that died) mid-write deletes its own
    * temp dir on the failure path, and any stale `*.tmp-*` siblings a
    * crash left behind are swept by the next writer once a complete
    * store exists (ADVICE r16).
    */
  def atRest(s: SparkSession, root: String, corpusDir: String, kind: String)(
      build: => DataFrame): DataFrame = {
    val path = storePath(root, corpusDir, kind)
    if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
      val df = build
      val shards = s.conf.get("spark.graft.storeShards", "32").toInt
      val cols = df.columns.toSet
      // Cluster + sort by the store's probe key (see layout scaladoc).
      val laid =
        if (cols("band_idx") && cols("band_val"))
          df.repartition(shards, col("band_idx"), col("band_val"))
            .sortWithinPartitions("band_idx", "band_val")
        else if (cols("sig_idx") && cols("sig_val"))
          df.repartition(shards, col("sig_idx"), col("sig_val"))
            .sortWithinPartitions("sig_idx", "sig_val")
        else if (cols("doc_id"))
          df.repartition(shards, col("doc_id"))
            .sortWithinPartitions("doc_id")
        else if (cols("bkt"))
          df.repartition(shards, col("bkt"))
            .sortWithinPartitions("bkt")
        else if (cols("vec_id"))
          df.repartition(shards, col("vec_id"))
            .sortWithinPartitions("vec_id")
        else df
      val tmp = s"$path.tmp-${java.util.UUID.randomUUID().toString.take(8)}"
      try {
        laid.write.mode("overwrite").parquet(tmp)
        Files.createDirectories(Paths.get(path).getParent)
        Files.move(Paths.get(tmp), Paths.get(path),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch {
        case _: java.nio.file.FileSystemException
            if Files.exists(Paths.get(path, "_SUCCESS")) =>
          // Lost the race to a completed writer: discard ours, read theirs.
          org.apache.commons.io.FileUtils.deleteDirectory(
            Paths.get(tmp).toFile)
        case e: Throwable =>
          // Failed write/rename with no winner: don't leak the temp dir.
          org.apache.commons.io.FileUtils.deleteQuietly(
            Paths.get(tmp).toFile)
          throw e
      }
      sweepStaleTmp(path)
    }
    s.read.parquet(path)
  }

  /** Delete `*.tmp-*` siblings a crashed writer left beside a now-
    * complete store: only runs when `$path/_SUCCESS` exists, so an
    * in-flight CONCURRENT writer's temp dir (same prefix) being swept
    * is harmless — its rename would have lost the race anyway and it
    * reads the completed store (the documented first-wins contract).
    */
  private def sweepStaleTmp(path: String): Unit =
    if (Files.exists(Paths.get(path, "_SUCCESS"))) {
      val p = Paths.get(path)
      val parent = p.getParent
      val prefix = p.getFileName.toString + ".tmp-"
      if (parent != null && Files.isDirectory(parent)) {
        val st = Files.list(parent)
        try st.filter(c => c.getFileName.toString.startsWith(prefix))
          .forEach(c =>
            org.apache.commons.io.FileUtils.deleteQuietly(c.toFile))
        finally st.close()
      }
    }
}
