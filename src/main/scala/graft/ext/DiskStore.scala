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

  /** Materialize `build` at `$root/<corpus-tag>/<kind>` (first caller
    * wins; `_SUCCESS` marks a complete store) and return the parquet
    * read — the frame every probe consumes.
    */
  def atRest(s: SparkSession, root: String, corpusDir: String, kind: String)(
      build: => DataFrame): DataFrame = {
    val tag = corpusDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"$root/$tag/$kind"
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
        else df
      laid.write.mode("overwrite").parquet(path)
    }
    s.read.parquet(path)
  }
}
