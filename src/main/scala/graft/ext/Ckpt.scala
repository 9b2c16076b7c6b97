package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Checkpoint policy for CORPUS-SCALE materializations.
  *
  * `localCheckpoint()`'s default storage level keeps blocks
  * DESERIALIZED on-heap: each row is a live object graph whose size the
  * MemoryStore only estimates. For the session ingest stores (signature
  * tables, shingle sets, quantized embeddings) that is 2–4× the
  * serialized footprint plus estimate error in the direction that
  * matters — the r14 third-decade (sf100, 50M-doc) campaign drove the
  * 32 GiB JVM into `java.lang.OutOfMemoryError` during store ingest
  * with the unified pool still thinking it had headroom.
  *
  * Corpus-scale checkpoints therefore pin MEMORY_AND_DISK_SER: blocks
  * are compact UnsafeRow bytes, their accounted size is exact, and
  * overflow lands on disk — which is also the honest in-session model
  * of what these artifacts ARE at cluster scale (persisted columnar
  * tables probed by queries, not resident object graphs).
  * Node-sized frames (group labels, census rows, per-round CC edges)
  * keep the plain deserialized `localCheckpoint()` — they are tiny and
  * re-read on every iteration, where deserialization cost would be in
  * the hot loop.
  */
object Ckpt {
  /** Eager local checkpoint at MEMORY_AND_DISK_SER — for frames whose
    * size grows with the corpus. */
  def ser(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = true, storageLevel = StorageLevel.MEMORY_AND_DISK_SER)

  /** Postfix form of [[ser]] for long method chains. */
  implicit class SerCkptOps(private val df: DataFrame) extends AnyVal {
    def serCkpt: DataFrame = ser(df)
  }
}
