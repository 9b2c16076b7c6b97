package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension surface): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extraction as a partition-local
  * batch transform.
  *
  * The actual codec step is STUBBED — no image/audio libraries exist in
  * this environment — as `decodeStub`, a deterministic fake that derives
  * "decoded" metadata from the payload's md5. Everything around it is the
  * real plumbing a production pipeline needs and is exercised by tests:
  * the binary column + metadata schema, the `mapPartitions` batch shape
  * (decoder state initialized once per partition, streamed row batches —
  * the JVM analogue of a pandas-batch UDF), and the pure-expression
  * variant used by the declared oracle query.
  *
  * Scale: decode is a narrow map — no shuffle; partition sizing is
  * whatever the upstream scan gives (`spark.sql.files.maxPartitionBytes`
  * bounds decoder memory). Feature columns stay columnar; the opaque
  * payload is never shuffled unless explicitly selected downstream.
  */
object Multimodal {

  /** Decoded-metadata schema attached alongside the opaque payload. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("frame_stride", IntegerType)))

  /** Attach an opaque binary payload column (here: the UTF-8 bytes of
    * `text` stand in for image bytes) — the ingest step of a multimodal
    * table.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** STUB decoder: a real implementation would parse the image header /
    * container here (libjpeg, ffmpeg, ...). This deterministic fake
    * derives plausible dimensions from the payload digest so the
    * downstream plumbing is fully testable.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val hex = java.security.MessageDigest.getInstance("MD5").digest(payload)
      .map("%02x".format(_)).mkString
    val width = 64 + (hex(0).toInt % 16) * 16
    val height = 64 + (hex(1).toInt % 16) * 16
    val frames = 1 + (hex(2).toInt % 8)
    (width, height, frames)
  }

  /** Partition-local batch decode over the payload column — the
    * mapPartitions shape: per-partition decoder init (once), then a
    * streamed pass over the rows. Returns `featureSchema` rows.
    */
  def featurizePartitions(withPayloadDf: DataFrame): DataFrame = {
    val spark = withPayloadDf.sparkSession
    val rdd = withPayloadDf.select("doc_id", "payload").rdd.mapPartitions { it =>
      // decoder/codec state would be initialized once per partition here
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h, f) = decodeStub(payload)
        Row(r.getAs[Long]("doc_id"), payload.length, w, h, f, payload.length / f)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** The same feature extraction as pure codegen'd expressions (md5 +
    * ascii arithmetic) — the declared, oracle-checkable query variant.
    * Must agree exactly with `featurizePartitions` (asserted in tests).
    */
  def featurizeExpr(docs: DataFrame): DataFrame =
    withPayload(docs)
      .select(col("doc_id"), col("payload"), md5(col("payload")).as("h"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        (lit(64) + (ascii(substring(col("h"), 1, 1)) % 16) * 16).as("width"),
        (lit(64) + (ascii(substring(col("h"), 2, 1)) % 16) * 16).as("height"),
        (lit(1) + ascii(substring(col("h"), 3, 1)) % 8).as("n_frames"))
      .withColumn("frame_stride", (col("n_bytes") / col("n_frames")).cast("int"))

  /** Frame sampling + resize planning over the decoded metadata: every
    * `every`-th frame becomes a row carrying its byte offset into the
    * payload, plus the fit-to-`fit`-box output dimensions (longest side
    * scaled to `fit`, integer floor division — the deterministic resize
    * arithmetic; the pixel work itself is the stubbed codec step).
    * One narrow Generate per doc — no shuffle; output rows ≈
    * Σ n_frames/every, never payload-sized.
    */
  def frameSample(docs: DataFrame, every: Int = 2, fit: Int = 224): DataFrame =
    featurizeExpr(docs)
      .select(col("doc_id"), col("width"), col("height"), col("frame_stride"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(every))).as("frame_no"))
      .select(col("doc_id"), col("frame_no"),
        (col("frame_no") * col("frame_stride")).as("frame_offset"),
        expr(s"(width * $fit) div greatest(width, height)").as("out_w"),
        expr(s"(height * $fit) div greatest(width, height)").as("out_h"))
}
