package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{PgmCodec, PgmDecode}

/** Multimodal-column plumbing (north-star extension surface): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extraction as a partition-local
  * batch transform.
  *
  * Two decode tiers:
  *   - UNCOMPRESSED RASTER (binary PGM/P5) decode is REAL:
  *     [[graft.functions.PgmDecode]] parses dimensions and raster
  *     offset out of the payload bytes and aggregates pixel statistics
  *     — see [[encodePgm]]/[[imageStats]] and the declared
  *     `image_stats` query, whose oracle checks the recovered stats
  *     against an independent derivation.
  *   - COMPRESSED codecs (JPEG/ffmpeg-class) remain STUBBED — no
  *     image/audio libraries exist in this environment — as
  *     `decodeStub`, a deterministic fake that derives "decoded"
  *     metadata from the payload's md5. Everything around that stub is
  *     the real plumbing a production pipeline needs and is exercised
  *     by tests: the binary column + metadata schema, the
  *     `mapPartitions` batch shape (decoder state initialized once per
  *     partition, streamed row batches — the JVM analogue of a
  *     pandas-batch UDF), and the pure-expression variant used by the
  *     declared oracle query.
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

  /** Encode each document's text bytes as a REAL binary P5 PGM image:
    * header `P5\n<width> <height>\n255\n` followed by a
    * `width × height` one-byte-per-pixel raster holding the first
    * `width·⌊len/width⌋` bytes of the text (the tail that doesn't fill
    * a row is dropped; docs shorter than one row are filtered). This is
    * the ingest step of an image-bearing corpus expressed over driver
    * data: the payload is a self-describing image FILE — dimensions
    * live only inside the bytes — so decoding it is a genuine parse,
    * and an oracle can recompute the expected pixel stats from `text`
    * by mirroring this arithmetic. All codegen'd built-ins
    * (format_string/encode/substring-on-binary), no shuffle.
    */
  def encodePgm(docs: DataFrame, width: Int = 32): DataFrame =
    docs.where(length(col("text")) >= width)
      .select(col("doc_id"),
        concat(
          encode(format_string(s"P5\n$width %d\n255\n",
            expr(s"length(text) div $width")), "UTF-8"),
          expr(s"substring(CAST(text AS BINARY), 1, (length(text) div $width) * $width)")
        ).as("payload"))

  /** REAL image decode over a (doc_id, payload) frame: parse each P5
    * payload and surface the per-image pixel statistics —
    * [[graft.functions.PgmDecode]] as a query stage. Output: doc_id,
    * width, height, maxval, n_pixels, pixel_sum, pixel_min, pixel_max
    * (malformed payloads yield null stats). Narrow map, stays inside
    * whole-stage codegen.
    */
  def imageStats(payloads: DataFrame): DataFrame =
    payloads
      .select(col("doc_id"), PgmDecode(col("payload")).as("img"))
      .select(col("doc_id"), col("img.width"), col("img.height"),
        col("img.maxval"), col("img.n_pixels"), col("img.pixel_sum"),
        col("img.pixel_min"), col("img.pixel_max"))

  /** [[imageStats]] in the partition-local BATCH shape ([[
    * featurizePartitions]] precedent): per-partition decoder init once,
    * then a streamed pass calling the same [[graft.functions.PgmCodec]]
    * parser — the harness a stateful codec (JPEG tables, ffmpeg
    * contexts) plugs into. Must agree exactly with [[imageStats]]
    * (asserted in ExtOpsSpec).
    */
  def imageStatsPartitions(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    val out = StructType(StructField("doc_id", LongType) +: PgmCodec.schema.fields)
    val rdd = payloads.select("doc_id", "payload").rdd.mapPartitions { it =>
      // codec state would be initialized once per partition here
      it.map { r =>
        val parsed = PgmCodec.parse(r.getAs[Array[Byte]]("payload"))
        if (parsed == null)
          Row(r.getAs[Long]("doc_id"), null, null, null, null, null, null, null)
        else Row(r.getAs[Long]("doc_id"), parsed.getInt(0), parsed.getInt(1),
          parsed.getInt(2), parsed.getInt(3), parsed.getLong(4),
          parsed.getInt(5), parsed.getInt(6))
      }
    }
    spark.createDataFrame(rdd,
      StructType(out.fields.map(f => f.copy(nullable = true))))
  }

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
