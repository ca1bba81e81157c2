package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing ([X] tier): images/audio/video ride as opaque
  * `binary` columns with typed metadata alongside. The IMAGE path is REAL —
  * [[ImageCodec]] encodes/decodes genuine PNG/JPEG via the JDK's own
  * `javax.imageio`, [[pngDims]] parses the actual IHDR bytes with codegen'd
  * column ops — while audio/video stay deterministic stubs (no such codec
  * ships with the JDK), keeping the partition-parallel plumbing a real
  * decoder slots into.
  *
  * Scale notes: binary payloads stay columnar in parquet; metadata-only
  * queries never read the blob column (column pruning), and the decode path
  * is a narrow map — no shuffle, scales linearly with executors.
  */
object MultimodalOps {

  /** Attach a binary "media" column (here: utf-8 bytes of `text` standing in
    * for image bytes) plus typed metadata — the carrier schema. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media_bytes"),
      struct(
        lit("image/fake").as("mime"),
        length(col("text")).as("n_bytes")).as("media_meta"))

  /** Metadata + digest extraction — pure column ops, blob never leaves the
    * executor: byte length, sha256 digest, stub geometry derived
    * deterministically from the payload size. */
  def mediaMeta(docs: DataFrame): DataFrame =
    asMedia(docs).select(
      col("doc_id"),
      length(col("media_bytes")).as("n_bytes"),
      sha2(col("media_bytes"), 256).as("sha256_hex"),
      (pmod(col("media_meta.n_bytes"), lit(640)) + 1).as("fake_width"),
      (pmod(col("media_meta.n_bytes"), lit(480)) + 1).as("fake_height"))

  /** PNG header parse over the REAL bytes, entirely in codegen'd column
    * ops — no UDF, no decode: the 8-byte signature check plus the IHDR
    * fields at their fixed spec offsets (PNG is: sig 8 | chunk len 4 |
    * "IHDR" 4 | width 4 | height 4 | bit depth 1 | color type 1, all
    * big-endian — offsets below are 1-indexed `substring` positions).
    * Big-endian u32 → `conv(hex(bytes), 16, 10)`. This is the
    * metadata-only scan shape: with payloads in parquet, a dims-only
    * query decodes nothing and reads just the header bytes. */
  def pngDims(media: DataFrame): DataFrame = {
    def be(pos: Int, len: Int) =
      conv(hex(substring(col("media_bytes"), pos, len)), 16, 10).cast("long")
    media.select(
      col("doc_id"),
      (hex(substring(col("media_bytes"), 1, 8)) === lit("89504E470D0A1A0A"))
        .as("sig_ok"),
      be(17, 4).as("width"),
      be(21, 4).as("height"),
      be(25, 1).as("bit_depth"),
      be(26, 1).as("color_type"))
  }

  final case class MediaRow(doc_id: Long, media_bytes: Array[Byte])
  final case class DecodedRow(doc_id: Long, n_bytes: Int, brightness: Long,
                              fake_width: Int, fake_height: Int)

  /** Decode stub via `mapPartitions`: iterates the real bytes per partition
    * (exactly where libjpeg/ffmpeg would run), producing a deterministic
    * fake "feature" (byte-sum brightness) so the result is oracle-checkable.
    * The partition-level batch loop is the genuine shape of a heavyweight
    * decoder: amortized per-partition init, streaming iterator, no
    * collect-to-driver. */
  def decodeStub(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] =
      asMedia(docs).select("doc_id", "media_bytes").as[MediaRow]
    media.mapPartitions { rows =>
      // per-partition init site (codec handle, model weights, …) goes here
      rows.map { m =>
        var sum = 0L
        var i = 0
        while (i < m.media_bytes.length) {
          sum += (m.media_bytes(i) & 0xff); i += 1
        }
        DecodedRow(m.doc_id, m.media_bytes.length, sum % 256,
          (m.media_bytes.length % 640) + 1, (sum % 480).toInt + 1)
      }
    }.toDF()
  }

  final case class FeatureRow(doc_id: Long, bucket: Int, n: Long)

  /** Feature-extraction stub via `mapPartitions` — the embedding-model
    * batch shape: per partition (where the model would init once), each
    * blob folds to a FIXED-SIZE feature vector; here an 8-bucket byte
    * histogram (bucket = byte >> 5), deterministic so the oracle can
    * recompute it. Emitted exploded as (doc_id, bucket, n) — the join/
    * aggregate-friendly long form. Narrow map, no shuffle. */
  def featureExtract(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] =
      asMedia(docs).select("doc_id", "media_bytes").as[MediaRow]
    media.mapPartitions { rows =>
      // per-partition init site (model weights, ONNX session, …)
      rows.flatMap { m =>
        val hist = new Array[Long](8)
        var i = 0
        while (i < m.media_bytes.length) {
          hist((m.media_bytes(i) & 0xff) >> 5) += 1; i += 1
        }
        (0 until 8).iterator.map(k => FeatureRow(m.doc_id, k, hist(k)))
      }
    }.toDF()
  }

  /** Resize stub: 1-D nearest-neighbor downsample of the payload to a
    * fixed `thumbSize`-byte thumbnail — thumbnail byte j reads source
    * byte `(j * n_bytes) div thumbSize` (the access pattern of image
    * resampling), as pure column ops. Exploded to (doc_id, j, byte_val). */
  def resizeStub(docs: DataFrame, thumbSize: Int = 16): DataFrame =
    asMedia(docs)
      .select(
        col("doc_id"),
        col("media_bytes").cast("string").as("media_str"),
        length(col("media_bytes")).as("n_bytes"))
      .select(col("doc_id"),
        posexplode(expr(s"""transform(sequence(0, ${thumbSize - 1}),
          j -> ascii(substring(media_str,
                      cast((j * n_bytes) div $thumbSize as int) + 1, 1)))"""))
          .as(Seq("j", "byte_val")))

  /** Frame sampling stub for "video" payloads: every `stride`-th byte of
    * the first `nFrames` strides — the access pattern of keyframe sampling,
    * as pure column ops (no UDF). The payload cast and length are hoisted
    * to a projection BEFORE the `transform` — a lambda body is re-evaluated
    * per element, so an un-hoisted `cast(media_bytes as string)` would pay
    * the full-payload copy nFrames times per row. */
  def frameSample(docs: DataFrame, nFrames: Int, stride: Int): DataFrame =
    asMedia(docs)
      .select(
        col("doc_id"),
        col("media_bytes").cast("string").as("media_str"),
        length(col("media_bytes")).as("n_bytes"))
      .select(
        col("doc_id"),
        expr(s"transform(sequence(0, ${nFrames - 1}), i -> " +
          s"if(i * $stride < n_bytes, ascii(substring(media_str, i * $stride + 1, 1)), -1))")
          .as("frame_bytes"))
}
