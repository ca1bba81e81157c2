package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}

/** REAL image encode/decode for the multimodal tier, built on the JDK's
  * own `javax.imageio` codecs (PNG and JPEG writers/readers ship with
  * every JDK — public API, no external library). This upgrades the
  * multimodal path from "deterministic fake" to genuine binary media:
  * the fixture attaches real PNG/JPEG payloads whose pixels follow a
  * closed-form pattern the DuckDB oracle can recompute, and the engine
  * side parses / decodes the actual bytes.
  *
  * Scale shape: encode and decode are `mapPartitions` narrow maps — the
  * exact seat a libjpeg-turbo/ffmpeg JNI codec would occupy on a real
  * cluster — so they scale linearly with executors and the binary column
  * stays columnar in parquet (metadata-only readers never touch it).
  * Codec handles are per-JVM statics; `ImageIO` readers are allocated
  * per partition, never per row, via the stream-reuse loop below.
  */
object ImageCodec {

  // ImageIO defaults to DISK-backed stream caches: every read/write
  // allocates a FileCache{Input,Output}Stream that creates and deletes a
  // temp FILE — per-image filesystem I/O that serializes on the tmp dir
  // and swings wildly under a noisy host. Our payloads are tens-to-
  // hundreds of bytes, so the in-memory cache is strictly better; the
  // flag is JVM-global (public JDK API), so it also covers Spark's
  // `image` datasource reads once this class has loaded. Decoded bytes
  // are identical either way — this changes only where the stream
  // buffers.
  ImageIO.setUseCache(false)

  /** Pixel pattern: gray(x, y | seed) = (7x + 13y + 31·seed) mod 256.
    * Linear in both axes with coprime strides, so any decode bug —
    * transposed axes, row-stride drift, channel expansion — shifts many
    * pixels and flips the oracle compare. */
  def gray(x: Int, y: Int, seed: Long): Int =
    (((x * 7L + y * 13L + seed * 31L) % 256L).toInt + 256) % 256

  /** Fixture dims: width 4..16, height 4..14, both varying with doc_id
    * so no constant-offset parser can fake the board. */
  def widthOf(docId: Long): Int = ((docId % 13L) + 4L).toInt
  def heightOf(docId: Long): Int = ((docId % 11L) + 4L).toInt

  private def patternImage(docId: Long): BufferedImage = {
    val (w, h) = (widthOf(docId), heightOf(docId))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, gray(x, y, docId)); x += 1 }
      y += 1
    }
    img
  }

  def encode(docId: Long, format: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(patternImage(docId), format, out)
    out.toByteArray
  }

  final case class MediaRow(doc_id: Long, media_bytes: Array[Byte])

  /** Attach a REAL encoded payload per document — only `doc_id` is read
    * (column pruning keeps `text` out of the scan), and the encoder runs
    * partition-parallel. `format` is "png" (lossless — pixel-exact
    * decode) or "jpg" (lossy — header fields only are oracle-checkable). */
  def withImagePayload(spark: SparkSession, docs: DataFrame,
                       format: String): DataFrame = {
    import spark.implicits._
    docs.select("doc_id").as[Long].mapPartitions { ids =>
      ids.map(id => MediaRow(id, encode(id, format)))
    }.toDF()
  }

  final case class JpegDims(doc_id: Long, width: Long, height: Long)

  /** JPEG frame-header scan: walk the marker segments (each FF xx with a
    * 2-byte big-endian length) from SOI until an SOF0–SOF3 frame header,
    * then read height/width big-endian at fixed offsets WITHIN that
    * segment. Segment lengths vary by encoder (APP0/DQT/DHT layout), so
    * this is a genuine scan — a hardcoded-offset parser would break on
    * any other writer. Pure byte arithmetic, no decode. */
  def jpegDims(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media_bytes").as[MediaRow].map { m =>
      val b = m.media_bytes
      var pos = 2
      var w = -1L; var h = -1L
      while (w < 0 && pos + 8 < b.length) {
        if ((b(pos) & 0xff) != 0xff) pos += 1
        // JPEG allows runs of 0xFF fill bytes before a marker: only the
        // LAST 0xFF of a run precedes the marker byte. Treating an inner
        // 0xFF-0xFF pair as a lengthed segment would misread the length
        // and derail the scan on writers that pad.
        else if ((b(pos + 1) & 0xff) == 0xff) pos += 1
        else {
          val marker = b(pos + 1) & 0xff
          if (marker >= 0xc0 && marker <= 0xc3) {
            h = ((b(pos + 5) & 0xff) << 8) | (b(pos + 6) & 0xff)
            w = ((b(pos + 7) & 0xff) << 8) | (b(pos + 8) & 0xff)
          } else pos += 2 + (((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff))
        }
      }
      JpegDims(m.doc_id, w, h)
    }.toDF()
  }

  final case class Decoded(doc_id: Long, n_px: Long, pix_sum: Long)

  /** Exact integer fold over every sample of band 0 — shared by the
    * batch decode seat and the streaming gate. */
  private def pixelSum(img: BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val r = img.getRaster
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += r.getSample(x, y, 0); x += 1 }
      y += 1
    }
    sum
  }

  /** REAL pixel decode via the JDK PNG reader: per-partition loop (the
    * codec-init seat), each payload decoded from its actual bytes and
    * folded to an exact integer pixel sum the oracle recomputes from the
    * closed-form pattern. PNG is lossless, so decoded samples equal the
    * written pattern bit-for-bit — equality IS the codec round-trip
    * proof. */
  def decodeBrightness(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media_bytes").as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        val img = ImageIO.read(new ByteArrayInputStream(m.media_bytes))
        // fail LOUD with the offending row named — this is the trusted-
        // fixture path (quarantining belongs to decodeGate, the ingest
        // sibling); a bare NPE here would hide which payload broke
        require(img != null, s"undecodable payload for doc ${m.doc_id}")
        Decoded(m.doc_id, img.getWidth.toLong * img.getHeight, pixelSum(img))
      }
    }.toDF()
  }

  final case class GateRow(doc_id: Long, ok: Boolean, width: Long,
                           height: Long, pix_sum: Long)

  /** [[decodeBrightness]] hardened for the INGEST path (the streaming
    * mm gate): a payload that fails to decode — truncated bytes, bad
    * magic, a codec exception — yields an `ok = false` row instead of
    * killing the task, so the caller can QUARANTINE it (the dead-letter
    * discipline). Streaming-safe: a pure per-row map, no driver state. */
  def decodeGate(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media_bytes").as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        try {
          val img = ImageIO.read(new ByteArrayInputStream(m.media_bytes))
          if (img == null) GateRow(m.doc_id, ok = false, -1L, -1L, 0L)
          else GateRow(m.doc_id, ok = true, img.getWidth.toLong,
            img.getHeight.toLong, pixelSum(img))
        } catch { case _: Exception =>
          GateRow(m.doc_id, ok = false, -1L, -1L, 0L)
        }
      }
    }.toDF()
  }

  final case class ThumbPx(doc_id: Long, i: Int, j: Int, v: Long)

  /** Nearest-neighbor thumbnail over REAL decoded pixels: thumb(i, j)
    * reads source pixel (⌊i·w/tw⌋, ⌊j·h/th⌋) — the resampling access
    * pattern, in exact integer arithmetic so the oracle replays it from
    * the pattern formula (library scalers blend unpredictably; the
    * decode is the codec's job, the resample is ours). Long form
    * (doc_id, i, j, v) for join/aggregate-friendly downstream use. */
  def resampleThumb(spark: SparkSession, media: DataFrame,
                    tw: Int, th: Int): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media_bytes").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { m =>
        val img = ImageIO.read(new ByteArrayInputStream(m.media_bytes))
        val (w, h) = (img.getWidth, img.getHeight)
        val r = img.getRaster
        for (j <- 0 until th; i <- 0 until tw) yield
          ThumbPx(m.doc_id, i, j,
            r.getSample(i * w / tw, j * h / th, 0).toLong)
      }
    }.toDF()
  }
}
