package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import graft.ext.{ImageCodec, MultimodalOps}

/** REAL image-codec path: the fixture's JDK-encoded PNG/JPEG payloads,
  * the column-op IHDR parse, the SOF marker scan, and the lossless
  * pixel-decode round trip — each cross-checked against `javax.imageio`
  * reading the same bytes (a genuinely independent decoder path). */
class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = Seq(0L, 1L, 7L, 12L, 142L).toDF("doc_id")

  test("png IHDR column-op parse matches the real decoder and the formulas") {
    val media = ImageCodec.withImagePayload(spark, ids, "png")
    val parsed = MultimodalOps.pngDims(media)
      .select("doc_id", "sig_ok", "width", "height", "bit_depth", "color_type")
      .as[(Long, Boolean, Long, Long, Long, Long)].collect().sortBy(_._1)
    val bytesById = media.as[ImageCodec.MediaRow].collect()
      .map(m => m.doc_id -> m.media_bytes).toMap
    parsed.foreach { case (id, sig, w, h, depth, color) =>
      assert(sig, s"doc $id: PNG signature")
      assert(w === ImageCodec.widthOf(id) && h === ImageCodec.heightOf(id))
      assert(depth === 8L && color === 0L, "8-bit grayscale IHDR fields")
      val real = ImageIO.read(new ByteArrayInputStream(bytesById(id)))
      assert(real.getWidth === w.toInt && real.getHeight === h.toInt,
        s"doc $id: column-op parse vs javax.imageio")
    }
  }

  test("file sources: binaryFile round-trips text; image source decodes PNGs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val want = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    val bin = spark.read.format("binaryFile")
      .load(graft.sources.MediaFiles.textFileDir(spark, sfDir))
      .select(regexp_extract(col("path"), "(\\d+)\\.bin", 1).cast("long"),
        decode(col("content"), "UTF-8"))
      .as[(Long, String)].collect().toMap
    assert(bin === want, "binaryFile read-back must be byte-lossless")
    val img = spark.read.format("image")
      .load(graft.sources.MediaFiles.pngFileDir(spark, sfDir))
      .select(
        regexp_extract(col("image.origin"), "(\\d+)\\.png", 1).cast("long"),
        col("image.width"), col("image.height"),
        col("image.nChannels"), col("image.mode"))
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(img.length === want.size)
    img.foreach { case (id, w, h, nc, mode) =>
      assert(w === graft.ext.ImageCodec.widthOf(id))
      assert(h === graft.ext.ImageCodec.heightOf(id))
      assert(nc === 1 && mode === 0, // OpenCV CV_8UC1: 8-bit single channel
        s"grayscale PNG must decode 1-channel (doc $id: nc=$nc mode=$mode)")
    }
  }

  test("jpeg SOF scan recovers dims through variable-length segments") {
    val media = ImageCodec.withImagePayload(spark, ids, "jpg")
    val out = ImageCodec.jpegDims(spark, media)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    out.foreach { case (id, w, h) =>
      assert(w === ImageCodec.widthOf(id) && h === ImageCodec.heightOf(id),
        s"doc $id")
    }
  }

  test("jpeg SOF scan skips legal 0xFF fill bytes before markers") {
    // JPEG permits runs of 0xFF padding between segments: only the last
    // 0xFF of a run precedes the marker byte. Inject a fill run after
    // SOI — a parser that treats FF FF as a lengthed segment misreads
    // the length and derails.
    import spark.implicits._
    val media = ImageCodec.withImagePayload(spark, ids, "jpg")
      .as[ImageCodec.MediaRow].map { m =>
        val b = m.media_bytes
        val padded = Array[Byte](b(0), b(1), 0xff.toByte, 0xff.toByte) ++
          b.drop(2)
        ImageCodec.MediaRow(m.doc_id, padded)
      }.toDF()
    val out = ImageCodec.jpegDims(spark, media)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.nonEmpty)
    out.foreach { case (id, w, h) =>
      assert(w === ImageCodec.widthOf(id) && h === ImageCodec.heightOf(id),
        s"doc $id under fill-byte padding")
    }
  }

  test("png decode round-trips the pattern pixels bit-for-bit") {
    val media = ImageCodec.withImagePayload(spark, ids, "png")
    val out = ImageCodec.decodeBrightness(spark, media)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    out.foreach { case (id, nPx, sum) =>
      val (w, h) = (ImageCodec.widthOf(id), ImageCodec.heightOf(id))
      val expect = (for (y <- 0 until h; x <- 0 until w)
        yield ImageCodec.gray(x, y, id).toLong).sum
      assert(nPx === w.toLong * h)
      assert(sum === expect, s"doc $id: decoded pixel sum")
    }
  }

  test("nearest-neighbor thumb reads exactly the formula's source pixels") {
    val media = ImageCodec.withImagePayload(spark, Seq(5L).toDF("doc_id"), "png")
    val out = ImageCodec.resampleThumb(spark, media, 4, 4)
      .select("i", "j", "v").as[(Int, Int, Long)].collect()
    val (w, h) = (ImageCodec.widthOf(5L), ImageCodec.heightOf(5L))
    assert(out.length === 16)
    out.foreach { case (i, j, v) =>
      assert(v === ImageCodec.gray(i * w / 4, j * h / 4, 5L).toLong)
    }
  }

  test("wav header column-op parse matches the real decoder and the formulas") {
    import graft.ext.AudioCodec
    val media = AudioCodec.withWavPayload(spark, ids)
    val parsed = AudioCodec.wavMeta(media)
      .select("doc_id", "riff_ok", "channels", "sample_rate",
        "bits_per_sample", "n_samples")
      .as[(Long, Boolean, Long, Long, Long, Long)].collect().sortBy(_._1)
    val bytesById = media.as[ImageCodec.MediaRow].collect()
      .map(m => m.doc_id -> m.media_bytes).toMap
    parsed.foreach { case (id, riff, ch, rate, bits, n) =>
      assert(riff && ch === 1L && bits === 16L, s"doc $id header fields")
      assert(rate === AudioCodec.rateOf(id) && n === AudioCodec.nSamplesOf(id))
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytesById(id)))
      assert(fmt.getFormat.getSampleRate.toInt === rate.toInt &&
        fmt.getFrameLength === n.toInt,
        s"doc $id: column-op parse vs javax.sound")
    }
  }

  test("wav decode round-trips the PCM pattern bit-for-bit") {
    import graft.ext.AudioCodec
    val media = AudioCodec.withWavPayload(spark, ids)
    val out = AudioCodec.wavDecode(spark, media)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    out.foreach { case (id, n, sum) =>
      val expectN = AudioCodec.nSamplesOf(id)
      val expect = (0 until expectN).map(i =>
        AudioCodec.sample(i, id).toLong).sum
      assert(n === expectN.toLong && sum === expect, s"doc $id")
    }
  }

  test("avi demux: RIFF walk finds every MJPEG frame, decoded dims match header") {
    import graft.ext.VideoCodec
    val media = VideoCodec.withAviPayload(spark, ids)
    val out = VideoCodec.demuxAvi(spark, media)
      .select("doc_id", "frame_idx", "frame_w", "frame_h",
        "hdr_frames", "hdr_w", "hdr_h")
      .as[(Long, Int, Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    ids.as[Long].collect().foreach { id =>
      val frames = out(id).sortBy(_._2)
      assert(frames.length === VideoCodec.nFramesOf(id), s"doc $id frame count")
      assert(frames.map(_._2).toSeq === frames.indices.toSeq, "stream order")
      frames.foreach { case (_, _, fw, fh, hn, hw, hh) =>
        assert(fw === ImageCodec.widthOf(id).toLong &&
          fh === ImageCodec.heightOf(id).toLong, s"doc $id decoded dims")
        assert(hn === VideoCodec.nFramesOf(id).toLong &&
          hw === fw && hh === fh, s"doc $id header claim vs decode")
      }
    }
  }

  test("avi frames are genuinely distinct JPEGs (per-frame pattern seed)") {
    import graft.ext.VideoCodec
    // two frames of the same doc decode to different pixel content: the
    // pattern seed 16*id+f shifts every sample by 31 per frame
    val bytes = VideoCodec.encodeAvi(9L)
    val media = Seq(graft.ext.ImageCodec.MediaRow(9L, bytes)).toDF()
    val n = VideoCodec.demuxAvi(spark, media).count()
    assert(n === VideoCodec.nFramesOf(9L).toLong)
  }

  test("metadata-only png query stays columnar over a parquet media table") {
    // with payloads at rest in parquet, the dims parse is pure column ops:
    // no (de)serialization into the JVM object path anywhere in the plan
    val dir = TmpDirs.create("graft_imgspec_").toString
    ImageCodec.withImagePayload(spark, ids, "png")
      .write.mode("overwrite").parquet(dir)
    val plan = MultimodalOps.pngDims(spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"),
      "IHDR parse must stay in columnar expression land")
  }
}
