package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL audio encode/decode for the multimodal tier via the JDK's own
  * `javax.sound.sampled` (WAV read/write ships with every JDK — public
  * API, no external library). Mirrors [[ImageCodec]]: the fixture
  * attaches genuine RIFF/WAVE payloads whose 16-bit PCM samples follow a
  * closed-form pattern, the header parse is codegen'd column ops over
  * the actual bytes, and the decode folds REAL samples — PCM WAV is
  * lossless, so equality with the pattern is the codec round-trip proof.
  *
  * Scale shape: identical to the image path — encode/decode are
  * `mapPartitions` narrow maps (the ffmpeg seat), payloads stay columnar
  * in parquet, and metadata-only queries read 44 header bytes without
  * touching sample data.
  */
object AudioCodec {

  /** PCM pattern: sample(i | seed) = ((31i + 13·seed) mod 65536) − 32768
    * — full signed-16-bit range, linear stride so any byte-order or
    * offset bug shifts every sample. */
  def sample(i: Int, seed: Long): Int =
    ((((i * 31L + seed * 13L) % 65536L).toInt + 65536) % 65536) - 32768

  /** Fixture params varying with doc_id so constant-output parsers fail:
    * 32..127 samples, one of five standard-ish rates. */
  def nSamplesOf(docId: Long): Int = ((docId % 96L) + 32L).toInt
  def rateOf(docId: Long): Int = (8000L + (docId % 5L) * 4000L).toInt

  def encode(docId: Long): Array[Byte] = {
    val n = nSamplesOf(docId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sample(i, docId)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rateOf(docId).toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  import ImageCodec.MediaRow

  /** Attach a REAL WAV payload per document (doc_id-only scan, encoder
    * partition-parallel — same contract as the image fixture). */
  def withWavPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select("doc_id").as[Long].mapPartitions { ids =>
      ids.map(id => MediaRow(id, encode(id)))
    }.toDF()
  }

  /** RIFF/WAVE header parse in pure column ops — little-endian fields
    * assembled per byte (`b0 + 256·b1 + …`), canonical 44-byte header
    * offsets (1-indexed substring positions): "RIFF" @1, "WAVE" @9,
    * channels @23 (u16), sample rate @25 (u32), bits/sample @35 (u16),
    * data-chunk byte count @41 (u32) → n_samples for 16-bit mono. */
  def wavMeta(media: DataFrame): DataFrame = {
    def u8(pos: Int) =
      conv(hex(substring(col("media_bytes"), pos, 1)), 16, 10).cast("long")
    def le(pos: Int, len: Int) =
      (0 until len).map(k => u8(pos + k) * lit(1L << (8 * k)))
        .reduce(_ + _)
    media.select(
      col("doc_id"),
      (substring(col("media_bytes"), 1, 4).cast("string") === "RIFF" &&
       substring(col("media_bytes"), 9, 4).cast("string") === "WAVE")
        .as("riff_ok"),
      le(23, 2).as("channels"),
      le(25, 4).as("sample_rate"),
      le(35, 2).as("bits_per_sample"),
      (le(41, 4) / lit(2L)).cast("long").as("n_samples"))
  }

  final case class DecodedAudio(doc_id: Long, n_samples: Long,
                                sample_sum: Long)

  final case class AudioGateRow(doc_id: Long, ok: Boolean,
                                sample_rate: Long, n_samples: Long,
                                sample_sum: Long)

  /** [[wavDecode]] hardened for the INGEST path (the streaming audio
    * gate, mirroring [[ImageCodec.decodeGate]]): a payload the WAV
    * reader rejects — truncated bytes, missing WAVE tag, a codec
    * exception — yields an `ok = false` row instead of killing the
    * task, so the caller can QUARANTINE it (the dead-letter
    * discipline). Streaming-safe: a pure per-row map, no driver
    * state. The decoded format's own sample rate rides along as the
    * admission-counter key. */
  def decodeGate(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media_bytes").as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        try {
          val ais = AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(m.media_bytes))
          val rate = ais.getFormat.getSampleRate.toLong
          val data = ais.readAllBytes()
          var sum = 0L
          var i = 0
          while (i + 1 < data.length) {
            sum += ((data(i) & 0xff) | (data(i + 1) << 8)).toShort
            i += 2
          }
          AudioGateRow(m.doc_id, ok = true, rate, data.length / 2L, sum)
        } catch { case _: Exception =>
          AudioGateRow(m.doc_id, ok = false, -1L, 0L, 0L)
        }
      }
    }.toDF()
  }

  /** REAL sample decode via the JDK WAV reader — per-partition codec
    * loop, exact integer sum over the signed 16-bit samples. */
  def wavDecode(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "media_bytes").as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        val ais = AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(m.media_bytes))
        val data = ais.readAllBytes()
        var sum = 0L
        var i = 0
        while (i + 1 < data.length) {
          sum += ((data(i) & 0xff) | (data(i + 1) << 8)).toShort
          i += 2
        }
        DecodedAudio(m.doc_id, data.length / 2L, sum)
      }
    }.toDF()
  }
}
