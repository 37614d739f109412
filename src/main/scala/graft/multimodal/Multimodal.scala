package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for a training-data pipeline: media as
  * opaque `BINARY` payloads + typed metadata, with decode / feature
  * extraction / frame sampling as `mapPartitions` stages.
  *
  * The Spark-side plumbing is real — schema, encoders, partition-wise
  * batched iteration (the shape a vectorized decoder needs: reuse one
  * decoder instance per partition, process fixed-size batches), narrow
  * pipelines with no shuffle until an explicit aggregate. IMAGE decode
  * is real: payloads are genuine PNG bytes (`javax.imageio` — pure-JDK
  * codec) and [[decode]] parses them. AUDIO decode is real too:
  * payloads are genuine RIFF/WAVE PCM files (`javax.sound.sampled`)
  * and [[decodeAudio]] parses them. Only formats without any JDK codec
  * (video) still go through the declared deterministic stub
  * (`FakeCodec`); swapping in a native binding changes only that
  * object. */
object Multimodal {

  /** Real PNG codec on the JDK's `javax.imageio` — no external
    * libraries. Dimensions are a deterministic function of the media id
    * ([[dimsFor]]) so an oracle can reconstruct them relationally while
    * the engine must actually parse the bytes to recover them. */
  object PngCodec {
    import java.awt.image.BufferedImage

    // ImageIO's default stream cache spools every read/write through a
    // temp FILE on disk — per row, on the decode hot path. In-memory
    // streams only.
    javax.imageio.ImageIO.setUseCache(false)

    def dimsFor(id: Long): (Int, Int) =
      ((16 + java.lang.Math.floorMod(id, 64L)).toInt,
        (16 + java.lang.Math.floorMod(id * 7L, 48L)).toInt)

    def encode(w: Int, h: Int, seed: Long): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (x * 31 + y * 17 + seed).toInt & 0xffffff)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream(1 << 12)
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** None when the stream can't be decoded — either no reader claims
      * it (`ImageIO.read` returns null) or the claimed reader throws on
      * a corrupt/truncated payload that merely begins with the PNG
      * signature (`IIOException`). A bad row falls back to the stub
      * instead of failing the whole task. */
    def decodeDims(payload: Array[Byte]): Option[(Int, Int)] =
      try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload)))
        .map(img => (img.getWidth, img.getHeight))
      catch { case scala.util.control.NonFatal(_) => None }

    /** PNG signature check (89 50 4E 47): routes real images to the
      * real decoder, everything else to the stub. */
    def isPng(payload: Array[Byte]): Boolean =
      payload.length >= 4 && (payload(0) & 0xff) == 0x89 &&
        payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G'
  }

  /** Real WAV codec on the JDK's `javax.sound.sampled` — no external
    * libraries, same pattern as [[PngCodec]]: payloads are genuine
    * RIFF/WAVE PCM files, synthesized with parameters that derive from
    * the media id ([[paramsFor]]) so an oracle can reconstruct the
    * decoded properties relationally while the engine must actually
    * parse the WAV header + data-chunk length to recover them. */
  object WavCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    /** (sample_rate, n_frames, channels) as a function of the media id
      * — mirrored by the q28_audio DuckDB oracle. */
    def paramsFor(id: Long): (Int, Int, Int) =
      ((8000 + java.lang.Math.floorMod(id, 5L) * 2000).toInt,
        (300 + java.lang.Math.floorMod(id * 13L, 700L)).toInt,
        (1 + java.lang.Math.floorMod(id, 2L)).toInt)

    /** 16-bit little-endian PCM WAV with pseudo-random sample data. */
    def encode(rate: Int, frames: Int, channels: Int,
               seed: Long): Array[Byte] = {
      val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
      val data = new Array[Byte](frames * channels * 2)
      var h = seed
      var i = 0
      while (i < data.length) {
        h = h * 6364136223846793005L + 1442695040888963407L
        data(i) = (h >>> 56).toByte
        i += 1
      }
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream(data.length + 64)
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** (sample_rate, channels, n_frames) parsed from the WAV bytes;
      * None when no reader claims the stream or the payload is
      * corrupt — a bad row falls back to the stub, like PNG decode. */
    def decodeProps(payload: Array[Byte]): Option[(Int, Int, Long)] =
      try {
        val ais = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val f = ais.getFormat
          Some((f.getSampleRate.toInt, f.getChannels, ais.getFrameLength))
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    /** RIFF/WAVE signature check: routes real audio to the real
      * decoder, everything else to the stub. */
    def isWav(p: Array[Byte]): Boolean =
      p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' &&
        p(11) == 'E'
  }

  case class Media(media_id: Long, kind: String, payload: Array[Byte])
  case class Decoded(media_id: Long, kind: String, width: Int, height: Int,
                     n_bytes: Long)
  case class DecodedAudio(media_id: Long, kind: String, sample_rate: Long,
                          channels: Long, n_frames: Long, duration_ms: Long)
  case class Feature(media_id: Long, embedding: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Per-partition decoder batch size — models a vectorized codec that
    * amortizes setup across a batch (GPU/SIMD decode at scale). */
  val DecodeBatch = 64

  /** STUB codec for formats without a JDK decoder (video):
    * deterministic pseudo-decode keyed on payload bytes. Replace with
    * a native library binding in production. */
  private[multimodal] object FakeCodec {
    private def hash(payload: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      h
    }
    def dims(payload: Array[Byte]): (Int, Int) = {
      val h = hash(payload)
      val w = 16 + math.floorMod(h, 1920).toInt
      val ht = 16 + math.floorMod(h >> 16, 1080).toInt
      (w, ht)
    }
    def embed(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = hash(payload)
      var j = 0
      while (j < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(j) = ((h >>> 40).toInt % 1000) / 1000.0f
        j += 1
      }
      out
    }
  }

  /** Synthesize a media table from the documents table: payload = a
    * REAL PNG (rendered + compressed per row via `javax.imageio`) whose
    * dimensions derive from the media id. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    val png = udf((id: Long) => {
      val (w, h) = PngCodec.dimsFor(id)
      PngCodec.encode(w, h, id)
    })
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        concat(lit("img/"), col("source")).as("kind"),
        png(col("doc_id")).as("payload"))
      .as[Media]
  }

  /** Synthesize an audio media table from the documents table: payload
    * = a REAL WAV file (16-bit PCM, written via `javax.sound.sampled`)
    * whose sample rate / frame count / channel count derive from the
    * media id. */
  def audioFromDocuments(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    val wav = udf((id: Long) => {
      val (rate, frames, channels) = WavCodec.paramsFor(id)
      WavCodec.encode(rate, frames, channels, id)
    })
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        concat(lit("aud/"), col("source")).as("kind"),
        wav(col("doc_id")).as("payload"))
      .as[Media]
  }

  /** Audio decode stage: same batched-`mapPartitions` shape as
    * [[decode]]. WAV payloads are REALLY parsed
    * (`AudioSystem.getAudioInputStream` — header + data-chunk length);
    * other formats fall back to the declared stub. `duration_ms` is
    * floor(frames·1000/rate), derived from the decoded values. */
  def decodeAudio(media: Dataset[Media]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap { batch =>
        batch.map { m =>
          val (rate, channels, frames) =
            (if (WavCodec.isWav(m.payload)) WavCodec.decodeProps(m.payload)
             else None).getOrElse {
              val (w, h) = FakeCodec.dims(m.payload)
              (8000 + (w % 5) * 2000, 1 + h % 2, (300 + w % 700).toLong)
            }
          DecodedAudio(m.media_id, m.kind, rate.toLong, channels.toLong,
            frames, frames * 1000L / rate)
        }
      }
    }
  }

  /** Decode stage: one codec instance per partition, fixed-size batches
    * through it — narrow (no shuffle), schema-typed output. PNG
    * payloads are REALLY parsed (`ImageIO.read`); other formats fall
    * back to the declared stub. */
  def decode(media: Dataset[Media]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder setup would happen here (expensive init
      // amortized across the partition — the reason for mapPartitions)
      it.grouped(DecodeBatch).flatMap { batch =>
        batch.map { m =>
          val (w, h) =
            (if (PngCodec.isPng(m.payload)) PngCodec.decodeDims(m.payload)
             else None).getOrElse(FakeCodec.dims(m.payload))
          Decoded(m.media_id, m.kind, w, h, m.payload.length.toLong)
        }
      }
    }
  }

  /** Feature-extraction stage: payload → fixed-dim embedding. */
  def features(media: Dataset[Media], dim: Int = 16): Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap(_.map(m =>
        Feature(m.media_id, FakeCodec.embed(m.payload, dim))))
    }
  }

  /** Frame sampling: slice every `stride`-th chunk of the payload as a
    * "frame" (stub for video frame extraction); one row per frame. */
  def sampleFrames(media: Dataset[Media], frameBytes: Int = 32,
                   stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val n = m.payload.length / frameBytes
      (0 until n by stride).map { i =>
        Frame(m.media_id, i,
          m.payload.slice(i * frameBytes, (i + 1) * frameBytes))
      }
    }
  }

  /** Metadata "resize": pure column arithmetic on decoded dims (no
    * payload touch — the plan stays narrow and codegen'd). */
  def resizePlan(decoded: Dataset[Decoded], maxSide: Int = 256): DataFrame =
    decoded.toDF()
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) /
          greatest(col("width"), col("height")).cast("double")))
      .withColumn("out_w", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", ceil(col("height") * col("scale")).cast("int"))
}
