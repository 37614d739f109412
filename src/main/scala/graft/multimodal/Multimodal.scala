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
  * and [[decodeAudio]] parses them. VIDEO decode is real as well:
  * payloads are genuine MJPEG-in-AVI files (hand-walked RIFF container
  * + per-frame JDK JPEG codec) and [[decodeVideo]] /
  * [[sampleVideoFrames]] parse them. The deterministic stub
  * (`FakeCodec`) remains only as the declared fallback for payloads no
  * codec claims. */
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

  /** Real MJPEG-in-AVI codec on the JDK alone — the RIFF container is
    * walked by hand (no JDK AVI demuxer exists), each frame is a
    * genuine JPEG decoded/encoded via `javax.imageio` (the JDK ships a
    * JPEG codec), same pattern as [[PngCodec]]/[[WavCodec]]: payloads
    * are real AVI files synthesized from id-derived parameters
    * ([[paramsFor]]) so an oracle can reconstruct the decoded
    * properties relationally while the engine must actually parse the
    * container and decode the frames to recover them. */
  object AviCodec {
    import java.awt.image.BufferedImage

    /** (width, height, n_frames, fps) as a function of the media id —
      * mirrored by the q28_video DuckDB oracle. fps ∈ {10,15,20,25}. */
    def paramsFor(id: Long): (Int, Int, Int, Int) =
      ((16 + java.lang.Math.floorMod(id, 32L)).toInt,
        (16 + java.lang.Math.floorMod(id * 5L, 24L)).toInt,
        (3 + java.lang.Math.floorMod(id, 6L)).toInt,
        (10 + java.lang.Math.floorMod(id, 4L) * 5).toInt)

    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    private def jpegFrame(w: Int, h: Int, seed: Long, idx: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (x * 31 + y * 17 + seed + idx * 101).toInt & 0xffffff)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream(1 << 10)
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

    private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1 // RIFF chunks are word-aligned
      val out = new Array[Byte](8 + body.length + pad)
      System.arraycopy(fcc(id), 0, out, 0, 4)
      System.arraycopy(le32(body.length), 0, out, 4, 4)
      System.arraycopy(body, 0, out, 8, body.length)
      out
    }
    private def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(kind) ++ body)

    /** Minimal standards-shaped AVI: RIFF('AVI ') → LIST(hdrl){avih,
      * LIST(strl){strh,strf}} → LIST(movi){'00dc' JPEG × n}. */
    def encode(w: Int, h: Int, nFrames: Int, fps: Int,
               seed: Long): Array[Byte] = {
      val usPerFrame = 1000000 / fps
      val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      val strh = fcc("vids") ++ fcc("MJPG") ++ le32(0) ++
        le16(0) ++ le16(0) ++ le32(0) ++
        le32(1) ++ le32(fps) ++ // dwScale=1, dwRate=fps
        le32(0) ++ le32(nFrames) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
      val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
        fcc("MJPG") ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++
        le32(0) ++ le32(0)
      val hdrl = list("hdrl",
        chunk("avih", avih) ++
          list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val movi = list("movi",
        (0 until nFrames).toArray
          .flatMap(i => chunk("00dc", jpegFrame(w, h, seed, i))))
      val body = fcc("AVI ") ++ hdrl ++ movi
      fcc("RIFF") ++ le32(body.length) ++ body
    }

    private def u32(p: Array[Byte], off: Int): Long =
      (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
        ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
    private def isFcc(p: Array[Byte], off: Int, s: String): Boolean =
      off + 4 <= p.length && p(off) == s.charAt(0).toByte &&
        p(off + 1) == s.charAt(1).toByte && p(off + 2) == s.charAt(2).toByte &&
        p(off + 3) == s.charAt(3).toByte

    /** RIFF/AVI signature check: routes real video to the real
      * decoder, everything else to the stub. */
    def isAvi(p: Array[Byte]): Boolean =
      p.length >= 12 && isFcc(p, 0, "RIFF") && isFcc(p, 8, "AVI ")

    /** The '00dc' frame payloads (JPEG bytes), in stream order, by
      * walking the RIFF chunk tree — the real frame-iteration path
      * [[sampleVideoFrames]] and [[decodeVideo]] share. */
    def frames(p: Array[Byte]): Seq[Array[Byte]] = {
      val out = Seq.newBuilder[Array[Byte]]
      def walk(from: Int, to: Int): Unit = {
        var pos = from
        while (pos + 8 <= to) {
          val size = u32(p, pos + 4).toInt
          val end = math.min(pos + 8 + size, to)
          if (isFcc(p, pos, "LIST")) walk(pos + 12, end)
          else if (isFcc(p, pos, "00dc") && size > 0)
            out += java.util.Arrays.copyOfRange(p, pos + 8, end)
          pos += 8 + size + (size & 1)
        }
      }
      if (isAvi(p)) walk(12, p.length)
      out.result()
    }

    /** µs-per-frame from the 'avih' main header, or None when the walk
      * finds none. */
    private def usPerFrame(p: Array[Byte]): Option[Long] = {
      var found: Option[Long] = None
      def walk(from: Int, to: Int): Unit = {
        var pos = from
        while (pos + 8 <= to && found.isEmpty) {
          val size = u32(p, pos + 4).toInt
          val end = math.min(pos + 8 + size, to)
          if (isFcc(p, pos, "LIST")) walk(pos + 12, end)
          else if (isFcc(p, pos, "avih") && size >= 4)
            found = Some(u32(p, pos + 8))
          pos += 8 + size + (size & 1)
        }
      }
      walk(12, p.length)
      found
    }

    /** (width, height, n_frames, fps) decoded from the AVI bytes —
      * dimensions come from REALLY decoding every JPEG frame
      * (`ImageIO.read`; all frames must agree), the frame count from
      * the '00dc' chunk walk, fps from the avih µs-per-frame. None on
      * any malformed layer — a bad row falls back to the stub, like
      * PNG/WAV decode. */
    def decodeProps(payload: Array[Byte]): Option[(Int, Int, Int, Int)] =
      try {
        val fs = frames(payload)
        if (fs.isEmpty) return None
        val dims = fs.map { f =>
          Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(f)))
            .map(img => (img.getWidth, img.getHeight))
        }
        if (dims.exists(_.isEmpty)) return None
        val ds = dims.flatten.distinct
        if (ds.size != 1) return None // MJPEG stream with drifting dims
        usPerFrame(payload).filter(_ > 0).map { us =>
          (ds.head._1, ds.head._2, fs.size, (1000000L / us).toInt)
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  case class Media(media_id: Long, kind: String, payload: Array[Byte])
  case class Decoded(media_id: Long, kind: String, width: Int, height: Int,
                     n_bytes: Long)
  case class DecodedAudio(media_id: Long, kind: String, sample_rate: Long,
                          channels: Long, n_frames: Long, duration_ms: Long)
  case class DecodedVideo(media_id: Long, kind: String, width: Long,
                          height: Long, n_frames: Long, fps: Long,
                          duration_ms: Long)
  case class Feature(media_id: Long, embedding: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Per-partition decoder batch size — models a vectorized codec that
    * amortizes setup across a batch (GPU/SIMD decode at scale). */
  val DecodeBatch = 64

  /** STUB fallback codec for payloads no real codec claims:
    * deterministic pseudo-decode keyed on payload bytes. Every media
    * family's happy path (PNG, WAV, AVI) is a real parse; this keeps a
    * bad row from failing the task. */
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

  /** Synthesize a video media table from the documents table: payload
    * = a REAL MJPEG-in-AVI file (RIFF container + JPEG frames via
    * `javax.imageio`) whose dimensions / frame count / frame rate
    * derive from the media id. */
  def videoFromDocuments(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    val avi = udf((id: Long) => {
      val (w, h, frames, fps) = AviCodec.paramsFor(id)
      AviCodec.encode(w, h, frames, fps, id)
    })
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        concat(lit("vid/"), col("source")).as("kind"),
        avi(col("doc_id")).as("payload"))
      .as[Media]
  }

  /** Video decode stage: same batched-`mapPartitions` shape as
    * [[decode]]. AVI payloads are REALLY parsed — the RIFF chunk tree
    * is walked for the frame chunks and the avih header, and every
    * JPEG frame is decoded for its dimensions; other formats fall back
    * to the declared stub. `duration_ms` = floor(frames·1000/fps). */
  def decodeVideo(media: Dataset[Media]): Dataset[DecodedVideo] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap { batch =>
        batch.map { m =>
          val (w, h, frames, fps) =
            (if (AviCodec.isAvi(m.payload)) AviCodec.decodeProps(m.payload)
             else None).getOrElse {
              val (fw, fh) = FakeCodec.dims(m.payload)
              (fw, fh, 3 + fw % 6, 10 + (fh % 4) * 5)
            }
          DecodedVideo(m.media_id, m.kind, w.toLong, h.toLong,
            frames.toLong, fps.toLong, frames * 1000L / fps)
        }
      }
    }
  }

  /** REAL frame sampling for AVI payloads: walk the RIFF chunk tree
    * and emit every `stride`-th '00dc' frame's JPEG bytes — one row
    * per sampled frame, narrow (no shuffle). Non-AVI payloads fall
    * back to [[sampleFrames]]' byte-slicing stub shape. */
  def sampleVideoFrames(media: Dataset[Media],
                        stride: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      if (AviCodec.isAvi(m.payload)) {
        val fs = AviCodec.frames(m.payload)
        fs.indices.by(stride).map(i => Frame(m.media_id, i, fs(i)))
      } else {
        val n = m.payload.length / 32
        (0 until n by stride).map(i =>
          Frame(m.media_id, i, m.payload.slice(i * 32, (i + 1) * 32)))
      }
    }
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

  /** REAL pixel-level image resize — the materialized counterpart of
    * [[resizePlan]]'s metadata arithmetic: each PNG payload is decoded
    * (`ImageIO`, pure JDK), resampled by deterministic nearest
    * neighbor (`src = (dst * srcDim) / dstDim`, integer division — no
    * AA filter whose kernel could vary across JVMs), re-encoded as
    * PNG, then RE-decoded to report the output dims plus an exact
    * 24-bit-pixel checksum. The checksum is the proof knob: the DuckDB
    * oracle reconstructs it from the synthetic pixel formula
    * ([[PngCodec.encode]]: `(x*31 + y*17 + id) & 0xffffff`), so a
    * hash-match certifies the whole decode → resample → encode →
    * decode chain touched real pixels correctly.
    *
    * Scale shape: one `mapPartitions` pass, per-row state = one image;
    * non-PNG payloads drop (the signature-routing convention). */
  def resizeImages(media: Dataset[Media], maxSide: Int = 24): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap(_.flatMap { m =>
        if (!PngCodec.isPng(m.payload)) None
        else try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload))
          val (w, h) = (img.getWidth, img.getHeight)
          val s = math.min(1.0, maxSide.toDouble / math.max(w, h))
          val ow = math.ceil(w * s).toInt
          val oh = math.ceil(h * s).toInt
          val out = new java.awt.image.BufferedImage(ow, oh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < oh) {
            var x = 0
            while (x < ow) {
              out.setRGB(x, y, img.getRGB(x * w / ow, y * h / oh) & 0xffffff)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream(1 << 12)
          javax.imageio.ImageIO.write(out, "png", bos)
          val back = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bos.toByteArray))
          var sum = 0L
          y = 0
          while (y < back.getHeight) {
            var x = 0
            while (x < back.getWidth) {
              sum += (back.getRGB(x, y) & 0xffffff).toLong
              x += 1
            }
            y += 1
          }
          Some((m.media_id, m.kind, w, h,
            back.getWidth, back.getHeight, sum))
        } catch { case scala.util.control.NonFatal(_) => None }
      })
    }.toDF("media_id", "kind", "width", "height", "out_w", "out_h",
      "pix_sum")
  }

  /** REAL pixel feature extraction — grid statistics over the decoded
    * image: the image is cut into `grid`×`grid` cells by integer
    * division (`cellRow = y*grid/h`), and each cell emits its pixel
    * count and the exact sum of its 24-bit RGB values. All-integer, so
    * the DuckDB oracle recomputes the identical rows from the
    * generative pixel formula — a hash-match proves the feature stage
    * reads real decoded pixels (where [[features]]' fixed-dim
    * embedding stub only proved plumbing). One `mapPartitions` pass,
    * per-row state = one image; non-PNG payloads drop. */
  def imageFeatureGrid(media: Dataset[Media], grid: Int = 2): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatch).flatMap(_.flatMap { m =>
        if (!PngCodec.isPng(m.payload)) Iterator.empty
        else try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload))
          val (w, h) = (img.getWidth, img.getHeight)
          val n = new Array[Long](grid * grid)
          val s = new Array[Long](grid * grid)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val c = (y * grid / h) * grid + (x * grid / w)
              n(c) += 1
              s(c) += (img.getRGB(x, y) & 0xffffff).toLong
              x += 1
            }
            y += 1
          }
          (0 until grid * grid).iterator
            .map(c => (m.media_id, c.toLong, n(c), s(c)))
        } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      })
    }.toDF("media_id", "cell", "n_px", "vsum")
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
