package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  lazy val media = Multimodal.mediaFromDocuments(spark, "/root/testdata/sf0.001")

  test("media table: binary payload + typed metadata") {
    val row = media.filter(col("media_id") === 0).head()
    assert(row.payload.nonEmpty)
    assert(row.kind.startsWith("img/"))
    assert(media.count() == 500)
  }

  test("decode is deterministic and schema-typed") {
    val d1 = Multimodal.decode(media).orderBy("media_id").collect()
    val d2 = Multimodal.decode(media).orderBy("media_id").collect()
    assert(d1.toSeq == d2.toSeq)
    assert(d1.forall(d => d.width >= 16 && d.height >= 16))
    assert(d1.forall(_.n_bytes > 0))
  }

  test("PNG payloads are real: ImageIO round-trips the formula dimensions") {
    val p = media.filter(col("media_id") === 3).head().payload
    assert(Multimodal.PngCodec.isPng(p), "payload is not a PNG")
    Multimodal.decode(media).orderBy("media_id").head(20).foreach { r =>
      val (w, h) = Multimodal.PngCodec.dimsFor(r.media_id)
      assert((r.width, r.height) == (w, h),
        s"decoded dims disagree with the formula for ${r.media_id}")
    }
  }

  test("corrupt payload with a valid PNG signature falls back, not crash") {
    import spark.implicits._
    // signature intact, truncated mid-stream: the JDK reader claims it
    // and throws — decode must fall back to the stub per row, never
    // fail the task
    val truncated = Multimodal.PngCodec.encode(20, 20, 1L).take(20)
    assert(Multimodal.PngCodec.isPng(truncated))
    assert(Multimodal.PngCodec.decodeDims(truncated).isEmpty)
    val d = Multimodal.decode(
      Seq(Multimodal.Media(1L, "img/x", truncated)).toDS()).head()
    assert((d.width, d.height) == Multimodal.FakeCodec.dims(truncated))
  }

  test("decode plan is narrow — no shuffle") {
    val plan = Multimodal.decode(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("feature extraction emits fixed-dim embeddings") {
    val f = Multimodal.features(media, dim = 16).head(10)
    assert(f.forall(_.embedding.length == 16))
    assert(f.forall(_.embedding.forall(v => v > -1.0f && v < 1.0f)))
  }

  test("frame sampling strides through payload") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 4)
      .filter(col("media_id") === 1).collect()
    assert(frames.nonEmpty)
    assert(frames.map(_.frame_idx).toSeq ==
      frames.map(_.frame_idx).toSeq.sorted)
    assert(frames.forall(_.frame.length == 32))
    assert(frames.map(_.frame_idx).forall(_ % 4 == 0))
  }

  lazy val videos = Multimodal.videoFromDocuments(spark, "/root/testdata/sf0.001")

  test("AVI payloads are real: RIFF walk + frame decode round-trip the formula") {
    val p = videos.filter(col("media_id") === 3).head().payload
    assert(Multimodal.AviCodec.isAvi(p), "payload is not a RIFF/AVI file")
    Multimodal.decodeVideo(videos).orderBy("media_id").head(20).foreach { r =>
      val (w, h, n, fps) = Multimodal.AviCodec.paramsFor(r.media_id)
      assert((r.width, r.height, r.n_frames, r.fps) ==
        (w.toLong, h.toLong, n.toLong, fps.toLong),
        s"decoded props disagree with the formula for ${r.media_id}")
      assert(r.duration_ms == n * 1000L / fps)
    }
  }

  test("sampled video frames are genuine standalone JPEGs at the stride") {
    val fs = Multimodal.sampleVideoFrames(videos, stride = 2)
      .filter(col("media_id") === 7).collect()
    val (w, h, n, _) = Multimodal.AviCodec.paramsFor(7L)
    assert(fs.map(_.frame_idx).toSeq == (0 until n by 2))
    fs.foreach { f =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.frame))
      assert(img != null, s"frame ${f.frame_idx} is not a decodable image")
      assert((img.getWidth, img.getHeight) == (w, h))
    }
  }

  test("corrupt AVI with a valid signature falls back, not crash") {
    import spark.implicits._
    val (w, h, n, fps) = Multimodal.AviCodec.paramsFor(5L)
    // signature intact, truncated mid-container: the chunk walk finds
    // frames but the JPEG decode fails → decodeProps None → stub row
    val truncated = Multimodal.AviCodec.encode(w, h, n, fps, 5L).take(200)
    assert(Multimodal.AviCodec.isAvi(truncated))
    assert(Multimodal.AviCodec.decodeProps(truncated).isEmpty)
    val d = Multimodal.decodeVideo(
      Seq(Multimodal.Media(5L, "vid/x", truncated)).toDS()).head()
    val (fw, fh) = Multimodal.FakeCodec.dims(truncated)
    assert((d.width, d.height) == (fw.toLong, fh.toLong))
  }

  test("video decode and frame sampling plans are narrow — no shuffle") {
    assert(!Multimodal.decodeVideo(videos)
      .queryExecution.executedPlan.toString.contains("Exchange"))
    assert(!Multimodal.sampleVideoFrames(videos)
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("resize plan computes bounded output dims in pure columns") {
    val r = Multimodal.resizePlan(Multimodal.decode(media), maxSide = 256)
      .collect()
    assert(r.forall(_.getAs[Int]("out_w") <= 256))
    assert(r.forall(_.getAs[Int]("out_h") <= 256))
  }

  test("pixel resize: output dims bounded, identity below the bound, " +
    "checksum stable across runs") {
    import org.apache.spark.sql.functions._
    val media = Multimodal
      .mediaFromDocuments(spark, "/root/testdata/sf0.001").limit(40)
    val a = Multimodal.resizeImages(media, maxSide = 24).orderBy("media_id")
    val rows = a.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h, ow, oh) = (r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(ow <= 24 && oh <= 24 && ow >= 1 && oh >= 1)
      if (math.max(w, h) <= 24) assert(ow == w && oh == h,
        s"media ${r.getLong(0)}: identity resize changed dims")
    }
    val again = Multimodal.resizeImages(media, maxSide = 24)
      .orderBy("media_id").collect()
    assert(rows.map(_.getLong(6)).toSeq == again.map(_.getLong(6)).toSeq,
      "pixel checksums not deterministic")
  }
}
