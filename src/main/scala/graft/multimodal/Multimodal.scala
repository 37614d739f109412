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
  * pipelines with no shuffle until an explicit aggregate. The actual
  * byte decoding is a STUB (`FakeCodec`): this container has no image/
  * audio libraries, so the codec is a deterministic fake keyed on the
  * payload bytes. Swapping in a real codec changes only `FakeCodec`.
  */
object Multimodal {

  case class Media(media_id: Long, kind: String, payload: Array[Byte])
  case class Decoded(media_id: Long, kind: String, width: Int, height: Int,
                     n_bytes: Long)
  case class Feature(media_id: Long, embedding: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Per-partition decoder batch size — models a vectorized codec that
    * amortizes setup across a batch (GPU/SIMD decode at scale). */
  val DecodeBatch = 64

  /** STUB codec: deterministic pseudo-decode keyed on payload bytes.
    * Replace with a real image/audio library binding in production. */
  private[multimodal] object FakeCodec {
    def dims(payload: Array[Byte]): (Int, Int) = {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      val w = 16 + math.floorMod(h, 1920).toInt
      val ht = 16 + math.floorMod(h >> 16, 1080).toInt
      (w, ht)
    }
    def embed(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      var j = 0
      while (j < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(j) = ((h >>> 40).toInt % 1000) / 1000.0f
        j += 1
      }
      out
    }
  }

  /** Synthesize a media table from the documents table (payload = UTF-8
    * text bytes — a deterministic stand-in for stored image bytes). */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        concat(lit("img/"), col("source")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[Media]
  }

  /** Decode stage: one codec instance per partition, fixed-size batches
    * through it — narrow (no shuffle), schema-typed output. */
  def decode(media: Dataset[Media]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder setup would happen here (expensive init
      // amortized across the partition — the reason for mapPartitions)
      it.grouped(DecodeBatch).flatMap { batch =>
        batch.map { m =>
          val (w, h) = FakeCodec.dims(m.payload)
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
