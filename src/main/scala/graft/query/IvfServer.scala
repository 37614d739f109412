package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Serving-path ANN over a durable [[Similarity.writeIvfLayout]]
  * store — the [[LoadedPointServer]] idea for vectors: the coarse
  * routing decision moves to the DRIVER, so a probe is ONE Spark job
  * over one cell directory.
  *
  * At construction the k seed centroids are read once (k×dims floats —
  * bounded at any corpus size). A probe takes the QUERY VECTOR (what a
  * real ANN service receives — resolving an id to its vector is client
  * work), assigns its cell in microseconds driver-side (same
  * argmax-cosine, NaN→+∞, smallest-cid ties as [[Similarity
  * .ivfCells]]), and scans only `cell=<qcell>/` — the partition prune
  * becomes a PATH, not even a filter. Exact cosine re-rank +
  * TakeOrderedAndProject inside the cell.
  *
  * vs [[Similarity.probeIvfStore]] (the oracle-checked form): same
  * results by construction (spec-pinned); this class trades its
  * generality for one-job probes.
  */
final class IvfServer(spark: SparkSession, storeDir: String) {

  private val seeds: Array[(Long, Array[Float])] =
    spark.read.parquet(storeDir)
      .filter(col("vec_id") < Similarity.IvfCentroids.toLong)
      .select(col("vec_id"), col("embedding"))
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  require(seeds.nonEmpty, s"no seed centroids found in $storeDir")

  /** Driver-side sequential-fold cosine (dimension order), NaN → +∞ —
    * the [[Similarity.ivfCells]] ranking semantics. */
  private def cosSeq(a: Seq[Float], b: Array[Float]): Double = {
    var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
    while (i < b.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      ab += x * y; aa += x * x; bb += y * y; i += 1
    }
    val c = ab / (math.sqrt(aa) * math.sqrt(bb))
    if (java.lang.Double.isNaN(c)) Double.PositiveInfinity else c
  }

  /** The cell the store's assignment would give this vector. */
  def cellOf(qv: Seq[Float]): Long =
    seeds.map { case (cid, cv) => (cid, cosSeq(qv, cv)) }
      .maxBy { case (cid, c) => (c, -cid) }._1

  /** Top-k exact-cosine neighbors of `qv` inside its cell. `excludeId`
    * drops the query's own row when probing with a stored vector. */
  def probe(qv: Seq[Float], k: Int = 10, excludeId: Long = -1L): DataFrame =
    spark.read.parquet(s"$storeDir/cell=${cellOf(qv)}")
      .filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"),
        Similarity.cosine(col("embedding"), typedLit(qv)).as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("c"), 4).as("cos"))
}
