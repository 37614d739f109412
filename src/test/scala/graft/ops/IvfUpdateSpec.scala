package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-14 UPDATE for the durable IVF vector store (re-embedded docs
  * keep their vec_id, the vector changes). The oracle entry
  * q25_ann_ivf_updated proves the absolute answer including the
  * re-derived coordinate system; these specs pin the two legs' choice
  * and replay convergence. */
class IvfUpdateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def probe(store: String): Seq[(Long, Double)] =
    Similarity.probeIvfStore(spark, store, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  /** A corpus dir whose embeddings table holds the updated vectors —
    * the from-scratch rebuild ground truth. */
  private def updatedTable(pred: org.apache.spark.sql.Column): String = {
    val d = tmp("graft_ivfupd_truth_src")
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        when(pred, transform(col("embedding"), v => -v))
          .otherwise(col("embedding")).as("embedding"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("non-seed update takes the APPEND leg: coordinate system " +
    "untouched (store k and seed vectors unchanged), probe == " +
    "rebuild over the updated embeddings") {
    val store = tmp("graft_ivfupd_a")
    Similarity.writeIvfLayout(spark, dir, store)
    val preSeeds = Similarity.storeSeeds(spark, store).toSeq
    // update ids safely above the seed range
    val pred = pmod(col("vec_id"), lit(7)) === lit(6) &&
      col("vec_id") >= lit(100)
    val newVecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(pred)
      .select(col("vec_id"),
        transform(col("embedding"), v => -v).as("embedding"))
    Similarity.updateIvfVectors(spark, store, newVecs)
    assert(Similarity.storeK(spark, store) ==
      Similarity.IvfCentroids.toLong, "append leg changed the store k")
    assert(Similarity.storeSeeds(spark, store).toSeq == preSeeds,
      "append leg changed the coordinate system")
    assert(Similarity.ivfTombstones(spark, store).isEmpty,
      "update left pending tombstones (reclaim leg missing)")
    val truth = tmp("graft_ivfupd_a_truth")
    Similarity.writeIvfLayout(spark, updatedTable(pred), truth)
    assert(probe(store) == probe(truth),
      "append-leg update != rebuild over updated embeddings")
    // replay converges
    Similarity.updateIvfVectors(spark, store, newVecs)
    assert(probe(store) == probe(truth), "update replay diverged")
  }

  test("seed update takes the RE-COORDINATE leg: probe == rebuild " +
    "over the updated embeddings (new seed vectors route), k " +
    "preserved, tombstones consumed") {
    val store = tmp("graft_ivfupd_s")
    Similarity.writeIvfLayout(spark, dir, store)
    val pred = pmod(col("vec_id"),
      lit(Similarity.UpdatedVecsMod.toLong)) ===
      lit(Similarity.UpdatedVecsRem.toLong)
    val newVecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(pred)
      .select(col("vec_id"),
        transform(col("embedding"), v => -v).as("embedding"))
    Similarity.updateIvfVectors(spark, store, newVecs)
    assert(Similarity.storeK(spark, store) ==
      Similarity.IvfCentroids.toLong,
      "seed-leg update resized the store")
    assert(Similarity.ivfTombstones(spark, store).isEmpty,
      "recluster left its consumed tombstones")
    val truth = tmp("graft_ivfupd_s_truth")
    Similarity.writeIvfLayout(spark, updatedTable(pred), truth)
    assert(probe(store) == probe(truth),
      "re-coordinate update != rebuild over updated embeddings")
    // the updated seed's NEW vector is the routing coordinate now
    val seed3 = Similarity.storeSeeds(spark, store)
      .find(_._1 == Similarity.UpdatedVecsRem.toLong)
    val orig3 = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === Similarity.UpdatedVecsRem.toLong)
      .head().getSeq[Float](1)
    assert(seed3.exists(_._2 == orig3.map(v => -v)),
      "seed coordinate did not switch to the updated vector")
    // replay converges
    Similarity.updateIvfVectors(spark, store, newVecs)
    assert(probe(store) == probe(truth), "update replay diverged")
  }
}
