package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-14 frozen-quantizer hardening + UPDATE for the PQ-coded
  * store. The coded store is LOSSY — its rows are meaningless without
  * the exact codebooks/seeds they were encoded under — so the store
  * now carries its quantizer as a sidecar written at build time, and
  * updates encode new versions against it. The oracle entry
  * q25_ann_ivfpq_updated proves the absolute ADC answer; these specs
  * pin the sidecar semantics. */
class PqUpdateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def probe(d: String, store: String): Seq[(Long, Double)] =
    Pq.probeIvfPqStore(spark, d, store, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  /** A corpus dir whose embeddings table is a COPY of the fixture's
    * (mutable without touching shared caches). */
  private def corpusCopy(): String = {
    val d = tmp("graft_pqupd_src")
    spark.read.parquet(s"$dir/embeddings.parquet")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("the quantizer sidecar freezes the store's coordinates: a " +
    "source-table rewrite no longer desyncs probes from the stored " +
    "codes (the pre-sidecar hazard)") {
    val d = corpusCopy()
    val store = tmp("graft_pqupd_frozen")
    Pq.writeIvfPqStore(spark, d, store)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$store/${Pq.QuantizerDir}")), "no quantizer sidecar written")
    val pre = probe(d, store)
    // REWRITE the source table: every non-seed, non-query vector
    // negated. Table-derived codebooks would retrain on this and
    // re-rank stored codes under the wrong distance tables; the
    // frozen sidecar must keep the probe byte-identical (the store's
    // rows and the query vector are unchanged).
    val mutated = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"),
        when(col("vec_id") >= Similarity.IvfCentroids,
          transform(col("embedding"), x => -x))
          .otherwise(col("embedding")).as("embedding"))
    val stagedDir = tmp("graft_pqupd_mut")
    mutated.write.mode("overwrite").parquet(s"$stagedDir/staged")
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$d/embeddings.parquet"), true)
    spark.read.parquet(s"$stagedDir/staged")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    assert(probe(d, store) == pre,
      "a source-table rewrite changed the probe — the quantizer was " +
        "not frozen with the store")
  }

  test("updatePqVectors: updating id X to id Y's vector gives X " +
    "exactly Y's codes and cell (frozen-codebook encode exactness); " +
    "replay converges; untouched cells stay byte-identical; seed " +
    "updates and pre-sidecar stores are refused") {
    val d = corpusCopy()
    val store = tmp("graft_pqupd_upd")
    Pq.writeIvfPqStore(spark, d, store)
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val x = maxId
    val y = maxId - 7
    val rowsOf = (id: Long) =>
      spark.read.parquet(store).filter(col("vec_id") === id)
        .drop("vec_id").collect().map(_.toString).toSeq
    val yPre = rowsOf(y)
    assert(yPre.size == 1)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def cellFiles(): Map[String, (Long, Long)] =
      fs.listStatus(new org.apache.hadoop.fs.Path(store))
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
        .flatMap(cd => fs.listStatus(cd.getPath).filter(_.isFile))
        .map(f => (f.getPath.toString, (f.getLen, f.getModificationTime)))
        .toMap
    val preFiles = cellFiles()
    val xPreCell = spark.read.parquet(store)
      .filter(col("vec_id") === x)
      .select(col("cell").cast("long")).head().getLong(0)
    val newVecs = emb.filter(col("vec_id") === y)
      .select(lit(x).as("vec_id"), col("embedding"))
    Pq.updatePqVectors(spark, store, newVecs)
    assert(rowsOf(x) == yPre,
      "updated row's codes+cell != the donor vector's (frozen-" +
        "codebook encode drifted)")
    assert(Similarity.ivfTombstones(spark, store).isEmpty,
      "update left pending tombstones")
    // only cells holding X's old or new row may have changed
    val touchedCells = Set(xPreCell,
      spark.read.parquet(store).filter(col("vec_id") === x)
        .select(col("cell").cast("long")).head().getLong(0))
    val postFiles = cellFiles()
    val unchanged = preFiles.filter { case (p, _) =>
      !touchedCells.exists(c => p.contains(s"cell=$c")) }
    assert(unchanged.forall { case (p, v) =>
      postFiles.get(p).contains(v) },
      "a cell not holding the updated row rewrote")
    // replay converges
    val post = probe(d, store)
    Pq.updatePqVectors(spark, store, newVecs)
    assert(rowsOf(x) == yPre && probe(d, store) == post,
      "update replay diverged")
    // a frozen coarse seed cannot be updated in place
    val seedUpd = emb.filter(col("vec_id") === 0)
      .select(col("vec_id"),
        transform(col("embedding"), v => -v).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Pq.updatePqVectors(spark, store, seedUpd)
    }
    assert(e.getMessage.contains("coarse-seed"))
    // a pre-sidecar store is refused (no frozen coordinates)
    val e2 = intercept[IllegalStateException] {
      Pq.updatePqVectors(spark, tmpStoreNoSidecar(d), newVecs)
    }
    assert(e2.getMessage.contains("sidecar"))
  }

  /** A store stripped of its sidecar (the pre-r14 layout). */
  private def tmpStoreNoSidecar(d: String): String = {
    val s = tmp("graft_pqupd_presidecar")
    Pq.writeIvfPqStore(spark, d, s)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$s/${Pq.QuantizerDir}"), true)
    s
  }
}
