package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Probe-latency-vs-fragmentation measurement for the durable IVF
  * store (SCALING.md round-9): [[Similarity.appendIvfLayout]] lands
  * one small file per delta per touched cell, so a long-lived store's
  * partition-pruned probe degrades from a one-directory scan to a
  * many-small-files scan; [[Similarity.compactIvfStore]] is the
  * repair. This builds a store from a base slice, applies N delta
  * appends, measures warm served-probe latency after each
  * fragmentation stage, compacts, and measures again — the
  * before/after row the compaction ships with.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.IvfCompactProf 24"
  */
object IvfCompactProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val deltas = if (args.nonEmpty) args(0).toInt else 24
    val spark = ExtraConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val out = TempDirs.scratch("graft_ivf_cprof")
    val e = Tables.load(spark, sfDir, "embeddings")
    // base = seeds + half the corpus; the other half arrives as
    // `deltas` appends (hash-sliced so every append touches most cells)
    val slot = pmod(xxhash64(col("vec_id")), lit(deltas * 2))
    Similarity.assignCells(spark, sfDir,
        e.filter(slot < deltas ||
          col("vec_id") < Similarity.IvfCentroids.toLong))
      .write.partitionBy("cell").mode("overwrite").parquet(out)
    def maxFiles(): Int = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    // query ids picked from the BASE store so the same set exists at
    // every stage (the hash slice above excludes arbitrary literals)
    val qids = spark.read.parquet(out).select("vec_id")
      .orderBy("vec_id").limit(11).collect().map(_.getLong(0)).toSeq
    def measure(tag: String): Unit = {
      val srv = new graft.query.IvfServer(spark, out)
      val qvecs = spark.read.parquet(out)
        .filter(col("vec_id").isin(qids: _*))
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      qids.foreach(q => srv.probeTemplate(qvecs(q))) // warm the pool
      System.gc()
      val meds = (1 to 3).map { _ =>
        val ls = qids.map { q =>
          val t0 = System.nanoTime()
          srv.probeTemplate(qvecs(q), excludeId = q)
          (System.nanoTime() - t0) / 1e3
        }.sorted
        ls(ls.size / 2)
      }.sorted
      println(f"[cprof] $tag%-28s max files/cell ${maxFiles()}%3d  " +
        f"warm template median ${meds(1) / 1000}%7.2f ms " +
        f"(3 sweeps: ${meds.map(m => f"${m / 1000}%.2f").mkString("/")})")
    }
    measure(s"base (pre-append)")
    (0 until deltas).foreach { i =>
      Similarity.appendIvfLayout(spark, sfDir, out,
        e.filter(slot === (deltas + i) &&
          col("vec_id") >= Similarity.IvfCentroids.toLong))
    }
    measure(s"after $deltas delta appends")
    val n = Similarity.compactIvfStore(spark, out, maxFilesPerCell = 4)
    println(s"[cprof] compacted $n cells (bound 4 files)")
    measure("after compaction")
    spark.stop()
  }
}
