package graft

import org.apache.spark.sql.SparkSession

/** Scale study for the streaming ANN ingest gate
  * ([[graft.queries.IrEngine.q29AnnStream]]): per-batch probe work is
  * |batch|·(n/k) cosines, so at a FIXED store centroid count the gate
  * grows ~quadratically with the corpus, while a corpus-sized k
  * (n / [[graft.ops.Similarity.SemDedupCellSize]]) pins cell occupancy
  * and keeps the gate linear. This main measures both regimes at one
  * SF dir so SCALING.md can carry the comparison as numbers instead of
  * an assertion.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.AnnGateProf"`
  * (Prof discipline: run each timing twice, report the warm best). */
object AnnGateProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ExtraConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = Tables.load(spark, sfDir, "embeddings").count()
    val fixedK = graft.ops.Similarity.IvfCentroids.toLong
    val sizedK = math.max(fixedK,
      (n + graft.ops.Similarity.SemDedupCellSize - 1) /
        graft.ops.Similarity.SemDedupCellSize)
    def time(k: Long, coarse: Boolean): Double = {
      val t0 = System.nanoTime()
      val c = graft.queries.IrEngine.annStreamGate(spark, sfDir, k, coarse)
        .count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[anngate] k=$k%d coarse=$coarse pairs=$c%d time=$dt%.2f s")
      dt
    }
    // warm pass (codegen/JIT + staging), then two timed runs each
    time(fixedK, coarse = false)
    val fixed = (1 to 2).map(_ => time(fixedK, coarse = false)).min
    val sized = (1 to 2).map(_ => time(sizedK, coarse = false)).min
    val sizedC = (1 to 2).map(_ => time(sizedK, coarse = true)).min
    println(f"[anngate] n=$n%d fixed_k=$fixedK%d best=$fixed%.2f s; " +
      f"sized_k=$sizedK%d flat=$sized%.2f s coarse=$sizedC%.2f s")
    spark.stop()
  }
}
