package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes the q25_knn_graph residual exponent (SCALING round-11:
  * ~0.58 at 26× under the coarse router) into its three terms:
  *   1. `assign`  — the dynamic-k cell assignment alone
  *      ([[graft.ops.Similarity.semDedupCellsOf]], auto-routed),
  *   2. `pairs`   — the same-cell self-join + cosine over the staged
  *      assignment (candidate enumeration + scoring, no heap),
  *   3. `full`    — the shipped query (adds the bounded-heap top-k,
  *      posexplode and output sort).
  * Also prints the candidate-pair count — if pairs grow super-linearly
  * (cell occupancy drift at fixed ÷128 sizing), that growth, not a
  * plan defect, is the exponent. Run per SF dir:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf26_d2 sbt "runMain graft.KnnGraphProf"
  */
object KnnGraphProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ExtraConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    // JIT/codegen warmup at the smallest SF (the Prof discipline)
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    SparkEntry.queries("q25_knn_graph")(spark, warmDir).count()
    def timed[T](name: String)(f: => T): T = {
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[knnprof] $name%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val n = timed("assign") {
      graft.ops.Similarity.semDedupCellsOf(spark, sfDir, None)
        .select("vec_id", "cell").count()
    }
    val nPairs = timed("pairs") {
      import graft.ops.Stage.StageOps
      val cells = graft.ops.Similarity
        .semDedupCellsOf(spark, sfDir, None).stage()
      cells.as("a").join(cells.as("b"),
          col("a.cell") === col("b.cell") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(graft.ops.Similarity.cosine(
          col("a.embedding"), col("b.embedding")).as("c"))
        .filter(col("c") > -2.0) // force the cosine to evaluate
        .count()
    }
    val out = timed("full") {
      SparkEntry.queries("q25_knn_graph")(spark, sfDir).count()
    }
    timed("balanced") {
      SparkEntry.queries("q25_knn_graph_balanced")(spark, sfDir).count()
    }
    val balPairs = timed("bal_pairs") {
      import graft.ops.Stage.StageOps
      val c2 = graft.ops.Similarity.balancedCellsOf(spark, sfDir, None)
        .stage()
      c2.as("a").join(c2.as("b"),
          col("a.cell") === col("b.cell") &&
            col("a.sub") === col("b.sub") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .count()
    }
    println(s"[knnprof] balanced_pairs=$balPairs")
    println(s"[knnprof] vectors=$n candidate_pairs=$nPairs out_rows=$out " +
      s"pairs_per_vec=${if (n > 0) nPairs / math.max(n, 1) else 0}")
    // cell-occupancy distribution: is pair growth plan skew (bad
    // seeds) or data density (amplified corpora genuinely cluster)?
    val occ = graft.ops.Similarity.semDedupCellsOf(spark, sfDir, None)
      .groupBy("cell").count()
      .agg(count(lit(1)).as("cells"), max("count").as("max_occ"),
        expr("percentile(count, 0.5)").as("p50"),
        expr("percentile(count, 0.99)").as("p99")).head()
    println(s"[knnprof] cells=${occ.getLong(0)} max_occ=${occ.getLong(1)} " +
      s"p50=${occ.get(2)} p99=${occ.get(3)}")
    spark.stop()
  }
}
