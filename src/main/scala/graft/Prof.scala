package graft

import org.apache.spark.sql.SparkSession

/** Local profiling runner: times a named subset of SparkEntry.queries
  * under the same session config as [[Bench]]. Usage:
  *   sbt "runMain graft.Prof q24_dedup_jaccard q24_dedup_minhash"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ExtraConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "20")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "2000")
      // same as Bench: out-of-scope shuffle/broadcast/checkpoint state
      // otherwise accumulates and degrades LATER queries (measured:
      // a repeated heavy query 3× slower on its second run)
      .config("spark.cleaner.periodicGC.interval", "1min"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).count() catch { case _: Throwable => }
    }
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // JIT/codegen warmup at the smallest SF (generated code is
    // data-size independent, same strategy as Bench): without it the
    // first execution pays Janino compile + interpreted generated code,
    // which dominates CPU-heavy queries (measured 10-25s of fixed
    // overhead in a cold JVM) and flattens cross-SF ratios — an
    // overhead-dominated pair of timings reads as "sublinear scaling"
    // while measuring nothing but the overhead
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    names.foreach { n =>
      spark.sharedState.cacheManager.clearCache()
      try SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => }
    }
    names.foreach { name =>
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[prof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
