package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Probe-latency-vs-cell-occupancy measurement for durable-store
  * RE-CLUSTERING (SCALING.md round-11): a store kept at the fixed
  * family k while the corpus grows has per-probe work n/k — the
  * [[Similarity.reclusterIvfStore]] maintenance step re-seeds at the
  * corpus-sized k ≈ n/128, restoring ~[[Similarity.SemDedupCellSize]]
  * occupancy. This builds a store at the family k from the given SF
  * dir, measures warm probe latency, re-clusters at the auto
  * (corpus-sized) k, and measures again — the before/after row the
  * recluster ships with.
  *
  * Uses the entry-point probe path ([[Similarity.probeIvfStore]],
  * nProbe=1 and 2) rather than the IvfServer template pool: the
  * server family is pinned to the fixed-k layout, while the store's
  * own meta-k routing is exactly what recluster changes.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf26_d2 sbt "runMain graft.ReclusterProf"
  */
object ReclusterProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = ExtraConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val out = TempDirs.scratch("graft_recl_prof")
    val t0 = System.nanoTime()
    Similarity.writeIvfLayout(spark, sfDir, out)
    println(f"[rprof] store build (family k=${Similarity.IvfCentroids}) " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    val n = spark.read.parquet(out).count()
    val qids = spark.read.parquet(out).select("vec_id")
      .orderBy("vec_id").limit(11).collect().map(_.getLong(0)).toSeq
    def measure(tag: String): Unit = {
      Seq(1, 2).foreach { np =>
        // warm once, then 3 sweeps of the 11 queries; median-of-medians
        qids.foreach(q =>
          Similarity.probeIvfStore(spark, out, qId = q, nProbe = np)
            .collect())
        System.gc()
        val meds = (1 to 3).map { _ =>
          val ls = qids.map { q =>
            val s = System.nanoTime()
            Similarity.probeIvfStore(spark, out, qId = q, nProbe = np)
              .collect()
            (System.nanoTime() - s) / 1e6
          }.sorted
          ls(ls.size / 2)
        }.sorted
        println(f"[rprof] $tag%-34s nProbe=$np  k=${Similarity.storeK(spark, out)}%5d  " +
          f"warm probe median ${meds(1)}%8.2f ms " +
          f"(3 sweeps: ${meds.map(m => f"$m%.1f").mkString("/")})")
      }
    }
    measure(s"family-k store (n=$n, occ~${n / Similarity.IvfCentroids})")
    val t1 = System.nanoTime()
    val newK = Similarity.reclusterIvfStore(spark, out)
    println(f"[rprof] recluster to k=$newK " +
      f"${(System.nanoTime() - t1) / 1e9}%.2f s")
    measure(s"re-clustered store (occ~${n / newK})")
    spark.stop()
  }
}
