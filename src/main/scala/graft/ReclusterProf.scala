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
    // The gate-shaped PER-BATCH probe — what the k ≈ n/128 sizing
    // discipline actually bounds (per-batch work = |batch|·occupancy
    // cosines): a 2% hash slice of the corpus cell-assigned at the
    // store's k, then the same-cell exact-cosine threshold join
    // against the whole store. The single-query probe above is
    // FIXED-COST dominated at this corpus size (hundreds of cell
    // directories to list vs sub-ms of cosines), so it measures the
    // partition-count overhead, not the occupancy term; this row
    // measures the occupancy term.
    def measureBatchProbe(tag: String): Unit = {
      val k = Similarity.storeK(spark, out)
      val delta = Tables.load(spark, sfDir, "embeddings")
        .filter(pmod(xxhash64(col("vec_id")), lit(50)) === 7)
        .select(col("vec_id"), col("embedding"))
      def run(): Long = {
        val assigned = Similarity.assignCells(spark, sfDir, delta, k)
        val base = spark.read.parquet(out)
        assigned.as("y").join(base.as("x"),
            col("x.cell") === col("y.cell") &&
              col("x.vec_id") =!= col("y.vec_id"))
          .filter(Similarity.cosine(
            col("x.embedding"), col("y.embedding")) >= 0.35)
          .count()
      }
      run() // warm
      System.gc()
      val ts = (1 to 3).map { _ =>
        val s = System.nanoTime()
        val pairs = run()
        ((System.nanoTime() - s) / 1e9, pairs)
      }
      val meds = ts.map(_._1).sorted
      println(f"[rprof] $tag%-34s k=$k%5d  batch probe median " +
        f"${meds(1)}%6.2f s (${ts.map(t => f"${t._1}%.2f").mkString("/")}; " +
        s"pairs=${ts.head._2})")
    }
    measure(s"family-k store (n=$n, occ~${n / Similarity.IvfCentroids})")
    measureBatchProbe("family-k store")
    val t1 = System.nanoTime()
    val newK = Similarity.reclusterIvfStore(spark, out)
    println(f"[rprof] recluster to k=$newK " +
      f"${(System.nanoTime() - t1) / 1e9}%.2f s")
    measure(s"re-clustered store (occ~${n / newK})")
    measureBatchProbe("re-clustered store")
    spark.stop()
  }
}
