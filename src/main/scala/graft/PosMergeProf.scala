package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the positional index's incremental path against a full
  * rebuild (SCALING.md): with a 90% base corpus ALREADY indexed, time
  * (a) rebuilding the whole index from scratch vs (b)
  * [[graft.index.PositionalIndex.merge]]-ing the 10% delta in. The
  * merge's claim — only the delta is tokenized, the base is a cached
  * pure union — should make (b) ~the delta fraction of (a), certifying
  * the incremental path as the cheaper one at scale.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt "runMain graft.PosMergeProf"`
  */
object PosMergeProf {
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
    import graft.index.PositionalIndex
    def corpusOf(dir: String) = graft.queries.IrEngine.corpus(spark, dir)
    // deterministic ~10% delta: docs whose docid hashes to bucket 0
    def split(c: org.apache.spark.sql.DataFrame) = {
      val bucket = pmod(xxhash64(col("docid")), lit(10))
      (c.filter(bucket =!= 0), c.filter(bucket === 0))
    }
    // JIT/codegen warmup at the smallest SF (Prof's discipline: cold
    // first executions measure Janino, not the operator)
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    val (wb, wd) = split(corpusOf(warmDir))
    val wix = PositionalIndex.build(spark, wb)
    PositionalIndex.merge(spark, wix, wd).postings.count()
    PositionalIndex.build(spark, corpusOf(warmDir)).postings.count()
    spark.sharedState.cacheManager.clearCache()
    System.gc()
    val c = corpusOf(sfDir)
    val (base, delta) = split(c)
    val nd = delta.count(); val nb = base.count()
    // (a) full rebuild from scratch
    val t0 = System.nanoTime()
    val full = PositionalIndex.build(spark, c)
    val nFull = full.postings.count()
    val rebuildS = (System.nanoTime() - t0) / 1e9
    spark.sharedState.cacheManager.clearCache()
    System.gc()
    // (b) base pre-indexed OUTSIDE the timed region (that's the
    // incremental premise), then merge the delta in
    val baseIx = PositionalIndex.build(spark, base)
    baseIx.postings.count()
    System.gc()
    val t1 = System.nanoTime()
    val merged = PositionalIndex.merge(spark, baseIx, delta)
    val nMerged = merged.postings.count()
    val mergeS = (System.nanoTime() - t1) / 1e9
    println(f"[posmerge] docs base=$nb delta=$nd  postings full=$nFull merged=$nMerged")
    println(f"[posmerge] rebuild ${rebuildS}%.2f s  merge ${mergeS}%.2f s  ratio ${mergeS / rebuildS}%.2f")
    spark.stop()
  }
}
