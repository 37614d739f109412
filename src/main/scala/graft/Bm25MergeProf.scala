package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the BM25 stats-store incremental merge against the full
  * rebuild at a given SF: build the store from all-but-a-delta of the
  * corpus, then time (a) merging the delta in vs (b) rebuilding from
  * everything, and verify the merged store still serves the exact
  * ranking. The delta is a FIXED batch of the top `DeltaDocs` doc_ids
  * (the id-monotone ingest shape the merge contract expects) — fixed
  * SIZE, not a fixed fraction, because the scaling claim is that
  * merge cost follows the BATCH (delta tokenize + touched-stats
  * rewrite) while rebuild cost follows the CORPUS (full re-tokenize):
  * across SFs the merge row should stay ~flat as the rebuild row
  * grows. Run per SF:
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf26_d2 sbt "runMain graft.Bm25MergeProf"
  */
object Bm25MergeProf {
  val DeltaDocs = 500L // docs arriving as the delta batch

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
    // warmup (JIT/codegen) on the smallest SF
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    val w = java.nio.file.Files.createTempDirectory("bm25prof_w").toString
    graft.queries.IrSql.writeBm25Stats(spark, warmDir, s"$w/full")
    graft.queries.IrSql.mergeBm25Stats(spark, s"$w/full",
      spark.emptyDataFrame.selectExpr("CAST(0 AS BIGINT) doc_id",
        "'x' text").limit(0))
    val root = java.nio.file.Files.createTempDirectory("bm25prof").toString
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val cut = docs.agg(max(col("doc_id"))).head().getLong(0) -
      DeltaDocs + 1
    docs.filter(col("doc_id") < cut)
      .write.mode("overwrite").parquet(s"$root/base/documents.parquet")
    def timed(name: String)(f: => Unit): Unit = {
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      f
      println(f"[bm25prof] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val store = s"$root/store"
    timed("base_build") {
      graft.queries.IrSql.writeBm25Stats(spark, s"$root/base", store)
    }
    timed("merge_delta") {
      graft.queries.IrSql.mergeBm25Stats(spark, store,
        docs.filter(col("doc_id") >= cut))
    }
    timed("full_rebuild") {
      graft.queries.IrSql.writeBm25Stats(spark, sfDir, s"$root/rebuilt")
    }
    // the merged store serves the exact full-corpus ranking
    val merged = graft.queries.IrSql.q10Bm25PrunedAt(spark, store,
      graft.queries.IrSql.ExpandedQueryTerms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = graft.queries.IrSql.q10Bm25PrunedAt(spark, s"$root/rebuilt",
      graft.queries.IrSql.ExpandedQueryTerms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    println(s"[bm25prof] merged_serves_exact=${merged == want}")
    // fragmentation → compaction: append 7 more fixed-size deltas from
    // disjoint id ranges (re-keyed copies of the delta batch), price
    // the warm pruned query on the fragmented store, compact, re-price
    (1 to 7).foreach { i =>
      graft.queries.IrSql.mergeBm25Stats(spark, store,
        docs.filter(col("doc_id") >= cut)
          .select((col("doc_id") + i * DeltaDocs).as("doc_id"),
            col("text")))
    }
    def warmQ(name: String): Unit = {
      graft.queries.IrSql.q10Bm25PrunedAt(spark, store,
        graft.queries.IrSql.ExpandedQueryTerms, 10).count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.queries.IrSql.q10Bm25PrunedAt(spark, store,
          graft.queries.IrSql.ExpandedQueryTerms, 10).count()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"[bm25prof] $name%-18s ${ts(1)}%8.1f ms (median of 3)")
    }
    warmQ("warm_fragmented")
    val rewrote = graft.queries.IrSql.compactBm25Store(spark, store)
    println(s"[bm25prof] compacted_artifacts=$rewrote")
    warmQ("warm_compacted")
    spark.stop()
  }
}
