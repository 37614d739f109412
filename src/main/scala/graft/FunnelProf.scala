package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes the streaming funnel's standing-ingest cost
  * ([[graft.queries.IrEngine.q29FunnelAudit]]): the per-batch work
  * that depends on ACCUMULATED state is the digest anti-join and the
  * band-key equi-join against the two append-channel indexes, and
  * both degrade with index file COUNT (one file set lands per batch),
  * not just row count. This main measures one fixed 500-doc batch's
  * gate probes against indexes accumulated from growing corpus
  * prefixes (appended in 500-doc chunks — the real fragmentation
  * shape), then compacts the largest index in place and re-times, so
  * SCALING.md carries the decomposition per-batch-cost vs
  * accumulated-state as numbers and the in-loop auto-compaction
  * ([[graft.queries.IrEngine.FunnelIndexMaxFiles]]) as a measured
  * fix, not an assertion.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.FunnelProf"` */
object FunnelProf {
  val BatchDocs = 500L

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
    import graft.ops.Stage.StageOps
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val n = d.count()
    require(n > 4 * BatchDocs, s"corpus too small ($n docs)")
    // the probe batch: the last BatchDocs ids (the next arrival)
    val batch = d.filter(col("doc_id") >= n - BatchDocs)
      .stageEager()
    val bBands = graft.ops.Dedup.bandRowsOf(batch)
      .select(col("doc_id"), col("band"), col("key")).stageEager()
    val bDigests = batch.select(md5(col("text")).as("digest"))
      .groupBy(col("digest")).agg(min(lit(1L)).as("one")).stageEager()

    def parts(dir: String): Int = {
      val p = java.nio.file.Paths.get(dir)
      val s = java.nio.file.Files.list(p)
      try s.filter(_.getFileName.toString.endsWith(".parquet"))
        .count().toInt
      finally s.close()
    }
    // one fixed probe: the two index-dependent gate reads of a batch
    def probe(bandDir: String, digestDir: String): Double = {
      val t0 = System.nanoTime()
      val nd = bBands.as("y")
        .join(spark.read.parquet(bandDir).as("x"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key"))
        .select(col("y.doc_id")).distinct().count()
      val kd = bDigests
        .join(spark.read.parquet(digestDir), Seq("digest"), "left_anti")
        .count()
      if (nd < 0 || kd < 0) println("") // keep both live
      (System.nanoTime() - t0) / 1e9
    }
    // ---- ONE-BATCH decomposition at the ambient SF (r14): where a
    // funnel batch's wall actually goes — per-gate compute vs
    // accumulated-state probes vs index appends vs a compaction
    // event — so the stream row's sf-level constant is attributable
    // from numbers, not guessed from the end-to-end time (the r13
    // verdict item; the r13 regression itself turned out to be
    // un-coalesced appends tripping the file bound every batch)
    locally {
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val root = java.nio.file.Files
        .createTempDirectory("graft_funnelprof_batch").toString
      val bandDir = s"$root/bands"
      val digestDir = s"$root/digests"
      val benchDir = s"$root/bench"
      val prefix = d.filter(col("doc_id") < n - BatchDocs)
      graft.ops.Dedup.bandRowsOf(prefix)
        .select(col("doc_id"), col("band"), col("key"))
        .write.mode("overwrite").parquet(bandDir)
      prefix.select(md5(col("text")).as("digest")).distinct()
        .write.mode("overwrite").parquet(digestDir)
      graft.ops.Dedup.docShingles(spark, sfDir)
        .filter(pmod(col("doc_id"),
          lit(graft.ops.TextAnalysis.ContamMod)) === 0)
        .select("shingle").distinct()
        .write.mode("overwrite").parquet(benchDir)
      def run(tag: String)(f: => Unit): Unit =
        println(f"[funnelprof_batch] $tag%-14s ${(1 to 3).map(_ =>
          time(f)).min}%.3f s")
      run("gate_langid") {
        graft.ops.TextAnalysis.langIdOf(batch).count(); () }
      run("gate_quality") {
        graft.ops.TextAnalysis.qualityOf(batch).count(); () }
      run("gate_exact") {
        bDigests.join(spark.read.parquet(digestDir),
          Seq("digest"), "left_anti").count(); () }
      run("gate_neardup") {
        bBands.as("y").join(spark.read.parquet(bandDir).as("x"),
            col("x.band") === col("y.band") &&
              col("x.key") === col("y.key"))
          .select(col("y.doc_id")).distinct().count(); () }
      run("gate_decontam") {
        val sh = graft.ops.Dedup.docShinglesOf(batch)
        sh.join(broadcast(spark.read.parquet(benchDir)), "shingle")
          .groupBy("doc_id").agg(count(lit(1))).count(); () }
      run("index_append") {
        bDigests.select("digest")
          .coalesce(1).write.mode("append").parquet(digestDir)
        bBands.coalesce(1).write.mode("append").parquet(bandDir) }
      run("compact_check") {
        Seq(digestDir, bandDir).foreach(parts); () }
      println(f"[funnelprof_batch] compact_pass   ${time {
        graft.ops.TextAnalysis.compact(spark, digestDir)
        graft.ops.TextAnalysis.compact(spark, bandDir)
      }}%.3f s (the amortized event: once per ~" +
        s"${graft.queries.IrEngine.FunnelIndexMaxFiles} batches)")
    }

    // accumulate prefixes in BatchDocs-sized appends (one file set
    // per append — the standing-ingest fragmentation shape)
    val levels = Seq(n / 26, n / 26 * 10, n - BatchDocs)
      .map(x => math.max(x, 2 * BatchDocs)).distinct
    levels.foreach { lvl =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_funnelprof_$lvl").toString
      val bandDir = s"$root/bands"
      val digestDir = s"$root/digests"
      var lo = 0L
      while (lo < lvl) {
        val hi = math.min(lo + BatchDocs, lvl)
        val chunk = d.filter(col("doc_id") >= lo && col("doc_id") < hi)
          .stageEager()
        graft.ops.Dedup.bandRowsOf(chunk)
          .select(col("doc_id"), col("band"), col("key"))
          .write.mode("append").parquet(bandDir)
        chunk.select(md5(col("text")).as("digest")).distinct()
          .write.mode("append").parquet(digestDir)
        lo = hi
      }
      probe(bandDir, digestDir) // warm
      val frag = (1 to 3).map(_ => probe(bandDir, digestDir)).min
      val filesB = parts(bandDir)
      graft.ops.TextAnalysis.compact(spark, bandDir)
      graft.ops.TextAnalysis.compact(spark, digestDir)
      val comp = (1 to 3).map(_ => probe(bandDir, digestDir)).min
      println(f"[funnelprof] acc_docs=$lvl%d files=$filesB%d " +
        f"probe_frag=$frag%.2f s probe_compacted=$comp%.2f s " +
        f"(files_after=${parts(bandDir)}%d)")
    }
    spark.stop()
  }
}
