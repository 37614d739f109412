package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the round-14 UPDATE (re-ingest / re-crawl) path against the
  * rebuild it replaces, at the ambient SF: for each store, measure
  * (a) a full from-corpus build, (b) updating a fixed 100-doc
  * re-crawl batch in place (new text = old text + the fixture
  * suffix). The per-store legs:
  *  - bm25: [[graft.queries.IrSql.updateBm25Docs]] — the
  *    delete→reclaim→merge composition (the reclaim between the legs
  *    amortizes every pending takedown, so the row is conservative);
  *  - pos/inv: deleteDocs + store-level appendToStore (tombstones
  *    pending — the serving shape; compaction priced separately by
  *    DeleteProf);
  *  - cgram: [[graft.index.CharKGramIndex.updateDocs]] — the
  *    one-transaction recount;
  *  - ivf: [[graft.ops.Similarity.updateIvfVectors]] BOTH legs —
  *    append (ids above the seed range) and re-coordinate (a seed id
  *    in the batch → recluster at current k; expected ~rebuild, the
  *    documented cost of mutating a routing coordinate).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.UpdateProf"` */
object UpdateProf {
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
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(tag).toString

    // JIT warmup at the smallest SF (the Prof discipline)
    locally {
      val w = tmp("graft_updprof_warm")
      graft.queries.IrSql.writeBm25Stats(spark, "/root/testdata/sf0.001", w)
      graft.queries.IrSql.updateBm25Docs(spark, w,
        graft.queries.IrSql.updatedDocsNew(spark, "/root/testdata/sf0.001"))
    }

    // the RE-CRAWL shape: a fixed 100-doc batch whose text gains the
    // fixture suffix — like DeleteProf's batch, far larger than a
    // typical single re-crawl arrival, so the rows are conservative
    val UpdateDocs = 100
    val suffix = graft.queries.IrSql.UpdateSuffix

    // ---- BM25 stats store
    val bmDir = tmp("graft_updprof_bm25")
    val tBuild = time {
      graft.queries.IrSql.writeBm25Stats(spark, sfDir, bmDir) }
    val newDocs = Tables.load(spark, sfDir, "documents")
      .orderBy(col("doc_id")).limit(UpdateDocs)
      .select(col("doc_id"), concat(col("text"), lit(suffix)).as("text"))
    val tUpd = time {
      graft.queries.IrSql.updateBm25Docs(spark, bmDir, newDocs) }
    println(f"[updateprof] bm25  rebuild=$tBuild%.2f s " +
      f"update=$tUpd%.2f s (docs_updated=$UpdateDocs%d, " +
      f"update/rebuild=${tUpd / tBuild}%.2f)")

    // ---- positional index: delete + store-level append
    val posDir = tmp("graft_updprof_pos")
    val corpus = graft.queries.IrEngine.corpus(spark, sfDir)
    val tBuildP = time {
      graft.index.PositionalIndex.write(
        graft.index.PositionalIndex.build(spark, corpus), posDir) }
    val newCorpus = newDocs
      .select(format_string("D%05d", col("doc_id")).as("docid"),
        col("text").as("content"))
    val tDelP = time {
      graft.index.PositionalIndex.deleteDocs(spark, posDir,
        newCorpus.select(col("docid"))) }
    val tAppP = time {
      graft.index.PositionalIndex.appendToStore(spark, posDir,
        newCorpus) }
    println(f"[updateprof] pos   rebuild=$tBuildP%.2f s " +
      f"delete=$tDelP%.2f s append=$tAppP%.2f s " +
      f"(update/rebuild=${(tDelP + tAppP) / tBuildP}%.2f)")

    // ---- inverted index store
    val invDir = tmp("graft_updprof_inv")
    val tBuildI = time {
      graft.index.InvertedIndex.write(
        graft.index.InvertedIndex.build(spark, corpus, k = 1), invDir) }
    val tDelI = time {
      graft.index.InvertedIndex.deleteDocs(spark, invDir,
        newCorpus.select(col("docid"))) }
    val tAppI = time {
      graft.index.InvertedIndex.appendToStore(spark, invDir,
        newCorpus, k = 1) }
    println(f"[updateprof] inv   rebuild=$tBuildI%.2f s " +
      f"delete=$tDelI%.2f s append=$tAppI%.2f s " +
      f"(update/rebuild=${(tDelI + tAppI) / tBuildI}%.2f)")

    // ---- chargram store: the one-transaction recount
    val cgDir = tmp("graft_updprof_cg")
    val tBuildC = time {
      graft.index.CharKGramIndex.write(
        graft.index.CharKGramIndex.build(spark, corpus), cgDir)
      graft.index.CharKGramIndex.writeVocabDf(spark, cgDir,
        graft.index.CharKGramIndex.docTermsOf(spark, corpus)) }
    val oldDocs = corpus.join(newCorpus.select(col("docid")),
      Seq("docid"), "left_semi")
    val tUpdC = time {
      graft.index.CharKGramIndex.updateDocs(spark, cgDir, "prof-upd",
        graft.index.CharKGramIndex.docTermsOf(spark, oldDocs),
        graft.index.CharKGramIndex.docTermsOf(spark, newCorpus)) }
    println(f"[updateprof] cgram rebuild=$tBuildC%.2f s " +
      f"update=$tUpdC%.2f s (update/rebuild=${tUpdC / tBuildC}%.2f)")

    // ---- durable IVF store, APPEND leg (ids above the seed range).
    // Built at CORPUS-SIZED k (n/128, the sizing discipline): at the
    // family default k=8 a 100-vector batch touches every cell, so
    // the reclaim degenerates to a full rewrite by construction and
    // the row prices the fixture, not the path.
    val nVecs = Tables.load(spark, sfDir, "embeddings").count()
    val kIvf = math.max(graft.ops.Similarity.IvfCentroids.toLong,
      (nVecs + graft.ops.Similarity.SemDedupCellSize - 1) /
        graft.ops.Similarity.SemDedupCellSize)
    val ivfDir = tmp("graft_updprof_ivf")
    val tBuildV = time {
      graft.ops.Similarity.writeIvfLayoutK(spark, sfDir, ivfDir, kIvf) }
    val newVecsHigh = Tables.load(spark, sfDir, "embeddings")
      .orderBy(col("vec_id").desc).limit(UpdateDocs)
      .select(col("vec_id"),
        transform(col("embedding"), v => -v).as("embedding"))
    val tUpdV = time {
      graft.ops.Similarity.updateIvfVectors(spark, ivfDir, newVecsHigh) }
    println(f"[updateprof] ivf   rebuild=$tBuildV%.2f s " +
      f"update=$tUpdV%.2f s (append leg, k=$kIvf%d, " +
      f"update/rebuild=${tUpdV / tBuildV}%.2f)")

    // ---- durable IVF store, RE-COORDINATE leg (a seed in the batch)
    val ivfDir2 = tmp("graft_updprof_ivfs")
    graft.ops.Similarity.writeIvfLayoutK(spark, sfDir, ivfDir2, kIvf)
    val newVecsSeed = Tables.load(spark, sfDir, "embeddings")
      .orderBy(col("vec_id")).limit(UpdateDocs)
      .select(col("vec_id"),
        transform(col("embedding"), v => -v).as("embedding"))
    val tUpdS = time {
      graft.ops.Similarity.updateIvfVectors(spark, ivfDir2, newVecsSeed) }
    println(f"[updateprof] ivfS  rebuild=$tBuildV%.2f s " +
      f"update=$tUpdS%.2f s (re-coordinate leg — expected ~rebuild, " +
      f"update/rebuild=${tUpdS / tBuildV}%.2f)")
    spark.stop()
  }
}
