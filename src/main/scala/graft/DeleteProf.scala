package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the round-14 deletion path against the rebuild it replaces,
  * at the ambient SF: for the BM25 stats store and the positional
  * index, measure (a) a full from-corpus build, (b) tombstoning the
  * fixed takedown set ([[graft.queries.IrSql.DeletedDocsMod]] — ~1/13
  * of the corpus, far LARGER than a real takedown batch, so the
  * numbers are conservative), (c) compaction reclaiming the
  * tombstones. The SCALING.md claim "delete+compact ≪ rebuild" is
  * then a measured row, not an assertion.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.DeleteProf"` */
object DeleteProf {
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
      val w = tmp("graft_delprof_warm")
      graft.queries.IrSql.writeBm25Stats(spark, "/root/testdata/sf0.001", w)
      graft.queries.IrSql.deleteBm25Docs(spark, w,
        graft.queries.IrSql.deletedDocIds(spark, "/root/testdata/sf0.001"))
      graft.queries.IrSql.compactBm25Deletes(spark, w)
      val wl = tmp("graft_delprof_warml")
      graft.queries.IrSql.writeBm25Stats(spark, "/root/testdata/sf0.001", wl)
      graft.queries.IrSql.deleteBm25DocsLazy(spark, wl,
        graft.queries.IrSql.deletedDocIds(spark, "/root/testdata/sf0.001"))
      graft.queries.IrSql.compactBm25Deletes(spark, wl)
    }

    // the TAKEDOWN shape: a fixed 100-doc batch. (The oracle entries
    // delete 1/13 of the corpus — a bulk purge; on this synthetic
    // corpus, whose docs share one vocabulary, that touches nearly
    // every term's stats, so its delete cost approaches a derived
    // rebuild by construction. A takedown batch is fixed-size, so its
    // cost must stay ~flat while rebuild grows with the corpus —
    // that's the exponent this prof prices.)
    val TakedownDocs = 100

    // ---- BM25 stats store
    val bmDir = tmp("graft_delprof_bm25")
    val tBuild = time {
      graft.queries.IrSql.writeBm25Stats(spark, sfDir, bmDir) }
    val del = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")).orderBy(col("doc_id"))
      .limit(TakedownDocs)
    val tDelete = time {
      graft.queries.IrSql.deleteBm25Docs(spark, bmDir, del) }
    val tCompact = time {
      graft.queries.IrSql.compactBm25Deletes(spark, bmDir) }
    println(f"[deleteprof] bm25  rebuild=$tBuild%.2f s " +
      f"delete=$tDelete%.2f s compact=$tCompact%.2f s " +
      f"(docs_deleted=$TakedownDocs%d, delete+compact/rebuild=" +
      f"${(tDelete + tCompact) / tBuild}%.2f)")

    // ---- BM25 stats store, LAZY leg: the takedown only tombstones
    // and re-sums the sidecar (a broadcast semi-join agg over the
    // batch) — the touched-term stats recompute that dominates the
    // eager leg on this shared-vocabulary corpus is deferred to
    // compaction, where it amortizes across every takedown since the
    // last reclaim
    val bmlDir = tmp("graft_delprof_bm25l")
    graft.queries.IrSql.writeBm25Stats(spark, sfDir, bmlDir)
    val tDeleteL = time {
      graft.queries.IrSql.deleteBm25DocsLazy(spark, bmlDir, del) }
    val tCompactL = time {
      graft.queries.IrSql.compactBm25Deletes(spark, bmlDir) }
    println(f"[deleteprof] bm25L rebuild=$tBuild%.2f s " +
      f"delete=$tDeleteL%.2f s compact=$tCompactL%.2f s " +
      f"(docs_deleted=$TakedownDocs%d, lazy delete vs eager=" +
      f"${tDeleteL / tDelete}%.2f, delete+compact/rebuild=" +
      f"${(tDeleteL + tCompactL) / tBuild}%.2f)")

    // ---- BM25 stats store, LOCALIZED batch: 100 docs from ONE
    // vocabulary slice (doc_id % 64 == 0 — group 0 of a
    // vocabSlices=64 ScaleGen fixture; the id stride is ≡ 0 mod 64,
    // so amplified copies keep their group). On the sliced fixture
    // the takedown's touched terms live in ONE contiguous term range
    // → the surgical reclaim's touched-file set follows the BATCH.
    // On an unsliced fixture this is just another diffuse batch —
    // the row then measures the same shape as `bm25` above.
    val bmgDir = tmp("graft_delprof_bm25g")
    graft.queries.IrSql.writeBm25Stats(spark, sfDir, bmgDir)
    val delG = Tables.load(spark, sfDir, "documents")
      .filter(pmod(col("doc_id"), lit(64L)) === lit(0L))
      .select(col("doc_id")).orderBy(col("doc_id"))
      .limit(TakedownDocs)
    val tDeleteG = time {
      graft.queries.IrSql.deleteBm25DocsLazy(spark, bmgDir, delG) }
    val tCompactG = time {
      graft.queries.IrSql.compactBm25Deletes(spark, bmgDir) }
    println(f"[deleteprof] bm25G rebuild=$tBuild%.2f s " +
      f"delete=$tDeleteG%.2f s compact=$tCompactG%.2f s " +
      f"(docs_deleted=$TakedownDocs%d LOCALIZED, " +
      f"delete+compact/rebuild=${(tDeleteG + tCompactG) / tBuild}%.2f)")

    // ---- positional index
    val posDir = tmp("graft_delprof_pos")
    val corpus = graft.queries.IrEngine.corpus(spark, sfDir)
    val tBuildP = time {
      graft.index.PositionalIndex.write(
        graft.index.PositionalIndex.build(spark, corpus), posDir) }
    val delIds = Tables.load(spark, sfDir, "documents")
      .orderBy(col("doc_id")).limit(TakedownDocs)
      .select(format_string("D%05d", col("doc_id")).as("docid"))
    val tDeleteP = time {
      graft.index.PositionalIndex.deleteDocs(spark, posDir, delIds) }
    val tCompactP = time {
      graft.index.PositionalIndex.compactDeletes(spark, posDir) }
    println(f"[deleteprof] pos   rebuild=$tBuildP%.2f s " +
      f"delete=$tDeleteP%.2f s compact=$tCompactP%.2f s " +
      f"(delete+compact/rebuild=${(tDeleteP + tCompactP) / tBuildP}%.2f)")

    // ---- inverted index store
    val invDir = tmp("graft_delprof_inv")
    val tBuildI = time {
      graft.index.InvertedIndex.write(
        graft.index.InvertedIndex.build(spark, corpus, k = 1), invDir) }
    val tDeleteI = time {
      graft.index.InvertedIndex.deleteDocs(spark, invDir, delIds) }
    val tCompactI = time {
      graft.index.InvertedIndex.compactDeletes(spark, invDir) }
    println(f"[deleteprof] inv   rebuild=$tBuildI%.2f s " +
      f"delete=$tDeleteI%.2f s compact=$tCompactI%.2f s " +
      f"(delete+compact/rebuild=${(tDeleteI + tCompactI) / tBuildI}%.2f)")

    // ---- chargram store: the incremental vocabulary recount
    // (tokenize ONLY the dead docs + df arithmetic + surgical gram
    // rewrite) vs the full re-tokenize + rebuild it replaces; no
    // separate compact step (the recount deletes eagerly)
    val cgDir = tmp("graft_delprof_cg")
    val tBuildC = time {
      graft.index.CharKGramIndex.write(
        graft.index.CharKGramIndex.build(spark, corpus), cgDir)
      graft.index.CharKGramIndex.writeVocabDf(spark, cgDir,
        graft.index.CharKGramIndex.docTermsOf(spark, corpus)) }
    val deadDocs = corpus.join(delIds, Seq("docid"), "left_semi")
    val tDeleteC = time {
      graft.index.CharKGramIndex.deleteDocs(spark, cgDir,
        graft.index.CharKGramIndex.docTermsOf(spark, deadDocs)) }
    println(f"[deleteprof] cgram rebuild=$tBuildC%.2f s " +
      f"delete=$tDeleteC%.2f s compact=0.00 s " +
      f"(delete/rebuild=${tDeleteC / tBuildC}%.2f)")

    // ---- durable IVF vector store: tombstone append vs the layout
    // rebuild it replaces; reclaim surgery rewrites only the cells a
    // dead NON-seed row lives in (a fixed batch touches at most
    // |batch| cells — the cost follows the takedown, not the corpus)
    val ivfDir = tmp("graft_delprof_ivf")
    val tBuildV = time {
      graft.ops.Similarity.writeIvfLayout(spark, sfDir, ivfDir) }
    val delV = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id")).orderBy(col("vec_id").desc) // non-seeds
      .limit(TakedownDocs)
    val tDeleteV = time {
      graft.ops.Similarity.deleteIvfVectors(spark, ivfDir, delV) }
    var cellsRewritten = 0
    val tCompactV = time {
      cellsRewritten =
        graft.ops.Similarity.compactIvfDeletes(spark, ivfDir) }
    println(f"[deleteprof] ivf   rebuild=$tBuildV%.2f s " +
      f"delete=$tDeleteV%.2f s compact=$tCompactV%.2f s " +
      f"(cells_rewritten=$cellsRewritten%d, delete+compact/rebuild=" +
      f"${(tDeleteV + tCompactV) / tBuildV}%.2f)")
    spark.stop()
  }
}
