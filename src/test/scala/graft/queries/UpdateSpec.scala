package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.IrSql

/** Round-14 UPDATE (re-ingest / re-crawl): replacing a document's
  * content in place across the stores. The oracle entries
  * (q10_bm25_updated / q36_phrase_updated / q26_ir_search_updated)
  * prove the absolute answers; these specs pin the composition
  * machinery — replay idempotence, upsert semantics, and live-server
  * detection. */
class UpdateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private def freshStore(): String = {
    val o = tmp("graft_upd_bm25")
    IrSql.writeBm25Stats(spark, dir, o)
    o
  }

  private def ranked(store: String): Seq[(Long, Double)] =
    IrSql.q10Bm25PrunedAt(spark, store, IrSql.ExpandedQueryTerms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def storeContent(store: String): Seq[Seq[String]] =
    Seq(rows(spark.read.parquet(s"$store/stats")),
      rows(spark.read.parquet(s"$store/corpus")),
      rows(spark.read.parquet(s"$store/doclen")))

  test("updateBm25Docs (generation-versioned, UNCOMPACTED) serves " +
    "the rebuild-over-updated-corpus ranking; compaction folds the " +
    "generations to a store content-identical to the rebuild; the " +
    "base artifacts stay byte-untouched until compaction") {
    val store = freshStore()
    val pre = ranked(store)
    // the lazy update must not rewrite the base store: postings and
    // stats part files stay byte-identical (appends land as NEW
    // files), the r14 full-table-rewrite cost gone
    def snap(table: String) = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$store/$table"))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
      .toSeq.sorted
    val postingsBefore = snap("postings")
    val statsBefore = snap("stats")
    IrSql.updateBm25Docs(spark, store, IrSql.updatedDocsNew(spark, dir))
    assert(snap("postings").intersect(postingsBefore) == postingsBefore,
      "the lazy update rewrote base postings files")
    assert(snap("stats") == statsBefore,
      "the lazy update rewrote the stats artifact")
    val post = ranked(store)
    assert(post != pre,
      "update left the ranking unchanged — suffix terms are query " +
        "terms, so it must move")
    // ground truth: a store BUILT from the updated corpus
    val corpusDir = tmp("graft_upd_corpus")
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(IrSql.UpdatedDocsMod)) ===
            lit(IrSql.UpdatedDocsRem),
          concat(col("text"), lit(IrSql.UpdateSuffix)))
          .otherwise(col("text")).as("text"))
      .write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    val truth = tmp("graft_upd_truth")
    IrSql.writeBm25Stats(spark, corpusDir, truth)
    assert(post == ranked(truth), "updated (pending) store != rebuild")
    // REPLAY: re-driving the same update from a re-crawl ledger lands
    // another identical generation — every answer unchanged
    IrSql.updateBm25Docs(spark, store, IrSql.updatedDocsNew(spark, dir))
    assert(ranked(store) == post, "update replay changed the ranking")
    // COMPACTION folds the pending generations: plain store, content
    // identical to the rebuild, all deferred-state sidecars gone
    IrSql.compactBm25Deletes(spark, store)
    for (d <- Seq("doc_gen", "sup_corpus", "stats_upd", "tombstones",
        "tombstones_lazy", "tomb_corpus"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$store/$d")),
        s"compaction left $d")
    assert(ranked(store) == post, "compaction changed the ranking")
    assert(storeContent(store)(0) == storeContent(truth)(0),
      "stats != rebuild")
    assert(storeContent(store)(1) == storeContent(truth)(1),
      "corpus != rebuild")
    assert(storeContent(store)(2) == storeContent(truth)(2),
      "doclen != rebuild")
  }

  test("updateBm25Docs upserts: a doc_id absent from the store " +
    "inserts (its delete leg no-ops)") {
    val store = freshStore()
    val maxId = spark.read.parquet(s"$dir/documents.parquet")
      .agg(max(col("doc_id"))).head().getLong(0)
    import spark.implicits._
    val fresh = Seq((maxId + 1000L,
      "zzqupsert window hash merge")).toDF("doc_id", "text")
    IrSql.updateBm25Docs(spark, store, fresh)
    val got = IrSql.q10Bm25PrunedAt(spark, store, Seq("zzqupsert"), 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(maxId + 1000L),
      "a query for the upserted doc's unique term must return " +
        "exactly that doc")
    val nd = spark.read.parquet(s"$store/corpus").head().getLong(1)
    val base = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(nd == base + 1, "corpus nd did not grow by the insert")
  }

  test("an update under a LIVE Bm25Server is detected by the stamp " +
    "(post-update served == fresh, no refresh)") {
    val store = freshStore()
    val srv = new graft.query.Bm25Server(spark, store)
    val pre = srv.search(IrSql.ExpandedQueryTerms)
    assert(pre == ranked(store))
    IrSql.updateBm25Docs(spark, store, IrSql.updatedDocsNew(spark, dir))
    val post = srv.search(IrSql.ExpandedQueryTerms)
    assert(post != pre, "fixture update missed the top-10")
    assert(post == ranked(store),
      "stale served ranking after an update (stamp missed it)")
  }
}
