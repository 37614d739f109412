package graft.query

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.IrSql

/** Pins [[Bm25Server]] to the fresh pruned plan and the full
  * multi-term scorer: served == fresh == multi for every query in a
  * sequence (the exchange-free reuse trap would surface as query 2+
  * returning query 1's ranking), plus the exchange-free invariant
  * itself and pooled-template concurrency. */
class Bm25ServerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val store = {
    val out = java.nio.file.Files
      .createTempDirectory("graft_bm25_srv").toString
    IrSql.writeBm25Stats(spark, dir, out)
    out
  }

  private lazy val srv = new Bm25Server(spark, store)

  private val querySet: Seq[Seq[String]] = Seq(
    IrSql.ExpandedQueryTerms,
    Seq("dup", "data", "table", "scan", "row", "key", "value", "batch"),
    Seq("merge", "stream"),
    IrSql.ExpandedQueryTerms, // repeat: reused template, same answer
    Seq("spark", "query", "group", "column"))

  test("served == fresh pruned == full multi across a query sequence") {
    querySet.foreach { terms =>
      val multi = IrSql.q10Bm25Multi(spark, dir, terms).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val fresh = IrSql.q10Bm25PrunedAt(spark, store, terms, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = srv.search(terms)
      assert(fresh == multi, s"$terms: fresh pruned diverged from multi")
      assert(got == multi, s"$terms: served=$got multi=$multi")
    }
  }

  test("served FILTERED == fresh q10Bm25Filtered (candidates " +
    "restricted, statistics global), across keep sets") {
    val keepAll = graft.ops.Similarity.filterIds(spark, dir)
      .select(col("vec_id").as("doc_id"))
    def keepSet(ids: Seq[Long]) = {
      val s = new java.util.HashSet[java.lang.Long]()
      ids.foreach(i => s.add(i))
      s
    }
    val filterDocs = keepAll.collect().map(_.getLong(0)).toSeq
    // the metadata filter, and a narrow hand-picked set (forces the
    // keep predicate to actually bite on the top of the ranking)
    Seq(filterDocs, filterDocs.sorted.take(40)).foreach { ids =>
      val keepDf = spark.createDataFrame(
        java.util.Arrays.asList(ids.map(org.apache.spark.sql.Row(_)): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType))))
      val want = IrSql.q10Bm25Filtered(spark, dir, keepDf).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = srv.searchFiltered(IrSql.DefaultQueryTerms, keepSet(ids))
      assert(got == want, s"filtered served=$got fresh=$want")
    }
    // empty keep set: nothing may be returned
    assert(srv.searchFiltered(IrSql.DefaultQueryTerms,
      keepSet(Seq.empty)).isEmpty)
  }

  test("unknown-term and empty queries return empty; known terms mixed " +
    "with unknown ones still rank correctly") {
    assert(srv.search(Seq("zzzqqqxx")).isEmpty)
    assert(srv.search(Nil).isEmpty)
    val want = IrSql.q10Bm25Multi(spark, dir, Seq("merge", "stream"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(srv.search(Seq("merge", "zzzqqqxx", "stream")) == want)
  }

  test("warm batch == q10Bm25Batch row for row (shared plan shape); " +
    "unknown-only qids yield no rows; repeat batch identical") {
    val want = IrSql.q10Bm25Batch(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val got = srv.searchBatch(IrSql.BatchQueries)
    assert(got == want, s"batch served=$got\nfresh=$want")
    assert(srv.searchBatch(IrSql.BatchQueries) == want,
      "repeat batch diverged (template reuse)")
    // a qid of only unknown terms contributes nothing; the rest of
    // the batch is unaffected
    val withGhost = IrSql.BatchQueries :+ (99L -> Seq("zzzqqqxx"))
    assert(srv.searchBatch(withGhost) == want)
    assert(srv.searchBatch(Seq(99L -> Seq("zzzqqqxx"))).isEmpty)
    // the batch template is exchange-free above the cached relation
    val s = srv.batchTemplatePlan.toString
    val above = s.linesIterator
      .takeWhile(!_.contains("InMemoryRelation")).mkString("\n")
    assert(above.contains("InMemoryTableScan") &&
      !above.contains("Exchange"),
      s"batch template must stay exchange-free:\n$above")
  }

  test("both templates are exchange-free under the session conf") {
    // the cached postings⨝doclen relation legitimately holds its
    // ONE-TIME construction join (with its broadcast exchange) inside
    // the InMemoryRelation leaf — what must stay exchange-free is the
    // re-executed template ABOVE the cache, i.e. every plan line
    // before the first InMemoryRelation in the rendered tree (a bare
    // tree-collect would not descend through the AQE root)
    srv.templatePlans.foreach { p =>
      val s = p.toString
      val above = s.linesIterator
        .takeWhile(!_.contains("InMemoryRelation")).mkString("\n")
      assert(above.contains("InMemoryTableScan"),
        s"template does not read the cached relation:\n$s")
      assert(!above.contains("Exchange"),
        s"exchange leaked into a reused template:\n$above")
    }
  }

  test("8 concurrent searches each return their own correct ranking " +
    "(pooled templates, no shared-ref race)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val qs = querySet ++ querySet.take(3)
    val want = qs.map(t => t -> srv.search(t)).toMap
    (1 to 3).foreach { _ =>
      val got = Await.result(
        Future.sequence(qs.map(t => Future(t -> srv.search(t)))),
        120.seconds).toMap
      qs.foreach(t =>
        assert(got(t) == want(t), s"concurrent bm25 [$t] diverged"))
    }
  }

  test("impact bounds re-price after a store merge (frontier pairs + " +
    "current corpus stats): a merged store's server matches the " +
    "merged corpus's full scorer") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bm25_srv_m").toString
    val full = spark.read.parquet(s"$dir/documents.parquet")
    val half = full.count() / 2
    full.filter(col("doc_id") < half)
      .write.mode("overwrite").parquet(s"$root/base/documents.parquet")
    val st = s"$root/store"
    IrSql.writeBm25Stats(spark, s"$root/base", st)
    IrSql.mergeBm25Stats(spark, st,
      full.filter(col("doc_id") >= half).select("doc_id", "text"))
    val want = IrSql.q10Bm25Multi(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(new Bm25Server(spark, st)
      .search(IrSql.ExpandedQueryTerms) == want)
  }

  test("a store merge under a LIVE server is detected by the version " +
    "stamp: post-merge searches serve the merged corpus with no " +
    "explicit refresh; compaction is detected too; refresh() works") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bm25_srv_stale").toString
    val full = spark.read.parquet(s"$dir/documents.parquet")
    val n = full.count()
    full.filter(col("doc_id") < n / 2)
      .write.mode("overwrite").parquet(s"$root/base/documents.parquet")
    val st = s"$root/store"
    IrSql.writeBm25Stats(spark, s"$root/base", st)
    val live = new Bm25Server(spark, st)
    def fresh(): Seq[(Long, Double)] =
      IrSql.q10Bm25PrunedAt(spark, st, IrSql.ExpandedQueryTerms, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val before = live.search(IrSql.ExpandedQueryTerms)
    assert(before == fresh(), "pre-merge served != fresh")
    // mutate the store the server holds open — NO refresh call
    IrSql.mergeBm25Stats(spark, st,
      full.filter(col("doc_id") >= n / 2).select("doc_id", "text"))
    val wantMerged = IrSql.q10Bm25Multi(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(before != wantMerged,
      "test corpus too small to distinguish pre/post-merge rankings")
    assert(live.search(IrSql.ExpandedQueryTerms) == wantMerged,
      "live server served a stale ranking after mergeBm25Stats")
    // compaction rewrites the artifact files: the stamp must move and
    // the rebuilt snapshot keep serving the same (content-equal) rows
    val compacted = IrSql.compactBm25Store(spark, st, maxFiles = 1)
    assert(compacted >= 1, "compaction did not trigger")
    assert(live.search(IrSql.ExpandedQueryTerms) == wantMerged,
      "live server diverged after compactBm25Store")
    live.refresh() // the explicit hammer stays available
    assert(live.search(IrSql.ExpandedQueryTerms) == wantMerged)
  }
}
