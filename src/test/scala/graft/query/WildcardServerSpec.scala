package graft.query

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.index.{CharKGramIndex, InvertedIndex}
import graft.queries.IrSql

/** Round-15 prepared wildcard serving: the warm template equals the
  * batch expansion ([[QueryEngine.wildcardTerms]]) pattern for
  * pattern, the retrieval arm equals [[QueryEngine.wildcardSearch]],
  * the template is exchange-free, and a chargram-store UPDATE under
  * the live server is detected by the stamp. */
class WildcardServerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def freshCgStore(): String = {
    val o = tmp("graft_wc_cg")
    CharKGramIndex.write(
      IrSql.q08CharGrams(spark, dir)
        .groupBy(col("gram"))
        .agg(sort_array(collect_set(col("term"))).as("terms")), o)
    CharKGramIndex.writeVocabDf(spark, o,
      IrSql.tokens(spark, dir)
        .select(col("doc_id"), col("term")).distinct())
    o
  }

  private def batchTerms(store: String, pattern: String): Seq[String] =
    QueryEngine.wildcardTerms(CharKGramIndex.load(spark, store),
      pattern).collect().map(_.getString(0)).toSeq

  test("served lookup == wildcardTerms for single-*, multi-*, " +
    "gramless-fallback and no-hit patterns; repeat queries identical") {
    val store = freshCgStore()
    val srv = new WildcardServer(spark, store)
    for (pat <- Seq("st*am", "str*ea*m", "a*b", "*zzqnotfound*")) {
      val want = batchTerms(store, pat)
      assert(srv.lookup(pat) == want, s"pattern $pat diverged")
      assert(srv.lookup(pat) == want, s"pattern $pat repeat diverged")
    }
    // q09's fixture pattern must actually match something here
    assert(srv.lookup("st*am").nonEmpty)
  }

  test("the lookup template is exchange-free") {
    val srv = new WildcardServer(spark, freshCgStore())
    val plan = srv.templatePlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty,
      s"wildcard template contains an exchange:\n$plan")
  }

  test("a chargram-store UPDATE under the LIVE server is detected by " +
    "the stamp: the update-introduced vocabulary term serves with no " +
    "refresh; a DELETE that retires a term is seen too") {
    val store = freshCgStore()
    val srv = new WildcardServer(spark, store)
    val pre = srv.lookup("st*am")
    assert(!pre.contains("stqzam"))
    val docTerms = IrSql.tokens(spark, dir)
      .select(col("doc_id"), col("term")).distinct()
    val oldTerms = docTerms
      .filter(pmod(col("doc_id"), lit(IrSql.UpdatedDocsMod)) ===
        lit(IrSql.UpdatedDocsRem))
    val newTerms = IrSql.updatedDocsNew(spark, dir)
      .select(col("doc_id"),
        explode(split(regexp_replace(lower(col("text")),
          "[^a-z0-9]+", " "), " ")).as("term"))
      .filter(col("term") =!= "").distinct()
    CharKGramIndex.updateDocs(spark, store, "wc-live-upd",
      oldTerms, newTerms)
    val post = srv.lookup("st*am")
    assert(post.contains("stqzam"),
      "live server missed the update-introduced vocabulary term")
    assert(post == batchTerms(store, "st*am"),
      "served post-update expansion != fresh batch expansion")
  }

  test("served wildcard RETRIEVAL == QueryEngine.wildcardSearch on " +
    "the same index + store (scores, order, docids)") {
    val store = freshCgStore()
    val corpus = graft.queries.IrEngine.corpus(spark, dir)
    val ix = InvertedIndex.build(spark, corpus, k = 1)
    val srv = new WildcardServer(spark, store,
      point = Some(new PointServer(ix)))
    // the chargram store above uses the SQL-subset vocabulary while
    // the index tokenizes with the full pipeline — wildcardSearch
    // re-analyzes the expansion either way, so the two paths agree
    val want = QueryEngine.wildcardSearch(ix,
        CharKGramIndex.load(spark, store), "st*am")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2))).toSeq
    val got = srv.search("st*am")
    assert(got == want, s"served=$got fresh=$want")
    assert(got.nonEmpty)
  }
}
