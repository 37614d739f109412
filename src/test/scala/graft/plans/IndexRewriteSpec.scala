package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.corpus.TrecCorpus
import graft.index.InvertedIndex

class IndexRewriteSpec extends SparkSpec {

  lazy val corpus = TrecCorpus.read(spark, resourcePath("/graft/sample-trec.xml"))
  lazy val ix = InvertedIndex.build(spark, corpus, k = 1)

  private def setup(): Unit = {
    corpus.join(broadcast(ix.docMap), "docid")
      .select(col("docno"), col("docid"), col("content"))
      .createOrReplaceTempView("docs_indexed")
    IndexCatalog.register("docs_indexed", ix)
  }

  test("fallback evaluation works without any registered index") {
    IndexCatalog.clear()
    corpus.createOrReplaceTempView("docs_plain")
    val got = spark.sql(
      "SELECT docid FROM docs_plain WHERE graft_contains_term(content, 'Merging') ORDER BY docid")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("FT911-0001", "FT911-0010", "FT911-0017", "FT911-0020"))
  }

  test("registered index rewrites the predicate to a semi join") {
    setup()
    val df = spark.sql(
      "SELECT docid FROM docs_indexed WHERE graft_contains_term(content, 'Merging') ORDER BY docid")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LeftSemi"), optimized)
    assert(!optimized.contains("graft_contains_term"), optimized)
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("FT911-0001", "FT911-0010", "FT911-0017", "FT911-0020"))
  }

  test("rewritten and fallback paths agree on every vocabulary term") {
    setup()
    IndexCatalog.clear()
    corpus.createOrReplaceTempView("docs_plain")
    val words = Seq("buffers", "stream", "xylophone", "the", "absent")
    words.foreach { w =>
      val slow = spark.sql(
        s"SELECT docid FROM docs_plain WHERE graft_contains_term(content, '$w')")
        .collect().map(_.getString(0)).toSet
      setup()
      val fast = spark.sql(
        s"SELECT docid FROM docs_indexed WHERE graft_contains_term(content, '$w')")
        .collect().map(_.getString(0)).toSet
      IndexCatalog.clear()
      assert(fast == slow, s"term [$w]: fast=$fast slow=$slow")
    }
  }

  test("residual predicates survive the rewrite") {
    setup()
    val df = spark.sql(
      "SELECT docid FROM docs_indexed " +
        "WHERE graft_contains_term(content, 'merge') AND docid LIKE '%001_'")
    assert(df.collect().map(_.getString(0)).toSeq.sorted ==
      Seq("FT911-0010", "FT911-0017"))
  }

  test("OR of term predicates rewrites to one union semi join") {
    setup()
    val df = spark.sql(
      "SELECT docid FROM docs_indexed WHERE " +
        "graft_contains_term(content, 'xylophone') OR " +
        "graft_contains_term(content, 'pipeline')")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_contains_term"), optimized)
    // docs 14/18 contain 'pipeline(s)', 16 contains 'xylophone'
    assert(df.collect().map(_.getString(0)).toSeq.sorted ==
      Seq("FT911-0014", "FT911-0016", "FT911-0018"))
  }

  test("OR with a stopword leaf degenerates to the real term") {
    setup()
    val df = spark.sql(
      "SELECT docid FROM docs_indexed WHERE " +
        "graft_contains_term(content, 'the') OR " +
        "graft_contains_term(content, 'xylophone')")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("FT911-0016"))
  }

  test("predicate over a non-indexed column is NOT rewritten (fallback)") {
    setup()
    // docid is not the indexed column: the docids don't tokenize to
    // 'merging', so the fallback must return 0 rows — a (wrong) rewrite
    // against content postings would return 4
    val df = spark.sql(
      "SELECT docid FROM docs_indexed WHERE graft_contains_term(docid, 'Merging')")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_contains_term"), optimized)
    assert(df.count() == 0)
  }

  test("computed-expression predicate is NOT rewritten (fallback)") {
    setup()
    // upper(content) destroys the pipeline's casing assumptions only in
    // the sense that the fallback must evaluate it as written; the
    // rewrite may only fire on a bare reference to the indexed column
    val df = spark.sql(
      "SELECT docid FROM docs_indexed " +
        "WHERE graft_contains_term(concat(content, ' xylophone'), 'xylophone') ORDER BY docid")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_contains_term"), optimized)
    // every doc matches: the concat appends the term to all 20 docs
    assert(df.count() == corpus.count())
  }

  test("stopword-only term matches nothing on both paths") {
    setup()
    val fast = spark.sql(
      "SELECT docid FROM docs_indexed WHERE graft_contains_term(content, 'the')")
    assert(fast.count() == 0)
  }
}
