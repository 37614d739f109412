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

  test("stopword-only term matches nothing on both paths") {
    setup()
    val fast = spark.sql(
      "SELECT docid FROM docs_indexed WHERE graft_contains_term(content, 'the')")
    assert(fast.count() == 0)
  }
}
