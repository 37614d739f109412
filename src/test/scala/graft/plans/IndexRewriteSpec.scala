package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.corpus.TrecCorpus
import graft.index.{CharKGramIndex, InvertedIndex}

class IndexRewriteSpec extends SparkSpec {

  lazy val corpus = TrecCorpus.read(spark, resourcePath("/graft/sample-trec.xml"))
  lazy val ix = InvertedIndex.build(spark, corpus, k = 1)
  lazy val chargrams = CharKGramIndex.build(spark, corpus, k = 3)

  private def setup(withChargrams: Boolean = false): Unit = {
    corpus.join(broadcast(ix.docMap), "docid")
      .select(col("docno"), col("docid"), col("content"))
      .createOrReplaceTempView("docs_indexed")
    IndexCatalog.register("docs_indexed", ix,
      chargrams = if (withChargrams) Some(chargrams) else None)
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

  test("wildcard predicate rewrites to a candidate semi join + recheck") {
    setup(withChargrams = true)
    val df = spark.sql(
      "SELECT docid FROM docs_indexed WHERE " +
        "graft_matches_term_like(content, 'mer*ng') ORDER BY docid")
    val optimized = df.queryExecution.optimizedPlan.toString
    // candidate prefilter present AND the predicate retained as recheck
    assert(optimized.contains("LeftSemi"), optimized)
    assert(optimized.contains("graft_matches_term_like"), optimized)
    IndexCatalog.clear()
    corpus.createOrReplaceTempView("docs_plain")
    val slow = spark.sql(
      "SELECT docid FROM docs_plain WHERE " +
        "graft_matches_term_like(content, 'mer*ng') ORDER BY docid")
      .collect().map(_.getString(0)).toSeq
    assert(slow.nonEmpty) // the corpus really has mer*ng tokens
    assert(df.collect().map(_.getString(0)).toSeq == slow)
  }

  test("wildcard rewrite and fallback agree across pattern shapes") {
    // *ing forces the stopword path (e.g. 'during' matches the pattern
    // but must not count); st*am the stemming-collapse recheck path;
    // zz* the empty-expansion path
    val patterns = Seq("mer*ng", "st*am", "*ing", "a*b*c", "zz*")
    patterns.foreach { p =>
      IndexCatalog.clear()
      corpus.createOrReplaceTempView("docs_plain")
      val slow = spark.sql(
        s"SELECT docid FROM docs_plain WHERE graft_matches_term_like(content, '$p')")
        .collect().map(_.getString(0)).toSet
      setup(withChargrams = true)
      val fast = spark.sql(
        s"SELECT docid FROM docs_indexed WHERE graft_matches_term_like(content, '$p')")
      assert(fast.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
      val got = fast.collect().map(_.getString(0)).toSet
      IndexCatalog.clear()
      assert(got == slow, s"pattern [$p]: fast=$got slow=$slow")
    }
  }

  test("wildcard predicate without a registered char-gram index falls back") {
    setup(withChargrams = false)
    val df = spark.sql(
      "SELECT docid FROM docs_indexed WHERE " +
        "graft_matches_term_like(content, 'mer*ng')")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("LeftSemi"), optimized)
    assert(df.count() > 0)
  }

  test("rewrite over a LOADED (parquet) index fires, pushes the term " +
    "filter into the postings scan, and matches the built path") {
    // the durable-serving shape: Repl.persist writes the range-
    // partitioned artifacts, the catalog registers the LOADED frames —
    // the rewrite must still fire, and its postings probe must reach
    // the parquet scan as a literal kgram filter (file/row-group
    // pruning on the sorted layout), not a post-scan filter
    val dir = java.nio.file.Files.createTempDirectory("graft_ixrw").toString
    graft.Repl.persist(ix, Some(chargrams), dir)
    val loaded = InvertedIndex.load(spark, dir)
    val loadedCg = CharKGramIndex.load(spark, s"$dir/chargrams")
    corpus.join(broadcast(loaded.docMap), "docid")
      .select(col("docno"), col("docid"), col("content"))
      .createOrReplaceTempView("docs_loaded")
    IndexCatalog.register("docs_loaded", loaded, chargrams = Some(loadedCg))

    val df = spark.sql(
      "SELECT docid FROM docs_loaded WHERE " +
        "graft_contains_term(content, 'Merging') ORDER BY docid")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_contains_term"), optimized)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("EqualTo(kgram") || phys.contains("In(kgram"),
      s"term filter not pushed to the loaded postings scan:\n$phys")
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("FT911-0001", "FT911-0010", "FT911-0017", "FT911-0020"))

    // wildcard route: candidate semi join + recheck over the loaded
    // char-gram table, agreeing with the built-index rewrite
    val wdf = spark.sql(
      "SELECT docid FROM docs_loaded WHERE " +
        "graft_matches_term_like(content, 'mer*ng') ORDER BY docid")
    val wopt = wdf.queryExecution.optimizedPlan.toString
    assert(wopt.contains("LeftSemi"), wopt)
    assert(wopt.contains("graft_matches_term_like"), wopt)
    val gotLoaded = wdf.collect().map(_.getString(0)).toSeq
    setup(withChargrams = true)
    val gotBuilt = spark.sql(
      "SELECT docid FROM docs_indexed WHERE " +
        "graft_matches_term_like(content, 'mer*ng') ORDER BY docid")
      .collect().map(_.getString(0)).toSeq
    IndexCatalog.clear()
    assert(gotLoaded == gotBuilt, s"loaded=$gotLoaded built=$gotBuilt")
  }

  test("explicit rule application is idempotent (recheck marker)") {
    setup(withChargrams = true)
    val df = spark.sql(
      "SELECT docid FROM docs_indexed WHERE " +
        "graft_matches_term_like(content, 'mer*ng')")
    // the session extension already rewrote; a second manual pass must
    // not add another semi join
    val once = df.queryExecution.analyzed
    val twice = TermRewriteRule()(once)
    assert(twice.fastEquals(once), twice.toString)
  }
}
