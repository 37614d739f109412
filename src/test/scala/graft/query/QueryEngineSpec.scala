package graft.query

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.corpus.TrecCorpus
import graft.index.{CharKGramIndex, InvertedIndex}

class QueryEngineSpec extends SparkSpec {

  lazy val corpus = TrecCorpus.read(spark, resourcePath("/graft/sample-trec.xml"))
  lazy val ix = InvertedIndex.build(spark, corpus, k = 1)
  lazy val chargrams = CharKGramIndex.build(spark, corpus, k = 3)

  test("single-term tf-idf: hand-computed golden score, top doc") {
    val top = QueryEngine.search(ix, "merge").collect()
    // df(merg)=4 over N=20; FT911-0017 has tf=5
    val expected = BigDecimal((1.0 + math.log(5)) * math.log10(20.0 / 4))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top.head.getAs[String]("docid") == "FT911-0017")
    assert(top.head.getAs[Double]("score") == expected)
    assert(top.length == 4)
  }

  test("two-term query is disjunctive (OR)") {
    val docs = QueryEngine.search(ix, "merge stream")
      .collect().map(_.getAs[String]("docid")).toSet
    // stream-only docs appear even without 'merge'
    assert(docs.contains("FT911-0018"))
    assert(docs.contains("FT911-0017"))
  }

  test("query analysis shares the index pipeline") {
    // 'Merging' stems to 'merg'; stopwords vanish
    assert(QueryEngine.analyze("The Merging") == Seq("merg"))
  }

  test("arity guard rejects 3-word queries") {
    intercept[IllegalArgumentException] {
      QueryEngine.search(ix, "one two three")
    }
  }

  test("bugCompat mode reproduces df=1 scoring: log10(N) for all terms") {
    val got = QueryEngine.search(ix, "merge", bugCompat = true).collect()
    val expTop = BigDecimal((1.0 + math.log(5)) * math.log10(20.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.head.getAs[Double]("score") == expTop)
  }

  test("wildcard expansion via char-gram intersection") {
    val terms = QueryEngine.wildcardTerms(chargrams, "re*ve")
      .collect().map(_.getString(0)).toSeq
    assert(terms == Seq("receive", "relive", "remove", "resolve",
      "retrieve", "revolve"))
  }

  test("wildcard search ranks the fodder doc first") {
    val top = QueryEngine.wildcardSearch(ix, chargrams, "re*ve").collect()
    assert(top.head.getAs[String]("docid") == "FT911-0013")
  }

  test("multi-* patterns expand through every anchored segment") {
    // r*so*ve: grams of "$r", "so", "ve$" — only 'resolve' survives;
    // segments shorter than k contribute nothing and LIKE still verifies
    val terms = QueryEngine.wildcardTerms(chargrams, "r*so*ve")
      .collect().map(_.getString(0)).toSeq
    assert(terms == Seq("resolve"))
    // leading-* pattern: suffix anchor only
    val tail = QueryEngine.wildcardTerms(chargrams, "*olve")
      .collect().map(_.getString(0)).toSeq
    assert(tail == Seq("resolve", "revolve"))
  }

  test("wildcard patterns are case-normalized and LIKE metacharacters " +
    "stay literal") {
    // the vocabulary is lowercased by the pipeline: 'Re*Ve' must behave
    // as 're*ve' (the raw pattern used to silently match nothing)
    val upper = QueryEngine.wildcardTerms(chargrams, "Re*Ve")
      .collect().map(_.getString(0)).toSeq
    val lower = QueryEngine.wildcardTerms(chargrams, "re*ve")
      .collect().map(_.getString(0)).toSeq
    assert(upper == lower && lower.nonEmpty)
    // '_' can never appear in an alnum-only vocab term, so it must
    // match nothing — naive LIKE translation would read '_%olve' as
    // one-any-char and wrongly return resolve/revolve (the '$_'
    // segment is shorter than k, so only the verify enforces it)
    assert(QueryEngine.wildcardTerms(chargrams, "_*olve").count() == 0)
  }

  test("serve-path search returns exactly the analytic plan's results") {
    val a = QueryEngine.search(ix, "merge stream").collect().toSeq
    val s = QueryEngine.serveSearch(ix, "merge stream").collect().toSeq
    assert(a == s)
  }

  test("neither search nor wildcardSearch broadcasts the corpus-sized doc map") {
    // the docMap (the only relation producing `docid`) must be the
    // STREAMED side of its join; broadcast build sides may only carry
    // the ranked top-k / expansion columns. Walk the ACTIVE physical
    // tree (descending through AQE stages; InMemoryTableScan is a leaf,
    // so cached build lineage is naturally excluded).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    Seq(
      QueryEngine.search(ix, "merge"),
      QueryEngine.wildcardSearch(ix, chargrams, "re*ve")).foreach { df =>
      df.collect() // finalize any adaptive stages
      val joins = flatten(df.queryExecution.executedPlan)
        .collect { case j: BroadcastHashJoinExec => j }
      assert(joins.nonEmpty)
      joins.foreach { j =>
        val build = j.buildSide match {
          case BuildLeft => j.left
          case BuildRight => j.right
        }
        assert(!build.output.map(_.name).contains("docid"),
          s"docMap on the broadcast build side:\n$j")
      }
    }
  }

  test("blank queries are rejected as 0 words, not passed as 1") {
    Seq("", "   ", "\t").foreach { q =>
      val e = intercept[IllegalArgumentException](
        QueryEngine.requireArity(q))
      assert(e.getMessage.contains("got 0"), e.getMessage)
    }
  }

  test("char-gram index with k=4 produces no garbage grams and serves " +
    "wildcards when k is threaded through") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vocab = Seq("a", "ab", "stream", "steam").toDF("term")
    val g4 = graft.index.CharKGramIndex.grams(vocab, k = 4)
    // wrapped "a" = "$a$" (3 chars) must contribute nothing at k=4
    assert(g4.filter(col("term") === "a").count() == 0)
    assert(g4.filter(length(col("gram")) =!= 4).count() == 0)
    // the k=4 gram set still expands a wildcard when the SAME k flows
    // through the lookup ("st*am" matches both: str-e-am and st-e-am)
    val cg4 = g4.groupBy("gram")
      .agg(sort_array(collect_set(col("term"))).as("terms"))
    val terms = QueryEngine.wildcardTerms(cg4, "st*am", k = 4)
      .collect().map(_.getString(0)).toSeq
    assert(terms == Seq("steam", "stream"))
    // a pattern with a ≥4-char segment exercises the gram path at k=4
    val viaGrams = QueryEngine.wildcardTerms(cg4, "stre*", k = 4)
      .collect().map(_.getString(0)).toSeq
    assert(viaGrams == Seq("stream"))
  }

  test("RM3: lambda=1 reduces to the plain ranking; expansion changes " +
    "it; feedback bounds hold") {
    def ranking(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.getString(1)).toSeq
    val plain = ranking(QueryEngine.search(ix, "merge"))
    // lambda=1: expansion weight zero -> the ORDER equals plain search
    // (scores scale by 1/|Q| and re-round, order is invariant)
    val noExp = ranking(QueryEngine.rm3Search(ix, "merge", lambda = 1.0))
    assert(noExp == plain, s"lambda=1 diverged: $noExp vs $plain")
    // default lambda: expansion terms from the feedback docs must be
    // able to ADMIT documents the original one-term query cannot see
    val expanded = QueryEngine.rm3Search(ix, "merge").collect()
    assert(expanded.nonEmpty && expanded.length <= 10)
    // deterministic across invocations
    val again = QueryEngine.rm3Search(ix, "merge").collect()
    assert(expanded.map(_.toSeq.toList).toSeq ==
      again.map(_.toSeq.toList).toSeq)
    // stopword-only queries keep the engine contract (error via arity)
    intercept[IllegalArgumentException](
      QueryEngine.rm3Search(ix, "one two three"))
  }

  test("rm3Model: the window-dlen relevance model reproduces the " +
    "groupBy-join recompute (the pre-r16 two-scan shape) term for term") {
    val fb = QueryEngine.search(ix, "merge stream", 5)
      .select("docno", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = QueryEngine.rm3Model(ix, fb, 10).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    // driver recompute with the OLD arithmetic: dlen = Σ tf per
    // feedback doc (the groupBy aggregate), rm0 = Σ_d tf/dlen·s(d)
    val posts = ix.postings
      .filter(col("docno").isin(fb.map(_._1): _*))
      .select("kgram", "docno", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val dlen = posts.groupBy(_._2).map { case (d, rs) =>
      d -> rs.map(_._3).sum }
    val s = fb.toMap
    val want = posts.groupBy(_._1).map { case (t, rs) =>
      t -> rs.map(r => r._3.toDouble / dlen(r._2) * s(r._2)).sum }
    assert(got.length == math.min(10, want.size))
    got.foreach { case (t, v) =>
      assert(want.contains(t), s"unexpected term $t in rm3Model output")
      assert(math.abs(v - want(t)) < 1e-12,
        s"rm0($t): $v vs recomputed ${want(t)}") }
    // the returned rows are the top slice by (rm0 desc, term asc)
    val wantOrder = want.toSeq.sortBy { case (t, v) => (-v, t) }
      .take(10).map(_._1)
    assert(got.map(_._1).toSeq == wantOrder)
  }
}
