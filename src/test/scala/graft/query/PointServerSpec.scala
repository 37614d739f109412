package graft.query

import graft.SparkSpec
import graft.corpus.TrecCorpus
import graft.index.InvertedIndex

/** Pins [[PointServer]] to [[QueryEngine.serveSearch]]: the reused
  * templates must return identical rankings for EVERY query in a
  * sequence — the stale-state trap this design dodges is an exchange
  * node caching the first query's result, which would surface here as
  * query 2+ returning query 1's ranking. */
class PointServerSpec extends SparkSpec {

  lazy val corpus = TrecCorpus.read(spark, resourcePath("/graft/sample-trec.xml"))
  lazy val ix = InvertedIndex.build(spark, corpus, k = 1)

  test("template reuse matches serveSearch across a query sequence") {
    val ps = new PointServer(ix)
    val queries = Seq("merge", "stream buffer", "pipeline", "merge",
      "xylophone", "data stream")
    queries.foreach { q =>
      val want = QueryEngine.serveSearch(ix, q).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      val got = ps.search(q)
      assert(got == want, s"query [$q]: got=$got want=$want")
    }
  }

  test("stopword-only and no-hit queries return empty without failing") {
    val ps = new PointServer(ix)
    assert(ps.search("the").isEmpty)
    assert(ps.search("zzzqqq").isEmpty)
    // and the server still works after the empty cases
    assert(ps.search("merge").nonEmpty)
  }

  test("arity contract matches the engine (3 words rejected)") {
    val ps = new PointServer(ix)
    intercept[IllegalArgumentException](ps.search("one two three"))
  }

  test("8 concurrent searches return each its own correct results " +
    "(pooled templates, no shared-ref race)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val ps = new PointServer(ix)
    val queries = Seq("merge", "stream buffer", "pipeline", "data stream",
      "merge engine", "sorted", "buffer", "engine")
    val want = queries.map(q => q -> ps.search(q)).toMap
    (1 to 3).foreach { _ =>
      val got = Await.result(
        Future.sequence(queries.map(q => Future(q -> ps.search(q)))),
        120.seconds).toMap
      queries.foreach { q =>
        assert(got(q) == want(q), s"concurrent search [$q] diverged")
      }
    }
  }
}
