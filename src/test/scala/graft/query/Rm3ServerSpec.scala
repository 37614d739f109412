package graft.query

import graft.SparkSpec
import graft.corpus.TrecCorpus
import graft.index.InvertedIndex

/** Pins [[Rm3Server]] to [[QueryEngine.rm3Search]]: the three reused
  * templates must return identical results for every query in a
  * sequence, and every template plan must be exchange-free (the
  * stale-state trap plan reuse dodges). */
class Rm3ServerSpec extends SparkSpec {

  lazy val corpus = TrecCorpus.read(spark, resourcePath("/graft/sample-trec.xml"))
  lazy val ix = InvertedIndex.build(spark, corpus, k = 1)

  private def want(q: String, lambda: Double = 0.5): Seq[(Long, String, Double)] =
    QueryEngine.rm3Search(ix, q, lambda = lambda).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

  test("template reuse matches rm3Search across a query sequence") {
    val srv = new Rm3Server(ix)
    val queries = Seq("merge", "stream buffer", "pipeline", "merge",
      "data stream")
    queries.foreach { q =>
      val got = srv.search(q)
      assert(got == want(q), s"query [$q]: got=$got want=${want(q)}")
    }
  }

  test("lambda plumbs through: lambda=1 server equals lambda=1 fresh") {
    val srv = new Rm3Server(ix, lambda = 1.0)
    assert(srv.search("merge") == want("merge", lambda = 1.0))
  }

  test("all three template plans are exchange-free") {
    val srv = new Rm3Server(ix)
    srv.templatePlans.foreach { p =>
      val exchanges = p.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }
      assert(exchanges.isEmpty, s"exchange leaked into an RM3 template:\n$p")
    }
  }

  test("8 concurrent RM3 searches return each its own correct results " +
    "(pooled three-stage templates, no shared-ref race)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val srv = new Rm3Server(ix)
    val queries = Seq("merge", "stream buffer", "pipeline", "data stream",
      "merge engine", "sorted", "buffer", "engine")
    val expect = queries.map(q => q -> srv.search(q)).toMap
    (1 to 3).foreach { _ =>
      val got = Await.result(
        Future.sequence(queries.map(q => Future(q -> srv.search(q)))),
        120.seconds).toMap
      queries.foreach { q =>
        assert(got(q) == expect(q), s"concurrent rm3 [$q] diverged")
      }
    }
  }

  test("stopword-only and no-hit queries return empty; arity enforced; " +
    "server keeps working after the empty cases") {
    val srv = new Rm3Server(ix)
    assert(srv.search("the").isEmpty)
    assert(srv.search("zzzqqq").isEmpty)
    intercept[IllegalArgumentException](srv.search("one two three"))
    assert(srv.search("merge") == want("merge"))
  }
}
