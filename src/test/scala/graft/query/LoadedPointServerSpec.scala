package graft.query

import graft.SparkSpec
import graft.corpus.TrecCorpus
import graft.index.InvertedIndex

/** Pins [[LoadedPointServer]] to [[QueryEngine.serveSearch]] over the
  * SAME loaded artifacts — the file-set-keyed plan cache must return
  * identical rankings for every query in a sequence, including the
  * multi-file layouts its routing exists for (terms of one query
  * living in different files) and plan-cache hits (repeated file
  * sets). */
class LoadedPointServerSpec extends SparkSpec {

  lazy val corpus = TrecCorpus.read(spark, resourcePath("/graft/sample-trec.xml"))
  lazy val ix = InvertedIndex.build(spark, corpus, k = 1)

  private def withWritten(rowsPerFile: Long)(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lps").toString
    try {
      InvertedIndex.write(ix, dir, rowsPerFile)
      f(dir)
    } finally {
      val wk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try wk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally wk.close()
    }
  }

  private def pinToServeSearch(dir: String): Unit = {
    val lps = new LoadedPointServer(spark, dir)
    val lx = lps.index
    // repeats exercise the plan-cache hit path; 2-word queries the
    // cross-file routing; unknown-term and stopword-only the empty
    // short-circuits
    val queries = Seq("merge", "stream buffer", "pipeline", "merge",
      "data stream", "stream buffer")
    queries.foreach { q =>
      val want = QueryEngine.serveSearch(lx, q).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      val got = lps.search(q)
      assert(got == want, s"query [$q]: got=$got want=$want")
    }
    assert(lps.search("the").isEmpty)
    assert(lps.search("zzzqqq").isEmpty)
    assert(lps.search("merge").nonEmpty)
  }

  test("single-file layout matches serveSearch (size-aware write)") {
    withWritten(InvertedIndex.WriteRowsPerFile) { dir =>
      // the sample corpus is tiny: size-aware write must give ONE file
      val files = new java.io.File(s"$dir/postings")
        .listFiles.count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"expected 1 postings file, got $files")
      pinToServeSearch(dir)
    }
  }

  test("multi-file layout routes terms to their files and matches") {
    withWritten(rowsPerFile = 50L) { dir =>
      val files = new java.io.File(s"$dir/postings")
        .listFiles.count(_.getName.endsWith(".parquet"))
      assert(files > 2, s"expected a multi-file layout, got $files")
      pinToServeSearch(dir)
    }
  }

  test("score template is exchange-free (reuse-safety invariant)") {
    withWritten(rowsPerFile = 50L) { dir =>
      val lps = new LoadedPointServer(spark, dir)
      assert(lps.search("data stream").nonEmpty)
      // the pooled plans must hold no exchange: an exchange node would
      // serve the first query's data to every later query
      val hasExchange = lps.templatePlan("data stream").collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }.nonEmpty
      assert(!hasExchange, "score template must stay exchange-free")
    }
  }

  test("8 concurrent routed searches return each its own results") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    withWritten(rowsPerFile = 50L) { dir =>
      val lps = new LoadedPointServer(spark, dir)
      val queries = Seq("merge", "stream buffer", "pipeline",
        "data stream", "merge engine", "sorted", "buffer", "engine")
      val want = queries.map(q => q -> lps.search(q)).toMap
      (1 to 3).foreach { _ =>
        val got = Await.result(
          Future.sequence(queries.map(q => Future(q -> lps.search(q)))),
          120.seconds).toMap
        queries.foreach { q =>
          assert(got(q) == want(q), s"concurrent loaded search [$q] diverged")
        }
      }
    }
  }
}
