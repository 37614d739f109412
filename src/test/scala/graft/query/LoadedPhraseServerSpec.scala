package graft.query

import graft.SparkSpec
import graft.corpus.TrecCorpus
import graft.index.PositionalIndex

/** LoadedPhraseServer: routed-template parity with the cached-index
  * paths over pure parquet artifacts, loaded == cached for every
  * positional query family, and the exchange-free plan invariant. */
class LoadedPhraseServerSpec extends SparkSpec {

  private lazy val corpus =
    TrecCorpus.read(spark, resourcePath("/graft/sample-trec.xml"))
  private lazy val pix = PositionalIndex.build(spark, corpus)
  private lazy val dir = {
    val tmp = java.nio.file.Files.createTempDirectory("lps_ix").toString
    // small rowsPerFile → several files, so routing actually routes
    PositionalIndex.write(pix, tmp, rowsPerFile = 16)
    tmp
  }
  private lazy val server = new LoadedPhraseServer(spark, dir)

  private def cached(q: String): Seq[(String, Long)] =
    PositionalIndex.phrase(pix, q).limit(10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  test("routed template == cached fresh plan across a query sequence") {
    val phrases = Seq("merge engine", "sorted streams", "merge engine",
      "engine merges", "streams buffers")
    phrases.foreach { p =>
      assert(server.phrase(p) == cached(p), s"divergence on '$p'")
    }
    assert(phrases.exists(p => server.phrase(p).nonEmpty))
  }

  test("unknown and stopword-only terms answer empty without a job") {
    assert(server.phrase("zzzzunknown merge") == Seq.empty)
    assert(server.phrase("the") == Seq.empty)
  }

  test("repeated-term and other-length phrases match the cached paths") {
    assert(server.phrase("merging merges") == cached("merging merges"))
    // 3 words serve through a 3-slot routed template; 1 word
    // degenerates to the term's tf; interleaved with 2-word queries so
    // templates of different lengths can't cross-contaminate
    assert(server.phrase("merge engine merges") ==
      cached("merge engine merges"))
    assert(server.phrase("merge") == cached("merge"))
    assert(server.phrase("merge engine") == cached("merge engine"))
    // beyond MaxSlots → fresh-plan fallback over the loaded frames
    val long = Seq.fill(PhraseServer.MaxSlots + 1)("merge").mkString(" ")
    assert(server.phrase(long) == cached(long))
  }

  test("routed near/nearOrdered templates match the RANKED fresh plan") {
    // the three paths of the ranked serving contract agree: fresh
    // nearTopK over the cached index == the cached PhraseServer
    // template == this routed loaded template
    def freshNear(a: String, b: String, w: Int, ordered: Boolean) =
      PositionalIndex.nearTopK(pix, a, b, w, ordered).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    val cachedServer = new PhraseServer(pix)
    val cases = Seq(("merge", "engine", 3, false), ("merge", "engine", 1, true),
      ("sorted", "streams", 2, false), ("merge", "engine", 3, false))
    cases.foreach { case (a, b, w, o) =>
      val want = freshNear(a, b, w, o)
      assert(server.near(a, b, w, o) == want,
        s"loaded divergence on near($a, $b, $w, ordered=$o)")
      assert(cachedServer.near(a, b, w, o) == want,
        s"cached divergence on near($a, $b, $w, ordered=$o)")
    }
    assert(cases.exists { case (a, b, w, o) => server.near(a, b, w, o).nonEmpty })
    // unknown term routes nowhere → empty without a job
    assert(server.near("zzzzunknown", "merge", 3) == Seq.empty)
  }

  test("loaded == cached for phrase, near, nearOrdered and snippet") {
    val loaded = server.index
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().map(_.toSeq.toList).toSeq
    assert(rows(PositionalIndex.phrase(loaded, "merge engine")) ==
      rows(PositionalIndex.phrase(pix, "merge engine")))
    assert(rows(PositionalIndex.near(loaded, "merge", "engine", 3)) ==
      rows(PositionalIndex.near(pix, "merge", "engine", 3)))
    assert(rows(PositionalIndex.nearOrdered(loaded, "merge", "engine", 3)) ==
      rows(PositionalIndex.nearOrdered(pix, "merge", "engine", 3)))
    assert(rows(PositionalIndex.snippet(loaded, "merge engine")) ==
      rows(PositionalIndex.snippet(pix, "merge engine")))
  }

  test("the routed reused plan contains no exchange node") {
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: p.children.flatMap(walk)
    // prime a plan via a real query, then assert on its cached template
    assert(server.phrase("merge engine").nonEmpty)
    val terms = graft.text.TextPipeline.processContent("merge engine")
    val files = terms
      .flatMap(t => Routing.route(
        Routing.stringRanges(spark, s"$dir/pos_postings_ranges"), t))
      .distinct.sorted
    val nodes = walk(server.templatePlan(files))
    assert(nodes.nonEmpty)
    nodes.foreach { n =>
      assert(!n.getClass.getName.contains("Exchange"),
        s"exchange in template: ${n.getClass.getName}")
    }
  }
}
