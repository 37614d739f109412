package graft.query

import graft.SparkSpec
import graft.corpus.TrecCorpus
import graft.index.PositionalIndex

/** PhraseServer: prepared-template parity with the fresh-plan phrase
  * path, stale-state safety across a query sequence, and the
  * exchange-free plan invariant. */
class PhraseServerSpec extends SparkSpec {

  private lazy val corpus =
    TrecCorpus.read(spark, resourcePath("/graft/sample-trec.xml"))
  private lazy val pix = PositionalIndex.build(spark, corpus)
  private lazy val server = new PhraseServer(pix)

  private def fresh(q: String): Seq[(String, Long)] =
    PositionalIndex.phrase(pix, q).limit(10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  test("template == fresh plan across a query sequence (no stale state)") {
    val phrases = Seq("merge engine", "sorted streams", "merge engine",
      "engine merges", "streams buffers")
    phrases.foreach { p =>
      assert(server.phrase(p) == fresh(p), s"divergence on '$p'")
    }
    // at least one of the sequence must actually hit
    assert(phrases.exists(p => server.phrase(p).nonEmpty))
  }

  test("repeated-term pair counts immediate self-adjacency only") {
    // "merging merges" analyzes to (merg, merg): doc 1's token stream
    // has merg at 0,2,5 — no immediate repeat — while any doc with
    // consecutive identical stems would count
    assert(server.phrase("merging merges") == fresh("merging merges"))
  }

  test("non-2-word phrases fall back to the fresh plan, same results") {
    assert(server.phrase("merge engine merges") ==
      fresh("merge engine merges"))
    assert(server.phrase("the") == Seq.empty) // stopword-only
  }

  test("the reused plan contains no exchange node") {
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: p.children.flatMap(walk)
    val nodes = walk(server.templatePlan)
    assert(nodes.nonEmpty)
    nodes.foreach { n =>
      assert(!n.getClass.getName.contains("Exchange"),
        s"exchange in template: ${n.getClass.getName}")
    }
  }
}
