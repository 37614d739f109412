package graft.query

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Similarity

/** Pins [[HybridServer]] to the batch fusion entry: served ==
  * q37_hybrid_rrf row for row (ranks, null arms, rrf contributions),
  * repeated queries reuse the prepared plans, and a lexical-only /
  * vector-only doc's missing rank contributes zero exactly as the
  * batch full-outer join does. */
class HybridServerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("served hybrid == batch hybridRrf row for row (incl. one-armed " +
    "docs), and a repeat query returns the same fused list") {
    val qv = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val srv = HybridServer.forCorpus(spark, dir)
    val got = srv.search(graft.queries.IrSql.DefaultQueryTerms, qv)
    val want = Similarity.hybridRrf(spark, dir).collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3))
    }.toSeq
    assert(want.exists(w => w._2.isEmpty || w._3.isEmpty),
      "fixture fuses fully-overlapping arms — one-armed docs untested")
    assert(got == want, s"served=$got\nbatch=$want")
    assert(srv.search(graft.queries.IrSql.DefaultQueryTerms, qv) == want,
      "repeat query diverged (template reuse)")
  }
}
