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

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3))
    }.toSeq

  test("served cap arm (nProbe=0) == batch hybridRrf row for row " +
    "(incl. one-armed docs), and a repeat query returns the same list") {
    val qv = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val srv = HybridServer.forCorpus(spark, dir)
    val got = srv.search(graft.queries.IrSql.DefaultQueryTerms, qv,
      nProbe = 0)
    val want = rows(Similarity.hybridRrf(spark, dir))
    assert(want.exists(w => w._2.isEmpty || w._3.isEmpty),
      "fixture fuses fully-overlapping arms — one-armed docs untested")
    assert(got == want, s"served=$got\nbatch=$want")
    assert(srv.search(graft.queries.IrSql.DefaultQueryTerms, qv,
      nProbe = 0) == want, "repeat query diverged (template reuse)")
  }

  test("served DEFAULT (routed auto) == batch hybridRrfAuto row for " +
    "row — the production arm is the spec-pinned twin, not the cap") {
    val qv = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val srv = HybridServer.forCorpus(spark, dir)
    val got = srv.search(graft.queries.IrSql.DefaultQueryTerms, qv)
    val want = rows(Similarity.hybridRrfAuto(spark, dir))
    assert(got == want, s"served=$got\nbatch=$want")
    assert(srv.search(graft.queries.IrSql.DefaultQueryTerms, qv) == want,
      "repeat auto query diverged (template + count-cache reuse)")
  }

  test("served FILTERED hybrid == batch hybridRrfFiltered row for row " +
    "(both arms under the metadata keep set, adaptive ladder included)") {
    val qv = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val srv = HybridServer.forCorpus(spark, dir)
    val keep = new java.util.HashSet[java.lang.Long]()
    Similarity.filterIds(spark, dir).collect()
      .foreach(r => keep.add(r.getLong(0)))
    val got = srv.searchFiltered(
      graft.queries.IrSql.DefaultQueryTerms, qv, keep)
    val want = rows(Similarity.hybridRrfFiltered(spark, dir))
    assert(got == want, s"served=$got\nbatch=$want")
    assert(srv.searchFiltered(
      graft.queries.IrSql.DefaultQueryTerms, qv, keep) == want,
      "repeat filtered query diverged (template reuse)")
  }

  test("8 concurrent hybrid searches each return their own fused " +
    "list (both arms' pools, no shared-ref race)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val srv = HybridServer.forCorpus(spark, dir)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    def vec(id: Long): Seq[Float] = e
      .filter(org.apache.spark.sql.functions.col("vec_id") === id)
      .select("embedding").head().getSeq[Float](0)
    val qs: Seq[(Seq[String], Seq[Float], Long)] = Seq(
      (graft.queries.IrSql.DefaultQueryTerms, vec(0), 0L),
      (Seq("merge"), vec(1), 1L),
      (Seq("stream", "data"), vec(2), 2L),
      (Seq("spark", "query"), vec(3), 3L),
      (graft.queries.IrSql.DefaultQueryTerms, vec(4), 4L),
      (Seq("merge", "data"), vec(5), 5L),
      (Seq("stream"), vec(6), 6L),
      (Seq("query", "merge"), vec(7), 7L))
    val want = qs.map { case (t, v, ex) => srv.search(t, v, ex) }
    (1 to 3).foreach { _ =>
      val got = Await.result(
        Future.sequence(qs.map { case (t, v, ex) =>
          Future(srv.search(t, v, ex)) }), 120.seconds)
      qs.indices.foreach(i =>
        assert(got(i) == want(i), s"concurrent hybrid [$i] diverged"))
    }
  }
}
