package graft.index

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.corpus.TrecCorpus
import graft.query.QueryEngine

/** Pins the chargram table's incremental merge: merge == full rebuild
  * content-identically, terms new to the delta become wildcard-
  * REACHABLE (the gap the delta path closes), and untouched grams'
  * rows are carried through unchanged. */
class CharKGramIndexSpec extends SparkSpec {

  lazy val corpus =
    TrecCorpus.read(spark, resourcePath("/graft/sample-trec.xml"))

  test("merge == full rebuild, delta-only terms become wildcard-" +
    "reachable, untouched grams carry through unchanged") {
    val ids = corpus.select("docid").orderBy("docid").collect()
      .map(_.getString(0))
    val half = ids(ids.length / 2)
    val base = corpus.filter(col("docid") < half)
    val delta = corpus.filter(col("docid") >= half)
    val baseCg = CharKGramIndex.build(spark, base)
    val merged = CharKGramIndex.merge(spark, baseCg, delta)
    val rebuilt = CharKGramIndex.build(spark, corpus)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(merged) == rows(rebuilt), "merge != full rebuild")
    // a vocabulary term present ONLY in the delta half: unreachable
    // through the base table, reachable through the merged one
    val baseVocab = baseCg
      .select(explode(col("terms")).as("t")).distinct()
      .collect().map(_.getString(0)).toSet
    val deltaOnly = rebuilt
      .select(explode(col("terms")).as("t")).distinct()
      .collect().map(_.getString(0))
      .filterNot(baseVocab)
      .filter(_.length >= 4)
    assert(deltaOnly.nonEmpty, "fixture halves share the whole vocab")
    val probe = deltaOnly.minBy(t => (t.length, t))
    val pattern = probe.take(2) + "*" + probe.takeRight(2)
    assert(!QueryEngine.wildcardTerms(baseCg, pattern)
        .collect().map(_.getString(0)).contains(probe),
      s"'$probe' should be unknown to the base table")
    assert(QueryEngine.wildcardTerms(merged, pattern)
        .collect().map(_.getString(0)).contains(probe),
      s"'$probe' unreachable through the merged table")
    // untouched grams: rows identical to the base table's
    val touched = CharKGramIndex.grams(
        delta.select(explode(expr("graft_tokenize_raw(content)"))
          .as("term")).distinct(), k = 3)
      .select("gram").distinct()
      .collect().map(_.getString(0)).toSet
    val mergedUntouched = merged
      .filter(!col("gram").isin(touched.toSeq: _*))
    val baseUntouched = baseCg
      .filter(!col("gram").isin(touched.toSeq: _*))
    assert(rows(mergedUntouched) == rows(baseUntouched),
      "an untouched gram's row changed under merge")
  }
}
