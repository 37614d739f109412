package graft.index

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.corpus.TrecCorpus
import graft.text.PorterStemmer

class InvertedIndexSpec extends SparkSpec {

  lazy val corpus = TrecCorpus.read(spark, resourcePath("/graft/sample-trec.xml"))
  lazy val ix = InvertedIndex.build(spark, corpus, k = 1)

  private def docno(docid: String): Long =
    ix.docMap.filter(col("docid") === docid).head().getLong(1)

  test("nDocs is a real scalar, not a magic row") {
    assert(ix.nDocs == 20)
    assert(ix.postings.filter(col("kgram") === " ").count() == 0)
  }

  test("tf counts term occurrences after stem/stop") {
    // FT911-0017: 'merge' x5 → stem 'merg' tf=5
    assert(ix.postings
      .filter(col("kgram") === "merg" &&
        col("docno") === docno("FT911-0017"))
      .head().getLong(2) == 5)
  }

  test("df is the postings-list length (intended semantics)") {
    val df = ix.termStats.filter(col("kgram") === "merg").head().getLong(1)
    val n = ix.postings.filter(col("kgram") === "merg").count()
    assert(df == n && df == 4) // docs 1, 10, 17, 20
    // singleton term
    val xyl = PorterStemmer.stem("xylophone")
    assert(ix.termStats.filter(col("kgram") === xyl).head().getLong(1) == 1)
  }

  test("stopwords and >100-byte tokens never reach the index") {
    assert(ix.termStats.filter(col("kgram") === "the").count() == 0)
    assert(ix.termStats.filter(length(col("kgram")) > 100).count() == 0)
  }

  test("k=2 windows skip docs shorter than k") {
    import spark.implicits._
    // raw docs keep their DOCNO tokens (the reference indexes the full
    // block, SURVEY §2.1), so craft a truly 1-token doc inline
    val tiny = Seq(("d1", "hello"), ("d2", "hello world"))
      .toDF("docid", "content")
    val ix2 = InvertedIndex.build(spark, tiny, k = 2)
    assert(ix2.postings.count() == 1) // only d2 produces a bigram
    assert(ix2.postings.head().getString(0) == "hello world")
  }

  test("nested form sorts postings desc-tf, asc-docno") {
    val row = InvertedIndex.nested(ix)
      .filter(col("kgram") === "merg").head()
    val postings = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("postings").toSeq
    val tfs = postings.map(_.getLong(1))
    assert(tfs == tfs.sortBy(-_))
    assert(postings.head.getLong(1) == 5) // doc 17 first
  }

  test("salted nested form equals the direct one") {
    val a = InvertedIndex.nested(ix)
    val b = InvertedIndex.nested(ix, salt = 8)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("write/load round-trip preserves the index") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ix").toString
    InvertedIndex.write(ix, dir)
    val back = InvertedIndex.load(spark, dir)
    assert(back.nDocs == ix.nDocs)
    assert(back.postings.count() == ix.postings.count())
    assert(back.termStats.count() == ix.termStats.count())
  }

  test("bucketed tables join on the term key without any exchange") {
    InvertedIndex.writeBucketed(ix, "ixspec", buckets = 4)
    val p = spark.table("ixspec_postings")
    val s = spark.table("ixspec_term_stats")
    // force a merge join (small tables would broadcast) to show the
    // bucketed co-location: sort-merge with NO exchange on either side
    val joined = p.hint("merge").join(s, "kgram")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(joined.count() == ix.postings.count())
  }

  test("char-k-gram index: boundary-marked grams, sorted distinct terms") {
    val cg = CharKGramIndex.build(spark, corpus, k = 3)
    val row = cg.filter(col("gram") === "$me").head()
    val terms = row.getAs[scala.collection.Seq[String]]("terms").toSeq
    assert(terms.contains("merge"))
    assert(terms == terms.sorted && terms.distinct == terms)
    // persistence round-trip
    val dir = java.nio.file.Files.createTempDirectory("graft_cg").toString
    CharKGramIndex.write(cg, dir)
    assert(CharKGramIndex.load(spark, dir).count() == cg.count())
  }

  test("incremental merge equals a from-scratch rebuild (semantically)") {
    val docids = corpus.select("docid").orderBy("docid")
      .collect().map(_.getString(0))
    val (oldIds, newIds) = docids.splitAt(14)
    val oldIx = InvertedIndex.build(spark,
      corpus.filter(col("docid").isin(oldIds: _*)), k = 1)
    val merged = InvertedIndex.merge(spark, oldIx,
      corpus.filter(col("docid").isin(newIds: _*)), k = 1)
    // docnos differ between the two builds, so compare docid-resolved
    // postings and per-term df
    def resolved(ix: InvertedIndex.Index) =
      ix.postings.join(ix.docMap, "docno")
        .select("kgram", "docid", "tf")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
    assert(merged.nDocs == ix.nDocs)
    assert(resolved(merged) == resolved(ix))
    assert(merged.termStats.collect().map(r => (r.getString(0), r.getLong(1)))
      .toSet == ix.termStats.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet)
    // existing docnos are untouched; new docnos continue after the max
    val oldMax = oldIx.docMap.agg(max(col("docno"))).head().getLong(0)
    assert(merged.docMap.filter(col("docid").isin(oldIds: _*))
      .agg(max(col("docno"))).head().getLong(0) == oldMax)
    assert(merged.docMap.agg(max(col("docno"))).head().getLong(0)
      == docids.length)
  }
}
