package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.TrecCorpus
import graft.text.TextPipeline

/** POSITIONAL inverted index: postings carry the token offsets of every
  * occurrence, so phrase and proximity queries of ANY length are
  * answered by position arithmetic on (at most) one postings list per
  * query term — the standard IR structure the reference approximates by
  * pre-building a separate word-k-gram index per k
  * (`TermKGramDocIndexer`, SURVEY §2.1 R3: each k needs its own MR
  * build; a 5-word phrase needs a k=5 index that was never built). One
  * positional index answers all of them.
  *
  * Positions are offsets into the PIPELINE token sequence (tag-tokenize
  * → Terrier stop → Porter2, the same `graft_tokenize` the ranking
  * index uses), so query analysis and the index can never disagree on
  * what "adjacent" means.
  *
  * Scale shape: build is the ranking index's shape plus one posexplode
  * — a single partial-agg shuffle on (term, docno); per-row state is
  * one doc's occurrence list of one term (bounded by doc length, never
  * corpus-sized). Queries filter postings by literal term sets (cached
  * batch stats / parquet row-group pruning apply), join the ≤m lists on
  * docno, and intersect shifted position arrays per doc — per-doc cost,
  * no corpus-wide stage after the pruned scans.
  */
object PositionalIndex {

  /** postings: (term, docno, positions ARRAY<INT> sorted asc, tf). */
  case class PIndex(postings: DataFrame, docMap: DataFrame, nDocs: Long)

  /** Build from a raw (docid, content) corpus. Same skeleton as
    * [[InvertedIndex.build]]: scalable two-phase numbering, size-guarded
    * docMap broadcast, term-sorted cached batches for literal-filter
    * pruning. */
  def build(spark: SparkSession, corpus: DataFrame): PIndex = {
    TextPipeline.register(spark)
    val dm = TrecCorpus.docnoMappingScalable(spark, corpus)
    val nDocs = dm.count()
    val mapParts = math.max(1L, math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      nDocs / 1000000L + 1)).toInt
    val docMap = dm.coalesce(mapParts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val joined =
      if (nDocs <= InvertedIndex.BroadcastDocs)
        corpus.join(broadcast(docMap), "docid")
      else corpus.join(docMap, "docid")
    val postings = joined
      .select(col("docno"), posexplode(expr("graft_tokenize(content)")))
      .groupBy(col("col").as("term"), col("docno"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).as("tf"))
      .sortWithinPartitions("term")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    PIndex(postings, docMap, nDocs)
  }

  /** Exact phrase search: documents containing the query terms at
    * CONSECUTIVE pipeline-token positions, with the phrase occurrence
    * count. Output (docid, phrase_tf) ordered by tf desc, docid asc.
    *
    * Plan: one pruned postings scan per distinct term, (m-1) equi-joins
    * on docno (each side query-bounded), then ONE array intersection of
    * the i-th list shifted left by i — a position p survives iff every
    * term appears at p+i, i.e. iff a phrase starts at p. The docid
    * resolution broadcasts the RESULT side into the corpus-sized
    * docMap, never the reverse ([[graft.query.QueryEngine]]'s rule). */
  def phrase(ix: PIndex, phraseText: String): DataFrame = {
    val terms = TextPipeline.processContent(phraseText)
    require(terms.nonEmpty, s"phrase analyzed to no terms: '$phraseText'")
    val spark = ix.postings.sparkSession
    val lists = terms.zipWithIndex.map { case (t, i) =>
      ix.postings.filter(col("term") === t)
        .select(col("docno"), col("positions").as(s"p$i"))
    }
    val joinedAll = lists.reduce((a, b) => a.join(b, "docno"))
    // a repeated query term produces two identical column names from
    // one list each — zipWithIndex aliases keep them distinct
    val phrasePos = (1 until terms.size).foldLeft[Column](col("p0")) {
      case (acc, i) =>
        array_intersect(acc, transform(col(s"p$i"), x => x - i))
    }
    val hits = joinedAll
      .select(col("docno"), size(phrasePos).cast("long").as("phrase_tf"))
      .filter(col("phrase_tf") > 0)
    ix.docMap.join(broadcast(hits), "docno")
      .select(col("docid"), col("phrase_tf"))
      .orderBy(col("phrase_tf").desc, col("docid"))
  }

  /** Proximity search: documents where `termA` and `termB` (pipeline-
    * analyzed single words) occur within `window` pipeline tokens of
    * each other, in either order. Output (docid) ordered.
    *
    * The per-doc predicate is an existential over the two (sorted,
    * doc-length-bounded) occurrence lists — per-row compute after the
    * same pruned-scan + docno-join shape as [[phrase]]. */
  def near(ix: PIndex, termA: String, termB: String,
           window: Int): DataFrame = {
    val ta = TextPipeline.processContent(termA)
    val tb = TextPipeline.processContent(termB)
    require(ta.size == 1 && tb.size == 1,
      s"near() takes single non-stopword terms, got '$termA'/'$termB'")
    val (a, b) = (ta.head, tb.head)
    val pa = ix.postings.filter(col("term") === a)
      .select(col("docno"), col("positions").as("pa"))
    val pb = ix.postings.filter(col("term") === b)
      .select(col("docno"), col("positions").as("pb"))
    val hits = pa.join(pb, "docno")
      .filter(exists(col("pa"), x =>
        exists(col("pb"), y => abs(x - y) <= window)))
      .select(col("docno"))
    ix.docMap.join(broadcast(hits), "docno")
      .select(col("docid"))
      .orderBy("docid")
  }
}
