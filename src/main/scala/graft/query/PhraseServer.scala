package graft.query

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.unsafe.types.UTF8String
import graft.index.PositionalIndex
import graft.index.PositionalIndex.PIndex

/** Prepared-statement serving for TWO-WORD phrase queries over a cached
  * positional index — [[PointServer]]'s zero-per-query-Catalyst pattern
  * applied to [[PositionalIndex.phrase]].
  *
  * The fresh-plan phrase path joins one pruned postings scan per term;
  * a join needs co-location, and co-location under a reused physical
  * plan means an exchange — the stale-result trap the PointServer doc
  * describes. The template dodges the join entirely: ONE scan filtered
  * to the phrase's term pair (driver-updated [[RefSetContains]]),
  * coalesced to a single partition, then a per-docno aggregate picks
  * each slot's position list CONDITIONALLY (`first(when(term == slot
  * ref, positions))`) — both lists of a doc meet in the same aggregate
  * row without any exchange. The phrase count is the shifted-array
  * intersection of the two slots; docs missing either term drop on the
  * non-null filter. Two words is the dominant interactive phrase shape;
  * other lengths fall back to the fresh-plan
  * [[PositionalIndex.phrase]] (same results, full parallelism).
  *
  * A repeated pair ("merge merge") works: both slot refs hold the same
  * term, both slots pick the same list, and the shifted intersection
  * counts exactly the immediate self-adjacencies.
  *
  * Docid resolution follows PointServer: a fresh tiny literal `isin`
  * plan per query (≤ topK rows — planning is microseconds and literals
  * keep stat pruning; an opaque templated filter here would be
  * O(corpus) per query).
  *
  * Index-size scaling limit (cached-only, like [[PointServer]]): the
  * opaque ref predicate defeats batch-stat pruning, so each query reads
  * the full CACHED positional postings single-threaded — and positional
  * rows carry whole position arrays, so this per-query O(index) term
  * grows faster with corpus size than PointServer's over the ranked
  * postings. Fine at the benchmarked scales; for a big written index,
  * serve through [[LoadedPhraseServer]], whose driver-side zone-map
  * routing bounds each query's scan to the 1-2 files holding its terms.
  */
final class PhraseServer(pix: PIndex, topK: Int = 10) {

  private def newRef() =
    new AtomicReference[java.util.HashSet[UTF8String]](new java.util.HashSet)

  private val bothRef = newRef()
  private val slotARef = newRef()
  private val slotBRef = newRef()

  private val template: DataFrame = {
    def in(ref: AtomicReference[java.util.HashSet[UTF8String]]) =
      Bridge.column(RefSetContains(Bridge.expression(col("term")), ref))
    pix.postings.filter(in(bothRef)).coalesce(1)
      .groupBy(col("docno"))
      .agg(
        first(when(in(slotARef), col("positions")), ignoreNulls = true)
          .as("p0"),
        first(when(in(slotBRef), col("positions")), ignoreNulls = true)
          .as("p1"))
      .filter(col("p0").isNotNull && col("p1").isNotNull)
      .select(col("docno"),
        size(array_intersect(col("p0"),
          transform(col("p1"), x => x - 1))).cast("long").as("phrase_tf"))
      .filter(col("phrase_tf") > 0)
      .orderBy(col("phrase_tf").desc, col("docno"))
      .limit(topK)
  }

  // plan + codegen once, at construction
  template.queryExecution.executedPlan

  /** Exposed for the exchange-free plan-walk assertion (see
    * [[PointServer.templatePlan]]). */
  private[graft] def templatePlan: org.apache.spark.sql.execution.SparkPlan =
    template.queryExecution.executedPlan

  /** Top-k (docid, phrase_tf), tf desc then docid asc — the same
    * ordering contract as [[PositionalIndex.phrase]] limited to topK.
    * `synchronized` for the same set-then-collect race PointServer
    * documents. */
  def phrase(phraseText: String): Seq[(String, Long)] = synchronized {
    val terms = graft.text.TextPipeline.processContent(phraseText)
    if (terms.isEmpty) return Seq.empty
    if (terms.size != 2)
      return PositionalIndex.phrase(pix, phraseText)
        .limit(topK).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    def set(ts: String*) = {
      val s = new java.util.HashSet[UTF8String]()
      ts.foreach(t => s.add(UTF8String.fromString(t)))
      s
    }
    bothRef.set(set(terms: _*))
    slotARef.set(set(terms.head))
    slotBRef.set(set(terms(1)))
    val top = template.collect().map(r => (r.getLong(0), r.getLong(1)))
    if (top.isEmpty) return Seq.empty
    val ids = pix.docMap
      .filter(col("docno").isin(top.map(_._1).toSeq: _*))
      .select(col("docno"), col("docid"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    top.flatMap { case (docno, tf) => ids.get(docno).map((_, tf)) }
      .sortBy { case (docid, tf) => (-tf, docid) }.toSeq
  }
}
