package graft.query

import org.apache.spark.sql.SparkSession

/** PREPARED HYBRID RETRIEVAL — the production shape a real retrieval
  * deployment serves most often (lexical + vector with reciprocal-
  * rank fusion), fused from the two prepared servers that already
  * exist: [[Bm25Server.search]] (MaxScore-pruned exact BM25 ranking,
  * two exchange-free template jobs) and [[IvfServer.probeTemplate]]
  * (cell-routed exact-cosine top-k, one exchange-free template job).
  * The fusion itself is DRIVER arithmetic over the two k-bounded
  * lists — three prepared jobs total per query, no new Spark job and
  * no per-query Catalyst work anywhere.
  *
  * RRF arithmetic mirrors the batch entry
  * ([[graft.ops.Similarity.hybridRrf]], q37_hybrid_rrf) operation for
  * operation: ranks are positions in each arm's (score desc, id asc)
  * top-k output, a missing arm contributes 0, contributions are
  * `floor(1e6 / (rank + kRrf))` as a long (floor, not round — the
  * cross-engine rule the batch entry documents), fused rows order by
  * (rrf desc, doc_id). Served == batch is spec-pinned.
  *
  * The vector arm's `nProbe` defaults to the CAP (every cell — the
  * exact scan, which is what the batch entry's brute-force arm
  * computes, so the default is parity-exact). A large-corpus
  * deployment dials it down for the standard IVF recall trade; the
  * fused ranks then shift only where the vector arm's tail does.
  *
  * Staleness rides on the component servers: [[Bm25Server]]
  * revalidates its store stamp per search, [[IvfServer]] its cell
  * listings per borrow — a store mutation under a live hybrid server
  * is caught by the arm that reads the mutated artifact. */
final class HybridServer(val lexical: Bm25Server, val vector: IvfServer,
                         topK: Int = 10, kRrf: Int = 60) {

  /** Fused rows: (doc_id, lex_rank, sem_rank, rrf) by (rrf desc,
    * doc_id) — the q37_hybrid_rrf row shape. `excludeId` drops the
    * query's own vector from the semantic arm (the stored-query
    * convention); `nProbe` ≤ 0 or > cell count means the cap. */
  def search(terms: Seq[String], qv: Seq[Float], excludeId: Long = 0L,
             nProbe: Int = Int.MaxValue)
      : Seq[(Long, Option[Long], Option[Long], Long)] = {
    val np = math.min(math.max(nProbe, 1), vector.nCells)
    val lex = lexical.search(terms).map(_._1)
    val sem = vector.probeTemplate(qv, topK, excludeId, np).map(_._1)
    val lexRank = lex.zipWithIndex
      .map { case (d, i) => d -> (i + 1L) }.toMap
    val semRank = sem.zipWithIndex
      .map { case (d, i) => d -> (i + 1L) }.toMap
    def contrib(r: Option[Long]): Long =
      r.map(rk => math.floor(1000000.0 / (rk + kRrf)).toLong)
        .getOrElse(0L)
    (lexRank.keySet ++ semRank.keySet).toSeq
      .map(d => (d, lexRank.get(d), semRank.get(d),
        contrib(lexRank.get(d)) + contrib(semRank.get(d))))
      .sortBy { case (d, _, _, rrf) => (-rrf, d) }
      .take(topK)
  }
}

object HybridServer {
  /** The harness-shape constructor: both stores session-cached per
    * corpus content (the loaded-entry discipline). */
  def forCorpus(spark: SparkSession, dir: String,
                topK: Int = 10): HybridServer =
    new HybridServer(
      new Bm25Server(spark,
        graft.queries.IrSql.bm25StatsStore(spark, dir), topK),
      new IvfServer(spark,
        graft.ops.Similarity.cachedIvfStore(spark, dir)), topK)
}
