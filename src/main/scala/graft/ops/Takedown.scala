package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The queryable artifacts one corpus feeds — a takedown request must
  * reach every one of them. Absent stores are skipped (a deployment
  * doesn't have to build all four). */
final case class TakedownStores(
    bm25: Option[String] = None,
    positional: Option[String] = None,
    inverted: Option[String] = None,
    vectors: Option[String] = None,
    chargram: Option[String] = None)

/** ONE removal request fanned across every index artifact built from
  * the corpus — the curation pipeline's takedown entry point. Each
  * store keeps its own deletion protocol (staged-marker commits,
  * crash recovery, live-view reads, stamped servers — see
  * [[graft.queries.IrSql.deleteBm25Docs]],
  * [[graft.index.PositionalIndex.deleteDocs]],
  * [[graft.index.InvertedIndex.deleteDocs]],
  * [[Similarity.deleteIvfVectors]],
  * [[graft.index.CharKGramIndex.deleteDocs]] — the last is an
  * immediate vocabulary recount, not a tombstone, so it has no
  * compact step); this object only translates the request into each
  * store's id space and applies them in a fixed order.
  *
  * Id spaces: the corpus contract is 1:1 `doc_id` == `vec_id` (one
  * embedding per document) and `docid` == `D%05d`-formatted `doc_id`
  * (the [[graft.corpus.TrecCorpus]] assignment) — so one `doc_id`
  * column drives all four artifacts.
  *
  * Crash mid-fan-out: some stores hold the tombstones, others don't
  * yet. Every per-store delete is IDEMPOTENT on the set (replaying
  * ids already tombstoned is a no-op), so the recovery story is
  * simply: replay the same request; stores that already committed
  * no-op, the rest catch up. There is deliberately NO cross-store
  * marker — the stores stay independently consistent (each serves
  * its own live view at every instant), and a half-applied takedown
  * is indistinguishable from one still in flight. */
object Takedown {

  /** Tombstone `docIds` (a `doc_id` column) in every present store.
    * `corpus` is the (docid, content) frame the chargram store was
    * built from — required when `stores.chargram` is set, because its
    * vocabulary recount tokenizes the DEAD docs (takedown-bounded;
    * [[graft.index.CharKGramIndex.docTermsOf]]'s tokenizer — stores
    * built from a different vocabulary generator call
    * `CharKGramIndex.deleteDocs` directly with their own doc-terms
    * frame). */
  def delete(spark: SparkSession, stores: TakedownStores,
             docIds: DataFrame,
             corpus: Option[DataFrame] = None): Unit = {
    val ids = docIds.select(col("doc_id").cast("long").as("doc_id"))
      .distinct()
    stores.bm25.foreach(d =>
      graft.queries.IrSql.deleteBm25Docs(spark, d, ids))
    val asDocid = ids
      .select(format_string("D%05d", col("doc_id")).as("docid"))
    stores.positional.foreach(d =>
      graft.index.PositionalIndex.deleteDocs(spark, d, asDocid))
    stores.inverted.foreach(d =>
      graft.index.InvertedIndex.deleteDocs(spark, d, asDocid))
    stores.vectors.foreach(d =>
      Similarity.deleteIvfVectors(spark, d,
        ids.select(col("doc_id").as("vec_id"))))
    stores.chargram.foreach { d =>
      val c = corpus.getOrElse(throw new IllegalArgumentException(
        "a chargram takedown needs the corpus frame (the vocabulary " +
          "recount tokenizes the dead docs)"))
      val dead = c.join(asDocid, Seq("docid"), "left_semi")
      graft.index.CharKGramIndex.deleteDocs(spark, d,
        graft.index.CharKGramIndex.docTermsOf(spark, dead))
    }
  }

  /** Physically reclaim every present store's tombstones (each
    * store's own crash-safe compaction). */
  def compact(spark: SparkSession, stores: TakedownStores): Unit = {
    stores.bm25.foreach(d =>
      graft.queries.IrSql.compactBm25Deletes(spark, d))
    stores.positional.foreach(d =>
      graft.index.PositionalIndex.compactDeletes(spark, d))
    stores.inverted.foreach(d =>
      graft.index.InvertedIndex.compactDeletes(spark, d))
    stores.vectors.foreach(d => {
      Similarity.compactIvfDeletes(spark, d); ()
    })
  }
}
