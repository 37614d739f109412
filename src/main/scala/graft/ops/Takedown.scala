package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The queryable artifacts one corpus feeds — a takedown request must
  * reach every one of them. Absent stores are skipped (a deployment
  * doesn't have to build all six). */
final case class TakedownStores(
    bm25: Option[String] = None,
    positional: Option[String] = None,
    inverted: Option[String] = None,
    vectors: Option[String] = None,
    chargram: Option[String] = None,
    pq: Option[String] = None)

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
  * column drives every artifact.
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
    * frame).
    *
    * `lazyBm25`: a one-shot request wants the default EAGER BM25 leg
    * (stats exact at delete time, no deferred state left behind); a
    * high-rate takedown QUEUE should pass true — per-request cost
    * drops to the tombstone write + request-sized sidecar, and one
    * [[graft.queries.IrSql.compactBm25Deletes]] on the maintenance
    * cadence pays the whole stats bill amortized (the
    * q29_takedown_stream shape). Every OTHER store's delete is
    * already takedown-bounded per call (tombstone or
    * vocabulary-bounded recount), so only BM25 carries the knob. */
  /** All targeted store roots of a request — the dirs an epoch's
    * pointer markers land in. */
  private def rootsOf(stores: TakedownStores): Seq[String] =
    Seq(stores.bm25, stores.positional, stores.inverted,
      stores.vectors, stores.pq, stores.chargram).flatten

  def delete(spark: SparkSession, stores: TakedownStores,
             docIds: DataFrame,
             corpus: Option[DataFrame] = None,
             opId: Option[String] = None,
             ledgerDir: Option[String] = None,
             lazyBm25: Boolean = false,
             epochFile: Option[String] = None): Unit = {
    val ledger = Ledger.open(spark, ledgerDir, opId, stores)
    // optional read-coherence epoch ([[Epoch]]): live multi-store
    // consumers serve all-old until the single commit after the last
    // leg — never arm-mixed. Deliberately NOT try/finally: a crash
    // mid-fan-out must LEAVE the epoch open (old view) until the
    // request replays to completion.
    val conf = spark.sparkContext.hadoopConfiguration
    epochFile.foreach(Epoch.begin(conf, _, rootsOf(stores)))
    val ids = docIds.select(col("doc_id").cast("long").as("doc_id"))
      .distinct()
    stores.bm25.foreach { d =>
      if (lazyBm25) graft.queries.IrSql.deleteBm25DocsLazy(spark, d, ids)
      else graft.queries.IrSql.deleteBm25Docs(spark, d, ids)
      ledger.done("bm25")
    }
    val asDocid = ids
      .select(format_string("D%05d", col("doc_id")).as("docid"))
    stores.positional.foreach { d =>
      graft.index.PositionalIndex.deleteDocs(spark, d, asDocid)
      ledger.done("positional")
    }
    stores.inverted.foreach { d =>
      graft.index.InvertedIndex.deleteDocs(spark, d, asDocid)
      ledger.done("inverted")
    }
    stores.vectors.foreach { d =>
      Similarity.deleteIvfVectors(spark, d,
        ids.select(col("doc_id").as("vec_id")))
      ledger.done("vectors")
    }
    stores.pq.foreach { d =>
      Pq.deletePqVectors(spark, d,
        ids.select(col("doc_id").as("vec_id")))
      ledger.done("pq")
    }
    stores.chargram.foreach { d =>
      val c = corpus.getOrElse(throw new IllegalArgumentException(
        "a chargram takedown needs the corpus frame (the vocabulary " +
          "recount tokenizes the dead docs)"))
      val dead = c.join(asDocid, Seq("docid"), "left_semi")
      graft.index.CharKGramIndex.deleteDocs(spark, d,
        graft.index.CharKGramIndex.docTermsOf(spark, dead))
      ledger.done("chargram")
    }
    // all legs committed: one atomic delete flips every arm at once
    epochFile.foreach(Epoch.end(conf, _, rootsOf(stores)))
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
    stores.pq.foreach(d => { Pq.compactPqDeletes(spark, d); () })
  }

  /** ONE re-crawl request fanned across every present store — the
    * UPDATE twin of [[delete]]: each updated doc's old version leaves
    * and its new version serves, by each store's own update protocol
    * ([[graft.queries.IrSql.updateBm25Docs]] delete→reclaim→merge;
    * positional/inverted deleteDocs + store-level
    * [[graft.index.PositionalIndex.appendToStore]] — tombstone hides
    * the old row while the new serves at a fresh docno;
    * [[Similarity.updateIvfVectors]] append or re-coordinate leg;
    * [[graft.index.CharKGramIndex.updateDocs]] one-transaction
    * recount keyed by `opId`).
    *
    * `newDocs` is the updated docs' NEW (doc_id, text); `corpus` the
    * CURRENT (pre-update) (docid, content) frame — required for the
    * chargram leg, whose decrement tokenizes the OLD versions.
    * `newVectors` the re-embedded (vec_id, embedding) rows — required
    * when `stores.vectors` is set (an engine re-embeds what it
    * re-crawls). Docs absent from a store INSERT (upsert).
    *
    * Crash mid-fan-out: replay the SAME request (same opId, same
    * content). Every leg converges — the four row stores by
    * composition (delete of the already-updated doc + re-add of the
    * same content lands the identical final state), the chargram leg
    * by its op ledger. Stores stay independently consistent at every
    * instant, exactly as [[delete]]. */
  def update(spark: SparkSession, stores: TakedownStores,
             newDocs: DataFrame, opId: String,
             corpus: Option[DataFrame] = None,
             newVectors: Option[DataFrame] = None,
             ledgerDir: Option[String] = None,
             epochFile: Option[String] = None): Unit = {
    import graft.ops.Stage.StageOps
    val ledger = Ledger.open(spark, ledgerDir, Some(opId), stores)
    // read-coherence epoch, same contract as [[delete]]'s (opened
    // AFTER the pq pre-flight below would be wrong — a refused
    // request must leave no epoch behind — so it opens after it)
    // staged once: every row-store leg below re-reads these frames
    val neu = newDocs
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .stage()
    // PRE-FLIGHT before any store mutates: the coded store refuses
    // updates it cannot express (frozen coarse-seed ids; missing
    // quantizer sidecar), and that refusal must fail the WHOLE
    // request — otherwise the earlier legs apply, every replay
    // throws at the same point, and the fan-out is permanently
    // inconsistent (five stores serving the new content while the pq
    // store serves the stale vector)
    stores.pq.foreach(d =>
      Pq.requireUpdatable(spark, d,
        newVectors.getOrElse(throw new IllegalArgumentException(
          "a vector-store update needs the re-embedded (vec_id, " +
            "embedding) rows — an engine re-embeds what it re-crawls"))))
    val conf = spark.sparkContext.hadoopConfiguration
    epochFile.foreach(Epoch.begin(conf, _, rootsOf(stores)))
    stores.bm25.foreach { d =>
      graft.queries.IrSql.updateBm25Docs(spark, d, neu)
      ledger.done("bm25")
    }
    val newCorpus = neu
      .select(format_string("D%05d", col("doc_id")).as("docid"),
        col("text").as("content"))
      .stage()
    val asDocid = newCorpus.select(col("docid"))
    stores.positional.foreach { d =>
      graft.index.PositionalIndex.deleteDocs(spark, d, asDocid)
      graft.index.PositionalIndex.appendToStore(spark, d, newCorpus)
      ledger.done("positional")
    }
    stores.inverted.foreach { d =>
      graft.index.InvertedIndex.deleteDocs(spark, d, asDocid)
      // k derives from the store itself (a k=2 word-kgram store must
      // not silently receive unigram postings for the new versions)
      graft.index.InvertedIndex.appendToStore(spark, d, newCorpus,
        k = graft.index.InvertedIndex.storeK(spark, d))
      ledger.done("inverted")
    }
    def vecs(): DataFrame =
      newVectors.getOrElse(throw new IllegalArgumentException(
        "a vector-store update needs the re-embedded (vec_id, " +
          "embedding) rows — an engine re-embeds what it re-crawls"))
    stores.vectors.foreach { d =>
      Similarity.updateIvfVectors(spark, d, vecs())
      ledger.done("vectors")
    }
    stores.pq.foreach { d =>
      Pq.updatePqVectors(spark, d, vecs())
      ledger.done("pq")
    }
    stores.chargram.foreach { d =>
      val c = corpus.getOrElse(throw new IllegalArgumentException(
        "a chargram update needs the pre-update corpus frame (the " +
          "recount's decrement tokenizes the OLD versions)"))
      val old = c.join(asDocid, Seq("docid"), "left_semi")
      graft.index.CharKGramIndex.updateDocs(spark, d, opId,
        graft.index.CharKGramIndex.docTermsOf(spark, old),
        graft.index.CharKGramIndex.docTermsOf(spark, newCorpus))
      ledger.done("chargram")
    }
    epochFile.foreach(Epoch.end(conf, _, rootsOf(stores)))
  }

  // ---- cross-store op-status ledger --------------------------------

  /** The UNIFIED fan-out ledger: which stores has request `opId`
    * reached? Per-store protocols already make a replay converge, but
    * after a crash mid-fan-out nothing answered "which legs remain" —
    * this does, with two fs primitives: at op entry a `_stores` file
    * records the targeted legs; after each leg durably commits, a
    * `<store>.done` marker lands. [[opStatus]] reads them back;
    * replaying the op re-marks (idempotent). Pure driver-side
    * metadata — no Spark job, no new commit protocol (the markers
    * observe the stores' own protocols, they don't replace them). */
  private[graft] final class Ledger(
      fs: Option[org.apache.hadoop.fs.FileSystem],
      dir: Option[org.apache.hadoop.fs.Path]) {
    def done(store: String): Unit =
      for (f <- fs; d <- dir) {
        f.create(new org.apache.hadoop.fs.Path(d, s"$store.done"), true)
          .close()
      }
  }

  private[graft] object Ledger {
    /** Targeted legs of a request, in fan-out order. */
    def legsOf(stores: TakedownStores): Seq[String] =
      Seq("bm25" -> stores.bm25, "positional" -> stores.positional,
        "inverted" -> stores.inverted, "vectors" -> stores.vectors,
        "pq" -> stores.pq, "chargram" -> stores.chargram)
        .collect { case (n, Some(_)) => n }

    def open(spark: SparkSession, ledgerDir: Option[String],
             opId: Option[String],
             stores: TakedownStores): Ledger =
      (ledgerDir, opId) match {
        case (Some(ld), Some(op)) =>
          val d = new org.apache.hadoop.fs.Path(ld, op)
          val fs = d.getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          fs.mkdirs(d)
          val sf = new org.apache.hadoop.fs.Path(d, "_stores")
          // MERGE the currently-targeted legs into any prior list —
          // a replay of the same opId may widen the store set (e.g.
          // the chargram leg added on retry), and opStatus must name
          // every leg the op has EVER targeted, not the first
          // attempt's snapshot. Canonical fan-out order first, then
          // any names this build doesn't know (forward compat).
          val prior: Seq[String] =
            if (!fs.exists(sf)) Seq.empty
            else {
              val in = fs.open(sf)
              try new String(
                org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
                java.nio.charset.StandardCharsets.UTF_8)
                .split("\n").toSeq.filter(_.nonEmpty)
              finally in.close()
            }
          val all = (prior ++ legsOf(stores)).distinct
          val canonical = Seq("bm25", "positional", "inverted",
            "vectors", "pq", "chargram")
          val merged = canonical.filter(all.contains) ++
            all.filterNot(canonical.contains)
          if (merged != prior) {
            val tmp = new org.apache.hadoop.fs.Path(d, "_stores.tmp")
            val out = fs.create(tmp, true)
            try out.write(merged.mkString("\n")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally out.close()
            fs.delete(sf, false)
            require(fs.rename(tmp, sf),
              s"rename $tmp -> $sf failed mid-ledger-open")
          }
          new Ledger(Some(fs), Some(d))
        case _ => new Ledger(None, None)
      }
  }

  /** Per-leg status of `opId`: (store, "applied" | "pending"), in
    * fan-out order — after a crash mid-fan-out, the pending rows ARE
    * the replay's remaining work. Unknown opId → empty. */
  def opStatus(spark: SparkSession, ledgerDir: String,
               opId: String): Seq[(String, String)] = {
    val d = new org.apache.hadoop.fs.Path(ledgerDir, opId)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sf = new org.apache.hadoop.fs.Path(d, "_stores")
    if (!fs.exists(sf)) return Seq.empty
    val in = fs.open(sf)
    val legs =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").toSeq.filter(_.nonEmpty)
      finally in.close()
    legs.map { n =>
      n -> (if (fs.exists(new org.apache.hadoop.fs.Path(d, s"$n.done")))
        "applied" else "pending")
    }
  }

  /** All op ids in a ledger dir (newest last by name sort). */
  def listOps(spark: SparkSession, ledgerDir: String): Seq[String] = {
    val d = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) return Seq.empty
    fs.listStatus(d).filter(_.isDirectory)
      .map(_.getPath.getName).sorted.toSeq
  }
}
