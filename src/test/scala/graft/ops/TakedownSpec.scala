package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.index.{CharKGramIndex, InvertedIndex, PositionalIndex}
import graft.queries.{IrEngine, IrSql}
import graft.query.QueryEngine

/** The unified takedown orchestrator: one `doc_id` request reaches
  * every artifact (BM25 store, positional index, inverted index, IVF
  * vector store) with the SAME effect as each store's own delete API
  * (the per-store oracle entries carry the absolute answers; this
  * pins the fan-out wiring — id-space translation above all), and the
  * whole request is replay-idempotent and compactable in one call. */
class TakedownSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def buildAll(): TakedownStores = {
    val corpus = IrEngine.corpus(spark, dir)
    val bm = tmp("graft_td_bm25"); IrSql.writeBm25Stats(spark, dir, bm)
    val pos = tmp("graft_td_pos")
    PositionalIndex.write(PositionalIndex.build(spark, corpus), pos)
    val inv = tmp("graft_td_inv")
    InvertedIndex.write(InvertedIndex.build(spark, corpus, k = 1), inv)
    val ivf = tmp("graft_td_ivf")
    Similarity.writeIvfLayout(spark, dir, ivf)
    val cg = tmp("graft_td_cg")
    CharKGramIndex.write(CharKGramIndex.build(spark, corpus), cg)
    CharKGramIndex.writeVocabDf(spark, cg,
      CharKGramIndex.docTermsOf(spark, corpus))
    val pq = tmp("graft_td_pq")
    Pq.writeIvfPqStore(spark, dir, pq)
    TakedownStores(bm25 = Some(bm), positional = Some(pos),
      inverted = Some(inv), vectors = Some(ivf), chargram = Some(cg),
      pq = Some(pq))
  }

  private def surfaces(s: TakedownStores)
      : (Seq[(Long, Double)], Seq[String], Seq[String], Seq[Long],
         Seq[String], Seq[Long]) = {
    val bm25 = IrSql.q10Bm25PrunedAt(spark, s.bm25.get,
        IrSql.ExpandedQueryTerms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val phrase = PositionalIndex.phrase(
        PositionalIndex.load(spark, s.positional.get), IrEngine.PhraseQuery)
      .select("docid").collect().map(_.getString(0)).toSeq
    val search = QueryEngine.serveSearch(
        InvertedIndex.load(spark, s.inverted.get), "merge stream")
      .select("docid").collect().map(_.getString(0)).toSeq
    val ann = Similarity.probeIvfStore(spark, s.vectors.get, k = 10)
      .collect().map(_.getLong(0)).toSeq
    val wild = QueryEngine.wildcardTerms(
        CharKGramIndex.load(spark, s.chargram.get), "s*m")
      .collect().map(_.getString(0)).toSeq
    val pq = Pq.probeIvfPqStore(spark, dir, s.pq.get, k = 10)
      .collect().map(_.getLong(0)).toSeq
    (bm25, phrase, search, ann, wild, pq)
  }

  test("one takedown call == each store's own delete API (id-space " +
    "translation pinned); replay is a no-op; one compact call " +
    "reclaims every store without changing an answer") {
    val viaOrch = buildAll()
    val viaStores = buildAll()
    val corpus = IrEngine.corpus(spark, dir)
    val ids = IrSql.deletedDocIds(spark, dir) // the fixed mod-13 set
    Takedown.delete(spark, viaOrch, ids, corpus = Some(corpus))
    // the same request through each store's own API
    IrSql.deleteBm25Docs(spark, viaStores.bm25.get, ids)
    val asDocid = ids
      .select(format_string("D%05d", col("doc_id")).as("docid"))
    PositionalIndex.deleteDocs(spark, viaStores.positional.get, asDocid)
    InvertedIndex.deleteDocs(spark, viaStores.inverted.get, asDocid)
    Similarity.deleteIvfVectors(spark, viaStores.vectors.get,
      ids.select(col("doc_id").as("vec_id")))
    Pq.deletePqVectors(spark, viaStores.pq.get,
      ids.select(col("doc_id").as("vec_id")))
    CharKGramIndex.deleteDocs(spark, viaStores.chargram.get,
      CharKGramIndex.docTermsOf(spark,
        corpus.join(asDocid, Seq("docid"), "left_semi")))
    val a = surfaces(viaOrch)
    assert(a == surfaces(viaStores),
      "orchestrated takedown diverged from the per-store APIs")
    // the deleted docs are gone from every surface
    val dead = ids.collect().map(_.getLong(0)).toSet
    val deadDocids = dead.map(i => f"D$i%05d")
    assert(a._1.forall { case (id, _) => !dead.contains(id) })
    assert(a._2.forall(d => !deadDocids.contains(d)))
    assert(a._3.forall(d => !deadDocids.contains(d)))
    assert(a._4.forall(v => !dead.contains(v)))
    assert(a._6.forall(v => !dead.contains(v)),
      "a deleted doc survived in the coded-store probe")
    // replay: every store no-ops
    Takedown.delete(spark, viaOrch, ids, corpus = Some(corpus))
    assert(surfaces(viaOrch) == a, "replaying the takedown changed answers")
    // one compact call reclaims all four; answers unchanged
    Takedown.compact(spark, viaOrch)
    assert(surfaces(viaOrch) == a, "compaction changed an answer")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def gone(p: String) =
      !fs.exists(new org.apache.hadoop.fs.Path(p))
    assert(gone(s"${viaOrch.bm25.get}/tombstones"),
      "bm25 tombstones survived compact")
    // positional/inverted reclaim leaves only dead-doc-free rows;
    // the vector store may legitimately retain dead SEEDS
    val pend = Similarity.ivfTombstones(spark, viaOrch.vectors.get)
      .map(_.collect().map(_.getLong(0)).toSet).getOrElse(Set.empty)
    val seeds = Similarity.storeSeeds(spark, viaOrch.vectors.get)
      .map(_._1).toSet
    assert(pend.subsetOf(seeds),
      "non-seed vector tombstones survived compact")
  }

  test("absent stores are skipped: a partial deployment takes the " +
    "takedown only where it has artifacts") {
    val bm = tmp("graft_td_only_bm25")
    IrSql.writeBm25Stats(spark, dir, bm)
    val stores = TakedownStores(bm25 = Some(bm))
    Takedown.delete(spark, stores, IrSql.deletedDocIds(spark, dir))
    val dead = IrSql.deletedDocIds(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val ranked = IrSql.q10Bm25PrunedAt(spark, bm,
        IrSql.ExpandedQueryTerms, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(ranked.forall(!dead.contains(_)))
    Takedown.compact(spark, stores) // must not touch absent stores
  }

  test("one update call reaches every store: the new content serves " +
    "on all five surfaces; replaying the same request (same op id, " +
    "same content) converges") {
    val stores = buildAll()
    val corpus = IrEngine.corpus(spark, dir)
    // re-crawl two docs above the vector seed range (the append leg)
    val updIds = Seq(20L, 33L)
    import spark.implicits._
    val newDocs = updIds.map(i =>
        (i, s"zzqrecrawl agg hash window stqzam doc $i"))
      .toDF("doc_id", "text")
    val newVecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id").isin(updIds: _*))
      .select(col("vec_id"),
        transform(col("embedding"), v => -v).as("embedding"))
    Takedown.update(spark, stores, newDocs, "td-upd-1",
      corpus = Some(corpus), newVectors = Some(newVecs))
    val a = surfaces(stores)
    val docids = updIds.map(i => f"D$i%05d").toSet
    // bm25: the re-crawl-only term returns exactly the updated set
    val hits = IrSql.q10Bm25PrunedAt(spark, stores.bm25.get,
        Seq("zzqrecrawl"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(hits == updIds.toSet, s"bm25 new-term hits: $hits")
    // positional: the new content contains the q36 phrase
    assert(docids.subsetOf(a._2.toSet),
      "updated docs missing from the phrase answer")
    // inverted: a search for the new term finds exactly both docs
    val s2 = QueryEngine.serveSearch(
        InvertedIndex.load(spark, stores.inverted.get), "zzqrecrawl")
      .select("docid").collect().map(_.getString(0)).toSet
    assert(s2 == docids, s"inverted new-term hits: $s2")
    // vectors: the stored rows are the new embeddings, no tombstones
    assert(Similarity.ivfTombstones(spark, stores.vectors.get).isEmpty)
    // coded store: updated rows re-encoded (cells/codes present,
    // exactly one row per updated id, no tombstones)
    assert(Similarity.ivfTombstones(spark, stores.pq.get).isEmpty)
    val pqRows = spark.read.parquet(stores.pq.get)
      .filter(col("vec_id").isin(updIds: _*))
      .groupBy(col("vec_id")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pqRows == updIds.map(_ -> 1L).toMap,
      s"coded store updated-row multiplicity: $pqRows")
    val stored = Similarity.liveIvfStore(spark, stores.vectors.get)
      .filter(col("vec_id").isin(updIds: _*))
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    val want = newVecs.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(stored == want, "vector store rows != the new embeddings")
    // chargram: the born vocabulary term is wildcard-reachable
    val w = QueryEngine.wildcardTerms(
        CharKGramIndex.load(spark, stores.chargram.get), "zzqrec*")
      .collect().map(_.getString(0)).toSeq
    assert(w == Seq("zzqrecrawl"), s"chargram born term: $w")
    // replay the whole request: every surface identical
    Takedown.update(spark, stores, newDocs, "td-upd-1",
      corpus = Some(corpus), newVectors = Some(newVecs))
    assert(surfaces(stores) == a, "update replay changed answers")
  }

  test("the inverted update leg derives the store's word-k: a k=2 " +
    "store receives BIGRAM postings for the new versions, never " +
    "unigrams") {
    val corpus = IrEngine.corpus(spark, dir)
    val inv = tmp("graft_td_inv2")
    InvertedIndex.write(
      InvertedIndex.build(spark, corpus, k = 2), inv)
    import spark.implicits._
    val newDocs = Seq((20L, "zzqone zzqtwo zzqone zzqtwo"))
      .toDF("doc_id", "text")
    Takedown.update(spark, TakedownStores(inverted = Some(inv)),
      newDocs, "td-k2")
    val ix = InvertedIndex.load(spark, inv)
    val newNo = ix.docMap.filter(col("docid") === "D00020")
      .select("docno").head().getLong(0)
    val kgrams = ix.postings.filter(col("docno") === newNo)
      .select("kgram").collect().map(_.getString(0)).toSeq
    assert(kgrams.nonEmpty, "no postings for the re-ingested doc")
    assert(kgrams.forall(_.split(" ", -1).length == 2),
      s"non-bigram postings appended into a k=2 store: $kgrams")
    assert(kgrams.contains("zzqone zzqtwo"),
      s"expected bigram missing: $kgrams")
  }

  test("the fan-out op ledger names the remaining legs after a " +
    "crash mid-request, and shows convergence after the replay") {
    val corpus = IrEngine.corpus(spark, dir)
    val bm = tmp("graft_tdl_bm25"); IrSql.writeBm25Stats(spark, dir, bm)
    val pos = tmp("graft_tdl_pos")
    PositionalIndex.write(PositionalIndex.build(spark, corpus), pos)
    val inv = tmp("graft_tdl_inv")
    InvertedIndex.write(InvertedIndex.build(spark, corpus, k = 1), inv)
    // the chargram leg dies (no corpus frame supplied) AFTER the
    // first three legs committed — the mid-fan-out crash shape
    val cg = tmp("graft_tdl_cg")
    CharKGramIndex.write(CharKGramIndex.build(spark, corpus), cg)
    CharKGramIndex.writeVocabDf(spark, cg,
      CharKGramIndex.docTermsOf(spark, corpus))
    val stores = TakedownStores(bm25 = Some(bm), positional = Some(pos),
      inverted = Some(inv), chargram = Some(cg))
    val ledger = tmp("graft_tdl_ledger")
    val ids = IrSql.deletedDocIds(spark, dir)
    intercept[IllegalArgumentException] {
      Takedown.delete(spark, stores, ids, corpus = None,
        opId = Some("op-7"), ledgerDir = Some(ledger))
    }
    val mid = Takedown.opStatus(spark, ledger, "op-7")
    assert(mid == Seq("bm25" -> "applied", "positional" -> "applied",
      "inverted" -> "applied", "chargram" -> "pending"),
      s"mid-crash ledger wrong: $mid")
    assert(Takedown.listOps(spark, ledger) == Seq("op-7"))
    // supply what the failed leg needed, REPLAY the same request —
    // the committed legs no-op, the pending one applies, converged
    Takedown.delete(spark, stores, ids, corpus = Some(corpus),
      opId = Some("op-7"), ledgerDir = Some(ledger))
    val post = Takedown.opStatus(spark, ledger, "op-7")
    assert(post.forall(_._2 == "applied"), s"post-replay: $post")
    // the late leg really applied: a term living only in the deleted
    // docs left the vocabulary (recount semantics, pinned elsewhere —
    // here just prove the leg ran: the store's df sidecar moved)
    assert(Takedown.opStatus(spark, ledger, "nope").isEmpty)
  }

  test("update PRE-FLIGHT: a frozen-coarse-seed vec_id fails the " +
    "WHOLE request before ANY store mutates (everywhere-or-nowhere)") {
    val bm = tmp("graft_tdp_bm25"); IrSql.writeBm25Stats(spark, dir, bm)
    val ivf = tmp("graft_tdp_ivf"); Similarity.writeIvfLayout(spark, dir, ivf)
    val pq = tmp("graft_tdp_pq"); Pq.writeIvfPqStore(spark, dir, pq)
    val stores = TakedownStores(bm25 = Some(bm), vectors = Some(ivf),
      pq = Some(pq))
    val preBm25 = IrSql.q10Bm25PrunedAt(spark, bm,
      IrSql.ExpandedQueryTerms, 10).collect().toSeq
    val preAnn = Similarity.probeIvfStore(spark, ivf, k = 10)
      .collect().toSeq
    import spark.implicits._
    // vec_id 0 is a frozen coarse seed of the PQ store
    val newDocs = Seq((0L, "zzqpreflight text")).toDF("doc_id", "text")
    val newVecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 0L)
      .select(col("vec_id"), col("embedding"))
    intercept[IllegalArgumentException] {
      Takedown.update(spark, stores, newDocs, "td-preflight",
        newVectors = Some(newVecs))
    }
    // NOTHING mutated — not even the legs that fan out before pq
    assert(IrSql.q10Bm25PrunedAt(spark, bm,
      IrSql.ExpandedQueryTerms, 10).collect().toSeq == preBm25,
      "the bm25 leg mutated despite the pq refusal")
    assert(Similarity.probeIvfStore(spark, ivf, k = 10)
      .collect().toSeq == preAnn,
      "the ivf leg mutated despite the pq refusal")
  }

  test("chargram opId reuse with DIFFERENT content fails loudly " +
    "(the ledger binds a content hash); a true replay still no-ops") {
    val corpus = IrEngine.corpus(spark, dir)
    val cg = tmp("graft_tdc_cg")
    CharKGramIndex.write(CharKGramIndex.build(spark, corpus), cg)
    CharKGramIndex.writeVocabDf(spark, cg,
      CharKGramIndex.docTermsOf(spark, corpus))
    import spark.implicits._
    val old = CharKGramIndex.docTermsOf(spark,
      corpus.filter(col("docid") === "D00003"))
    val neu = CharKGramIndex.docTermsOf(spark,
      Seq(("D00003", "zzqnew content words")).toDF("docid", "content"))
    CharKGramIndex.updateDocs(spark, cg, "op-reuse", old, neu)
    val post = QueryEngine.wildcardTerms(
      CharKGramIndex.load(spark, cg), "zzq*")
      .collect().map(_.getString(0)).toSeq
    // true replay: same opId, same content → no-op, store unchanged
    CharKGramIndex.updateDocs(spark, cg, "op-reuse", old, neu)
    assert(QueryEngine.wildcardTerms(CharKGramIndex.load(spark, cg),
      "zzq*").collect().map(_.getString(0)).toSeq == post)
    // reuse with different content → loud failure, not a silent skip
    val neu2 = CharKGramIndex.docTermsOf(spark,
      Seq(("D00003", "zzqother body")).toDF("docid", "content"))
    val e = intercept[IllegalStateException] {
      CharKGramIndex.updateDocs(spark, cg, "op-reuse", old, neu2)
    }
    assert(e.getMessage.contains("DIFFERENT content"))
  }
}
