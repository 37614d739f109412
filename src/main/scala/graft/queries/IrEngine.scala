package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.index.{CharKGramIndex, InvertedIndex, PositionalIndex}
import graft.query.QueryEngine

/** Driver-contract queries exercising the faithful IR engine (tag-aware
  * tokenizer + Terrier stopwords + Porter2 stemmer + index builders +
  * query engine). No DuckDB oracle — the stemmer isn't SQL-expressible
  * — so the driver records rows-only checks; correctness is pinned by
  * the conformance specs against the reference implementation
  * (PorterStemmerSpec / TextPipelineSpec / engine specs).
  */
object IrEngine {

  /** Synthetic documents table viewed as a (docid, content) corpus. */
  def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(format_string("D%05d", col("doc_id")).as("docid"),
        col("text").as("content"))

  /** Deterministic staging dir per (SF dir, kind, SOURCE fingerprint),
    * built at most once: repeated invocations (bench warmup +
    * median-of-3 loops) must NOT accumulate full staged corpus copies
    * in /tmp (ADVICE r3). `write` populates the dir; a marker file
    * flags completion so a partially-written dir is rebuilt.
    *
    * The key is a SHA-256 of the absolute path PLUS the caller's
    * source fingerprint ([[sourceStamp]]): a 32-bit path hash could
    * collide two datasets onto one staging dir, and a path-only key
    * served STALE staged copies after the dataset at that path was
    * regenerated (markers persist across JVMs in tmpdir). A changed
    * source re-stages under a new key; the superseded dir stays until
    * tmp cleanup, which bounded staging sizes make acceptable. */
  private def stagedOnce(dir: String, kind: String, fingerprint: String)
                        (write: java.nio.file.Path => Unit): String = {
    import java.nio.file.{Files, Paths}
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest((Paths.get(dir).toAbsolutePath.toString + "|" + fingerprint)
        .getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    val root = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_stage_${kind}_$key")
    val marker = root.resolve("_GRAFT_STAGED")
    this.synchronized {
      if (!Files.exists(marker)) {
        write(root)
        Files.createFile(marker)
      }
    }
    root.toString
  }

  /** Source-data fingerprint for [[stagedOnce]]: (name, size, mtime)
    * of the table's parquet file, or of every part file when the table
    * is a directory (ScaleGen output). */
  private def sourceStamp(dir: String, table: String): String = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    def one(p: java.nio.file.Path): String =
      s"${p.getFileName}:${Files.size(p)}:" +
        s"${Files.getLastModifiedTime(p).toMillis}"
    val p = Paths.get(dir, s"$table.parquet")
    if (Files.isDirectory(p)) {
      val ls = Files.list(p)
      try ls.iterator().asScala.toSeq.sortBy(_.toString)
        .filter(_.toString.endsWith(".parquet")).map(one).mkString(",")
      finally ls.close()
    } else one(p)
  }

  /** Stream shuffle partitions derived from the staged inputs' size
    * (guide §2.2 — see [[graft.streaming.StreamShuffle]]): every
    * stream run wraps in this so its stateful exchanges and
    * foreachBatch jobs stop paying a core-count-sized task fan over
    * trigger-sized data. */
  private def withStreamShuffle[T](spark: SparkSession,
                                   paths: String*)(body: => T): T =
    graft.streaming.StreamShuffle
      .withInputSizedShuffle(spark, paths.toSeq)(body)

  /** Faithful-pipeline token stream: (docid, pos, term). */
  def q26PipelineTerms(spark: SparkSession, dir: String): DataFrame = {
    graft.text.TextPipeline.register(spark)
    corpus(spark, dir)
      .select(col("docid"),
        posexplode(expr("graft_tokenize(content)")).as(Seq("pos", "term")))
      .orderBy("docid", "pos")
  }

  /** Stemmed inverted index in nested presentation form. */
  def q26StemmedIndex(spark: SparkSession, dir: String): DataFrame = {
    val ix = InvertedIndex.build(spark, corpus(spark, dir), k = 1)
    InvertedIndex.nested(ix)
      .select(col("kgram"), col("df"),
        array_join(transform(col("postings"),
          x => concat_ws(":", x.getField("docno"), x.getField("tf"))), " ")
          .as("postings"))
      .orderBy("kgram")
  }

  /** Incremental index maintenance end-to-end: build the index on the
    * first half of the corpus (by docid order), then MERGE the second
    * half in as a delta — docnos continue densely after the base,
    * postings union, term stats re-sum, no re-tokenization of the base
    * — and present the result in the q26 nested form. The oracle is
    * the SAME golden parquet as q26_ir_index: an incrementally
    * maintained index must be indistinguishable from a from-scratch
    * build over the full corpus. */
  def q26MergedIndex(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    // split at the median-rank docid VALUE (docnos are assigned in
    // docid sort order, so `docid <= boundary` ⟺ `docno <= half`):
    // one row to the driver, then two narrow filters — no join of the
    // corpus against its own numbering map
    val dm = graft.corpus.TrecCorpus.docnoMappingScalable(spark, c)
    // count from the numbering's checkpoint, not a second corpus parse
    // (same fix InvertedIndex.build got in r4)
    val half = dm.count() / 2
    // half == 0 (corpus of 0-1 docs) degenerates to an empty base +
    // full delta, which merge's empty-base bootstrap handles
    val boundary =
      if (half == 0) ""
      else dm.filter(col("docno") === half).select("docid").head().getString(0)
    val first = c.filter(col("docid") <= boundary)
    val second = c.filter(col("docid") > boundary)
    val merged = InvertedIndex.merge(spark,
      InvertedIndex.build(spark, first, k = 1), second, k = 1)
    InvertedIndex.nested(merged)
      .select(col("kgram"), col("df"),
        array_join(transform(col("postings"),
          x => concat_ws(":", x.getField("docno"), x.getField("tf"))), " ")
          .as("postings"))
      .orderBy("kgram")
  }

  /** STREAMING index maintenance end-to-end: the corpus arrives as a
    * file STREAM (three docid-range chunk files, one micro-batch each
    * via `maxFilesPerTrigger=1`, ordered by file mtime), and
    * `foreachBatch` builds the index on the first batch then MERGEs
    * every later batch in — the standing ingest loop of a live search
    * index (crawl lands → index advances, no re-tokenization of what's
    * already indexed). Chunk boundaries are docno-range cuts, so the
    * incrementally-grown index must be INDISTINGUISHABLE from the
    * from-scratch build: the oracle is the SAME golden parquet as
    * q26_ir_index, like q26_ir_merged. */
  def q26StreamedIndex(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val c = corpus(spark, dir)
    val staged = stagedOnce(dir, "ixstream",
        sourceStamp(dir, "documents")) { root =>
      val dm = graft.corpus.TrecCorpus.docnoMappingScalable(spark, c)
      val n = dm.count()
      // docid values at the docno third-points: range filters on docid
      // then cut exactly at docno boundaries (docnos follow docid order)
      def cut(at: Long): String =
        if (at <= 0) ""
        else dm.filter(col("docno") === at).select("docid").head().getString(0)
      val (b1, b2) = (cut(n / 3), cut(2 * n / 3))
      val chunks = Seq(
        c.filter(col("docid") <= b1),
        c.filter(col("docid") > b1 && col("docid") <= b2),
        c.filter(col("docid") > b2))
      Files.createDirectories(root)
      chunks.zipWithIndex.foreach { case (chunk, i) =>
        val tmp = root.resolve(s"_build$i")
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val ls = Files.list(tmp)
        val part =
          try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
          finally ls.close()
        val dst = root.resolve(s"chunk-$i.parquet")
        // REPLACE_EXISTING: a run killed mid-staging leaves no marker,
        // so the next run re-enters this closure and must overwrite
        Files.move(part, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        // the file source orders batches by modification time: make the
        // chunk order explicit and deterministic
        dst.toFile.setLastModified(1000000000000L + i * 60000L)
        // clean the scratch dir so only the chunk files remain
        val wk = Files.walk(tmp)
        try wk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { Files.deleteIfExists(p); () })
        finally wk.close()
      }
    }
    var ix: InvertedIndex.Index = null
    // the micro-batch engine runs against a CLONED session state
    // snapshotted at start(): the tokenizer UDFs must be registered in
    // the outer session BEFORE the clone is taken, and batch-side plans
    // must resolve against the batch's own (cloned) session
    graft.text.TextPipeline.register(spark)
    withStreamShuffle(spark, staged) {
      val q = spark.readStream
        .schema("docid STRING, content STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val bs = batch.sparkSession
          if (ix == null) ix = InvertedIndex.build(bs, batch, k = 1)
          else {
            // DEFERRED merge (r17, the union-view the r16 round left
            // unattempted): the lazy chain appends each batch's build
            // to the cumulative union WITHOUT materializing it — the
            // eager form re-cached the whole cumulative postings per
            // batch (O(cumulative) per trigger, quadratic over the
            // stream), where the only per-batch actions a merge needs
            // are the delta numbering and the base docno max. The
            // cumulative index materializes ONCE, at the first read
            // (here the final nested presentation) — total work one
            // tokenize pass over everything ingested, like the
            // from-scratch build it must equal. A STANDING ingest
            // (unbounded batches) would cut the chain every K batches
            // (eager merge + unpersist — the r16 footprint
            // discipline) so neither the plan depth nor the pinned
            // delta caches grow without bound; the bounded replay
            // here is exactly one such window.
            ix = InvertedIndex.merge(bs, ix, batch, k = 1)
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    InvertedIndex.nested(ix)
      .select(col("kgram"), col("df"),
        array_join(transform(col("postings"),
          x => concat_ws(":", x.getField("docno"), x.getField("tf"))), " ")
          .as("postings"))
      .orderBy("kgram")
  }

  /** tf-idf search through the full engine (build + rank). */
  def q26Search(spark: SparkSession, dir: String): DataFrame = {
    val ix = InvertedIndex.build(spark, corpus(spark, dir), k = 1)
    QueryEngine.search(ix, "merge stream")
  }

  private val invDeletedCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The q26 ranked search answered from a WRITTEN inverted index
    * with the fixed takedown set TOMBSTONED
    * ([[InvertedIndex.deleteDocs]] — pending, not compacted).
    * Projected to (docid, score): surviving docs keep their original
    * docnos while a rebuild renumbers, so the docno column is the one
    * legitimate difference. Checked against a golden from the engine
    * run on the corpus WITHOUT the docs — tombstoned tf-idf retrieval
    * == rebuild-without-docs (df, nDocs both delete-exact). */
  def q26SearchDeleted(spark: SparkSession, dir: String): DataFrame = {
    val store = invDeletedCache.computeIfAbsent(
      s"$dir|invdel|${sourceStamp(dir, "documents")}", _ => {
        val o = graft.TempDirs.scratch("graft_inv_del")
        InvertedIndex.write(
          InvertedIndex.build(spark, corpus(spark, dir), k = 1), o)
        val delIds = Tables.load(spark, dir, "documents")
          .filter(pmod(col("doc_id"), lit(IrSql.DeletedDocsMod)) ===
            lit(IrSql.DeletedDocsRem))
          .select(format_string("D%05d", col("doc_id")).as("docid"))
        InvertedIndex.deleteDocs(spark, o, delIds)
        o
      })
    QueryEngine.serveSearch(InvertedIndex.load(spark, store),
        "merge stream")
      .select(col("docid"), col("score"))
      .orderBy(col("score").desc, col("docid"))
  }

  /** Golden generator for q26_ir_search_deleted: the engine run on
    * the reduced corpus (docnos projected away — a rebuild
    * renumbers). */
  private[graft] def q26SearchDeletedBrute(spark: SparkSession,
                                           dir: String): DataFrame = {
    val ix = InvertedIndex.build(spark,
      corpusMinusDeleted(spark, dir), k = 1)
    QueryEngine.search(ix, "merge stream")
      .select(col("docid"), col("score"))
      .orderBy(col("score").desc, col("docid"))
  }

  /** RM3 pseudo-relevance-feedback search through the full engine
    * (build → initial tf-idf pass → relevance-model expansion →
    * weighted re-ranking; [[graft.query.QueryEngine.rm3Search]]).
    * Golden-parquet oracle like the rest of the q26 family (the
    * stemming pipeline is not SQL-expressible); the λ=1 ≡ plain-search
    * identity and the feedback bounds are spec-pinned. */
  def q26Rm3(spark: SparkSession, dir: String): DataFrame = {
    val ix = InvertedIndex.build(spark, corpus(spark, dir), k = 1)
    QueryEngine.rm3Search(ix, "merge stream")
  }

  /** Wildcard expansion via the char-3-gram index. */
  def q26Wildcard(spark: SparkSession, dir: String): DataFrame = {
    val cg = CharKGramIndex.build(spark, corpus(spark, dir), k = 3)
    QueryEngine.wildcardTerms(cg, "st*am")
  }

  /** [[q26Wildcard]] against a chargram table maintained by the
    * INCREMENTAL delta path ([[CharKGramIndex.merge]]) instead of a
    * full rebuild — the q26_ir_merged pattern applied to the wildcard
    * artifact: build on the first half (median docid split, same
    * boundary discipline as [[q26MergedIndex]]), merge the second
    * half's vocabulary in, answer the same pattern. Checked against
    * q26_ir_wildcard's oracle: the driver gate itself proves the
    * delta-maintained table serves identical wildcard results. */
  def q26MergedWildcard(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val dm = graft.corpus.TrecCorpus.docnoMappingScalable(spark, c)
    val half = dm.count() / 2
    val boundary =
      if (half == 0) ""
      else dm.filter(col("docno") === half).select("docid")
        .head().getString(0)
    val merged = CharKGramIndex.merge(spark,
      CharKGramIndex.build(spark, c.filter(col("docid") <= boundary)),
      c.filter(col("docid") > boundary))
    QueryEngine.wildcardTerms(merged, "st*am")
  }

  /** Index-aware WILDCARD predicate planning end-to-end: a SQL query
    * with `graft_matches_term_like(content, 'st*am')` over a view with
    * a registered inverted + char-gram index pair. [[graft.plans
    * .TermRewriteRule]] turns the predicate into a char-gram-driven
    * candidate SEMI JOIN (gram intersection + verify + stem + postings
    * probe) and keeps the predicate as the exact recheck on candidates.
    * The rule is applied explicitly so the query also rewrites in a
    * session built without `GraftExtensions` (idempotent: the recheck
    * marker stops a second application) — its GOLDEN oracle is
    * generated from the UN-rewritten fallback path
    * ([[q35Fallback]]), so the driver compare proves
    * rewritten == fallback at the verify SF. */
  def q35RewriteWildcard(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val c = corpus(spark, dir)
    val ix = InvertedIndex.build(spark, c, k = 1)
    val cg = CharKGramIndex.build(spark, c, k = 3)
    val view = "graft_docs_wild"
    c.join(ix.docMap, "docid")
      .select(col("docno"), col("docid"), col("content"))
      .createOrReplaceTempView(view)
    graft.plans.IndexCatalog.register(view, ix, "content", Some(cg))
    val df = spark.sql(s"SELECT docid FROM $view WHERE " +
      "graft_matches_term_like(content, 'st*am') ORDER BY docid")
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      graft.plans.TermRewriteRule()(df.queryExecution.analyzed))
  }

  /** Phrase / proximity parameters shared by the serving queries and
    * their brute-force golden generators. The phrase is mid-frequency
    * in the synthetic corpus (df=8 at sf0.01) so the result is
    * non-trivial without being the whole corpus. */
  private[graft] val PhraseQuery = "agg hash window"
  private[graft] val NearTerms = ("spark", "hash")
  private[graft] val NearWindow = 3

  /** Exact phrase search through the POSITIONAL index
    * ([[graft.index.PositionalIndex]]): postings pruned per term,
    * docno joins, one shifted-array intersection per doc. Golden comes
    * from [[q36PhraseBrute]] — a windowed full scan with no positional
    * machinery — so the driver compare proves index == scan. */
  def q36Phrase(spark: SparkSession, dir: String): DataFrame = {
    val ix = PositionalIndex.build(spark, corpus(spark, dir))
    PositionalIndex.phrase(ix, PhraseQuery)
  }

  /** The q36 phrase answered by a positional index maintained through
    * the INCREMENTAL delta path ([[PositionalIndex.merge]]) — the
    * q26_ir_merged pattern applied to the phrase artifact (and the
    * q26_ir_merged_wildcard twin for positions): build on the first
    * half, merge the second half, answer the same phrase. Checked
    * against q36_phrase's golden oracle, so the driver gate proves
    * the merged positional index serves identical phrase results. */
  def q36PhraseMerged(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val dm = graft.corpus.TrecCorpus.docnoMappingScalable(spark, c)
    val half = dm.count() / 2
    val boundary =
      if (half == 0) ""
      else dm.filter(col("docno") === half).select("docid")
        .head().getString(0)
    val merged = PositionalIndex.merge(spark,
      PositionalIndex.build(spark, c.filter(col("docid") <= boundary)),
      c.filter(col("docid") > boundary))
    PositionalIndex.phrase(merged, PhraseQuery)
  }

  /** The q36 phrase served through the COMPRESSED durable layout:
    * build → varint-gap write → schema-branched load → phrase. Checked
    * against the same brute-scan golden as q36_phrase, so the driver
    * compare proves the gap codec round-trips exactly. */
  def q36PhraseCompressed(spark: SparkSession, dir: String): DataFrame = {
    val ix = PositionalIndex.build(spark, corpus(spark, dir))
    val tmp = graft.TempDirs.scratch("graft_posz")
    PositionalIndex.write(ix, tmp, compressed = true)
    PositionalIndex.phrase(PositionalIndex.load(spark, tmp), PhraseQuery)
  }

  /** The same phrase evaluated with NO positional index: every
    * m-token window of the pipeline token sequence, string-compared to
    * the phrase — the independent path the golden is generated from. */
  private[graft] def q36PhraseBrute(spark: SparkSession,
                                    dir: String): DataFrame =
    phraseBruteOver(spark, corpus(spark, dir))

  private def phraseBruteOver(spark: SparkSession,
                              c: DataFrame): DataFrame = {
    graft.text.TextPipeline.register(spark)
    val terms = graft.text.TextPipeline.processContent(PhraseQuery)
    val toks = c.select(col("docid"),
      expr("graft_tokenize(content)").as("toks"))
    toks.select(col("docid"),
        explode(InvertedIndex.kgramWindows(col("toks"), terms.size))
          .as("w"))
      .filter(col("w") === terms.mkString(" "))
      .groupBy(col("docid"))
      .agg(count(lit(1)).as("phrase_tf"))
      .orderBy(col("phrase_tf").desc, col("docid"))
  }

  /** The deletion entries' corpus view: the fixed takedown set
    * ([[graft.queries.IrSql.DeletedDocsMod]]) removed. */
  private def corpusMinusDeleted(spark: SparkSession,
                                 dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(IrSql.DeletedDocsMod)) =!=
        lit(IrSql.DeletedDocsRem))
      .select(format_string("D%05d", col("doc_id")).as("docid"),
        col("text").as("content"))

  /** The golden generator for q36_phrase_deleted: the index-free
    * brute phrase count over the corpus WITHOUT the deleted docs —
    * so the entry proves tombstoned phrase retrieval ==
    * rebuild-without-docs. */
  private[graft] def q36PhraseDeletedBrute(spark: SparkSession,
                                           dir: String): DataFrame =
    phraseBruteOver(spark, corpusMinusDeleted(spark, dir))

  /** The re-crawl set's NEW versions as a (docid, content) frame —
    * the ONE fixture definition ([[graft.queries.IrSql
    * .updatedDocsNew]]) mapped through the corpus projection, so the
    * q36/q26 entries, their brute goldens and the q10 oracle can
    * never drift on which docs update or what they gain. */
  private def updatedDocsNewCorpus(spark: SparkSession,
                                   dir: String): DataFrame =
    IrSql.updatedDocsNew(spark, dir)
      .select(format_string("D%05d", col("doc_id")).as("docid"),
        col("text").as("content"))

  /** The update entries' corpus view: the corpus with the re-crawl
    * set's rows replaced by [[updatedDocsNewCorpus]]. */
  private def corpusUpdated(spark: SparkSession,
                            dir: String): DataFrame = {
    val upd = updatedDocsNewCorpus(spark, dir)
    corpus(spark, dir)
      .join(upd.select(col("docid")), Seq("docid"), "left_anti")
      .unionByName(upd)
  }

  private val posUpdatedCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The q36 phrase over a positional store with the fixed re-crawl
    * set UPDATED IN PLACE — [[PositionalIndex.deleteDocs]] of the old
    * versions, then the store-level delta append
    * ([[PositionalIndex.appendToStore]]) of the new ones; tombstones
    * stay pending, so the entry exercises the live-view read over a
    * store holding BOTH versions physically. The suffix contains one
    * more occurrence of the phrase, so every updated doc must appear
    * (or move) in the answer. Golden from [[q36PhraseUpdatedBrute]]:
    * update-in-place == rebuild-over-updated-corpus. */
  def q36PhraseUpdated(spark: SparkSession, dir: String): DataFrame = {
    val store = posUpdatedCache.computeIfAbsent(
      s"$dir|posupd|${sourceStamp(dir, "documents")}", _ => {
        val o = graft.TempDirs.scratch("graft_pos_upd")
        PositionalIndex.write(
          PositionalIndex.build(spark, corpus(spark, dir)), o)
        val upd = updatedDocsNewCorpus(spark, dir)
        PositionalIndex.deleteDocs(spark, o, upd.select(col("docid")))
        PositionalIndex.appendToStore(spark, o, upd)
        o
      })
    PositionalIndex.phrase(
      PositionalIndex.load(spark, store), PhraseQuery)
  }

  /** Golden generator for q36_phrase_updated: the index-free brute
    * phrase count over the UPDATED corpus. */
  private[graft] def q36PhraseUpdatedBrute(spark: SparkSession,
                                           dir: String): DataFrame =
    phraseBruteOver(spark, corpusUpdated(spark, dir))

  private val invUpdatedCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Ranked search over a ranked-index store with the re-crawl set
    * UPDATED IN PLACE (delete + store-level append, tombstones
    * pending). The query terms are two the suffix CONTAINS, so the
    * updated docs' tf and the terms' df both shift — the driver gate
    * proves the appended store's term_stats maintenance equals a
    * rebuild, not just its postings. Golden from
    * [[q26SearchUpdatedBrute]]. */
  def q26SearchUpdated(spark: SparkSession, dir: String): DataFrame = {
    val store = invUpdatedCache.computeIfAbsent(
      s"$dir|invupd|${sourceStamp(dir, "documents")}", _ => {
        val o = graft.TempDirs.scratch("graft_inv_upd")
        InvertedIndex.write(
          InvertedIndex.build(spark, corpus(spark, dir), k = 1), o)
        val upd = updatedDocsNewCorpus(spark, dir)
        InvertedIndex.deleteDocs(spark, o, upd.select(col("docid")))
        InvertedIndex.appendToStore(spark, o, upd, k = 1)
        o
      })
    QueryEngine.serveSearch(InvertedIndex.load(spark, store),
        "hash window")
      .select(col("docid"), col("score"))
      .orderBy(col("score").desc, col("docid"))
  }

  /** Golden generator for q26_ir_search_updated: the engine run on
    * the updated corpus (docnos projected away — a rebuild
    * renumbers). */
  private[graft] def q26SearchUpdatedBrute(spark: SparkSession,
                                           dir: String): DataFrame = {
    val ix = InvertedIndex.build(spark,
      corpusUpdated(spark, dir), k = 1)
    QueryEngine.search(ix, "hash window")
      .select(col("docid"), col("score"))
      .orderBy(col("score").desc, col("docid"))
  }

  private val posDeletedCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The q36 phrase answered from a WRITTEN positional store with the
    * fixed takedown set TOMBSTONED ([[PositionalIndex.deleteDocs]] —
    * pending, not compacted, so the entry exercises the query-time
    * anti-join view). Checked against the brute-over-live-corpus
    * golden: tombstoned phrase retrieval == rebuild-without-docs. */
  def q36PhraseDeleted(spark: SparkSession, dir: String): DataFrame = {
    val store = posDeletedCache.computeIfAbsent(
      s"$dir|posdel|${sourceStamp(dir, "documents")}", _ => {
        val o = graft.TempDirs.scratch("graft_pos_del")
        PositionalIndex.write(
          PositionalIndex.build(spark, corpus(spark, dir)), o)
        val delIds = Tables.load(spark, dir, "documents")
          .filter(pmod(col("doc_id"), lit(IrSql.DeletedDocsMod)) ===
            lit(IrSql.DeletedDocsRem))
          .select(format_string("D%05d", col("doc_id")).as("docid"))
        PositionalIndex.deleteDocs(spark, o, delIds)
        o
      })
    PositionalIndex.phrase(
      PositionalIndex.load(spark, store), PhraseQuery)
  }

  /** Wildcard-phrase parameters: `s*` expands to six surface terms of
    * the synthetic vocabulary (scan/slow/small/sort/spark/stream), so
    * the expansion is genuinely disjunctive; the literal second slot
    * keeps the intersection non-trivial. */
  private[graft] val PhraseWildcardQuery = "s* window"

  /** Wildcard phrase through the positional index composed with the R4
    * char-gram expansion ([[PositionalIndex.phraseWildcard]]). Golden
    * from [[q36PhraseWildcardBrute]] — regex over the raw vocabulary +
    * a windowed scan, no positional and no char-gram index — so the
    * driver compare proves the composed index path == the index-free
    * evaluation (the q35/q36 pattern). */
  def q36PhraseWildcard(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val ix = PositionalIndex.build(spark, c)
    val cg = CharKGramIndex.build(spark, c, k = 3)
    PositionalIndex.phraseWildcard(ix, cg, PhraseWildcardQuery)
  }

  /** The same wildcard phrase with NO index of either kind: slot 1's
    * term set is the anchored regex over the distinct raw vocabulary
    * (re-analyzed to stems — the same two-step the engine's expansion
    * performs, computed independently), slot 2 the pipeline literal;
    * every adjacent token pair of the pipeline stream is then tested
    * directly. */
  private[graft] def q36PhraseWildcardBrute(spark: SparkSession,
                                            dir: String): DataFrame = {
    graft.text.TextPipeline.register(spark)
    val c = corpus(spark, dir)
    val Array(wildPat, litWord) = PhraseWildcardQuery.split(" ")
    val wildSet = c
      .select(explode(expr("graft_tokenize_raw(content)")).as("t"))
      .distinct()
      .filter(col("t").rlike(graft.query.QueryEngine.wildcardRegex(
        wildPat.toLowerCase(java.util.Locale.ROOT))))
      .select(explode(expr("graft_tokenize(t)")).as("t")).distinct()
      .collect().map(_.getString(0)).toSet
    val litTerm = graft.text.TextPipeline.processContent(litWord).head
    c.select(col("docid"), expr("graft_tokenize(content)").as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= 2) // sequence(1, 0) would count DOWN
      .select(col("docid"),
        size(filter(sequence(lit(1), col("n") - 1), p =>
          element_at(col("toks"), p).isInCollection(wildSet) &&
            element_at(col("toks"), p + 1) === litTerm))
          .cast("long").as("phrase_tf"))
      .filter(col("phrase_tf") > 0)
      .orderBy(col("phrase_tf").desc, col("docid"))
  }

  /** Proximity search (terms within [[NearWindow]] pipeline tokens,
    * either order) through the positional index; golden from
    * [[q36NearBrute]]'s row-level position join — no arrays, no index. */
  def q36Near(spark: SparkSession, dir: String): DataFrame = {
    val ix = PositionalIndex.build(spark, corpus(spark, dir))
    PositionalIndex.near(ix, NearTerms._1, NearTerms._2, NearWindow)
  }

  /** Ordered proximity ([[NearTerms]]._1 strictly before ._2 within
    * [[NearWindow]]) through the positional index; golden from
    * [[q36NearOrderedBrute]]. */
  def q36NearOrdered(spark: SparkSession, dir: String): DataFrame = {
    val ix = PositionalIndex.build(spark, corpus(spark, dir))
    PositionalIndex.nearOrdered(ix, NearTerms._1, NearTerms._2, NearWindow)
  }

  /** Independent ordered-proximity evaluation (row-level position
    * join, forward gaps only). */
  private[graft] def q36NearOrderedBrute(spark: SparkSession,
                                         dir: String): DataFrame = {
    graft.text.TextPipeline.register(spark)
    val a = graft.text.TextPipeline.processContent(NearTerms._1).head
    val b = graft.text.TextPipeline.processContent(NearTerms._2).head
    val tp = corpus(spark, dir).select(col("docid"),
        posexplode(expr("graft_tokenize(content)")))
      .select(col("docid"), col("pos"), col("col").as("term"))
    tp.filter(col("term") === a).select(col("docid"), col("pos").as("pa"))
      .join(tp.filter(col("term") === b)
        .select(col("docid"), col("pos").as("pb")), "docid")
      .filter(col("pb") > col("pa") &&
        col("pb") - col("pa") <= NearWindow)
      .select(col("docid")).distinct()
      .orderBy("docid")
  }

  /** KWIC snippets for [[PhraseQuery]] served entirely from the
    * positional index (postings inverted back to the token stream);
    * golden from [[q36SnippetBrute]]'s direct token-array slicing. */
  def q36Snippet(spark: SparkSession, dir: String): DataFrame = {
    val ix = PositionalIndex.build(spark, corpus(spark, dir))
    PositionalIndex.snippet(ix, PhraseQuery)
  }

  /** Independent snippet evaluation: no index — find the first phrase
    * window in the tokenized doc and slice the token array around it. */
  private[graft] def q36SnippetBrute(spark: SparkSession,
                                     dir: String): DataFrame = {
    graft.text.TextPipeline.register(spark)
    val terms = graft.text.TextPipeline.processContent(PhraseQuery)
    val m = terms.size
    val ctx = 3
    val toks = corpus(spark, dir).select(col("docid"),
      expr("graft_tokenize(content)").as("toks"))
    val firsts = toks.select(col("docid"), col("toks"),
        posexplode(InvertedIndex.kgramWindows(col("toks"), m)))
      .filter(col("col") === terms.mkString(" "))
      .groupBy(col("docid"))
      .agg(min(col("pos")).as("first_pos"), first(col("toks")).as("toks"))
    firsts.select(col("docid"),
        col("first_pos").cast("long").as("first_pos"),
        array_join(slice(col("toks"),
          greatest(col("first_pos") - ctx, lit(0)) + 1,
          least(col("first_pos") + (m - 1) + ctx,
            size(col("toks")) - 1) -
            greatest(col("first_pos") - ctx, lit(0)) + 1), " ")
          .as("snippet"))
      .orderBy("docid")
  }

  /** RANKED top-k proximity — the bounded NEAR serving contract
    * ([[PositionalIndex.nearTopK]]: near_tf = qualifying-pair count,
    * tf desc then docid asc, limit 10) through the positional index;
    * golden from [[q36NearTopKBrute]]'s index-free row-level pair
    * count, so the driver compare proves the ranked index path == the
    * brute scan (the established q36 pattern). */
  def q36NearTopK(spark: SparkSession, dir: String): DataFrame = {
    val ix = PositionalIndex.build(spark, corpus(spark, dir))
    PositionalIndex.nearTopK(ix, NearTerms._1, NearTerms._2, NearWindow)
  }

  /** Independent ranked-proximity evaluation: row-level occurrence
    * join, COUNT the qualifying pairs per doc (no arrays, no index),
    * same total order and limit as the serving contract. */
  private[graft] def q36NearTopKBrute(spark: SparkSession,
                                      dir: String): DataFrame = {
    graft.text.TextPipeline.register(spark)
    val a = graft.text.TextPipeline.processContent(NearTerms._1).head
    val b = graft.text.TextPipeline.processContent(NearTerms._2).head
    val tp = corpus(spark, dir).select(col("docid"),
        posexplode(expr("graft_tokenize(content)")))
      .select(col("docid"), col("pos"), col("col").as("term"))
    tp.filter(col("term") === a).select(col("docid"), col("pos").as("pa"))
      .join(tp.filter(col("term") === b)
        .select(col("docid"), col("pos").as("pb")), "docid")
      .filter(abs(col("pa") - col("pb")) <= NearWindow)
      .groupBy(col("docid"))
      .agg(count(lit(1)).as("near_tf"))
      .orderBy(col("near_tf").desc, col("docid"))
      .limit(10)
  }

  /** Independent proximity evaluation: explode every token with its
    * offset, self-join the two terms' occurrence ROWS per doc, keep
    * docs with any pair within the window. */
  private[graft] def q36NearBrute(spark: SparkSession,
                                  dir: String): DataFrame = {
    graft.text.TextPipeline.register(spark)
    val a = graft.text.TextPipeline.processContent(NearTerms._1).head
    val b = graft.text.TextPipeline.processContent(NearTerms._2).head
    val tp = corpus(spark, dir).select(col("docid"),
        posexplode(expr("graft_tokenize(content)")))
      .select(col("docid"), col("pos"), col("col").as("term"))
    tp.filter(col("term") === a).select(col("docid"), col("pos").as("pa"))
      .join(tp.filter(col("term") === b)
        .select(col("docid"), col("pos").as("pb")), "docid")
      .filter(abs(col("pa") - col("pb")) <= NearWindow)
      .select(col("docid")).distinct()
      .orderBy("docid")
  }

  /** The same predicate evaluated WITHOUT any index (per-row tokenize)
    * — the golden generator's path, never the serving path. */
  private[graft] def q35Fallback(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    corpus(spark, dir).createOrReplaceTempView("graft_docs_wild_plain")
    spark.sql("SELECT docid FROM graft_docs_wild_plain WHERE " +
      "graft_matches_term_like(content, 'st*am') ORDER BY docid")
  }

  /** Stage the events table as a stream-source directory (shared by
    * every q29 streaming query — one layout, one place to change). */
  private def stagedEvents(dir: String): String =
    stagedOnce(dir, "ev", sourceStamp(dir, "events")) { root =>
      java.nio.file.Files.createDirectories(root)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        root.resolve("part-0.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

  /** Structured Streaming end-to-end through the driver contract: stage
    * the events file as a stream-source directory, run the watermarked
    * tumbling-window aggregation to completion, return the sink. */
  def q29Streaming(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventsStream
    val staged = stagedEvents(dir)
    // fixed sink name: each run REPLACES the temp view, so repeated
    // invocations pin at most one result copy (r4 review)
    val name = "q29_sink"
    withStreamShuffle(spark, staged) {
      val q = EventsStream.tumblingCounts(
          EventsStream.readEvents(spark, staged),
          windowLen = "1 hour", watermark = "0 seconds")
        .writeStream.format("memory").queryName(name)
        // complete mode: a bounded replay must also emit the windows the
        // final watermark hasn't closed yet (append would hold them back)
        .outputMode("complete").start()
      // stop in finally: with fixed sink names, a failure that left the
      // query active would block every later invocation in this JVM
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
      .select(unix_timestamp(col("w_start")).as("w_sec"), col("user_id"),
        col("n_events"), col("total_value"))
      .orderBy("w_sec", "user_id")
  }

  /** Streaming per-window top-k: the tumbling 1 h count stream (same
    * pipeline as q29_streaming), then per-window top-3 users ride the
    * bounded-heap `graft_topk` aggregate — O(k) state per window per
    * partition instead of a window-function sort of every (window,
    * user) row. The streaming stage holds watermark-bounded count
    * state; the rank stage reads the bounded sink. */
  def q29TopUsers(spark: SparkSession, dir: String,
                  k: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import graft.streaming.EventsStream
    val staged = stagedEvents(dir)
    val name = "q29t_sink"
    withStreamShuffle(spark, staged) {
      val q = EventsStream.tumblingCounts(
          EventsStream.readEvents(spark, staged),
          windowLen = "1 hour", watermark = "0 seconds")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
      .select(unix_timestamp(col("w_start")).as("w_sec"),
        col("user_id"), col("n_events"))
      .groupBy(col("w_sec"))
      .agg(graft.functions.GraftFunctions
        .topkBy(col("n_events").cast("double"), col("user_id"), k)
        .as("top"))
      .select(col("w_sec"), posexplode(col("top")))
      .select(col("w_sec"), (col("pos") + 1).cast("long").as("rn"),
        col("col.id").as("user_id"),
        col("col.score").cast("long").as("n_events"))
      .orderBy("w_sec", "rn")
  }

  /** Streaming stateful dedup end-to-end: replay the staged events
    * directory, keep the first event per (user_id, minute) via
    * watermarked dropDuplicates, emit the deduped key set. */
  def q29Dedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventsStream
    val staged = stagedEvents(dir)
    val name = "q29d_sink"
    withStreamShuffle(spark, staged) {
      val q = EventsStream.dedupKeys(
          EventsStream.readEvents(spark, staged))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      // stop in finally: with fixed sink names, a failure that left the
      // query active would block every later invocation in this JVM
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name).orderBy("user_id", "min_sec")
  }

  /** Stream-stream interval join end-to-end: two file-source streams
    * over the staged events dir, watermarked interval join (same-user
    * events within the following minute), append sink. */
  def q29Join(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventsStream
    val staged = stagedEvents(dir)
    val name = "q29j_sink"
    // the dominant cost is inherent: a stream-stream join buffers BOTH
    // inputs in the state store (~2× corpus rows of puts for a bounded
    // replay in one micro-batch). Levers measured at sf0.1: partition
    // count flat (6.4s at 8 and 32); RocksDB state store flat (~7.3s);
    // a time-sorted 8-file replay with maxFilesPerTrigger=1 — the
    // state-bounding layout that IS right for an unbounded stream —
    // 3× WORSE here (23.8s: micro-batch scheduling dominates a
    // bounded replay of this size)
    // both join inputs stream the staged dir, so the basis is 2× it
    withStreamShuffle(spark, staged, staged) {
      val q = EventsStream.followJoin(
          EventsStream.readEvents(spark, staged),
          EventsStream.readEvents(spark, staged))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      // stop in finally: with fixed sink names, a failure that left the
      // query active would block every later invocation in this JVM
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name).orderBy("user_id", "a_id", "b_id")
  }

  /** STREAMING NEAR-DUP ingest gate end-to-end — the incremental LSH
    * probe ([[graft.ops.Dedup.neardupProbe]]) inside the standing
    * ingest loop: the corpus arrives as a file stream (three chunks,
    * docs routed by `doc_id % 3`, one micro-batch each), and
    * `foreachBatch` (a) probes the batch's minhash band keys against
    * the DURABLE accumulated band index — flagging each new doc's
    * near-duplicates among everything ingested before it — then
    * (b) appends the batch's band rows to the index, exactly the
    * append-only maintenance [[graft.ops.Similarity.appendIvfLayout]]
    * runs for vectors. Emits (delta_doc, base_doc, est_jaccard) for
    * every cross-batch band collision where the base arrived in an
    * earlier batch; the oracle recomputes the same contract
    * relationally (base chunk < delta chunk). Candidate sets are
    * duplicate-density-bounded, so the per-batch collect is the same
    * bounded driver hop the batch probe takes. */
  /** The 3-chunk staged documents source shared by the document-stream
    * gates ([[q29NeardupStream]], [[q29DecontamStream]]): the corpus
    * split into three mtime-ordered parquet chunks so
    * `maxFilesPerTrigger=1` replays it as three deterministic
    * micro-batches. Staged once per (dir, corpus-stamp). */
  private def stagedDocChunks(spark: SparkSession, dir: String): String = {
    import java.nio.file.Files
    stagedOnce(dir, "nds", sourceStamp(dir, "documents")) {
      root =>
        val d = Tables.load(spark, dir, "documents")
          .select(col("doc_id"), col("text"))
        Files.createDirectories(root)
        (0 until 3).foreach { i =>
          val tmp = root.resolve(s"_build$i")
          d.filter(pmod(col("doc_id"), lit(3)) === i)
            .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val ls = Files.list(tmp)
          val part =
            try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
            finally ls.close()
          val dst = root.resolve(s"chunk-$i.parquet")
          Files.move(part, dst,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          dst.toFile.setLastModified(1000000000000L + i * 60000L)
          val wk = Files.walk(tmp)
          try wk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { Files.deleteIfExists(p); () })
          finally wk.close()
        }
    }
  }

  def q29NeardupStream(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val staged = stagedDocChunks(spark, dir)
    // the durable band index this run accumulates (per-run scratch),
    // and the RESULTS sink the gate appends matched pairs to — both
    // are tables, never driver state: a real ingest run flags pairs
    // for the whole corpus lifetime, so the result channel must scale
    // with storage, not driver heap (the per-batch probe itself is
    // density-bounded; the pair VOLUME over months is not)
    val ixDir = graft.TempDirs.scratch("graft_nds_ix")
    val pairsDir = graft.TempDirs.scratch("graft_nds_pairs")
    var indexNonEmpty = false
    withStreamShuffle(spark, staged) {
      val q = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val bs = batch.sparkSession
          graft.functions.GraftFunctions.register(bs)
          val bands = graft.ops.Dedup.bandRowsOf(batch)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            if (indexNonEmpty) {
              val base = bs.read.parquet(ixDir)
              bands.as("y").join(base.as("x"),
                  col("x.band") === col("y.band") &&
                    col("x.key") === col("y.key"))
                .select(col("y.doc_id").as("delta_doc"),
                  col("x.doc_id").as("base_doc"),
                  graft.ops.Dedup.bandMatchFraction.as("est_jaccard"))
                .distinct()
                .write.mode("append").parquet(pairsDir)
            }
            bands.write.mode("append").parquet(ixDir)
            indexNonEmpty = true
          } finally { bands.unpersist(); () }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    if (sinkHasParquet(pairsDir))
      spark.read.parquet(pairsDir).orderBy("delta_doc", "base_doc")
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "delta_doc BIGINT, base_doc BIGINT, est_jaccard DOUBLE"))
  }

  /** STREAMING DECONTAMINATION GATE — the [[graft.ops.TextAnalysis
    * .decontaminate]] policy applied at INGEST time, the third
    * document-stream gate beside near-dup and ANN: a training doc is
    * admitted or dropped the moment it arrives, not in a later batch
    * sweep. The benchmark suite's distinct-trigram set is STATIC (an
    * eval suite doesn't grow with the corpus), so it is built once and
    * written as a table; each micro-batch shingles its own docs
    * ([[graft.ops.Dedup.docShinglesOf]] — the batch operator's exact
    * expression), joins them against the broadcast suite (suite-sized
    * at any corpus scale), decides keep/drop per doc, and APPENDS the
    * admitted rows with their audit columns to a parquet results sink.
    * Per-doc decisions against static state make the gate
    * embarrassingly parallel — no cross-batch index, no watermark
    * state — and the stream output equals the batch operator
    * row-for-row (they share one oracle). Both channels are tables
    * (the r9/r10 gate discipline): nothing accumulates on the
    * driver. */
  def q29DecontamStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.TextAnalysis.{ContamMod, ContamDropThreshold}
    graft.functions.GraftFunctions.register(spark)
    val staged = stagedDocChunks(spark, dir)
    val benchDir = graft.TempDirs.scratch("graft_dec_bench")
    graft.ops.Dedup.docShingles(spark, dir)
      .filter(pmod(col("doc_id"), lit(ContamMod)) === 0)
      .select("shingle").distinct()
      .write.mode("overwrite").parquet(benchDir)
    val keptDir = graft.TempDirs.scratch("graft_dec_kept")
    withStreamShuffle(spark, staged) {
      val q = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val bs = batch.sparkSession
          graft.functions.GraftFunctions.register(bs)
          val sh = graft.ops.Dedup.docShinglesOf(
              batch.filter(pmod(col("doc_id"), lit(ContamMod)) =!= 0))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val bench = bs.read.parquet(benchDir)
            val tot = sh.groupBy("doc_id")
              .agg(count(lit(1)).as("n_trigrams"))
            val hit = sh.join(broadcast(bench), "shingle")
              .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
            tot.join(hit, Seq("doc_id"), "left")
              .na.fill(0L, Seq("n_shared"))
              .select(col("doc_id"), col("n_trigrams"), col("n_shared"),
                round(col("n_shared").cast("double") / col("n_trigrams"), 4)
                  .as("contam_ratio"))
              .filter(col("contam_ratio") < ContamDropThreshold)
              .write.mode("append").parquet(keptDir)
          } finally { sh.unpersist(); () }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    if (sinkHasParquet(keptDir))
      spark.read.parquet(keptDir).orderBy("doc_id")
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, n_trigrams BIGINT, n_shared BIGINT, " +
            "contam_ratio DOUBLE"))
  }

  /** ONE-PASS STREAMING CURATION FUNNEL — the document gates
    * composed the way a real ingest runs them: each arriving doc is
    * decided by language-ID, quality, exact-dedup keeper, NEAR-dup
    * representative AND benchmark decontamination inside ONE
    * `foreachBatch` over ONE staged stream (previously each gate was
    * its own pass), with a per-doc audit row (the five gate flags)
    * appended to a parquet sink; the emitted result is [[graft.ops
    * .TextAnalysis.curationFunnel]]'s one-row cumulative survivor
    * report computed from the audit table — stream decisions == batch
    * decisions row-for-row, so the two entries share ONE oracle
    * (q27_funnel).
    *
    * Parity argument, gate by gate: language, quality and
    * decontamination are per-doc functions of (content, id) computed
    * by the BATCH OPERATORS' own expressions ([[graft.ops
    * .TextAnalysis.langIdOf]]/`qualityOf`, [[graft.ops.Dedup
    * .docShinglesOf]] against the static benchmark trigram table), so
    * they cannot differ. The two gates with cross-doc state lean on
    * the same staging property: the corpus stages as doc_id-RANGE
    * chunks (not the mod-3 routing of the single-gate streams), so
    * ids arrive in order — a digest's first arrival IS its global
    * minimum ("not in the accumulated digest index, min within batch"
    * == the batch keeper), and a doc's smaller-id band-collision
    * partners are exactly the accumulated band index plus this
    * batch's smaller ids (== the batch [[graft.ops.Dedup.minhashLsh]]
    * doc_b drop set).
    *
    * Channels are all tables (the r9/r10 gate discipline): the digest
    * and band indexes accumulate per batch, the audit sink appends
    * per batch, nothing lives on the driver. Per-batch work: two
    * token passes + two shingle passes over the batch, a broadcast
    * join against the (eval-suite-sized) benchmark trigrams, a digest
    * anti-join and a band-key equi-join against the indexes — each
    * linear-or-collision-bounded in the batch. */
  def q29FunnelStream(spark: SparkSession, dir: String): DataFrame =
    q29FunnelAudit(spark, dir)
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("g1"), 1L).otherwise(0L)).as("n_lang"),
        sum(when(col("g1") && col("g2"), 1L).otherwise(0L))
          .as("n_quality"),
        sum(when(col("g1") && col("g2") && col("g3"), 1L).otherwise(0L))
          .as("n_dedup"),
        sum(when(col("g1") && col("g2") && col("g3") && col("g4"), 1L)
          .otherwise(0L)).as("n_neardup"),
        sum(when(col("g1") && col("g2") && col("g3") && col("g4") &&
          col("g5"), 1L).otherwise(0L)).as("n_final"))

  /** The funnel gate's per-doc audit table (doc_id, g1..g4) — the
    * spec surface proving stream decisions == the batch operators'
    * per doc, not only in aggregate. */
  private[graft] def q29FunnelAudit(spark: SparkSession,
                                    dir: String): DataFrame = {
    import graft.ops.TextAnalysis.{ContamMod, ContamDropThreshold}
    graft.functions.GraftFunctions.register(spark)
    val staged = stagedOnce(dir, "fnl", sourceStamp(dir, "documents")) {
      root =>
        import java.nio.file.Files
        val d = Tables.load(spark, dir, "documents")
          .select(col("doc_id"), col("text"))
        // contiguous doc_id ranges (see keeper-parity argument above);
        // exact tertile boundaries via approxQuantile at zero error
        val b = d.stat.approxQuantile("doc_id",
          Array(1.0 / 3, 2.0 / 3), 0.0)
        val preds = Seq(col("doc_id") < b(0),
          col("doc_id") >= b(0) && col("doc_id") < b(1),
          col("doc_id") >= b(1))
        Files.createDirectories(root)
        preds.zipWithIndex.foreach { case (p, i) =>
          val tmp = root.resolve(s"_build$i")
          d.filter(p).coalesce(1)
            .write.mode("overwrite").parquet(tmp.toString)
          val ls = Files.list(tmp)
          val part =
            try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
            finally ls.close()
          val dst = root.resolve(s"chunk-$i.parquet")
          Files.move(part, dst,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          dst.toFile.setLastModified(1000000000000L + i * 60000L)
          val wk = Files.walk(tmp)
          try wk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p2 => { Files.deleteIfExists(p2); () })
          finally wk.close()
        }
    }
    // static benchmark trigram set (an eval suite doesn't grow with
    // the corpus) — same build as the standalone decontamination gate
    val benchDir = graft.TempDirs.scratch("graft_fnl_bench")
    graft.ops.Dedup.docShingles(spark, dir)
      .filter(pmod(col("doc_id"), lit(ContamMod)) === 0)
      .select("shingle").distinct()
      .write.mode("overwrite").parquet(benchDir)
    val digestDir = graft.TempDirs.scratch("graft_fnl_digests")
    val bandDir = graft.TempDirs.scratch("graft_fnl_bands")
    val auditDir = graft.TempDirs.scratch("graft_fnl_audit")
    var indexNonEmpty = false
    val writer = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bs = batch.sparkSession
        graft.functions.GraftFunctions.register(bs)
        val b = batch
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val lid = graft.ops.TextAnalysis.langIdOf(b)
            .select(col("doc_id"), col("lang_pred"))
          val qual = graft.ops.TextAnalysis.qualityOf(b)
            .select(col("doc_id"), col("n_tokens"), col("alnum_ratio"))
          val bd = b.select(col("doc_id"), md5(col("text")).as("digest"))
          val batchKeepers = bd.groupBy(col("digest"))
            .agg(min(col("doc_id")).as("doc_id"))
          val keepers =
            (if (indexNonEmpty)
              batchKeepers.join(bs.read.parquet(digestDir),
                Seq("digest"), "left_anti")
            else batchKeepers)
              .select(col("doc_id"), lit(1L).as("k"))
          // NEAR-DUP gate: a doc is its group's representative iff no
          // band collision with a SMALLER doc_id exists. Range chunks
          // order ids, so smaller-id partners live in the accumulated
          // band index (earlier chunks) or in this batch — union of
          // an index probe and a within-batch self-join == the batch
          // operator's doc_b drop set exactly.
          val bands = graft.ops.Dedup.bandRowsOf(b)
            .select(col("doc_id"), col("band"), col("key"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val inBatch = bands.as("x").join(bands.as("y"),
              col("x.band") === col("y.band") &&
                col("x.key") === col("y.key") &&
                col("x.doc_id") < col("y.doc_id"))
            .select(col("y.doc_id"))
          val ndDrop =
            (if (indexNonEmpty)
              bands.as("y").join(bs.read.parquet(bandDir).as("x"),
                  col("x.band") === col("y.band") &&
                    col("x.key") === col("y.key"))
                .select(col("y.doc_id"))
                .unionByName(inBatch)
            else inBatch)
              .distinct()
              .select(col("doc_id"), lit(1L).as("nd"))
          val sh = graft.ops.Dedup.docShinglesOf(
            b.filter(pmod(col("doc_id"), lit(ContamMod)) =!= 0))
          val tot = sh.groupBy("doc_id")
            .agg(count(lit(1)).as("n_trigrams"))
          val hit = sh.join(broadcast(bs.read.parquet(benchDir)),
              "shingle")
            .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
          val dec = tot.join(hit, Seq("doc_id"), "left")
            .na.fill(0L, Seq("n_shared"))
            .filter(round(col("n_shared").cast("double") /
              col("n_trigrams"), 4) < ContamDropThreshold)
            .select(col("doc_id"), lit(1L).as("c"))
          lid.join(qual, "doc_id")
            .join(keepers, Seq("doc_id"), "left")
            .join(ndDrop, Seq("doc_id"), "left")
            .join(dec, Seq("doc_id"), "left")
            .select(col("doc_id"),
              (col("lang_pred") === "en").as("g1"),
              (col("n_tokens").between(20, 1000) &&
                col("alnum_ratio") >= 0.7).as("g2"),
              col("k").isNotNull.as("g3"),
              col("nd").isNull.as("g4"),
              col("c").isNotNull.as("g5"))
            .coalesce(1).write.mode("append").parquet(auditDir)
          // ONE file per batch per channel (coalesce before append):
          // an un-coalesced append lands one file PER SHUFFLE
          // PARTITION (~32), blowing through the compaction bound on
          // the very first batches — r13's q29_funnel_stream constant
          // was the in-loop compaction firing near-every batch for
          // exactly this reason. A batch's index delta is
          // batch-sized; one part file is its natural unit.
          // (r17 A/B'd overlapping the audit write with the index
          // appends per guide §2.6: inconclusive — adjacent
          // single-query sessions swing ±30% on this row (6.0–8.7 s
          // on IDENTICAL code), larger than any overlap effect, so
          // the simpler sequential body stays. The update stream's
          // overlap DID land: its win was proven within one session
          // by instrumented segment timings.)
          bd.select("digest").distinct()
            .coalesce(1).write.mode("append").parquet(digestDir)
          bands.coalesce(1).write.mode("append").parquet(bandDir)
          bands.unpersist()
          indexNonEmpty = true
          // AUTO-COMPACTION of the accumulated gate indexes — the
          // q29AnnStream in-loop discipline applied to the funnel's
          // two append channels: every batch adds ONE file, and at
          // standing-ingest batch counts the digest anti-join and
          // band equi-join degrade with file COUNT (FunnelProf
          // measures it), so the loop itself bounds fragmentation
          // instead of relying on post-hoc maintenance. Cheap no-op
          // listing per batch while under the bound; when EITHER
          // channel exceeds it, BOTH compact in the one maintenance
          // pass (they accumulate in lockstep — amortized to one
          // rewrite pair per ~FunnelIndexMaxFiles batches). Safe here
          // because foreachBatch serializes with the next batch's
          // reads.
          if (Seq(digestDir, bandDir)
              .exists(parquetPartCount(_) > FunnelIndexMaxFiles))
            Seq(digestDir, bandDir)
              .foreach(graft.ops.TextAnalysis.compact(bs, _))
        } finally { b.unpersist(); () }
        ()
      }
    withStreamShuffle(spark, staged) {
      val q = writer.start()
      val paa0 = System.nanoTime()
      try q.processAllAvailable() finally q.stop()
      // the trigger-scheduler wall of THIS run, exposed so the bench
      // artifact can attribute session scheduler noise (r13: the row
      // swung 3× across same-code sessions with flat GC) — the bench
      // prints it beside the row's end-to-end time
      lastFunnelStreamWallSec = (System.nanoTime() - paa0) / 1e9
    }
    spark.read.parquet(auditDir)
  }

  /** Wall seconds of the last [[q29FunnelAudit]]
    * `processAllAvailable` (see its note). */
  @volatile var lastFunnelStreamWallSec: Double = -1.0

  /** File-count bound on the funnel's accumulated digest/band indexes
    * before the in-loop compaction rewrites them (the
    * `maxFilesPerCell` analog for unpartitioned append channels;
    * IvfCompactProf measured 2.2× probe degradation by 24 appends on
    * the cell store — the same accretion mechanism). */
  val FunnelIndexMaxFiles = 24

  private def parquetPartCount(dirPath: String): Int = {
    val p = java.nio.file.Paths.get(dirPath)
    if (!java.nio.file.Files.isDirectory(p)) 0
    else {
      val s = java.nio.file.Files.list(p)
      try s.filter(_.getFileName.toString.endsWith(".parquet"))
        .count().toInt
      finally s.close()
    }
  }

  /** True iff a gate's results sink holds at least one parquet part —
    * the guard the typed-empty fallback keys on. [[graft.TempDirs
    * .scratch]] PRE-CREATES the sink directory, so a bare
    * `Files.exists` is always true and the fallback would be dead
    * code; correctness of the no-pairs case would then silently
    * depend on Spark writing schema-bearing empty part files. */
  private def sinkHasParquet(dirPath: String): Boolean = {
    val p = java.nio.file.Paths.get(dirPath)
    java.nio.file.Files.isDirectory(p) && {
      val s = java.nio.file.Files.list(p)
      try s.anyMatch(f => f.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
  }

  /** Exact-cosine threshold of the STREAMING vector ingest gate —
    * shared with the [[graft.ops.TrainingOracles]] SQL (embedded as a
    * literal there via the generator, one definition). */
  val AnnStreamTau = 0.35

  /** STREAMING ANN ingest gate end-to-end — [[q29NeardupStream]]'s
    * vector twin: embeddings arrive as a file stream (three chunks,
    * vectors routed by `vec_id % 3`, one micro-batch each), and
    * `foreachBatch` (a) assigns the batch its IVF cells against the
    * table's fixed seed centroids ([[graft.ops.Similarity
    * .assignCells]]), (b) probes the batch against the DURABLE
    * accumulated cell-partitioned store — same-cell exact cosine ≥
    * [[AnnStreamTau]] flags each new vector's near-duplicates among
    * everything ingested before it — appending the matched pairs to a
    * RESULTS sink table (never driver state), then (c) appends the
    * batch's assigned rows to the store (the [[graft.ops.Similarity
    * .appendIvfLayout]] maintenance). Emits (delta_vec, base_vec, cos)
    * for every cross-batch same-cell pair over the threshold; the
    * oracle recomputes the contract relationally (cell assignment via
    * the argmax CTE, base chunk < delta chunk). Per-batch probe work
    * is cell-bounded (batch rows × their cells' occupancy — the IVF
    * probe shape), and both the vector store and the result channel
    * are tables, never driver buffers.
    *
    * SIZING k AT SCALE: cell occupancy is n/k, so per-batch probe
    * work is |batch|·n/k cosines — with the test corpus's FIXED
    * [[graft.ops.Similarity.IvfCentroids]] seeds that term grows with
    * the corpus. A production gate sizes the store's centroid count
    * to the corpus (k ≈ n/128, the [[graft.ops.Similarity
    * .SemDedupCellSize]] discipline, re-clustering periodically as
    * part of store maintenance), pinning per-batch work at
    * |batch|·128 regardless of corpus size. The contract here runs on
    * the same fixed seeds as the whole q25 store family so all probe
    * paths share one oracle-checked assignment. */
  def q29AnnStream(spark: SparkSession, dir: String): DataFrame =
    annStreamGate(spark, dir, graft.ops.Similarity.IvfCentroids.toLong)

  /** STREAMING TAKEDOWN FEED — removal requests arriving as a stream,
    * the operational shape of a curation pipeline's deletion queue
    * (takedowns trickle in; each must be honored when it lands, not
    * in a quarterly rebuild). The fixed takedown set streams in THREE
    * id chunks into a per-run BM25 stats store; each micro-batch is
    * one [[graft.queries.IrSql.deleteBm25DocsLazy]] — a crash-safe
    * staged-marker TOMBSTONE whose only delete-time work is the
    * request-sized sidecar: the doc disappears from every read
    * immediately, df/corpus corrections ride the deferred-read path
    * (exactly the update stream's shape, which serves the
    * uncompacted store). The r15 shape ran the EAGER delete per
    * micro-batch, paying the touched-term stats recompute on every
    * trigger — the one per-batch bill the lazy leg exists to defer.
    * [[graft.queries.IrSql.compactBm25Deletes]] belongs to the
    * maintenance CADENCE, not the ingest loop (running it per feed
    * would bill the whole surgical reclaim to the stream — measured
    * costlier than the eager legs it replaced on a diffuse takedown
    * set); q10_bm25_deleted_lazy_compacted owns that oracle. The
    * incremental feed still COMPOSES to exactly the one-shot batch
    * delete: the final ranking shares q10_bm25_deleted's oracle
    * (full BM25 recomputed over the corpus minus the whole set),
    * served through the pending-tombstone read path.
    * Chunks are disjoint id slices, so per-batch deletes never
    * overlap; the replay-idempotence each store's protocol guarantees
    * makes an at-least-once feed safe too (spec-pinned in
    * DeletionSpec's no-op replays). */
  /** Per-run MUTABLE copy of the session-cached stats store (a
    * mutation stream drives it): a file copy is ~free next to the
    * from-corpus build it replaces, and the shared cache stays
    * pristine for every other entry. */
  private def scratchBm25Copy(spark: SparkSession, dir: String,
                              tag: String): String = {
    val store = graft.TempDirs.scratch(tag)
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(
      IrSql.bm25StatsStore(spark, dir))
    val dst = new org.apache.hadoop.fs.Path(store)
    val fs = src.getFileSystem(conf)
    fs.listStatus(src).foreach { s =>
      org.apache.hadoop.fs.FileUtil.copy(fs, s.getPath, fs,
        new org.apache.hadoop.fs.Path(dst, s.getPath.getName),
        false, conf)
    }
    store
  }

  def q29TakedownStream(spark: SparkSession, dir: String): DataFrame = {
    val store = scratchBm25Copy(spark, dir, "graft_tds_bm25")
    val staged = graft.TempDirs.scratch("graft_tds_ids")
    val ids = Tables.load(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(IrSql.DeletedDocsMod)) ===
        lit(IrSql.DeletedDocsRem))
      .select(col("doc_id"))
    // one parquet file per chunk (append lands one coalesced part
    // per write) — maxFilesPerTrigger=1 then feeds them one per batch
    // (a one-job partitioned-write variant was A/B'd in r17 and
    // measured no faster: three trivial writes ≈ one shuffle write)
    (0 until 3).foreach { i =>
      ids.filter(pmod(col("doc_id"), lit(3)) === lit(i))
        .coalesce(1).write.mode("append").parquet(staged)
    }
    withStreamShuffle(spark, staged) {
      val q = spark.readStream
        .schema("doc_id BIGINT")
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          IrSql.deleteBm25DocsLazy(batch.sparkSession, store, batch)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    IrSql.q10Bm25PrunedAt(spark, store, IrSql.ExpandedQueryTerms, 10)
  }

  /** Re-crawl requests as a STREAM — the update queue's operational
    * shape, the q29_takedown_stream twin for UPDATES: the fixed
    * re-crawl set's new versions arrive as three disjoint chunk files
    * (one micro-batch each), and foreachBatch drives
    * [[IrSql.updateBm25Docs]] per batch — delete → reclaim → merge
    * per arrival, the standing loop of a store tracking a live crawl.
    * The incremental feed must compose to exactly the one-shot batch
    * update: the oracle is q10_bm25_updated's (BM25 recomputed over
    * the updated corpus). */
  def q29UpdateStream(spark: SparkSession, dir: String): DataFrame = {
    val store = scratchBm25Copy(spark, dir, "graft_ups_bm25")
    val staged = graft.TempDirs.scratch("graft_ups_docs")
    val upd = IrSql.updatedDocsNew(spark, dir)
    (0 until 3).foreach { i =>
      upd.filter(pmod(col("doc_id"), lit(3)) === lit(i))
        .coalesce(1).write.mode("append").parquet(staged)
    }
    withStreamShuffle(spark, staged) {
      val q = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          IrSql.updateBm25Docs(batch.sparkSession, store, batch)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    IrSql.q10Bm25PrunedAt(spark, store, IrSql.ExpandedQueryTerms, 10)
  }

  /** [[q29AnnStream]] with the centroid count as a knob — the scale
    * study runs the gate at the fixed store k AND at corpus-sized k
    * (n/128) to measure the occupancy term the scaladoc describes.
    * `coarse` routes the per-batch assignment through the two-level
    * [[graft.ops.Similarity.assignCellsCoarse]] (2n√k vs n·k) — the
    * production shape at corpus-sized k. */
  private[graft] def annStreamGate(spark: SparkSession, dir: String,
                                   k: Long,
                                   coarse: Boolean = false,
                                   maxFilesPerCell: Int = 8): DataFrame =
    annStreamGateWithStore(spark, dir, k, coarse, maxFilesPerCell)._1

  /** [[annStreamGate]] exposing the durable store's path alongside
    * the pairs — the maintenance spec inspects per-cell file counts
    * after the run. */
  private[graft] def annStreamGateWithStore(
      spark: SparkSession, dir: String, k: Long,
      coarse: Boolean = false,
      maxFilesPerCell: Int = 8): (DataFrame, String) = {
    import java.nio.file.Files
    graft.functions.GraftFunctions.register(spark)
    val staged = stagedOnce(dir, "ans", sourceStamp(dir, "embeddings")) {
      root =>
        val e = Tables.load(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        Files.createDirectories(root)
        (0 until 3).foreach { i =>
          val tmp = root.resolve(s"_build$i")
          e.filter(pmod(col("vec_id"), lit(3)) === i)
            .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          val ls = Files.list(tmp)
          val part =
            try ls.filter(_.toString.endsWith(".parquet")).findFirst().get()
            finally ls.close()
          val dst = root.resolve(s"chunk-$i.parquet")
          Files.move(part, dst,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          dst.toFile.setLastModified(1000000000000L + i * 60000L)
          val wk = Files.walk(tmp)
          try wk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { Files.deleteIfExists(p); () })
          finally wk.close()
        }
    }
    val storeDir = graft.TempDirs.scratch("graft_ans_store")
    val pairsDir = graft.TempDirs.scratch("graft_ans_pairs")
    var storeNonEmpty = false
    val writer = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bs = batch.sparkSession
        graft.functions.GraftFunctions.register(bs)
        val assigned = (if (coarse)
            graft.ops.Similarity.assignCellsCoarse(bs, dir, batch, k)
          else graft.ops.Similarity.assignCells(bs, dir, batch, k))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          if (storeNonEmpty) {
            val base = bs.read.parquet(storeDir)
            assigned.as("y").join(base.as("x"),
                col("x.cell") === col("y.cell"))
              .select(col("y.vec_id").as("delta_vec"),
                col("x.vec_id").as("base_vec"),
                graft.ops.Similarity.cosine(
                  col("x.embedding"), col("y.embedding")).as("c"))
              .filter(col("c") >= AnnStreamTau)
              .select(col("delta_vec"), col("base_vec"),
                round(col("c"), 4).as("cos"))
              .write.mode("append").parquet(pairsDir)
          }
          // repartition by cell before the partitioned append: with
          // corpus-sized k, un-clustered upstream partitioning writes
          // up to (tasks × touched cells) small files per batch —
          // clustering bounds it at one file per cell per batch (the
          // fragmentation compactIvfStore otherwise repairs post-hoc)
          assigned.repartition(col("cell"))
            .write.partitionBy("cell").mode("append").parquet(storeDir)
          storeNonEmpty = true
          // AUTO-COMPACTION: even clustered appends accrete one file
          // per touched cell per batch, and fragmentation was measured
          // at 2.2× probe degradation by 24 appends (IvfCompactProf) —
          // a long-lived gate must bound it as part of the loop, not
          // rely on an operator remembering the manual maintenance
          // call. compactIvfStore only rewrites cells OVER the bound
          // (a per-cell listing otherwise), so under the default
          // bound this is a cheap no-op check per batch; probe results
          // are identical pre/post compaction (spec-pinned).
          graft.ops.Similarity.compactIvfStore(bs, storeDir,
            maxFilesPerCell)
        } finally { assigned.unpersist(); () }
        ()
      }
    withStreamShuffle(spark, staged) {
      val q = writer.start()
      try q.processAllAvailable() finally q.stop()
    }
    val pairs =
      if (sinkHasParquet(pairsDir))
        spark.read.parquet(pairsDir).orderBy("delta_vec", "base_vec")
      else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "delta_vec BIGINT, base_vec BIGINT, cos DOUBLE"))
    (pairs, storeDir)
  }

  /** Sliding-window aggregation over events (batch form of the
    * streaming `slidingCounts` transform — 1 h windows every 30 min,
    * so each event lands in exactly two overlapping windows; the
    * oracle reconstructs the two slide-aligned slots per event). */
  def q29Sliding(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventsStream
    EventsStream.slidingCounts(Tables.load(spark, dir, "events"),
        windowLen = "1 hour", slide = "30 minutes", watermark = "0 seconds")
      .select(unix_timestamp(col("w_start")).as("w_sec"), col("user_id"),
        col("n_events"))
      .orderBy("w_sec", "user_id")
  }

  /** Session-window aggregation over events (batch form of the
    * streaming `session_window` transform — 30-minute inactivity gap). */
  def q32Sessions(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventsStream
    EventsStream.sessionWindows(Tables.load(spark, dir, "events"))
      .orderBy("user_id", "start_us")
  }

  /** TREC DataSourceV2 end-to-end: stage the documents table as a TREC
    * XML collection (single-line `<DOC>` blocks), read it back through
    * the split-realigning `trec` source with a small splitSize so the
    * scan exercises multi-split boundary ownership, and project
    * (docid, n_chars). Oracle rebuilds the same strings relationally. */
  def q31TrecSource(spark: SparkSession, dir: String): DataFrame = {
    val staged = stagedOnce(dir, "trec",
        sourceStamp(dir, "documents")) { root =>
      Tables.load(spark, dir, "documents")
        .select(format_string(
          "<DOC> <DOCNO> FT-%d </DOCNO> <TEXT> %s </TEXT> </DOC>",
          col("doc_id"), col("text")).as("value"))
        .write.mode("overwrite").text(root.toString)
    }
    spark.read.format("trec")
      .option("splitSize", "65536")
      .load(staged)
      .select(col("docid"), length(col("content")).cast("long").as("n_chars"))
      .orderBy("docid")
  }

  /** Multimodal end-to-end: synthesize REAL PNG payloads, decode them
    * with the JDK codec (`ImageIO`), run the resize plan, and aggregate
    * per-kind stats. Every output value derives from the decoded
    * dimensions — which the engine must recover by actually parsing the
    * PNG bytes, while the DuckDB oracle reconstructs them from the
    * dimension formula relationally. */
  def q28Multimodal(spark: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Multimodal
    val media = Multimodal.mediaFromDocuments(spark, dir)
    Multimodal.resizePlan(Multimodal.decode(media), maxSide = 48)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        max(col("width")).cast("long").as("max_w"),
        max(col("height")).cast("long").as("max_h"),
        max(col("out_w")).cast("long").as("max_out_w"),
        max(col("out_h")).cast("long").as("max_out_h"),
        sum(col("width").cast("long") * col("height")).as("sum_px"))
      .orderBy("kind")
  }

  /** Image resize end-to-end: decode REAL PNG pixels, nearest-neighbor
    * resample, re-encode, re-decode, exact pixel checksum — the DuckDB
    * oracle recomputes the checksum from the generative pixel formula,
    * so the hash-match certifies the whole pixel path (see
    * [[graft.multimodal.Multimodal.resizeImages]]). */
  def q28Resize(spark: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Multimodal
    Multimodal.resizeImages(Multimodal.mediaFromDocuments(spark, dir))
      .select(col("media_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("out_w").cast("long").as("out_w"),
        col("out_h").cast("long").as("out_h"), col("pix_sum"))
      .orderBy("media_id")
  }

  /** Real-pixel feature extraction: 2×2 grid cell statistics over the
    * decoded PNGs, all-integer, oracle-recomputed from the generative
    * formula ([[graft.multimodal.Multimodal.imageFeatureGrid]]). */
  def q28Features(spark: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Multimodal
    Multimodal.imageFeatureGrid(Multimodal.mediaFromDocuments(spark, dir))
      .orderBy("media_id", "cell")
  }

  /** Audio end-to-end: synthesize REAL WAV payloads (16-bit PCM via
    * `javax.sound.sampled`), decode them with the JDK sound stack, and
    * emit the per-row decoded properties. The engine recovers sample
    * rate / channels / frame count by actually parsing the RIFF
    * header; the DuckDB oracle reconstructs them from the parameter
    * formula ([[graft.multimodal.Multimodal.WavCodec.paramsFor]]). */
  def q28Audio(spark: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Multimodal
    Multimodal.decodeAudio(Multimodal.audioFromDocuments(spark, dir))
      .toDF()
      .orderBy("media_id")
  }

  /** Video end-to-end: synthesize REAL MJPEG-in-AVI payloads (RIFF
    * container + JDK JPEG frames), decode them by walking the chunk
    * tree and decoding every frame, and join against the real
    * frame-sampling stage. The engine recovers width / height / frame
    * count / fps by actually parsing the container (dims from JPEG
    * decode of each frame, count from the '00dc' walk, fps from the
    * avih header) and `sampled` by emitting every 2nd frame; the
    * DuckDB oracle reconstructs all of it from the parameter formula
    * ([[graft.multimodal.Multimodal.AviCodec.paramsFor]]). */
  def q28Video(spark: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Multimodal
    import graft.ops.Stage.StageOps
    // stage the synthesized media ONCE: the decode branch and the
    // frame-sampling branch both consume it, and unstaged each branch
    // re-runs the AVI/JPEG ENCODE UDF over every payload (the plan
    // showed the encode Project under BOTH scans — guide §1.2 "don't
    // compute things twice"); measured 7.43 → ~4.4 s isolated at sf0.1
    val media = Multimodal.videoFromDocuments(spark, dir).stage()
    val sampled = Multimodal.sampleVideoFrames(media, stride = 2)
      .groupBy(col("media_id")).agg(count(lit(1)).as("sampled"))
    Multimodal.decodeVideo(media).toDF()
      .join(sampled, "media_id")
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("n_frames"), col("fps"), col("duration_ms"), col("sampled"))
      .orderBy("media_id")
  }
}
