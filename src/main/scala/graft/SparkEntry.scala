package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{IrEngine, IrSql, Relational}
import graft.ops.{Bpe, Dedup, Graph, Pq, Similarity, Temporal, TextAnalysis, TrainingOracles}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` keys map 1:1 to SURVEY.md §2.9 query families; each has an
  * `oracleSql` entry in DuckDB dialect over the same parquet tables
  * (column names aliased identically on both sides — the driver compare
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's headline capability — tf-idf ranked search through
    * the full faithful engine (tag tokenizer → Terrier stopwords →
    * Porter2 stem → inverted index → disjunctive ranked query). */
  def entry(spark: SparkSession): DataFrame =
    IrEngine.q26Search(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter" -> (Relational.q01ScanFilter _),
    "q02_docid_extract" -> (IrSql.q02DocidExtract _),
    "q02_trectext_fields" -> (IrSql.q02TrecTextFields _),
    "q02_urlscrub" -> (IrSql.q02UrlScrub _),
    "q02_trecweb_meta" -> (IrSql.q02TrecWebMeta _),
    "q02_trectext_full" -> (IrSql.q02TrecTextFull _),
    "q09_wildcard" -> ((s: SparkSession, d: String) => IrSql.q09Wildcard(s, d)),
    "q09_wildcard_multi" -> (IrSql.q09WildcardMulti _),
    "q09_wildcard_deleted" -> (IrSql.q09WildcardDeleted _),
    "q09_wildcard_updated" -> (IrSql.q09WildcardUpdated _),
    "q03_docno_assign" -> (IrSql.q03DocnoAssign _),
    "q04_tokenize" -> (IrSql.q04Tokenize _),
    "q05_term_tf" -> (IrSql.q05TermTf _),
    "q06_inverted_index" -> (IrSql.q06InvertedIndex _),
    "q06_bigram_index" -> (IrSql.q06BigramIndex _),
    "q06_salted_index" ->
      ((s: SparkSession, d: String) => IrSql.q06InvertedIndexSalted(s, d)),
    "q07_bigrams" -> (IrSql.q07Bigrams _),
    "q08_chargrams" -> (IrSql.q08CharGrams _),
    "q09_chargram_terms" -> (IrSql.q09CharGramTerms _),
    "q10_tfidf" -> ((s: SparkSession, d: String) => IrSql.q10TfIdf(s, d)),
    "q10_bm25" -> ((s: SparkSession, d: String) => IrSql.q10Bm25(s, d)),
    "q10_bm25_batch" ->
      ((s: SparkSession, d: String) => IrSql.q10Bm25Batch(s, d)),
    "q10_bm25_batch_stored" ->
      ((s: SparkSession, d: String) => IrSql.q10Bm25BatchStored(s, d)),
    "q10_bm25_multi" ->
      ((s: SparkSession, d: String) => IrSql.q10Bm25Multi(s, d)),
    "q10_bm25_pruned" ->
      ((s: SparkSession, d: String) => IrSql.q10Bm25Pruned(s, d)),
    "q11_join" -> (Relational.q11Join _),
    "q12_semi" -> (Relational.q12Semi _),
    "q12_anti" -> (Relational.q12Anti _),
    "q13_revenue" -> (Relational.q13Revenue _),
    "q13_tpch_pricing" -> (Relational.q13TpchPricing _),
    "q14_count_distinct" -> (Relational.q14CountDistinct _),
    "q14_approx_distinct" -> (Relational.q14ApproxDistinct _),
    "q21_approx_quantiles" -> (Relational.q21ApproxQuantiles _),
    "q15_rollup" -> (Relational.q15Rollup _),
    "q15_cube" -> (Relational.q15Cube _),
    "q15_grouping_sets" -> (Relational.q15GroupingSets _),
    "q21_stats" -> (Relational.q21Stats _),
    "q16_window_nav" -> (Relational.q16WindowNav _),
    "q20_strings2" -> (Relational.q20Strings2 _),
    "q21_nulls" -> (Relational.q21Nulls _),
    "q21_percentiles" -> (Relational.q21Percentiles _),
    "q16_rank_windows" -> (Relational.q16RankWindows _),
    "q17_window_frames" -> (Relational.q17WindowFrames _),
    "q18_topk" -> (Relational.q18TopK _),
    "q18_topk_group" ->
      ((s: SparkSession, d: String) => Relational.q18TopKGroup(s, d)),
    "q19_setops" -> (Relational.q19SetOps _),
    "q20_strings" -> (Relational.q20Strings _),
    "q21_math" -> (Relational.q21Math _),
    "q22_dates" -> (Relational.q22Dates _),
    "q22_dates_events" -> (Relational.q22DatesEvents _),
    "q22_date_arith" -> (Relational.q22DateArith _),
    "q23_json" -> (Relational.q23Json _),
    "q23_higher_order" -> (Relational.q23HigherOrder _),
    "q23_arrays" -> (Relational.q23Arrays _),
    "q23_maps" -> (Relational.q23Maps _),
    // Training-data pipeline ops (dedup / similarity / text analysis)
    "q24_dedup_exact" -> (Dedup.exact _),
    "q24_dedup_chunks" ->
      ((s: SparkSession, d: String) => Dedup.chunkDedup(s, d)),
    "q24_cdc_chunks" -> (Dedup.cdcChunks _),
    "q24_cdc_apply" -> (Dedup.cdcApply _),
    "q24_sample_stratified" ->
      ((s: SparkSession, d: String) => TextAnalysis.stratifiedSample(s, d)),
    "q24_span_dedup" ->
      ((s: SparkSession, d: String) => Dedup.spanDedup(s, d)),
    "q24_span_apply" ->
      ((s: SparkSession, d: String) => Dedup.spanDedupApply(s, d)),
    "q24_dedup_apply" -> (Dedup.applyExact _),
    "q24_dedup_jaccard" -> ((s: SparkSession, d: String) => Dedup.jaccard(s, d)),
    "q24_dedup_minhash" -> (Dedup.minhashLsh _),
    "q24_dedup_eval" -> (Dedup.dedupEval _),
    "q24_dedup_eval_sampled" ->
      ((s: SparkSession, d: String) => Dedup.dedupEvalSampled(s, d)),
    "q24_neardup_probe" -> (Dedup.neardupProbe _),
    "q24_dedup_clusters" -> ((s: SparkSession, d: String) => Dedup.dedupClusters(s, d)),
    "q24_dedup_survivors" -> ((s: SparkSession, d: String) => Dedup.survivors(s, d)),
    "q24_simhash" -> (Dedup.simhash _),
    "q24_simhash_pairs" -> (Dedup.simhashPairs _),
    "q25_cosine_pairs" -> (Similarity.cosinePairs _),
    "q25_ann_topk" -> ((s: SparkSession, d: String) => Similarity.annTopK(s, d)),
    "q25_embed_neardup" -> (Similarity.embedNearDup _),
    "q25_ann_lsh" -> (Similarity.lshBucketHistogram _),
    "q25_ann_multiprobe" ->
      ((s: SparkSession, d: String) => Similarity.annLshMultiProbe(s, d)),
    "q25_ann_quantized" ->
      ((s: SparkSession, d: String) => Similarity.annQuantized(s, d)),
    "q25_ann_binary" ->
      ((s: SparkSession, d: String) => Similarity.annBinary(s, d)),
    "q25_quant_recall" ->
      ((s: SparkSession, d: String) => Similarity.quantRecallEval(s, d)),
    "q25_ann_ivf" -> ((s: SparkSession, d: String) => Similarity.annIvf(s, d)),
    "q25_ann_ivf_loaded" ->
      ((s: SparkSession, d: String) => Similarity.annIvfLoaded(s, d)),
    "q25_ann_ivf_nprobe" ->
      ((s: SparkSession, d: String) => Similarity.annIvfProbe(s, d)),
    "q25_ann_filtered" ->
      ((s: SparkSession, d: String) => Similarity.annFiltered(s, d)),
    "q25_ann_ivf_filtered" ->
      ((s: SparkSession, d: String) => Similarity.annIvfFiltered(s, d)),
    "q25_ann_filtered_loaded" ->
      ((s: SparkSession, d: String) =>
        Similarity.annIvfFilteredLoaded(s, d)),
    "q25_ann_filtered_auto" ->
      ((s: SparkSession, d: String) =>
        Similarity.annIvfFilteredAuto(s, d)),
    "q25_ann_filtered_auto_loaded" ->
      ((s: SparkSession, d: String) =>
        Similarity.annIvfFilteredAutoLoaded(s, d)),
    "q25_ann_filtered_recall" ->
      ((s: SparkSession, d: String) =>
        Similarity.annFilteredRecallEval(s, d)),
    "q25_ann_ivf_loaded_nprobe" ->
      ((s: SparkSession, d: String) => Similarity.annIvfLoadedNprobe(s, d)),
    "q25_centroids" -> (Similarity.labelCentroids _),
    "q25_kmeans" ->
      ((s: SparkSession, d: String) => Similarity.kmeansCentroids(s, d)),
    "q25_semantic_clusters" -> (Similarity.semanticClusters _),
    "q25_semdedup_cells" -> (Similarity.semDedupCellTable _),
    "q25_semdedup_cells_coarse" -> (Similarity.semDedupCellsCoarse _),
    "q25_semdedup_pairs" ->
      ((s: SparkSession, d: String) => Similarity.semDedupPairs(s, d)),
    "q25_semdedup_pairs_coarse" ->
      ((s: SparkSession, d: String) =>
        Similarity.semDedupPairs(s, d, coarse = Some(true))),
    "q25_semdedup_eval" ->
      ((s: SparkSession, d: String) => Similarity.semDedupEval(s, d)),
    "q25_semdedup_full" ->
      ((s: SparkSession, d: String) => Similarity.semDedupFull(s, d)),
    "q25_semdedup_survivors" ->
      ((s: SparkSession, d: String) => Similarity.semDedupSurvivors(s, d)),
    "q25_knn_join" ->
      ((s: SparkSession, d: String) => Similarity.annKnnJoin(s, d)),
    // Faithful IR engine (tokenizer+stemmer not SQL-expressible →
    // rows-only driver check; conformance pinned by specs)
    "q26_ir_terms" -> (IrEngine.q26PipelineTerms _),
    "q26_ir_index" -> (IrEngine.q26StemmedIndex _),
    "q26_ir_merged" -> (IrEngine.q26MergedIndex _),
    "q26_ir_stream" -> (IrEngine.q26StreamedIndex _),
    "q26_ir_search" -> (IrEngine.q26Search _),
    "q26_ir_search_deleted" -> (IrEngine.q26SearchDeleted _),
    "q26_ir_rm3" -> (IrEngine.q26Rm3 _),
    "q26_ir_wildcard" -> (IrEngine.q26Wildcard _),
    "q26_ir_merged_wildcard" -> (IrEngine.q26MergedWildcard _),
    "q28_multimodal" -> (IrEngine.q28Multimodal _),
    "q28_resize" -> (IrEngine.q28Resize _),
    "q28_features" -> (IrEngine.q28Features _),
    "q28_audio" -> (IrEngine.q28Audio _),
    "q28_video" -> (IrEngine.q28Video _),
    "q35_rewrite_wildcard" -> (IrEngine.q35RewriteWildcard _),
    "q36_phrase" -> (IrEngine.q36Phrase _),
    "q36_phrase_deleted" -> (IrEngine.q36PhraseDeleted _),
    "q36_phrase_updated" -> (IrEngine.q36PhraseUpdated _),
    "q26_ir_search_updated" -> (IrEngine.q26SearchUpdated _),
    "q10_bm25_updated" ->
      ((s: SparkSession, d: String) => IrSql.q10Bm25Updated(s, d)),
    "q10_bm25_updated_compacted" ->
      ((s: SparkSession, d: String) =>
        IrSql.q10Bm25UpdatedCompacted(s, d)),
    "q10_bm25_deleted" ->
      ((s: SparkSession, d: String) => IrSql.q10Bm25Deleted(s, d)),
    "q10_bm25_deleted_lazy" ->
      ((s: SparkSession, d: String) => IrSql.q10Bm25DeletedLazy(s, d)),
    "q10_bm25_deleted_lazy_compacted" ->
      ((s: SparkSession, d: String) =>
        IrSql.q10Bm25DeletedLazyCompacted(s, d)),
    "q10_bm25_emptied" ->
      ((s: SparkSession, d: String) => IrSql.q10Bm25Emptied(s, d)),
    "q29_takedown_stream" -> (IrEngine.q29TakedownStream _),
    "q29_update_stream" -> (IrEngine.q29UpdateStream _),
    "q36_phrase_compressed" -> (IrEngine.q36PhraseCompressed _),
    "q36_phrase_merged" -> (IrEngine.q36PhraseMerged _),
    "q36_near" -> (IrEngine.q36Near _),
    "q36_near_ordered" -> (IrEngine.q36NearOrdered _),
    "q36_near_topk" -> (IrEngine.q36NearTopK _),
    "q36_snippet" -> (IrEngine.q36Snippet _),
    "q36_phrase_wildcard" -> (IrEngine.q36PhraseWildcard _),
    "q31_trec_source" -> (IrEngine.q31TrecSource _),
    "q29_streaming" -> (IrEngine.q29Streaming _),
    "q29_sliding" -> (IrEngine.q29Sliding _),
    "q29_dedup" -> (IrEngine.q29Dedup _),
    "q29_topk" ->
      ((s: SparkSession, d: String) => IrEngine.q29TopUsers(s, d)),
    "q29_join" -> (IrEngine.q29Join _),
    "q29_neardup_stream" -> (IrEngine.q29NeardupStream _),
    "q29_ann_stream" -> (IrEngine.q29AnnStream _),
    "q29_decontam_stream" -> (IrEngine.q29DecontamStream _),
    "q29_funnel_stream" -> (IrEngine.q29FunnelStream _),
    "q32_sessions" -> (IrEngine.q32Sessions _),
    // Temporal joins (as-of / range) — operators Spark lacks natively
    "q30_asof" -> (Temporal.q30AsOf _),
    "q30_range_join" -> (Temporal.q30RangeJoin _),
    "q27_langid" -> (TextAnalysis.langId _),
    "q27_quality" -> (TextAnalysis.quality _),
    "q27_domain_topq" -> (TextAnalysis.domainTopQuality _),
    "q27_token_drift" -> (TextAnalysis.tokenDrift _),
    "q27_token_count" -> (TextAnalysis.tokenCount _),
    "q27_vocab" ->
      ((s: SparkSession, d: String) => TextAnalysis.vocabCoverage(s, d)),
    "q27_langid_ngram" -> (TextAnalysis.langIdNgram _),
    "q27_fingerprint" -> (TextAnalysis.fingerprint _),
    "q27_filter_apply" ->
      ((s: SparkSession, d: String) => TextAnalysis.filterApply(s, d)),
    "q24_sample" ->
      ((s: SparkSession, d: String) => TextAnalysis.sampleByHash(s, d)),
    "q27_pipeline" -> (TextAnalysis.corpusPipeline _),
    "q27_redact" -> (TextAnalysis.redactPii _),
    "q27_repetition" -> (TextAnalysis.repetition _),
    "q27_contamination" -> (TextAnalysis.contamination _),
    "q27_decontaminate" -> (TextAnalysis.decontaminate _),
    "q27_decontaminate_multi" -> (TextAnalysis.decontaminateMulti _),
    "q27_funnel" -> (TextAnalysis.curationFunnel _),
    "q27_mixture" -> (TextAnalysis.mixCorpus _),
    "q27_mixture_alpha" ->
      ((s: SparkSession, d: String) => TextAnalysis.mixCorpusAlpha(s, d)),
    "q27_split" -> (TextAnalysis.trainValTestSplit _),
    "q27_corpus_stats" -> (TextAnalysis.corpusStats _),
    "q27_packing" ->
      ((s: SparkSession, d: String) => TextAnalysis.packSequences(s, d)),
    "q27_chunk" -> (TextAnalysis.chunk _),
    "q27_funnel_apply" ->
      ((s: SparkSession, d: String) =>
        TextAnalysis.curationFunnelApply(s, d)),
    "q27_funnel_apply_longest" ->
      ((s: SparkSession, d: String) =>
        TextAnalysis.curationFunnelApply(s, d, keepLongest = true)),
    "q27_upsample" -> (TextAnalysis.upsample _),
    "q24_dedup_delta" -> (Dedup.deltaDedup _),
    "q24_bloom_probe" ->
      ((s: SparkSession, d: String) => Dedup.bloomProbe(s, d)),
    "q25_joint_dedup" -> (Similarity.jointDedup _),
    "q25_knn_graph" ->
      ((s: SparkSession, d: String) => Similarity.knnGraph(s, d)),
    "q25_knn_graph_plain" ->
      ((s: SparkSession, d: String) => Similarity.knnGraphPlain(s, d)),
    "q25_semdedup_pairs_plain" ->
      ((s: SparkSession, d: String) => Similarity.semDedupPairsPlain(s, d)),
    "q25_knn_graph_coarse" ->
      ((s: SparkSession, d: String) =>
        Similarity.knnGraph(s, d, coarse = Some(true))),
    "q25_knn_graph_balanced" ->
      ((s: SparkSession, d: String) => Similarity.knnGraphBalanced(s, d)),
    "q25_ann_mrl" ->
      ((s: SparkSession, d: String) => Similarity.annMrl(s, d)),
    "q25_negatives" ->
      ((s: SparkSession, d: String) => Similarity.negatives(s, d)),
    "q25_negatives_coarse" ->
      ((s: SparkSession, d: String) =>
        Similarity.negatives(s, d, coarse = Some(true))),
    "q25_negatives_dense" ->
      ((s: SparkSession, d: String) => Similarity.negativesDense(s, d)),
    "q25_ann_recall" ->
      ((s: SparkSession, d: String) => Similarity.annRecallEval(s, d)),
    "q14_heavy_hitters" ->
      ((s: SparkSession, d: String) => TextAnalysis.heavyHitters(s, d)),
    "q27_lm_score" -> (TextAnalysis.lmScore _),
    "q27_bpe_train" -> (Bpe.bpeTrain _),
    "q27_bpe_apply" -> (Bpe.bpeApply _),
    "q27_bpe_pack" ->
      ((s: SparkSession, d: String) => Bpe.bpePack(s, d)),
    "q27_dsir" ->
      ((s: SparkSession, d: String) => TextAnalysis.dsirSelect(s, d)),
    "q37_hybrid_rrf" ->
      ((s: SparkSession, d: String) => Similarity.hybridRrf(s, d)),
    "q37_hybrid_rrf_filtered" ->
      ((s: SparkSession, d: String) => Similarity.hybridRrfFiltered(s, d)),
    "q37_hybrid_rrf_auto" ->
      ((s: SparkSession, d: String) => Similarity.hybridRrfAuto(s, d)),
    "q37_hybrid_recall" ->
      ((s: SparkSession, d: String) => Similarity.hybridRecallEval(s, d)),
    "q25_ann_ivf_auto" ->
      ((s: SparkSession, d: String) => Similarity.annIvfAuto(s, d)),
    "q25_ann_ivf_deleted" ->
      ((s: SparkSession, d: String) => Similarity.annIvfDeleted(s, d)),
    "q25_ann_ivf_updated" ->
      ((s: SparkSession, d: String) => Similarity.annIvfUpdated(s, d)),
    "q25_ann_ivf_deleted_compacted" ->
      ((s: SparkSession, d: String) =>
        Similarity.annIvfDeletedCompacted(s, d)),
    "q25_pq_codes" -> (Pq.pqCodes _),
    "q25_ann_pq" ->
      ((s: SparkSession, d: String) => Pq.annPq(s, d)),
    "q25_ann_ivfpq" ->
      ((s: SparkSession, d: String) => Pq.annIvfPq(s, d)),
    "q25_ann_ivfpq_loaded" ->
      ((s: SparkSession, d: String) => Pq.annIvfPqLoaded(s, d)),
    "q25_ann_ivfpq_filtered" ->
      ((s: SparkSession, d: String) => Pq.annIvfPqFiltered(s, d)),
    "q25_ann_ivfpq_filtered_loaded" ->
      ((s: SparkSession, d: String) => Pq.annIvfPqFilteredLoaded(s, d)),
    "q25_ann_ivfpq_filtered_auto" ->
      ((s: SparkSession, d: String) => Pq.annIvfPqFilteredAuto(s, d)),
    "q25_ann_ivfpq_filtered_auto_loaded" ->
      ((s: SparkSession, d: String) => Pq.annIvfPqFilteredAutoLoaded(s, d)),
    "q25_ann_ivfpq_deleted" ->
      ((s: SparkSession, d: String) => Pq.annIvfPqDeleted(s, d)),
    "q25_ann_ivfpq_deleted_compacted" ->
      ((s: SparkSession, d: String) => Pq.annIvfPqDeletedCompacted(s, d)),
    "q25_ann_ivfpq_updated" ->
      ((s: SparkSession, d: String) => Pq.annIvfPqUpdated(s, d)),
    "q33_pagerank" -> (Graph.q33PageRank _),
    "q33_triangles" -> (Graph.q33Triangles _),
    "q33_clustering" -> (Graph.q33Clustering _),
    "q34_zorder" -> (graft.ops.Layout.q34ZValue _),
    "q38_formats" -> (graft.ops.Formats.roundTrip _),
    "q39_ir_eval" ->
      ((s: SparkSession, d: String) => IrSql.q39IrEval(s, d)),
  )

  /** DuckDB dialect equivalents. Dialect notes: regexp_replace needs the
    * 'g' flag (Spark replaces all matches by default); epoch() returns
    * DOUBLE → cast BIGINT; generate_subscripts pairs with unnest for
    * positional explode; narrow ints cast to BIGINT to match Spark's
    * LongType output. */
  def oracleSql: Map[String, String] = {
    val base = oracleBase ++ TrainingOracles.oracle
    // output-identical variants checked against the SAME oracle: the
    // salted two-phase index == q06 by design; the durable
    // partition-pruned IVF store == the cached IVF probe by design
    base + ("q06_salted_index" -> base("q06_inverted_index")) +
      ("q25_ann_ivf_loaded" -> base("q25_ann_ivf")) +
      // the durable-store nProbe path == the in-memory nProbe ranking
      ("q25_ann_ivf_loaded_nprobe" -> base("q25_ann_ivf_nprobe")) +
      // the PQ-CODED durable store == the in-memory IVF-PQ ADC scan
      // (same codes, same distance table, same fold order)
      ("q25_ann_ivfpq_loaded" -> base("q25_ann_ivfpq")) +
      // the durable-store filtered probe == the in-memory filtered
      // nProbe ranking (same seeds, routing order, and predicate)
      ("q25_ann_filtered_loaded" -> base("q25_ann_ivf_filtered")) +
      // the adaptive probe over the durable store == the in-memory
      // adaptive probe (same seeds, ranking, ladder rule, predicate)
      ("q25_ann_filtered_auto_loaded" -> base("q25_ann_filtered_auto")) +
      // the filtered probe over the PQ-coded store == the in-memory
      // filtered IVF-PQ (same routing, codes, table, predicate)
      ("q25_ann_ivfpq_filtered_loaded" -> base("q25_ann_ivfpq_filtered")) +
      // the adaptive coded probe over the durable store == the
      // in-memory adaptive coded probe (same ladder rule + table)
      ("q25_ann_ivfpq_filtered_auto_loaded" ->
        base("q25_ann_ivfpq_filtered_auto")) +
      // physical reclaim of tombstoned vectors must not change any
      // answer: the compacted probe == the tombstoned probe's oracle
      ("q25_ann_ivf_deleted_compacted" -> base("q25_ann_ivf_deleted")) +
      // the coded store's reclaim drops every dead row (no retained
      // seeds — its coordinates live in the embeddings table): same
      // oracle as the tombstoned coded probe
      ("q25_ann_ivfpq_deleted_compacted" ->
        base("q25_ann_ivfpq_deleted")) +
      // the one-pass streaming funnel's gate decisions == the batch
      // curation funnel's row-for-row (range-chunk staging makes the
      // stream's first-arrival keeper the batch's global-min keeper)
      ("q29_funnel_stream" -> base("q27_funnel")) +
      // hybrid recall panel: hits of the ROUTED fusion's top-10 in
      // the cap-probe fused truth — both arms ARE the two pinned
      // hybrid entries' SQL, wrapped as derived tables (the
      // q25_quant_recall discipline), so the panel cannot drift
      ("q37_hybrid_recall" ->
        s"""WITH truth AS (SELECT doc_id FROM (${base("q37_hybrid_rrf")})),
           auto AS (SELECT doc_id FROM (${base("q37_hybrid_rrf_auto")})),
           h AS (SELECT CAST(count(*) AS BIGINT) AS hits
                 FROM auto JOIN truth USING (doc_id))
           SELECT 'auto' AS method, hits,
                  round(CAST(hits AS DOUBLE) / 10, 4) AS recall10
           FROM h""")
  }

  /** The BM25 ranking oracle — shared by q10_bm25 and the lexical arm
    * of q37_hybrid_rrf. `filtered` restricts the CANDIDATES (after
    * the df window — term statistics stay collection-global) to the
    * metadata survivors, mirroring `IrSql.q10Bm25Filtered` for the
    * filtered fusion's lexical arm. */
  private def bm25Sql(filtered: Boolean = false): String = {
    val fCte =
      if (filtered)
        s""",
       fset AS (SELECT doc_id FROM documents
                WHERE lang = '${graft.ops.Similarity.FilterLang}'
                  AND n_chars >= ${graft.ops.Similarity.FilterMinChars})"""
      else ""
    val fJoin = if (filtered) " JOIN fset USING (doc_id)" else ""
    s"""WITH tok AS (
         SELECT doc_id, unnest(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS term
         FROM documents),
       t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
       len AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
       st AS (SELECT CAST(sum(dl) AS BIGINT) AS tt, count(*) AS nd FROM len),
       tf AS (SELECT term, doc_id, count(*) AS tf FROM t
              WHERE term IN (${IrSql.DefaultQueryTerms.map("'" + _ + "'").mkString(", ")}) GROUP BY term, doc_id),
       wdf AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf)$fCte
       SELECT doc_id,
              round(sum(ln((nd - df + 0.5) / (df + 0.5) + 1.0) * (tf * ${IrSql.Bm25K1 + 1}) /
                        (tf + ${IrSql.Bm25K1} * (${1 - IrSql.Bm25B} + ${IrSql.Bm25B} * dl / (CAST(tt AS DOUBLE) / nd)))), 4) AS score
       FROM wdf JOIN len USING (doc_id)$fJoin CROSS JOIN st
       GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10"""
  }

  /** The MULTI-TERM BM25 oracle (q10_bm25_multi == q10_bm25_pruned —
    * pruning is result-invariant, so both entries share this one SQL):
    * same scoring arithmetic as [[bm25Sql]] but per-posting
    * contributions quantized to 1e-9 and integer-summed
    * ([[IrSql.Bm25Scale]]) so the 8-term per-doc total is
    * aggregation-order-exact on both engines. */
  private def bm25MultiSql: String = bm25MultiSqlOver("documents")

  /** [[bm25MultiSql]] over an arbitrary documents relation — the
    * deletion oracle recomputes full BM25 over the corpus WITHOUT the
    * deleted docs (df/tt/nd all shift, unlike the filtered oracle
    * where statistics stay global). */
  private def bm25MultiSqlOver(docsRel: String): String =
    s"""WITH tok AS (
         SELECT doc_id, unnest(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS term
         FROM $docsRel),
       t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
       len AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
       st AS (SELECT CAST(sum(dl) AS BIGINT) AS tt, count(*) AS nd FROM len),
       tf AS (SELECT term, doc_id, count(*) AS tf FROM t
              WHERE term IN (${IrSql.ExpandedQueryTerms.map("'" + _ + "'").mkString(", ")}) GROUP BY term, doc_id),
       wdf AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf),
       s AS (SELECT doc_id,
                    CAST(round(ln((nd - df + 0.5) / (df + 0.5) + 1.0) * (tf * ${IrSql.Bm25K1 + 1}) /
                               (tf + ${IrSql.Bm25K1} * (${1 - IrSql.Bm25B} + ${IrSql.Bm25B} * dl / (CAST(tt AS DOUBLE) / nd)))
                               * ${IrSql.Bm25Scale}) AS BIGINT) AS s9
             FROM wdf JOIN len USING (doc_id) CROSS JOIN st)
       SELECT doc_id, round(CAST(sum(s9) AS DOUBLE) / ${IrSql.Bm25Scale}, 4) AS score
       FROM s GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10"""

  /** The BATCH multi-term BM25 oracle (q10_bm25_batch): the VALUES
    * query table comes verbatim from [[IrSql.BatchQueries]], scoring
    * is [[bm25MultiSql]]'s quantized arithmetic per (qid, doc), and
    * the per-qid rank window re-proves the bounded heap. */
  private def bm25BatchSql: String = {
    val values = IrSql.BatchQueries
      .flatMap { case (qid, ts) => ts.distinct.map(t => s"($qid, '$t')") }
      .mkString(", ")
    val allTerms = IrSql.BatchQueries.flatMap(_._2).distinct
      .map("'" + _ + "'").mkString(", ")
    s"""WITH qq(qid, term) AS (VALUES $values),
       tok AS (
         SELECT doc_id, unnest(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS term
         FROM documents),
       t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
       len AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
       st AS (SELECT CAST(sum(dl) AS BIGINT) AS tt, count(*) AS nd FROM len),
       tf AS (SELECT term, doc_id, count(*) AS tf FROM t
              WHERE term IN ($allTerms) GROUP BY term, doc_id),
       wdf AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf),
       s AS (SELECT qq.qid, wdf.doc_id,
                    CAST(round(ln((nd - df + 0.5) / (df + 0.5) + 1.0) * (tf * ${IrSql.Bm25K1 + 1}) /
                               (tf + ${IrSql.Bm25K1} * (${1 - IrSql.Bm25B} + ${IrSql.Bm25B} * dl / (CAST(tt AS DOUBLE) / nd)))
                               * ${IrSql.Bm25Scale}) AS BIGINT) AS s9
             FROM wdf JOIN len USING (doc_id) CROSS JOIN st
                  JOIN qq ON qq.term = wdf.term),
       g AS (SELECT qid, doc_id,
                    round(CAST(sum(s9) AS DOUBLE) / ${IrSql.Bm25Scale}, 4) AS score
             FROM s GROUP BY qid, doc_id),
       r AS (SELECT qid, doc_id, score,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY score DESC, doc_id) AS rank
             FROM g)
       SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
              doc_id, score
       FROM r WHERE rank <= 10 ORDER BY qid, rank"""
  }

  private def oracleBase: Map[String, String] = Map(
    "q01_scan_filter" ->
      """SELECT doc_id, n_chars FROM documents WHERE lang = 'en' ORDER BY doc_id""",

    "q02_docid_extract" ->
      """SELECT trim(regexp_extract(content, '<DOCNO>(.*?)</DOCNO>', 1)) AS docid
         FROM (SELECT '<DOC> <DOCNO> FT-' || doc_id || ' </DOCNO> <TEXT> ' || text || ' </TEXT> </DOC>' AS content FROM documents)
         ORDER BY docid""",

    "q02_trectext_fields" ->
      """SELECT doc_id, concat_ws(' ',
                trim(regexp_extract(content, '<HEADLINE>(.*?)</HEADLINE>', 1)),
                trim(regexp_extract(content, '<TEXT>(.*?)</TEXT>', 1))) AS kept
         FROM (SELECT doc_id, '<DOC> <DOCNO>D' || doc_id || '</DOCNO> <HEADLINE>h ' || doc_id ||
                      '</HEADLINE> <TEXT>' || text || '</TEXT> <IGNORED>zzz</IGNORED> </DOC>' AS content
               FROM documents)
         ORDER BY doc_id""",

    "q02_urlscrub" ->
      """SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(lower(url),
                '#.*$', ''), ':80/', '/'), '/+$', '') AS scrubbed
         FROM (SELECT doc_id, 'HTTP://Example' || doc_id || '.COM:80/Path/To/' || source || '/#Frag' AS url
               FROM documents)
         ORDER BY doc_id""",

    "q09_wildcard" ->
      """WITH terms AS (
           SELECT DISTINCT term FROM (
             SELECT unnest(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS term
             FROM documents)
           WHERE term <> ''),
         grams AS (
           SELECT DISTINCT substring('$' || term || '$', CAST(i AS INT), 3) AS gram, term
           FROM (SELECT term, unnest(range(1, CAST(len(term) AS BIGINT) + 1)) AS i FROM terms))
         SELECT term FROM grams WHERE gram IN ('$st', 'am$')
         GROUP BY term
         HAVING count(*) = 2 AND term LIKE 'st%am'
         ORDER BY term""",

    // the vocabulary RECOUNT ground truth for the surgically-deleted
    // chargram store: rebuild the q09 vocabulary from the corpus
    // minus the fixed takedown set — a term survives iff some live
    // doc still contains it, exactly the df-sidecar rule
    "q09_wildcard_deleted" ->
      """WITH terms AS (
           SELECT DISTINCT term FROM (
             SELECT unnest(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS term
             FROM documents WHERE doc_id % 13 <> 5)
           WHERE term <> ''),
         grams AS (
           SELECT DISTINCT substring('$' || term || '$', CAST(i AS INT), 3) AS gram, term
           FROM (SELECT term, unnest(range(1, CAST(len(term) AS BIGINT) + 1)) AS i FROM terms))
         SELECT term FROM grams WHERE gram IN ('$st', 'am$')
         GROUP BY term
         HAVING count(*) = 2 AND term LIKE 'st%am'
         ORDER BY term""",

    // the vocabulary ground truth for the UPDATED chargram store:
    // rebuild the q09 vocabulary from the corpus with the re-crawl
    // set's text replaced — the suffix's stqzam matches st*am and
    // exists only in updated docs, so the gate proves the incremental
    // update ADDS vocabulary
    "q09_wildcard_updated" ->
      s"""WITH terms AS (
           SELECT DISTINCT term FROM (
             SELECT unnest(string_split(regexp_replace(lower(
               CASE WHEN doc_id % ${IrSql.UpdatedDocsMod} = ${IrSql.UpdatedDocsRem} THEN text || '${IrSql.UpdateSuffix}' ELSE text END),
               '[^a-z0-9]+', ' ', 'g'), ' ')) AS term
             FROM documents)
           WHERE term <> ''),
         grams AS (
           SELECT DISTINCT substring('$$' || term || '$$', CAST(i AS INT), 3) AS gram, term
           FROM (SELECT term, unnest(range(1, CAST(len(term) AS BIGINT) + 1)) AS i FROM terms))
         SELECT term FROM grams WHERE gram IN ('$$st', 'am$$')
         GROUP BY term
         HAVING count(*) = 2 AND term LIKE 'st%am'
         ORDER BY term""",

    // kept = whole lines of whitelisted sections INCLUDING tag lines,
    // '\n'-terminated; <IGNORED> dropped; nested <INNER> line survives
    "q02_trectext_full" ->
      """SELECT doc_id, 'TT-' || doc_id AS docid,
                '<HEADLINE>' || chr(10) || 'h ' || doc_id || chr(10) ||
                '</HEADLINE>' || chr(10) ||
                '<TEXT>' || chr(10) || text || chr(10) ||
                '<INNER>kept</INNER>' || chr(10) || '</TEXT>' || chr(10) AS kept
         FROM documents ORDER BY doc_id""",

    // reference scrub steps in lockstep: drop one trailing '#', lower,
    // ':80/'->'/', drop trailing ':80', strip trailing slashes; body =
    // 'body ' || text || '\n' (6 extra chars)
    "q02_trecweb_meta" ->
      """SELECT doc_id, 'WEB-' || doc_id AS web_docid,
                regexp_replace(
                  CASE WHEN u LIKE '%:80' THEN replace(u, ':80', '') ELSE u END,
                  '/+$', '') AS url,
                CAST(length(text) + 6 AS BIGINT) AS n_body
         FROM (SELECT doc_id, text,
                      replace(lower(regexp_replace(
                        'HTTP://Example' || doc_id || '.COM:80/p/' || source || '/#',
                        '#$', '')), ':80/', '/') AS u
               FROM documents)
         ORDER BY doc_id""",

    // multi-* pattern str*ea*m: grams only from the >=3-char anchored
    // segment ("$str" -> $st, str); short segments enforced by LIKE
    "q09_wildcard_multi" ->
      """WITH terms AS (
           SELECT DISTINCT term FROM (
             SELECT unnest(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS term
             FROM documents)
           WHERE term <> ''),
         grams AS (
           SELECT DISTINCT substring('$' || term || '$', CAST(i AS INT), 3) AS gram, term
           FROM (SELECT term, unnest(range(1, CAST(len(term) AS BIGINT) + 1)) AS i FROM terms))
         SELECT term FROM grams WHERE gram IN ('$st', 'str')
         GROUP BY term
         HAVING count(*) = 2 AND term LIKE 'str%ea%m'
         ORDER BY term""",

    "q03_docno_assign" ->
      """SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS docno
         FROM documents ORDER BY doc_id""",

    "q04_tokenize" ->
      """SELECT doc_id, pos, term FROM (
           SELECT doc_id, CAST(generate_subscripts(l, 1) AS BIGINT) AS pos, unnest(l) AS term
           FROM (SELECT doc_id, string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ') AS l
                 FROM documents WHERE doc_id < 100))
         WHERE term <> '' ORDER BY doc_id, pos""",

    "q05_term_tf" ->
      """SELECT term, doc_id, count(*) AS tf FROM (
           SELECT doc_id, unnest(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS term
           FROM documents)
         WHERE term <> '' GROUP BY term, doc_id ORDER BY term, doc_id""",

    "q06_inverted_index" ->
      """WITH tf AS (
           SELECT term, doc_id, count(*) AS tf FROM (
             SELECT doc_id, unnest(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS term
             FROM documents)
           WHERE term <> '' GROUP BY term, doc_id)
         SELECT term, count(*) AS df,
                string_agg(doc_id || ':' || tf, ' ' ORDER BY tf DESC, doc_id) AS postings
         FROM tf GROUP BY term ORDER BY term""",

    "q06_bigram_index" ->
      """WITH tok AS (
           SELECT doc_id, pos, term FROM (
             SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS term
             FROM (SELECT doc_id, string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ') AS l
                   FROM documents WHERE doc_id < 100))
           WHERE term <> ''),
         tf AS (SELECT a.term || ' ' || b.term AS bigram, a.doc_id AS doc_id, count(*) AS tf
                FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                GROUP BY 1, 2)
         SELECT bigram, count(*) AS df,
                string_agg(doc_id || ':' || tf, ' ' ORDER BY tf DESC, doc_id) AS postings
         FROM tf GROUP BY bigram ORDER BY bigram""",

    "q07_bigrams" ->
      """WITH tok AS (
           SELECT doc_id, pos, term FROM (
             SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS term
             FROM (SELECT doc_id, string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ') AS l
                   FROM documents WHERE doc_id < 100))
           WHERE term <> '')
         SELECT a.term || ' ' || b.term AS bigram, count(*) AS cnt
         FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         GROUP BY 1 ORDER BY bigram""",

    "q08_chargrams" ->
      """WITH terms AS (
           SELECT DISTINCT term FROM (
             SELECT unnest(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS term
             FROM documents)
           WHERE term <> '')
         SELECT DISTINCT substring('$' || term || '$', CAST(i AS INT), 3) AS gram, term
         FROM (SELECT term, unnest(range(1, CAST(len(term) AS BIGINT) + 1)) AS i FROM terms)
         ORDER BY gram, term""",

    "q09_chargram_terms" ->
      """WITH terms AS (
           SELECT DISTINCT term FROM (
             SELECT unnest(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS term
             FROM documents)
           WHERE term <> ''),
         grams AS (
           SELECT DISTINCT substring('$' || term || '$', CAST(i AS INT), 3) AS gram, term
           FROM (SELECT term, unnest(range(1, CAST(len(term) AS BIGINT) + 1)) AS i FROM terms))
         SELECT gram, string_agg(term, ' ' ORDER BY term) AS terms
         FROM grams GROUP BY gram ORDER BY gram""",

    "q10_tfidf" ->
      """WITH tf AS (
           SELECT term, doc_id, count(*) AS tf FROM (
             SELECT doc_id, unnest(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS term
             FROM documents)
           WHERE term IN ('merge', 'stream') GROUP BY term, doc_id),
         wdf AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf),
         n AS (SELECT count(*) AS n FROM documents)
         SELECT doc_id, round(sum((1.0 + ln(tf)) * log10(CAST(n AS DOUBLE) / CAST(df AS DOUBLE))), 4) AS score
         FROM wdf CROSS JOIN n
         GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""",

    // constants genuinely interpolated from IrSql.Bm25K1/Bm25B and
    // DefaultQueryTerms — the same Scala values the plan uses
    "q10_bm25" -> bm25Sql(),
    // the pruned plan is result-invariant ⇒ one oracle for both
    "q10_bm25_multi" -> bm25MultiSql,
    "q10_bm25_pruned" -> bm25MultiSql,

    // tombstoned retrieval == rebuild-without-docs: full BM25
    // recomputed over the corpus minus the fixed takedown set (the
    // engine side serves it from a store with PENDING tombstones)
    "q10_bm25_deleted" -> bm25MultiSqlOver(
      s"""(SELECT * FROM documents
           WHERE NOT (doc_id % ${IrSql.DeletedDocsMod} = ${IrSql.DeletedDocsRem}))"""),
    // recomputed over the corpus with the re-crawl set's text
    // REPLACED (suffix appended): update-in-place must equal a
    // rebuild over the updated corpus — df, tf, dl, tt, nd all
    // exact. `updated` serves the UNCOMPACTED generation-versioned
    // store (deferred-read corrections); `updated_compacted` the
    // folded plain store — same ground truth either way
    "q10_bm25_updated" -> bm25MultiSqlOver(
      s"""(SELECT doc_id,
             CASE WHEN doc_id % ${IrSql.UpdatedDocsMod} = ${IrSql.UpdatedDocsRem}
                  THEN text || '${IrSql.UpdateSuffix}'
                  ELSE text END AS text
           FROM documents)"""),
    "q10_bm25_updated_compacted" -> bm25MultiSqlOver(
      s"""(SELECT doc_id,
             CASE WHEN doc_id % ${IrSql.UpdatedDocsMod} = ${IrSql.UpdatedDocsRem}
                  THEN text || '${IrSql.UpdateSuffix}'
                  ELSE text END AS text
           FROM documents)"""),
    // the LAZY delete defers the touched-term stats recompute to
    // compaction; both its read paths (sidecar-corrected pending
    // store, compacted store) must hit the same reduced-corpus truth
    "q10_bm25_deleted_lazy" -> bm25MultiSqlOver(
      s"""(SELECT * FROM documents
           WHERE NOT (doc_id % ${IrSql.DeletedDocsMod} = ${IrSql.DeletedDocsRem}))"""),
    "q10_bm25_deleted_lazy_compacted" -> bm25MultiSqlOver(
      s"""(SELECT * FROM documents
           WHERE NOT (doc_id % ${IrSql.DeletedDocsMod} = ${IrSql.DeletedDocsRem}))"""),
    // re-crawl to EMPTY text (zero tokens) then compact: for BM25 an
    // empty doc == an absent doc, so the ground truth is the same
    // reduced-corpus recompute — pins that a zero-row generation is
    // never resurrected by the compaction
    "q10_bm25_emptied" -> bm25MultiSqlOver(
      s"""(SELECT * FROM documents
           WHERE NOT (doc_id % ${IrSql.DeletedDocsMod} = ${IrSql.DeletedDocsRem}))"""),
    // the streaming takedown feed composes to the one-shot batch
    // delete: same reduced-corpus ground truth
    "q29_takedown_stream" -> bm25MultiSqlOver(
      s"""(SELECT * FROM documents
           WHERE NOT (doc_id % ${IrSql.DeletedDocsMod} = ${IrSql.DeletedDocsRem}))"""),
    // the streaming re-crawl feed composes to the one-shot batch
    // update: same updated-corpus ground truth as q10_bm25_updated
    "q29_update_stream" -> bm25MultiSqlOver(
      s"""(SELECT doc_id,
             CASE WHEN doc_id % ${IrSql.UpdatedDocsMod} = ${IrSql.UpdatedDocsRem}
                  THEN text || '${IrSql.UpdateSuffix}'
                  ELSE text END AS text
           FROM documents)"""),
    "q10_bm25_batch" -> bm25BatchSql,
    // the store-served batch == the corpus-scored batch by design
    "q10_bm25_batch_stored" -> bm25BatchSql,

    // interchange round-trips: the engine must write+read each format;
    // the oracle computes the expected (count, order-free content
    // hash) once per format straight from the source table — equality
    // proves lossless round-trips
    "q38_formats" -> {
      val fmts = graft.ops.Formats.RoundTripFormats
        .map("('" + _ + "')").mkString(", ")
      // the null sentinel rendered as a DuckDB expression, DERIVED
      // from the engine's constant so the two sides cannot drift
      // (control chars via chr(), printable runs quoted)
      val sent = graft.ops.Formats.NullSentinel
        .foldLeft(List.empty[(Boolean, String)]) { (acc, c) =>
          val ctl = c < ' '
          acc match {
            case (false, s) :: t if !ctl => (false, s + c) :: t
            case _ if ctl => (true, s"chr(${c.toInt})") :: acc
            case _ => (false, c.toString) :: acc
          }
        }.reverse
        .map { case (ctl, s) => if (ctl) s else s"'$s'" }
        .mkString("(", " || ", ")")
      s"""WITH f(format) AS (VALUES $fmts),
         d AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
                      CAST(sum(${graft.ops.CrossHash.ddbPolyHash(
                        "CAST(doc_id AS VARCHAR) || ' ' || " +
                          s"coalesce(lang, $sent) || ' ' || " +
                          s"coalesce(text, $sent)")}) AS BIGINT) AS hash_sum
               FROM documents)
         SELECT format, n_rows, hash_sum FROM f CROSS JOIN d
         ORDER BY format"""
    },

    // RRF fusion of the BM25 arm and the dense ANN arm: ranks from
    // each arm's top-10 output, floor(1e6/(rank+60)) contributions
    // (floor, not cast — DuckDB's double→BIGINT cast rounds where
    // Spark truncates), full outer join so single-arm docs fuse
    "q37_hybrid_rrf" ->
      s"""WITH lex AS (SELECT doc_id,
                       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
                FROM (${bm25Sql()})),
         semall AS (SELECT vec_id, round(c, 4) AS cos
                FROM (SELECT vec_id,
                             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                               list_transform(range(1, len(embedding) + 1),
                                 i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))),
                               (acc, x) -> acc + x)
                             / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                 list_transform(range(1, len(embedding) + 1),
                                   i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
                                 (acc, x) -> acc + x)) *
                                sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                 list_transform(range(1, len(qv) + 1),
                                   i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))),
                                 (acc, x) -> acc + x))) AS c
                      FROM embeddings CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
                      WHERE vec_id <> 0)
                ORDER BY c DESC, vec_id LIMIT 10),
         sem AS (SELECT vec_id AS doc_id,
                       CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS sem_rank
                FROM semall),
         f AS (SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id, lex_rank, sem_rank,
                      coalesce(CAST(floor(1000000 / (lex_rank + 60)) AS BIGINT), 0) +
                      coalesce(CAST(floor(1000000 / (sem_rank + 60)) AS BIGINT), 0) AS rrf
               FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
         SELECT doc_id, lex_rank, sem_rank, rrf FROM f
         ORDER BY rrf DESC, doc_id LIMIT 10""",

    // FILTERED hybrid fusion: the lexical arm is the filtered BM25
    // oracle (candidates restricted after the df window), the
    // semantic arm is the ADAPTIVE filtered probe's SQL — the very
    // ladder rule q25_ann_filtered_auto hash-checks — fused by the
    // same RRF arithmetic as q37_hybrid_rrf
    "q37_hybrid_rrf_filtered" ->
      s"""WITH lex AS (SELECT doc_id,
                       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
                FROM (${bm25Sql(filtered = true)})),
         sem AS (SELECT vec_id AS doc_id,
                       CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS sem_rank
                FROM (${graft.ops.TrainingOracles.annIvfFilteredAutoSql(k = 10)})),
         f AS (SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id, lex_rank, sem_rank,
                      coalesce(CAST(floor(1000000 / (lex_rank + 60)) AS BIGINT), 0) +
                      coalesce(CAST(floor(1000000 / (sem_rank + 60)) AS BIGINT), 0) AS rrf
               FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
         SELECT doc_id, lex_rank, sem_rank, rrf FROM f
         ORDER BY rrf DESC, doc_id LIMIT 10""",

    // the ROUTED adaptive probe, unfiltered — the serving default's
    // vector arm (ladder rule replicated in SQL, filter-free)
    "q25_ann_ivf_auto" ->
      graft.ops.TrainingOracles.annIvfAutoSql(k = 10),

    // ROUTED hybrid fusion: exact BM25 arm + the adaptive unfiltered
    // probe's SQL, fused by the same RRF arithmetic — the batch twin
    // of HybridServer's production default
    "q37_hybrid_rrf_auto" ->
      s"""WITH lex AS (SELECT doc_id,
                       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
                FROM (${bm25Sql()})),
         sem AS (SELECT vec_id AS doc_id,
                       CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS sem_rank
                FROM (${graft.ops.TrainingOracles.annIvfAutoSql(k = 10)})),
         f AS (SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id, lex_rank, sem_rank,
                      coalesce(CAST(floor(1000000 / (lex_rank + 60)) AS BIGINT), 0) +
                      coalesce(CAST(floor(1000000 / (sem_rank + 60)) AS BIGINT), 0) AS rrf
               FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
         SELECT doc_id, lex_rank, sem_rank, rrf FROM f
         ORDER BY rrf DESC, doc_id LIMIT 10""",

    "q11_join" ->
      """SELECT o_orderkey, o_totalprice, c_name, n_name
         FROM orders JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
         WHERE o_totalprice > 400000
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",

    "q12_semi" ->
      """SELECT o_orderkey FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
         ORDER BY o_orderkey""",

    "q12_anti" ->
      """SELECT o_orderkey FROM orders
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
         ORDER BY o_orderkey""",

    "q13_revenue" ->
      """SELECT l_orderkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
                count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'O'
         GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 100""",

    "q14_count_distinct" ->
      """SELECT o_custkey, count(DISTINCT o_orderstatus) AS n_status, count(*) AS n_orders
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",

    // TPC-H Q1: money sums ride the fixed-point pattern (cents-exact
    // data, so per-row quantization is the identity; BIGINT sums are
    // engine-exact where raw double sums drift past round(2) here)
    "q13_tpch_pricing" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
                round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_base_price,
                round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e4, 0) AS BIGINT)) AS DOUBLE) / 1e4, 2) AS sum_disc_price,
                round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1e6, 0) AS BIGINT)) AS DOUBLE) / 1e6, 2) AS sum_charge,
                round(CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS DOUBLE) / count(*), 4) AS avg_qty,
                round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 / count(*), 4) AS avg_price,
                round(CAST(sum(CAST(round(l_discount * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 / count(*), 4) AS avg_disc,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    // sketch estimates are engine-specific; the oracle pins the exact
    // values and asserts the Spark-side error-bound flags came out true
    "q14_approx_distinct" ->
      """SELECT l_returnflag,
                CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_keys,
                true AS hll_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q21_approx_quantiles" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
                round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
                true AS approx_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q15_rollup" ->
      """SELECT r_name, n_name, round(sum(s_acctbal), 2) AS total_bal,
                CAST(grouping(r_name) AS BIGINT) AS g_r, CAST(grouping(n_name) AS BIGINT) AS g_n
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""",

    "q15_cube" ->
      """SELECT r_name, n_name, count(*) AS n_supp,
                round(avg(s_acctbal), 4) AS avg_bal,
                CAST(grouping(r_name) AS BIGINT) AS g_r, CAST(grouping(n_name) AS BIGINT) AS g_n
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey
         GROUP BY CUBE (r_name, n_name)
         ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""",

    "q15_grouping_sets" ->
      """SELECT r_name, n_name, count(*) AS n_supp,
                round(sum(s_acctbal), 2) AS total_bal,
                CAST(grouping(r_name) AS BIGINT) AS g_r,
                CAST(grouping(n_name) AS BIGINT) AS g_n
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey
         GROUP BY GROUPING SETS ((r_name), (n_name), ())
         ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST""",

    "q21_stats" ->
      """SELECT l_returnflag,
                round(stddev_samp(l_quantity), 4) AS sd_qty,
                round(stddev_pop(l_quantity), 4) AS sdp_qty,
                round(var_samp(l_quantity), 4) AS var_qty,
                round(avg(l_quantity), 4) AS avg_qty,
                round(corr(l_quantity, CAST(l_linenumber AS DOUBLE)), 4) AS corr_ql,
                round(covar_samp(l_quantity, CAST(l_linenumber AS DOUBLE)), 4) AS cov_ql
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q16_window_nav" ->
      """SELECT o_custkey, o_orderkey,
                lead(o_orderkey, 1) OVER w AS next_key,
                first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key,
                last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
                CAST(ntile(4) OVER w AS BIGINT) AS quartile
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
         ORDER BY o_custkey, o_orderkey""",

    "q20_strings2" ->
      """SELECT p_partkey,
                lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '-') AS rp,
                translate(p_name, 'aeiou', 'AEIOU') AS tr,
                repeat(p_type, 2) AS rep2, reverse(p_name) AS rev,
                split_part(p_name, ' ', 1) AS first_word,
                left(p_name, 5) AS l5, right(p_name, 5) AS r5
         FROM part ORDER BY p_partkey""",

    "q21_nulls" ->
      """SELECT l_orderkey, l_linenumber,
                round(coalesce(CASE WHEN l_discount > 0.05 THEN l_discount END, -1.0), 4) AS c1,
                CAST(nullif(l_linenumber, 1) AS BIGINT) AS n1,
                CASE WHEN (CASE WHEN l_discount > 0.05 THEN l_discount END) IS NULL
                     THEN 'none' ELSE 'some' END AS tag
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q21_percentiles" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_quantity, 0.25), 4) AS p25,
                round(quantile_cont(l_quantity, 0.5), 4) AS p50,
                round(quantile_cont(l_quantity, 0.75), 4) AS p75,
                round(quantile_cont(l_extendedprice, 0.5), 4) AS med_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q16_rank_windows" ->
      """SELECT * FROM (
           SELECT o_custkey, o_orderkey,
                  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
                  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS BIGINT) AS rk,
                  CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS BIGINT) AS drk
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "q17_window_frames" ->
      """SELECT event_id, user_id,
                round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS running_sum,
                round(coalesce(lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 4) AS prev_value
         FROM events ORDER BY event_id""",

    "q18_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",

    // top-k per group: the oracle's window form is output-identical to
    // the engine's bounded-heap aggregate (same desc-score, asc-key
    // tie-break)
    "q18_topk_group" ->
      """SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                      row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
               FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "q19_setops" ->
      """SELECT tag, k FROM (
           SELECT 'both' AS tag, k FROM
             (SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer INTERSECT SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
           UNION ALL
           SELECT 'cust_only', k FROM
             (SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer EXCEPT SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
           UNION ALL
           SELECT 'supp_only', k FROM
             (SELECT CAST(s_nationkey AS BIGINT) AS k FROM supplier EXCEPT SELECT CAST(c_nationkey AS BIGINT) FROM customer))
         ORDER BY tag, k""",

    "q20_strings" ->
      """SELECT p_partkey, lower(p_name) AS lo, upper(p_brand) AS up, trim(p_name) AS tr,
                substring(p_name, 1, 8) AS sub8, CAST(instr(p_name, 'a') AS BIGINT) AS ia,
                CAST(length(p_name) AS BIGINT) AS len, concat_ws('|', p_brand, p_type) AS cw,
                regexp_replace(p_name, ' ', '_', 'g') AS rep,
                regexp_extract(p_name, '([a-z]+)', 1) AS rx,
                CASE WHEN starts_with(p_name, 'a') THEN 1 ELSE 0 END AS sw
         FROM part ORDER BY p_partkey""",

    "q21_math" ->
      """SELECT l_orderkey, l_linenumber,
                round(ln(l_extendedprice), 4) AS ln_price,
                round(log10(l_extendedprice), 4) AS log10_price,
                CAST(ceil(l_discount * 100) AS BIGINT) AS ceil_disc,
                CAST(floor(l_tax * 100) AS BIGINT) AS floor_tax,
                round(abs(l_discount - l_tax), 4) AS abs_diff,
                round(least(l_quantity, 25.0), 4) AS lq,
                round(greatest(l_quantity, 25.0), 4) AS gq,
                (l_orderkey * l_linenumber) % 97 AS m
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q22_dates" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y,
                CAST(month(o_orderdate) AS BIGINT) AS m,
                CAST(day(o_orderdate) AS BIGINT) AS d,
                CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_start
         FROM orders ORDER BY o_orderkey""",

    "q22_dates_events" ->
      """SELECT event_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
                CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hr
         FROM events ORDER BY event_id""",

    "q22_date_arith" ->
      """SELECT o_orderkey,
                CAST(datediff('day', o_orderdate, DATE '1998-01-01') AS BIGINT) AS days_to_98,
                CAST(o_orderdate + INTERVAL 30 DAY AS DATE)::VARCHAR AS plus30,
                CAST(o_orderdate + INTERVAL 2 MONTH AS DATE)::VARCHAR AS plus2m,
                last_day(o_orderdate)::VARCHAR AS eom,
                CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow
         FROM orders ORDER BY o_orderkey""",

    "q23_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events ORDER BY event_id""",

    // Streaming tumbling windows == batch hour-truncated aggregation
    // (EventsStreamSpec proves stream==batch; the oracle checks batch).
    "q29_streaming" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS w_sec, user_id,
                count(*) AS n_events, round(sum(value), 4) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY w_sec, user_id""",

    // streaming per-window top-3 users == batch rank over the same
    // hourly counts (score desc, id asc — graft_topk's tie rule)
    "q29_topk" ->
      """WITH w AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS w_sec,
                           user_id, count(*) AS n
                    FROM events GROUP BY 1, 2)
         SELECT w_sec, CAST(rn AS BIGINT) AS rn, user_id,
                CAST(n AS BIGINT) AS n_events
         FROM (SELECT w_sec, user_id, n,
                      row_number() OVER (PARTITION BY w_sec
                        ORDER BY n DESC, user_id) AS rn
               FROM w)
         WHERE rn <= 3 ORDER BY w_sec, rn""",

    // stream-stream interval join ≡ the batch interval self-join at µs
    // precision (Spark's derived ts is ts_ns div 1000; epoch_us on a
    // TIMESTAMP_NS truncates identically)
    "q29_join" ->
      """SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id
         FROM events a JOIN events b
           ON a.user_id = b.user_id
          AND epoch_us(b.ts) > epoch_us(a.ts)
          AND epoch_us(b.ts) <= epoch_us(a.ts) + 60000000
         ORDER BY a.user_id, a_id, b_id""",

    // streaming dedup emits only the key set, so the batch oracle is a
    // plain DISTINCT over the truncated event time
    "q29_dedup" ->
      """SELECT DISTINCT user_id,
                CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS min_sec
         FROM events ORDER BY user_id, min_sec""",

    // sliding windows (1h every 30min): each event belongs to exactly
    // two slide-aligned windows — slots floor(t/30min) and the one
    // before it; µs arithmetic matches Spark's window() alignment
    "q29_sliding" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 1800000000 AS slot FROM events),
              w AS (SELECT user_id, unnest([slot, slot - 1]) AS wslot FROM e)
         SELECT wslot * 1800 AS w_sec, user_id, count(*) AS n_events
         FROM w GROUP BY 1, 2 ORDER BY w_sec, user_id""",

    // the oracle rebuilds every map-derived value relationally — the
    // engine side proves the MAP functions, the compare needs no maps
    "q23_maps" ->
      """SELECT doc_id, lang AS lang_v, CAST(2 AS BIGINT) AS n_keys,
                'lang,src' AS keys,
                CASE WHEN upper(lang) < upper(source)
                     THEN upper(lang) || ',' || upper(source)
                     ELSE upper(source) || ',' || upper(lang) END AS upper_vals,
                true AS has_src
         FROM documents ORDER BY doc_id""",

    "q23_higher_order" ->
      """SELECT vec_id,
                CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.0)) AS BIGINT) AS n_pos,
                round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0)),
                  (acc, v) -> acc + v), 4) AS sum2x,
                CASE WHEN len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.9)) > 0
                     THEN 1 ELSE 0 END AS has_big,
                round(CAST(list_max(embedding) AS DOUBLE), 4) AS mx,
                round(CAST(list_min(embedding) AS DOUBLE), 4) AS mn
         FROM embeddings ORDER BY vec_id""",

    "q23_arrays" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
                round(CAST(embedding[1] AS DOUBLE), 4) AS e1,
                round(CAST(embedding[64] AS DOUBLE), 4) AS e64
         FROM embeddings ORDER BY vec_id""",

    // sessionization: new session when the inactivity gap >= 30 min
    // (the complement of session_window's `< gap` merge rule); both
    // engines see identical µs timestamps
    "q32_sessions" ->
      """WITH o AS (SELECT user_id, ts, event_id, value,
                           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
                    FROM events),
              f AS (SELECT user_id, ts, event_id, value,
                           CASE WHEN pts IS NULL
                                  OR epoch_us(ts) - epoch_us(pts) >= 1800000000
                                THEN 1 ELSE 0 END AS new_s
                    FROM o),
              s AS (SELECT user_id, ts, value,
                           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS sid
                    FROM f)
         SELECT user_id, CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
                count(*) AS n_events, round(sum(value), 4) AS total_value
         FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""",

    // Faithful-IR queries: the tokenize→stop→stem pipeline is not
    // SQL-expressible, so the oracle is a committed GOLDEN parquet
    // (generated by graft.GoldenGen at the driver's verify SF from the
    // spec-pinned pipeline — 530 tokenizer + 38k stemmer reference
    // vectors prove the generator). DuckDB reads it as a plain scan.
    "q26_ir_terms" ->
      """SELECT * FROM '/root/repo/golden/q26_ir_terms.parquet'""",
    "q26_ir_index" ->
      """SELECT * FROM '/root/repo/golden/q26_ir_index.parquet'""",
    // incremental merge must be indistinguishable from a full rebuild
    "q26_ir_merged" ->
      """SELECT * FROM '/root/repo/golden/q26_ir_index.parquet'""",
    // ... and so must the streaming foreachBatch build+merge ingest
    "q26_ir_stream" ->
      """SELECT * FROM '/root/repo/golden/q26_ir_index.parquet'""",
    "q26_ir_search" ->
      """SELECT * FROM '/root/repo/golden/q26_ir_search.parquet'""",
    "q26_ir_rm3" ->
      """SELECT * FROM '/root/repo/golden/q26_ir_rm3.parquet'""",
    "q26_ir_wildcard" ->
      """SELECT * FROM '/root/repo/golden/q26_ir_wildcard.parquet'""",
    // a delta-merged chargram table must serve the same wildcard
    // answer as the rebuilt one
    "q26_ir_merged_wildcard" ->
      """SELECT * FROM '/root/repo/golden/q26_ir_wildcard.parquet'""",
    // golden generated from the UN-rewritten fallback evaluation, so
    // the compare proves the index rewrite == per-row predicate
    "q35_rewrite_wildcard" ->
      """SELECT * FROM '/root/repo/golden/q35_rewrite_wildcard.parquet'""",
    // goldens generated from the index-free brute evaluations
    // (windowed scan / row-level position join), so the compare proves
    // positional-index phrase/proximity == full-scan semantics
    "q36_phrase" ->
      """SELECT * FROM '/root/repo/golden/q36_phrase.parquet'""",
    // same golden: proves the varint-gap compressed layout round-trips
    "q36_phrase_compressed" ->
      """SELECT * FROM '/root/repo/golden/q36_phrase.parquet'""",
    // same golden again: a delta-merged positional index must serve
    // the same phrase answer as the rebuilt one
    "q36_phrase_merged" ->
      """SELECT * FROM '/root/repo/golden/q36_phrase.parquet'""",
    // golden from the brute phrase count over the corpus MINUS the
    // fixed takedown set: a store with pending tombstones must serve
    // exactly the rebuild-without-docs answer
    "q36_phrase_deleted" ->
      """SELECT * FROM '/root/repo/golden/q36_phrase_deleted.parquet'""",
    // golden from the brute phrase count over the UPDATED corpus
    // (the re-crawl set's text gains one phrase occurrence): a store
    // updated in place (delete + store-level delta append) must serve
    // exactly the rebuild-over-updated-corpus answer
    "q36_phrase_updated" ->
      """SELECT * FROM '/root/repo/golden/q36_phrase_updated.parquet'""",
    // golden from the engine run on the reduced corpus: tombstoned
    // tf-idf retrieval from the written ranked index ==
    // rebuild-without-docs (df and nDocs delete-exact)
    "q26_ir_search_deleted" ->
      """SELECT * FROM '/root/repo/golden/q26_ir_search_deleted.parquet'""",
    // golden from the engine run on the updated corpus; the query
    // terms are ones the update suffix CONTAINS, so df and tf both
    // shift — update-in-place == rebuild (term_stats exact)
    "q26_ir_search_updated" ->
      """SELECT * FROM '/root/repo/golden/q26_ir_search_updated.parquet'""",
    "q36_near" ->
      """SELECT * FROM '/root/repo/golden/q36_near.parquet'""",
    "q36_near_ordered" ->
      """SELECT * FROM '/root/repo/golden/q36_near_ordered.parquet'""",
    // golden from the index-free ranked brute (row-level pair COUNT +
    // the same total order and limit): proves the bounded NEAR serving
    // contract == brute-scan semantics
    "q36_near_topk" ->
      """SELECT * FROM '/root/repo/golden/q36_near_topk.parquet'""",
    "q36_snippet" ->
      """SELECT * FROM '/root/repo/golden/q36_snippet.parquet'""",
    // golden from the doubly index-free brute (regex over the raw
    // vocabulary + windowed scan): compare proves char-gram expansion
    // composed with positional intersection == index-free semantics
    "q36_phrase_wildcard" ->
      """SELECT * FROM '/root/repo/golden/q36_phrase_wildcard.parquet'""",

    // the staged TREC file is rebuilt relationally: docid + block length
    "q31_trec_source" ->
      """SELECT 'FT-' || doc_id AS docid,
                CAST(length('<DOC> <DOCNO> FT-' || doc_id || ' </DOCNO> <TEXT> ' ||
                            text || ' </TEXT> </DOC>') AS BIGINT) AS n_chars
         FROM documents ORDER BY docid""",

    // the engine recovers (w, h) by PARSING real PNG bytes; the oracle
    // reconstructs them from the dimension formula (dimsFor) and
    // mirrors the resize arithmetic (48/maxSide scale, ceil)
    "q28_multimodal" ->
      """WITH d AS (SELECT 'img/' || source AS kind,
                           16 + doc_id % 64 AS w,
                           16 + (doc_id * 7) % 48 AS h
                    FROM documents),
              r AS (SELECT kind, w, h,
                           least(1.0, 48 / CAST(greatest(w, h) AS DOUBLE)) AS scale
                    FROM d)
         SELECT kind, count(*) AS n,
                CAST(max(w) AS BIGINT) AS max_w,
                CAST(max(h) AS BIGINT) AS max_h,
                CAST(max(ceil(w * scale)) AS BIGINT) AS max_out_w,
                CAST(max(ceil(h * scale)) AS BIGINT) AS max_out_h,
                CAST(sum(w * h) AS BIGINT) AS sum_px
         FROM r GROUP BY kind ORDER BY kind""",

    // the engine decodes REAL PNG pixels, nearest-neighbor resamples,
    // re-encodes, re-decodes and checksums; the oracle reconstructs
    // dims (PngCodec.dimsFor) AND the exact 24-bit pixel checksum from
    // the generative formula (x*31 + y*17 + id) & 0xffffff with the
    // same integer-division NN source mapping
    "q28_resize" ->
      """WITH m AS (SELECT doc_id AS media_id,
                  CAST(16 + doc_id % 64 AS BIGINT) AS w,
                  CAST(16 + (doc_id * 7) % 48 AS BIGINT) AS h
           FROM documents),
         d AS (SELECT media_id, w, h,
                  CAST(ceil(w * least(1.0, 24.0 / greatest(w, h))) AS BIGINT) AS ow,
                  CAST(ceil(h * least(1.0, 24.0 / greatest(w, h))) AS BIGINT) AS oh
               FROM m),
         px AS (SELECT media_id, w, h, ow, oh,
                  ((((xs.x * w) // ow) * 31 + ((ys.y * h) // oh) * 17 + media_id) & 16777215) AS v
                FROM d,
                     LATERAL (SELECT unnest(range(d.ow)) AS x) xs,
                     LATERAL (SELECT unnest(range(d.oh)) AS y) ys)
         SELECT media_id, w AS width, h AS height, ow AS out_w, oh AS out_h,
                CAST(sum(v) AS BIGINT) AS pix_sum
         FROM px GROUP BY media_id, w, h, ow, oh
         ORDER BY media_id""",

    // real-pixel grid features: the oracle rebuilds each 2x2 cell's
    // pixel count and exact 24-bit value sum from the generative
    // formula; the engine must read the same numbers out of decoded
    // PNG pixels
    "q28_features" ->
      """WITH m AS (SELECT doc_id AS media_id,
                  CAST(16 + doc_id % 64 AS BIGINT) AS w,
                  CAST(16 + (doc_id * 7) % 48 AS BIGINT) AS h
           FROM documents),
         px AS (SELECT media_id,
                  CAST(((ys.y * 2) // h) * 2 + (xs.x * 2) // w AS BIGINT) AS cell,
                  ((xs.x * 31 + ys.y * 17 + media_id) & 16777215) AS v
                FROM m,
                     LATERAL (SELECT unnest(range(m.w)) AS x) xs,
                     LATERAL (SELECT unnest(range(m.h)) AS y) ys)
         SELECT media_id, cell, CAST(count(*) AS BIGINT) AS n_px,
                CAST(sum(v) AS BIGINT) AS vsum
         FROM px GROUP BY media_id, cell
         ORDER BY media_id, cell""",

    // the engine recovers (rate, channels, frames) by PARSING real WAV
    // bytes; the oracle reconstructs them from the parameter formula
    // (WavCodec.paramsFor) — duration is integer-floored ms
    "q28_audio" ->
      """SELECT doc_id AS media_id, 'aud/' || source AS kind,
                CAST(8000 + (doc_id % 5) * 2000 AS BIGINT) AS sample_rate,
                CAST(1 + doc_id % 2 AS BIGINT) AS channels,
                CAST(300 + (doc_id * 13) % 700 AS BIGINT) AS n_frames,
                CAST((300 + (doc_id * 13) % 700) * 1000
                     // (8000 + (doc_id % 5) * 2000) AS BIGINT) AS duration_ms
         FROM documents ORDER BY media_id""",

    // the engine recovers (w, h, frames, fps) by PARSING real AVI
    // bytes — RIFF walk + JPEG decode of every frame; the oracle
    // reconstructs them from the parameter formula (AviCodec.paramsFor)
    // — duration is integer-floored ms, sampled = every 2nd frame
    "q28_video" ->
      """SELECT doc_id AS media_id, 'vid/' || source AS kind,
                CAST(16 + doc_id % 32 AS BIGINT) AS width,
                CAST(16 + (doc_id * 5) % 24 AS BIGINT) AS height,
                CAST(3 + doc_id % 6 AS BIGINT) AS n_frames,
                CAST(10 + (doc_id % 4) * 5 AS BIGINT) AS fps,
                CAST((3 + doc_id % 6) * 1000
                     // (10 + (doc_id % 4) * 5) AS BIGINT) AS duration_ms,
                CAST((3 + doc_id % 6 + 1) // 2 AS BIGINT) AS sampled
         FROM documents ORDER BY media_id""",

    // events.ts is ns-precision: epoch_ns(ts) == Spark's ts_ns exactly
    "q30_asof" ->
      """WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
              p AS (SELECT user_id, ts, max(value) AS p_value FROM events
                    WHERE event_type = 'purchase' GROUP BY 1, 2)
         SELECT v.event_id, v.user_id, round(coalesce(p.p_value, -1.0), 4) AS p_value
         FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts >= p.ts
         ORDER BY event_id""",

    // z-order: the identical bit-interleave generated from MortonBits
    "q34_zorder" ->
      s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                ${graft.ops.Layout.ddbMorton(
                  s"(l_orderkey % ${graft.ops.Layout.MortonGrid})",
                  s"(l_partkey % ${graft.ops.Layout.MortonGrid})")} AS zval
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q30_range_join" ->
      """SELECT a.user_id, a.event_id AS e_a, b.event_id AS e_b,
                epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
         FROM events a JOIN events b
           ON a.user_id = b.user_id AND a.event_id < b.event_id
          AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= CAST(3600000000 AS BIGINT)
         ORDER BY e_a, e_b""",
  )
}
