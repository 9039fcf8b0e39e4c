package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every capability from SURVEY §2 is a named `(SparkSession, sfDir)
  * => DataFrame` here; SQL-expressible ones carry a DuckDB oracle in
  * [[oracleSql]] (the driver hash-compares results on sf0.01).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The reference's E2 semantic search end-to-end: featurize
    * the query string, score the featurized document corpus with
    * negative-inner-product distance, top-5, snippet around the first
    * query-term hit (`search.py:77-99`). */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.{Embeddings, TextOps, VectorOps}
    val sfDir = "/root/testdata/sf0.001"
    val query = "fast merge window"
    // production shape: corpus embeddings are PREcomputed (stored at
    // ingest, like the reference's pgvector column), only the query
    // string is embedded at request time — one native-featurizer call
    // on a 1-row broadcast side (~1 ms; q31/q57 oracle-check the
    // featurizer itself)
    val corpus = Tables.documents(spark, sfDir)
      .withColumn("vec_id", pmod(col("doc_id"), lit(500)))
      .join(broadcast(Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))), Seq("vec_id"))
    val q = spark.range(1)
      .select(Embeddings.embedText(lit(query)).as("q_emb"))
    corpus.crossJoin(broadcast(q))
      .withColumn("distance",
        VectorOps.negDot(col("embedding"), col("q_emb")))
      .filter(col("distance") <= 0.05)
      .orderBy(col("distance"), col("doc_id"))
      .limit(5)
      .select(col("doc_id"), round(col("distance"), 6).as("distance"),
        TextOps.snippet(col("text"), lit(query)).as("snippet"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Relational.pricingSummary _),
    "q2_revenue_by_nation" -> (Relational.revenueByNation _),
    "q3_top_orders" -> (Relational.topOrdersByRevenue _),
    "q4_paginate_orders" -> (Relational.paginateOrders _),
    "q5_semi_anti_coverage" -> (Relational.customerOrderCoverage _),
    "q6_except_users" -> (Relational.eventSetOps _),
    "q7_event_stats" -> (Relational.eventTypeStats _),
    "q8_dashboard" -> (Search.dashboard _),
    "q9_listing" -> (Search.listing _),
    "q10_semantic_search" -> (Search.semanticSearch _),
    "q11_snippet_search" -> (Search.snippetSearch _),
    "q12_rag_context" -> (Search.ragContext _),
    "q13_upsert_merge" -> (Upsert.upsertMerge _),
    "q14_job_status_counts" -> (Ledger.statusCounts _),
    "q15_job_lookup" -> (Ledger.jobLookup _),
    "q16_job_update" -> (Ledger.jobUpdate _),
    "q17_job_delete" -> (Ledger.jobDelete _),
    "q18_lang_id" -> (TextAnalysis.langIdConfusion _),
    "q19_quality_by_source" -> (TextAnalysis.qualityBySource _),
    "q20_token_stats" -> (TextAnalysis.tokenStats _),
    "q21_fingerprints" -> (TextAnalysis.fingerprints _),
    "q22_exact_dedup" -> (Dedup.exactDedup _),
    "q23_jaccard_pairs" -> (Dedup.jaccardPairs _),
    "q24_minhash_lsh" -> (Dedup.minhashLsh _),
    "q25_simhash_pairs" -> (Dedup.simhashPairs _),
    "q26_knn_brute_force" -> (Similarity.knnBruteForce _),
    "q27_embedding_near_dup" -> (Similarity.embeddingNearDup _),
    "q28_knn_ivf" -> (Similarity.knnIvf _),
    "q29_crawl_bfs" -> (Crawl.frontierBfs _),
    "q30_route_extract" -> (Html.routeAndExtract _),
    "q31_featurized" -> (TextAnalysis.featurized _),
    "q32_structured_extract" -> (Html.structuredExtract _),
    "q33_media_features" -> (Media.mediaFeatures _),
    "q34_rollup_type_day" -> (Events.rollupTypeDay _),
    "q35_tumbling_daily" -> (Events.tumblingDaily _),
    "q36_sessionize" -> (Events.sessionize _),
    "q37_json_decode" -> (Events.jsonDecode _),
    "q38_crawl_stats" -> (Events.crawlStats _),
    "q39_salted_join" -> (Skew.saltedHotKeyJoin _),
    "q40_feature_flags" -> (Flags.flagGatedPlan _),
    "q41_kmeans_clusters" -> (KMeans.clusterSummary _),
    "q42_knn_ivf_kmeans" -> (KMeans.knnIvfKmeans _),
    "q43_topk_per_group" -> (Advanced.topOrdersPerPriority _),
    "q44_asof_join" -> (Advanced.asofJoin _),
    "q45_pivot" -> (Advanced.pivotEventCounts _),
    "q46_percentiles" -> (Stats.percentiles _),
    "q47_moving_window" -> (Stats.movingWindow _),
    "q48_edit_distance" -> (Stats.editDistancePairs _),
    "q49_corr_stats" -> (Stats.corrStats _),
    "q50_histogram" -> (Stats.histogram _),
    "q51_hash_sample" -> (Sampling.hashSample _),
    "q52_stemmed_vocab" -> (Sampling.stemmedVocab _),
    "q53_dedup_groups" -> (Components.dedupGroups _),
    "q54_range_join" -> (RangeJoin.eventsInCampaigns _),
    "q55_pdf_extract" -> (Pdf.pdfExtract _),
    "q56_vision_embed" -> (Media.visionEmbed _),
    "q57_knn_1024" -> (Search.knn1024 _),
    "q58_structured_registry" -> (Html.structuredRegistry _),
    "q59_chunk_docs" -> (Pipeline.chunkDocs _),
    "q60_repetition" -> (Pipeline.repetitionScore _),
    "q61_pii_scrub" -> (Pipeline.piiScrub _),
    "q62_domain_quota" -> (Pipeline.domainQuota _),
    "q63_contamination" -> (Pipeline.contamination _),
    "q64_session_window" -> (Events.sessionWindows _),
    "q65_bm25" -> (Ranking.bm25 _),
    "q66_pagerank" -> (Graph.pageRank _),
    "q67_pq_ann" -> (PQ.pqAnn _),
    "q68_crawl_restricted" -> (Crawl.frontierBfsRestricted _),
    "q69_unigram_logprob" -> (Ranking.unigramLogprob _),
    "q70_source_mix" -> ((s: SparkSession, d: String) => Pipeline.sourceMix(s, d)),
    "q71_incremental_rollup" -> (Incremental.incrementalRollup _),
    "q72_cube" -> (Events.cubeTypeDow _),
    "q73_stratified_quota" -> ((s: SparkSession, d: String) => Pipeline.stratifiedQuota(s, d)),
    "q74_chat_stream" -> (Chat.chatStream _),
    "q75_pagerank_full" -> (Graph.pageRankFull _),
    "q76_flag_reload" -> (Flags.flagReload _),
    "q77_job_stop" -> (Ledger.jobStop _),
    "q78_image_decode" -> (Media.imageDecode _),
    "q79_ivf_1024" -> (KMeans.knnIvf1024 _),
    "q80_pdf_decode" -> (Pdf.pdfDecode _),
    "q81_span_dedup" -> (Curation.spanDedup _),
    "q82_bigram_lm" -> (Ranking.bigramLogprob _),
    "q83_tfidf" -> (Ranking.tfidf _),
    "q84_quality_classifier" -> (Curation.qualityClassifier _),
    "q85_url_canonical" -> (Urls.urlCanonical _),
    "q86_seq_pack" -> (Curation.seqPack _),
    "q87_robots" -> (Robots.robotsEnforce _),
    "q88_bloom_semijoin" -> (Sketches.bloomSemiJoin _),
    "q89_hll_distinct" -> (Sketches.hllDistinct _),
    "q90_cms_heavy_hitters" -> (Sketches.cmsHeavyHitters _),
    "q91_zorder_layout" -> (Zorder.zorderLayout _),
    "q92_weighted_reservoir" -> (Sampling.weightedReservoir _),
    "q93_token_budget" -> (Mixture.tokenBudget _),
    "q94_triangles" -> (Graph.triangles _),
    "q95_phrase_search" -> (Index.phraseSearch _),
    "q96_bpe_merges" -> (Bpe.bpeMerges _),
    "q97_frame_sample" -> (Video.frameSample _),
    "q98_gapfill" -> (Timeseries.gapFill _),
    "q99_dsir" -> (Dsir.dsirWeights _),
    "q100_semdedup" -> (SemDedup.semDedup _),
    "q101_exact_quantiles" -> (Stats.quantileDisc _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Relational.pricingSummarySql,
    "q2_revenue_by_nation" -> Relational.revenueByNationSql,
    "q3_top_orders" -> Relational.topOrdersByRevenueSql,
    "q4_paginate_orders" -> Relational.paginateOrdersSql,
    "q5_semi_anti_coverage" -> Relational.customerOrderCoverageSql,
    "q6_except_users" -> Relational.eventSetOpsSql,
    "q7_event_stats" -> Relational.eventTypeStatsSql,
    "q8_dashboard" -> Search.dashboardSql,
    "q9_listing" -> Search.listingSql,
    "q10_semantic_search" -> Search.semanticSearchSql,
    "q11_snippet_search" -> Search.snippetSearchSql,
    "q12_rag_context" -> Search.ragContextSql,
    "q13_upsert_merge" -> Upsert.upsertMergeSql,
    "q14_job_status_counts" -> Ledger.statusCountsSql,
    "q15_job_lookup" -> Ledger.jobLookupSql,
    "q16_job_update" -> Ledger.jobUpdateSql,
    "q17_job_delete" -> Ledger.jobDeleteSql,
    "q18_lang_id" -> TextAnalysis.langIdConfusionSql,
    "q19_quality_by_source" -> TextAnalysis.qualityBySourceSql,
    "q20_token_stats" -> TextAnalysis.tokenStatsSql,
    "q21_fingerprints" -> TextAnalysis.fingerprintsSql,
    "q22_exact_dedup" -> Dedup.exactDedupSql,
    "q23_jaccard_pairs" -> Dedup.jaccardPairsSql,
    "q24_minhash_lsh" -> Dedup.minhashLshSql,
    "q25_simhash_pairs" -> Dedup.simhashPairsSql,
    "q26_knn_brute_force" -> Similarity.knnBruteForceSql,
    "q27_embedding_near_dup" -> Similarity.embeddingNearDupSql,
    "q28_knn_ivf" -> Similarity.knnIvfSql,
    "q29_crawl_bfs" -> Crawl.frontierBfsSql,
    "q30_route_extract" -> Html.routeAndExtractSql,
    "q31_featurized" -> TextAnalysis.featurizedSql,
    "q32_structured_extract" -> Html.structuredExtractSql,
    "q33_media_features" -> Media.mediaFeaturesSql,
    "q34_rollup_type_day" -> Events.rollupTypeDaySql,
    "q35_tumbling_daily" -> Events.tumblingDailySql,
    "q36_sessionize" -> Events.sessionizeSql,
    "q37_json_decode" -> Events.jsonDecodeSql,
    "q38_crawl_stats" -> Events.crawlStatsSql,
    "q39_salted_join" -> Skew.saltedHotKeyJoinSql,
    "q40_feature_flags" -> Flags.flagGatedPlanSql,
    "q41_kmeans_clusters" -> KMeans.clusterSummarySql,
    "q42_knn_ivf_kmeans" -> KMeans.knnIvfKmeansSql,
    "q43_topk_per_group" -> Advanced.topOrdersPerPrioritySql,
    "q44_asof_join" -> Advanced.asofJoinSql,
    "q45_pivot" -> Advanced.pivotEventCountsSql,
    "q46_percentiles" -> Stats.percentilesSql,
    "q47_moving_window" -> Stats.movingWindowSql,
    "q48_edit_distance" -> Stats.editDistancePairsSql,
    "q49_corr_stats" -> Stats.corrStatsSql,
    "q50_histogram" -> Stats.histogramSql,
    "q51_hash_sample" -> Sampling.hashSampleSql,
    "q52_stemmed_vocab" -> Sampling.stemmedVocabSql,
    "q53_dedup_groups" -> Components.dedupGroupsSql,
    "q54_range_join" -> RangeJoin.eventsInCampaignsSql,
    "q55_pdf_extract" -> Pdf.pdfExtractSql,
    "q56_vision_embed" -> Media.visionEmbedSql,
    "q57_knn_1024" -> Search.knn1024Sql,
    "q58_structured_registry" -> Html.structuredRegistrySql,
    "q59_chunk_docs" -> Pipeline.chunkDocsSql,
    "q60_repetition" -> Pipeline.repetitionScoreSql,
    "q61_pii_scrub" -> Pipeline.piiScrubSql,
    "q62_domain_quota" -> Pipeline.domainQuotaSql,
    "q63_contamination" -> Pipeline.contaminationSql,
    "q64_session_window" -> Events.sessionWindowsSql,
    "q65_bm25" -> Ranking.bm25Sql,
    "q66_pagerank" -> Graph.pageRankSql,
    "q67_pq_ann" -> PQ.pqAnnSql,
    "q68_crawl_restricted" -> Crawl.frontierBfsRestrictedSql,
    "q69_unigram_logprob" -> Ranking.unigramLogprobSql,
    "q70_source_mix" -> Pipeline.sourceMixSql,
    "q71_incremental_rollup" -> Incremental.incrementalRollupSql,
    "q72_cube" -> Events.cubeTypeDowSql,
    "q73_stratified_quota" -> Pipeline.stratifiedQuotaSql,
    "q74_chat_stream" -> Chat.chatStreamSql,
    "q75_pagerank_full" -> Graph.pageRankFullSql,
    "q76_flag_reload" -> Flags.flagReloadSql,
    "q77_job_stop" -> Ledger.jobStopSql,
    "q78_image_decode" -> Media.imageDecodeSql,
    "q79_ivf_1024" -> KMeans.knnIvf1024Sql,
    "q80_pdf_decode" -> Pdf.pdfDecodeSql,
    "q81_span_dedup" -> Curation.spanDedupSql,
    "q82_bigram_lm" -> Ranking.bigramLogprobSql,
    "q83_tfidf" -> Ranking.tfidfSql,
    "q84_quality_classifier" -> Curation.qualityClassifierSql,
    "q85_url_canonical" -> Urls.urlCanonicalSql,
    "q86_seq_pack" -> Curation.seqPackSql,
    "q87_robots" -> Robots.robotsEnforceSql,
    "q88_bloom_semijoin" -> Sketches.bloomSemiJoinSql,
    "q89_hll_distinct" -> Sketches.hllDistinctSql,
    "q90_cms_heavy_hitters" -> Sketches.cmsHeavyHittersSql,
    "q91_zorder_layout" -> Zorder.zorderLayoutSql,
    "q92_weighted_reservoir" -> Sampling.weightedReservoirSql,
    "q93_token_budget" -> Mixture.tokenBudgetSql,
    "q94_triangles" -> Graph.trianglesSql,
    "q95_phrase_search" -> Index.phraseSearchSql,
    "q96_bpe_merges" -> Bpe.bpeMergesSql,
    "q97_frame_sample" -> Video.frameSampleSql,
    "q98_gapfill" -> Timeseries.gapFillSql,
    "q99_dsir" -> Dsir.dsirWeightsSql,
    "q100_semdedup" -> SemDedup.semDedupSql,
    "q101_exact_quantiles" -> Stats.quantileDiscSql,
  )
}
