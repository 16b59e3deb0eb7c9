package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 Table B is declared here as
  * a named query; [[Oracles]] holds the DuckDB-equivalent SQL the driver
  * hash-checks against. Queries without an oracle entry (approximate ops)
  * get the driver's weaker rows-only check and a tolerance test in
  * src/test instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.pricingSummary _),
    "q02_filter_pushdown" -> (Relational.filterPushdown _),
    "q03_broadcast_join" -> (Relational.broadcastJoin _),
    "q04_fact_join" -> (Relational.factJoin _),
    "q05_semi_join" -> (Relational.semiJoin _),
    "q06_anti_join" -> (Relational.antiJoin _),
    "q07_distinct_agg" -> (Relational.distinctAgg _),
    "q08_rollup_agg" -> (Relational.rollupAgg _),
    "q09_window_rank" -> (Relational.windowRank _),
    "q10_window_lag" -> (Relational.windowLag _),
    "q11_window_frame" -> (Relational.windowFrame _),
    "q12_topk_per_group" -> (Relational.topKPerGroup _),
    "q13_set_ops" -> (Relational.setOps _),
    "q14_string_fns" -> (Relational.stringFns _),
    "q15_datetime_fns" -> (Relational.datetimeFns _),
    "q16_math_fns" -> (Relational.mathFns _),
    "q17_case_when" -> (Relational.caseWhen _),
    "q18_json_extract" -> (Relational.jsonExtract _),
    "q19_approx_distinct" -> (Relational.approxDistinct _),
    "q20_tumbling_window" -> (Events.tumblingWindow _),
    "q21_sliding_window" -> (Events.slidingWindow _),
    "q22_sessionize" -> (Events.sessionize _),
    "q23_late_data" -> (Events.lateData _),
    "q24_time_partition_keys" -> (Manifest.timePartitionKeys _),
    "q25_manifest_agg" -> (Manifest.manifestAgg _),
    "q26_lcc_forward" -> (Geo.lccForward _),
    "q27_lcc_roundtrip" -> (Geo.lccRoundtrip _),
    "q28_regrid" -> (Geo.regrid _),
    "q29_word_count" -> (Text.wordCount _),
    "q30_text_quality" -> (Text.textQuality _),
    "q31_lang_id" -> (Text.langId _),
    "q32_token_bpe" -> (Text.tokenCountBpe _),
    "q33_fingerprint" -> (Text.fingerprint _),
    "q34_dedup_exact" -> (Dedup.dedupExact _),
    "q35_jaccard_neardup" -> (Dedup.jaccardNearDup _),
    "q36_minhash_sig" -> (Dedup.minhashSignatures _),
    "q37_lsh_neardup" -> (Dedup.lshNearDup _),
    "q38_simhash" -> (Dedup.simhash _),
    "q39_simhash_pairs" -> (Dedup.simhashPairs _),
    "q40_cosine_topk" -> (Similarity.cosineTopK _),
    "q41_ann_bucketed" -> (Similarity.annBucketed _),
    "q42_embedding_stats" -> (Similarity.embeddingStats _),
    "q43_multimodal_meta" -> (Multimodal.multimodalMeta _),
    "q44_frame_sample" -> (Multimodal.frameSample _),
    "q45_media_decode" -> (Multimodal.mediaDecode _),
    "q46_cube_agg" -> (Advanced.cubeAgg _),
    "q47_pivot" -> (Advanced.pivotAgg _),
    "q48_above_nation_avg" -> (Advanced.aboveNationAvg _),
    "q49_near_max" -> (Advanced.nearMaxOrders _),
    "q50_percentiles" -> (Advanced.percentiles _),
    "q51_latest_per_key" -> (Advanced.latestPerKey _),
    "q52_array_ops" -> (Advanced.arrayOps _),
    "q53_map_ops" -> (Advanced.mapOps _),
    "q54_asof_join" -> (Temporal.asofJoin _),
    "q55_range_join" -> (Temporal.rangeJoin _),
    "q56_null_handling" -> (Advanced.nullHandling _),
    "q57_hash_sample" -> (Advanced.deterministicSample _),
    "q58_rp_lsh_ann" -> (Similarity.rpLshAnn _),
    "q59_topk_aggregator" -> (Advanced.topKAggregator _),
    "q60_chargram_neardup" -> (Dedup.chargramNearDup _),
    "q61_embedding_neardup" -> (Dedup.embeddingNearDup _),
    "q62_window_family" -> (Analytic.windowFamily _),
    "q63_grouping_sets" -> (Analytic.groupingSetsAgg _),
    "q64_unpivot" -> (Analytic.unpivotMeasures _),
    "q65_tfidf" -> (Text.tfidf _),
    "q66_quality_gate" -> (Curation.qualityGate _),
    "q67_repetition" -> (Curation.repetitionRatio _),
    "q68_boilerplate_census" -> (Curation.boilerplateCensus _),
    "q69_stratified_sample" -> (Curation.stratifiedSample _),
    "q70_kmeans_assign" -> (Curation.kmeansAssign _),
    "q71_chunk_tokens" -> (Curation.chunkTokens _),
    "q72_inverted_index" -> (Curation.invertedIndex _),
    "q73_decontaminate" -> (Curation.decontaminate _),
    "q74_pack_sequences" -> (Curation.packSequences _),
    "q75_unigram_surprisal" -> (Curation.unigramSurprisal _),
    "q76_mixture_weights" -> (Curation.mixtureWeights _),
    "q77_kmeans_update" -> (Curation.kmeansUpdate _),
    "q78_curation_funnel" -> (Curation.curationFunnel _),
    "q79_incremental_dedup" -> (Curation.incrementalDedup _),
    "q80_neardup_clusters" -> (Curation.nearDupClusters _),
    "q81_redact_census" -> (Curation.redactCensus _),
    "q82_cluster_reps" -> (Curation.clusterReps _),
    "q83_semdedup" -> (Curation.semDedup _),
    "q84_split_manifest" -> (Curation.splitManifest _),
    "q85_length_outliers" -> (Curation.lengthOutliers _),
    "q86_zipf_census" -> (Text.zipfCensus _),
    "q87_cross_source_dups" -> (Curation.crossSourceDups _),
    "q88_ann_recall" -> (Similarity.annRecall _),
    "q89_epoch_plan" -> (Curation.epochPlan _),
    "q90_filter_calibration" -> (Curation.filterCalibration _),
    "q91_chunk_dedup" -> (Curation.chunkDedup _),
    "q92_salted_join" -> (Skew.saltedJoinQuery _),
    "q93_weighted_sample" -> (Curation.weightedSample _),
    "q94_bloom_increment" -> (Curation.bloomIncrement _),
    "q95_span_dedup" -> (Curation.spanDedup _),
    "q96_span_trim" -> (Curation.spanTrim _),
    "q97_cms_census" -> (Curation.cmsCensus _),
    "q98_span_provenance" -> (Curation.spanProvenance _),
    "q99_span_dedup_staged" -> (Curation.spanDedupStaged _),
    "q100_bloom_increment_sharded" ->
      ((s, d) => Curation.bloomIncrementSharded(s, d)),
    "q101_span_gate_sharded" ->
      ((s, d) => Curation.spanDedupShardedGate(s, d)),
    "q102_ivf_ann" -> (Similarity.ivfAnn _),
    "q103_span_gate_shuffled" -> (Curation.spanDedupShardedGateShuffled _),
    "q104_ivf_trained" -> (Similarity.ivfTrained _),
    "q105_bloom_shuffled" -> (Curation.bloomIncrementShardedShuffled _),
    "q106_pq_ann" -> (Similarity.pqAnn _),
    "q107_asof_tolerance" -> (Temporal.asofJoinTolerance _),
    "q108_ivfpq_ann" -> (Similarity.ivfPqAnn _),
    "q109_pq_recall" -> (Similarity.pqRecall _),
    "q110_ivf_refresh" -> (Similarity.ivfRefresh _),
    "q111_spatial_join" -> (Geo.spatialNeighbors _),
    "q112_ivfpq_trained" -> (Similarity.ivfPqTrained _),
    "q113_span_dedup_sketch" -> (Curation.spanDedupSketch _),
    "q114_span_dedup_increment" -> (Curation.spanDedupIncrement _),
    "q115_pq_refine" -> (Similarity.pqRefine _),
    "q116_bm25" -> (Retrieval.bm25Search _),
    "q117_rrf_fusion" -> (Retrieval.rrfFusion _),
    "q118_hard_negatives" -> (Similarity.hardNegatives _),
    "q119_multiprobe_lsh" -> (Similarity.multiprobeLsh _),
    "q120_sq8_ann" -> (Similarity.sq8Ann _),
    "q121_lsh_recall" -> (Dedup.lshRecallAudit _),
    "q122_ivf_sq8" -> (Similarity.ivfSq8Ann _),
    "q123_dup_pagerank" -> (Curation.dupPageRank _),
    "q124_triplet_mining" -> (Similarity.tripletMining _),
    "q125_quality_scorer" -> (Curation.qualityScorer _),
    "q126_span_runs" -> (Curation.spanRuns _),
    "q127_pq_drift" -> (Similarity.pqDriftAudit _),
    "q128_dsir_select" -> (Curation.dsirSelect _),
    "q129_bigram_surprisal" -> (Curation.bigramSurprisal _),
    "q130_self_repeat" -> (Curation.selfRepeat _),
    "q131_frame_dedup" -> (Multimodal.frameDedup _),
    "q132_crossmodal_agreement" -> (Dedup.crossModalAgreement _),
    "q133_drop_provenance" -> (Curation.dropProvenance _),
    "q134_split_leakage" -> (Curation.splitLeakage _),
    "q135_dedup_savings" -> (Curation.dedupSavings _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Oracles.relational ++ Oracles.temporal ++ Oracles.geo ++
      Oracles.text ++ Oracles.dedup ++ Oracles.similarity ++
      Oracles.multimodal ++ Oracles.advanced ++ Oracles.similarity2 ++
      Oracles.similarity3 ++ Oracles.dedup2 ++ Oracles.analytic ++
      Oracles.curation ++ Oracles.retrieval
}
