package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.llm.{Dedup, Multimodal, Similarity, TextStats, Tokenizer}
import graft.ops.{ColorQueries, EventAnalytics, GraphOps, Linkage, Relational, Skew, Sketches, StreamQueries}
import graft.sources.SinkQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each key in [[queries]] is one implemented operator from SURVEY.md §2.3;
  * [[oracleSql]] holds the DuckDB-equivalent SQL for every SQL-expressible
  * entry (same column names, explicit ORDER BY on a unique key — the driver
  * hash-compares values after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    GraphOps.qDegree(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational inventory (SURVEY.md §2.3)
    "q_scan_project" -> (Relational.qScanProject _),
    "q_filter_pred" -> (Relational.qFilterPred _),
    "q_join_inner" -> (Relational.qJoinInner _),
    "q_join_left" -> (Relational.qJoinLeft _),
    "q_join_full" -> (Relational.qJoinFull _),
    "q_join_broadcast" -> (Relational.qJoinBroadcast _),
    "q_join_semi" -> (Relational.qJoinSemi _),
    "q_join_anti" -> (Relational.qJoinAnti _),
    "q_join_asof" -> (Relational.qJoinAsof _),
    "q_join_range" -> (Relational.qJoinRange _),
    "q_agg_partial" -> (Relational.qAggPartial _),
    "q_agg_salted" -> (Skew.qAggSalted _),
    "q_group_collect" -> (Relational.qGroupCollect _),
    "q_distinct" -> (Relational.qDistinct _),
    "q_approx_distinct" -> (Relational.qApproxDistinct _),
    "q_hist_quantile" -> (Relational.qHistQuantile _),
    "q_join_salted" -> (Skew.qJoinSalted _),
    "q_skew_aqe" -> (Skew.qSkewAqe _),
    "q_write_partitioned" -> (SinkQueries.qWritePartitioned _),
    "q_compact" -> (SinkQueries.qCompact _),
    "q_source_csv" -> (SinkQueries.qSourceCsv _),
    "q_source_json" -> (SinkQueries.qSourceJson _),
    "q_join_bucketed" -> (SinkQueries.qJoinBucketed _),
    "q_source_orc" -> (SinkQueries.qSourceOrc _),
    "q_zorder" -> (SinkQueries.qZorder _),
    "q_source_binary" -> (SinkQueries.qSourceBinary _),
    "q_bloom_join" -> (Sketches.qBloomJoin _),
    "q_heavy_hitters" -> (Sketches.qHeavyHitters _),
    "q_kmv_distinct" -> (Sketches.qKmvDistinct _),
    "q_window_range" -> (Relational.qWindowRange _),
    "q_window_cume" -> (Relational.qWindowCume _),
    "q_stats_moments" -> (Relational.qStatsMoments _),
    "q_gap_fill" -> (Relational.qGapFill _),
    "q_merge_upsert" -> (Relational.qMergeUpsert _),
    "q_scd2" -> (Relational.qScd2 _),
    "q_rollup" -> (Relational.qRollup _),
    "q_grouping_sets" -> (Relational.qGroupingSets _),
    "q_subquery_exists" -> (Relational.qSubqueryExists _),
    "q_conditional_agg" -> (Relational.qConditionalAgg _),
    "q_cube" -> (Relational.qCube _),
    "q_percentile" -> (Relational.qPercentile _),
    "q_pivot" -> (Relational.qPivot _),
    "q_unpivot" -> (Relational.qUnpivot _),
    "q_cogroup" -> (Relational.qCogroup _),
    "q_profile" -> (Relational.qProfile _),
    "q_window_rank" -> (Relational.qWindowRank _),
    "q_window_frame" -> (Relational.qWindowFrame _),
    "q_window_leadlag" -> (Relational.qWindowLeadLag _),
    "q_null_handling" -> (Relational.qNullHandling _),
    "q_topk" -> (Relational.qTopk _),
    "q_setops" -> (Relational.qSetops _),
    "q_scalar_str" -> (Relational.qScalarStr _),
    "q_scalar_date" -> (Relational.qScalarDate _),
    "q_scalar_math" -> (Relational.qScalarMath _),
    "q_array_fns" -> (Relational.qArrayFns _),
    "q_json_map" -> (Relational.qJsonMap _),
    "q_funnel" -> (EventAnalytics.qFunnel _),
    "q_retention" -> (EventAnalytics.qRetention _),
    "q_anomaly" -> (EventAnalytics.qAnomaly _),
    "q_active_users" -> (EventAnalytics.qActiveUsers _),
    "q_attribution" -> (EventAnalytics.qAttribution _),
    "q_markov" -> (EventAnalytics.qMarkov _),
    "q_sessionize" -> (EventAnalytics.qSessionize _),
    // graph inventory
    "q_edges_build" -> (GraphOps.qEdgesBuild _),
    "q_degree" -> (GraphOps.qDegree _),
    "q_degree_stats" -> (GraphOps.qDegreeStats _),
    "q_argmax_seed" -> (GraphOps.qArgmaxSeed _),
    "q_neighbor_colors" -> (GraphOps.qNeighborColors _),
    "q_first_fit" -> (GraphOps.qFirstFit _),
    "q_validate_coloring" -> (GraphOps.qValidateColoring _),
    "q_triangle_count" -> (GraphOps.qTriangleCount _),
    "q_clustering_coeff" -> (GraphOps.qClusteringCoeff _),
    "q_edge_jaccard" -> (GraphOps.qEdgeJaccard _),
    "q_local_cc" -> (GraphOps.qLocalCc _),
    "q_truss" -> (GraphOps.qTruss _),
    "q_closeness" -> (GraphOps.qCloseness _),
    "q_assortativity" -> (GraphOps.qAssortativity _),
    "q_connected_components" -> (GraphOps.qConnectedComponents _),
    "q_pagerank" -> (GraphOps.qPagerank _),
    "q_ppr" -> (GraphOps.qPpr _),
    "q_graph_sample" -> (GraphOps.qGraphSample _),
    "q_random_walk" -> (GraphOps.qRandomWalk _),
    "q_hits" -> (GraphOps.qHits _),
    "q_sssp" -> (GraphOps.qSssp _),
    "q_kcore" -> (GraphOps.qKcore _),
    "q_label_prop" -> (GraphOps.qLabelProp _),
    "q_modularity" -> (GraphOps.qModularity _),
    // iterative coloring kernel (no SQL oracle — invariant-checked; see
    // ColoringKernelSpec + ColorQueries)
    "q_color_graph" -> (ColorQueries.qColorGraph _),
    "q_color_greedy" -> (ColorQueries.qColorGreedy _),
    "q_minimal_colors" -> (ColorQueries.qMinimalColors _),
    // streaming pipelines in batch mode (same fns drive readStream —
    // StreamingSpec proves the streaming path with MemoryStream)
    "q_stream_tumbling" -> (StreamQueries.qStreamTumbling _),
    "q_stream_sliding" -> (StreamQueries.qStreamSliding _),
    "q_stream_session" -> (StreamQueries.qStreamSession _),
    "q_stream_stateful" -> (StreamQueries.qStreamStateful _),
    "q_stream_funnel" -> (StreamQueries.qStreamFunnel _),
    "q_stream_dedup" -> (StreamQueries.qStreamDedup _),
    "q_stream_join" -> (StreamQueries.qStreamJoin _),
    "q_stream_topk" -> (StreamQueries.qStreamTopk _),
    "q_stream_session_state" -> (StreamQueries.qStreamSessionState _),
    "q_stream_neardup" -> (StreamQueries.qStreamNeardup _),
    "q_stream_enrich" -> (StreamQueries.qStreamEnrich _),
    // LLM-pipeline operators (SURVEY.md §2.2 north star)
    "q_text_stats" -> (TextStats.qTextStats _),
    "q_repetition" -> (TextStats.qRepetition _),
    "q_mix_weights" -> (TextStats.qMixWeights _),
    "q_quality_score" -> (TextStats.qQualityScore _),
    "q_classify_quality" -> (TextStats.qClassifyQuality _),
    "q_chunking" -> (TextStats.qChunking _),
    "q_lang_id" -> (TextStats.qLangId _),
    "q_fingerprint" -> (TextStats.qFingerprint _),
    "q_sample_hash" -> (TextStats.qSampleHash _),
    "q_vocab" -> (TextStats.qVocab _),
    "q_redact" -> (TextStats.qRedact _),
    "q_sample_stratified" -> (TextStats.qSampleStratified _),
    "q_pack_sequences" -> (TextStats.qPackSequences _),
    "q_dedup_exact" -> (Dedup.qDedupExact _),
    "q_dedup_url" -> (Dedup.qDedupUrl _),
    "q_dedup_ngram" -> (Dedup.qDedupNgram _),
    "q_dedup_ngram_pairs" -> (Dedup.qDedupNgramPairs _),
    "q_dedup_spans" -> (Dedup.qDedupSpans _),
    "q_dedup_containment" -> (Dedup.qDedupContainment _),
    "q_dedup_fraction" -> (Dedup.qDedupFraction _),
    "q_pca_power" -> (Similarity.qPcaPower _),
    "q_dedup_incremental" -> (Dedup.qDedupIncremental _),
    "q_quality_filter" -> (TextStats.qQualityFilter _),
    "q_lm_score" -> (TextStats.qLmScore _),
    "q_dedup_minhash" -> (Dedup.qDedupMinhash _),
    "q_dedup_simhash" -> (Dedup.qDedupSimhash _),
    "q_dedup_embed" -> (Dedup.qDedupEmbed _),
    "q_dedup_cluster" -> (Dedup.qDedupCluster _),
    "q_dedup_canonical" -> (Dedup.qDedupCanonical _),
    "q_decontaminate" -> (Dedup.qDecontaminate _),
    "q_corpus_card" -> (Dedup.qCorpusCard _),
    "q_tfidf" -> (TextStats.qTfidf _),
    "q_bm25" -> (TextStats.qBm25 _),
    "q_sim_topk" -> (Similarity.qSimTopk _),
    "q_outlier_embed" -> (Similarity.qOutlierEmbed _),
    "q_sim_lsh" -> (Similarity.qSimLsh _),
    "q_sim_ivf" -> (Similarity.qSimIvf _),
    "q_sim_pq" -> (Similarity.qSimPq _),
    "q_dedup_semantic" -> (Similarity.qDedupSemantic _),
    "q_cluster_kmeans" -> (Similarity.qClusterKmeans _),
    "q_skyline" -> (TextStats.qSkyline _),
    "q_sample_priority" -> (TextStats.qSamplePriority _),
    "q_multimodal" -> (Multimodal.qMultimodal _),
    "q_bpe_train" -> (Tokenizer.qBpeTrain _),
    "q_bpe_encode" -> (Tokenizer.qBpeEncode _),
    "q_ngram_lm" -> (TextStats.qNgramLm _),
    "q_shuffle_shard" -> (TextStats.qShuffleShard _),
    "q_dsir" -> (TextStats.qDsir _),
    "q_char_entropy" -> (TextStats.qCharEntropy _),
    "q_pmi" -> (TextStats.qPmi _),
    "q_cdc_chunk" -> (TextStats.qCdcChunk _),
    "q_rank_fusion" -> (Similarity.qRankFusion _),
    "q_fuzzy_join" -> (Linkage.qFuzzyJoin _),
    "q_hard_negatives" -> (Similarity.qHardNegatives _),
    "q_ks_drift" -> (TextStats.qKsDrift _),
    "q_k_anonymity" -> (Relational.qKAnonymity _),
    "q_assoc_rules" -> (EventAnalytics.qAssocRules _),
    "q_silhouette" -> (Similarity.qSilhouette _),
    "q_mmr_select" -> (Similarity.qMmrSelect _),
    "q_chisq_drift" -> (TextStats.qChisqDrift _),
    "q_user_paths" -> (EventAnalytics.qUserPaths _),
    "q_schema_drift" -> (SinkQueries.qSchemaDrift _),
    "q_dp_count" -> (Relational.qDpCount _),
    "q_ann_recall" -> (Similarity.qAnnRecall _),
    "q_ann_recall_ivf" -> (Similarity.qAnnRecallIvf _),
    "q_token_budget" -> (TextStats.qTokenBudget _),
  )

  private val E = GraphOps.edgesSql

  def oracleSql: Map[String, String] =
    Relational.oracles ++ StreamQueries.oracles ++ TextStats.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Skew.oracles ++ Sketches.oracles ++
      EventAnalytics.oracles ++ Tokenizer.oracles ++ Linkage.oracles ++
      Multimodal.oracles ++ SinkQueries.oracles ++ Map(
    "q_edge_jaccard" -> GraphOps.edgeJaccardOracleSql(),
    "q_local_cc" -> GraphOps.localCcOracleSql(),
    "q_truss" -> GraphOps.trussOracleSql(),
    "q_closeness" -> GraphOps.closenessOracleSql(),
    "q_connected_components" -> GraphOps.ccOracleSql(),
    "q_pagerank" -> GraphOps.pagerankOracleSql(),
    "q_ppr" -> GraphOps.pprOracleSql(),
    "q_graph_sample" -> GraphOps.graphSampleOracleSql(),
    "q_random_walk" -> GraphOps.randomWalkOracleSql(),
    "q_hits" -> GraphOps.hitsOracleSql(),
    "q_sssp" -> GraphOps.ssspOracleSql(),
    "q_kcore" -> GraphOps.kcoreOracleSql(),
    "q_label_prop" -> GraphOps.labelPropOracleSql(),
    "q_modularity" -> GraphOps.modularityOracleSql(),
    "q_color_graph" -> ColorQueries.colorGraphOracleSql(),
    "q_minimal_colors" -> ColorQueries.minimalColorsOracleSql(),
    "q_color_greedy" -> ColorQueries.colorGreedyOracleSql,
    "q_edges_build" ->
      s"WITH edges AS ($E) SELECT src, dst FROM edges ORDER BY src, dst",
    "q_degree" ->
      s"WITH edges AS ($E) SELECT src, count(*) AS degree FROM edges GROUP BY src ORDER BY src",
    "q_degree_stats" ->
      s"""WITH edges AS ($E), deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY src)
         |SELECT CAST(avg(degree) AS DOUBLE) AS avg_degree, max(degree) AS max_degree,
         |       count(*) AS n_vertices FROM deg""".stripMargin,
    "q_argmax_seed" ->
      s"""WITH edges AS ($E), deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY src)
         |SELECT src AS id, degree FROM deg ORDER BY degree DESC, src LIMIT 1""".stripMargin,
    "q_neighbor_colors" ->
      s"""WITH edges AS ($E)
         |SELECT src, array_to_string(list_sort(list(DISTINCT CAST(dst % 7 AS INT))), ',') AS neighbor_colors
         |FROM edges GROUP BY src ORDER BY src""".stripMargin,
    "q_first_fit" ->
      s"""WITH edges AS ($E),
         |nc AS (SELECT DISTINCT src, CAST(dst % 7 AS INT) AS c FROM edges)
         |SELECT d.src, CAST(min(g.c) AS INT) AS first_fit
         |FROM (SELECT DISTINCT src FROM nc) d
         |CROSS JOIN generate_series(0, 7) g(c)
         |WHERE NOT EXISTS (SELECT 1 FROM nc WHERE nc.src = d.src AND nc.c = g.c)
         |GROUP BY d.src ORDER BY d.src""".stripMargin,
    "q_triangle_count" ->
      s"""WITH edges AS ($E), canon AS (SELECT src, dst FROM edges WHERE src < dst)
         |SELECT count(*) AS n_triangles
         |FROM canon e1 JOIN canon e2 ON e1.dst = e2.src
         |JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst""".stripMargin,
    "q_clustering_coeff" ->
      s"""WITH edges AS ($E), canon AS (SELECT src, dst FROM edges WHERE src < dst),
         |tri AS (
         |  SELECT count(*) AS t
         |  FROM canon e1 JOIN canon e2 ON e1.dst = e2.src
         |  JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
         |w AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS w FROM deg)
         |SELECT tri.t AS n_triangles, w.w AS n_wedges,
         |  CAST(3 * tri.t AS DOUBLE) / CAST(w.w AS DOUBLE) AS global_cc
         |FROM tri CROSS JOIN w""".stripMargin,
    "q_assortativity" ->
      s"""WITH edges AS ($E),
         |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
         |s AS (
         |  SELECT count(*) AS n_dir_edges,
         |    CAST(sum(a.d) AS BIGINT) AS sx,
         |    CAST(sum(a.d * b.d) AS BIGINT) AS sxy,
         |    CAST(sum(a.d * a.d) AS BIGINT) AS sxx
         |  FROM edges e JOIN deg a ON a.src = e.src JOIN deg b ON b.src = e.dst)
         |SELECT n_dir_edges, sx, sxy, sxx,
         |  CAST(CAST(n_dir_edges AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sx AS DOUBLE) /
         |  nullif(CAST(CAST(n_dir_edges AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE), 0) AS assortativity
         |FROM s""".stripMargin,
    "q_validate_coloring" ->
      s"""WITH edges AS ($E),
         |colors AS (SELECT DISTINCT src AS id, CAST(src % 5 AS INT) AS color FROM edges)
         |SELECT count(*) AS conflicts
         |FROM edges e JOIN colors ca ON e.src = ca.id JOIN colors cb ON e.dst = cb.id
         |WHERE ca.color = cb.color""".stripMargin,
  )
}
