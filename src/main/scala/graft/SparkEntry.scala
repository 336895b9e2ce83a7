package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or a north-star
  * LLM-pipeline extension); each has an equivalent DuckDB SQL in
  * `oracleSql` so the driver's correctness gate hash-compares both engines
  * on the same parquet inputs.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.5 relational layer
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q6_forecast_revenue" -> (Relational.q6ForecastRevenue _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q5_local_supplier" -> (Relational.q5LocalSupplier _),
    "top_order_per_customer" -> (Relational.topOrderPerCustomer _),
    "running_customer_spend" -> (Relational.runningCustomerSpend _),
    "nearby_spend" -> (Relational.nearbySpend _),
    "order_gaps" -> (Relational.orderGaps _),
    "top10_lineitems" -> (Relational.top10Lineitems _),
    "distinct_parts_per_flag" -> (Relational.distinctPartsPerFlag _),
    "set_ops_customers" -> (Relational.setOpsCustomers _),
    "rollup_quantity" -> (Relational.rollupQuantity _),
    "cube_quantity" -> (Relational.cubeQuantity _),
    "grouping_sets_quantity" -> (Relational.groupingSetsQuantity _),
    "orders_above_customer_avg" -> (Relational.ordersAboveCustomerAvg _),
    "pivot_order_status" -> (Relational.pivotOrderStatus _),
    "unpivot_part_metrics" -> (Relational.unpivotPartMetrics _),
    "quantity_quartiles" -> (Relational.quantityQuartiles _),
    "histogram_order_totals" -> (Relational.histogramOrderTotals _),
    "order_value_extremes" -> (Relational.orderValueExtremes _),
    "string_agg_types" -> (Relational.stringAggTypes _),
    "array_functions_orders" -> (Relational.arrayFunctionsOrders _),
    "null_semantics_orders" -> (Relational.nullSemanticsOrders _),
    "regex_part_names" -> (Relational.regexPartNames _),
    "events_hourly_gapfill" -> (Events.hourlyGapfill _),
    "lateral_top_parts" -> (Relational.lateralTopParts _),
    "quantity_stats_per_flag" -> (Relational.quantityStatsPerFlag _),
    "theta_nation_region" -> (Relational.thetaNationRegion _),
    "order_price_ranks" -> (Relational.orderPriceRanks _),
    "median_quantity_per_flag" -> (Relational.medianQuantityPerFlag _),
    "profile_orders" -> (Relational.profileOrders _),
    "quantity_price_covariance" -> (Relational.quantityPriceCovariance _),
    "order_quantity_vectors" -> (Relational.orderQuantityVectors _),
    "customers_without_orders" -> (Relational.customersWithoutOrders _),
    "customers_with_open_orders" -> (Relational.customersWithOpenOrders _),
    "part_scalar_functions" -> (Relational.partScalarFunctions _),
    "order_date_stats" -> (Relational.orderDateStats _),
    // §2.1 core API semantics re-expressed relationally
    "rowid_range" -> (Relational.rowidRange _),
    "table_length" -> (Relational.tableLength _),
    // §2.6 event-time
    "events_hourly_by_type" -> (Events.hourlyByType _),
    "events_sliding_counts" -> (Events.slidingCounts _),
    "events_user_sessions" -> (Events.userSessions _),
    "events_json_props" -> (Events.jsonPropsSummary _),
    "events_inter_event_gaps" -> (Events.interEventGaps _),
    "events_funnel" -> (Events.signupClickPurchaseFunnel _),
    "events_cohort_retention" -> (Events.cohortRetention _),
    "asof_last_purchase" -> (AsofJoin.lastPurchaseBeforeClick _),
    "asof_next_error" -> (AsofJoin.nextErrorAfterClick _),
    "range_errors_near_clicks" -> (AsofJoin.errorsNearClicks _),
    // north-star: dedup
    "dedup_exact" -> (Dedup.exactDedup _),
    "dedup_minhash_signatures" -> (Dedup.minhashSignatures _),
    "dedup_lsh_candidates" -> (Dedup.lshCandidatePairs _),
    "dedup_jaccard_verified" -> (Dedup.jaccardVerifiedPairs _),
    "dedup_simhash" -> (Dedup.simhashSignatures _),
    "dedup_clusters" -> (Dedup.duplicateClusters _),
    "pipeline_clean_corpus" -> (Pipeline.cleanCorpus _),
    // north-star: similarity search
    "knn_brute_force" -> (Similarity.bruteForceKnn _),
    "ann_lsh_bucket_stats" -> (Similarity.lshBucketStats _),
    "embedding_near_dups" -> (Similarity.embeddingNearDups _),
    "ann_ivf_assign" -> (Similarity.ivfAssign _),
    "ann_ivf_cell_stats" -> (Similarity.ivfCellStats _),
    "ann_ivf_search" -> (Similarity.ivfSearch _),
    "ann_ivf_search_multiprobe" -> (Similarity.ivfSearchMultiprobe _),
    "ann_ivf_index_search" -> (Similarity.ivfIndexSearch _),
    // north-star: text analysis
    "text_token_stats" -> (TextOps.tokenStats _),
    "text_quality_scores" -> (TextOps.qualityScores _),
    "text_language_id" -> (TextOps.languageId _),
    "text_fingerprints" -> (TextOps.fingerprints _),
    "text_top_tokens" -> (TextOps.topTokens _),
    "text_deterministic_sample" -> (TextOps.deterministicSample _),
    "map_token_counts" -> (TextOps.tokenCountMap _),
    "text_tfidf_top_terms" -> (TextOps.tfidfTopTerms _),
    "text_bigram_counts" -> (TextOps.bigramCounts _),
    // north-star: multimodal plumbing
    "mm_binary_metadata" -> (Multimodal.binaryMetadata _),
    "mm_decode_features" -> (Multimodal.decodeFeatures _),
    "mm_payload_chunks" -> (Multimodal.payloadChunks _),
    "mm_binary_dedup" -> (Multimodal.binaryDedup _),
    "doc_embedding_fusion" -> (Multimodal.docEmbeddingFusion _),
    "events_transition_counts" -> (Events.transitionCounts _),
    "events_hourly_anomalies" -> (Events.hourlyAnomalies _),
    // skew + sketches
    "skew_salted_event_totals" -> (Skew.eventTypeTotalsSalted _),
    "skew_salted_join" -> (Skew.eventTypeJoinSalted _),
    "approx_sketches" -> (Relational.approxSketches _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Relational.q1Sql,
    "q6_forecast_revenue" -> Relational.q6Sql,
    "q3_shipping_priority" -> Relational.q3Sql,
    "q5_local_supplier" -> Relational.q5Sql,
    "top_order_per_customer" -> Relational.topOrderPerCustomerSql,
    "running_customer_spend" -> Relational.runningCustomerSpendSql,
    "nearby_spend" -> Relational.nearbySpendSql,
    "order_gaps" -> Relational.orderGapsSql,
    "top10_lineitems" -> Relational.top10LineitemsSql,
    "distinct_parts_per_flag" -> Relational.distinctPartsPerFlagSql,
    "set_ops_customers" -> Relational.setOpsCustomersSql,
    "rollup_quantity" -> Relational.rollupQuantitySql,
    "cube_quantity" -> Relational.cubeQuantitySql,
    "grouping_sets_quantity" -> Relational.groupingSetsQuantitySql,
    "orders_above_customer_avg" -> Relational.ordersAboveCustomerAvgSql,
    "pivot_order_status" -> Relational.pivotOrderStatusSql,
    "unpivot_part_metrics" -> Relational.unpivotPartMetricsSql,
    "quantity_quartiles" -> Relational.quantityQuartilesSql,
    "histogram_order_totals" -> Relational.histogramOrderTotalsSql,
    "order_value_extremes" -> Relational.orderValueExtremesSql,
    "string_agg_types" -> Relational.stringAggTypesSql,
    "array_functions_orders" -> Relational.arrayFunctionsOrdersSql,
    "null_semantics_orders" -> Relational.nullSemanticsOrdersSql,
    "regex_part_names" -> Relational.regexPartNamesSql,
    "events_hourly_gapfill" -> Events.hourlyGapfillSql,
    "lateral_top_parts" -> Relational.lateralTopPartsSql,
    "quantity_stats_per_flag" -> Relational.quantityStatsPerFlagSql,
    "theta_nation_region" -> Relational.thetaNationRegionSql,
    "order_price_ranks" -> Relational.orderPriceRanksSql,
    "median_quantity_per_flag" -> Relational.medianQuantityPerFlagSql,
    "profile_orders" -> Relational.profileOrdersSql,
    "quantity_price_covariance" -> Relational.quantityPriceCovarianceSql,
    "order_quantity_vectors" -> Relational.orderQuantityVectorsSql,
    "customers_without_orders" -> Relational.customersWithoutOrdersSql,
    "customers_with_open_orders" -> Relational.customersWithOpenOrdersSql,
    "part_scalar_functions" -> Relational.partScalarFunctionsSql,
    "order_date_stats" -> Relational.orderDateStatsSql,
    "rowid_range" -> Relational.rowidRangeSql,
    "table_length" -> Relational.tableLengthSql,
    "events_hourly_by_type" -> Events.hourlyByTypeSql,
    "events_sliding_counts" -> Events.slidingCountsSql,
    "events_user_sessions" -> Events.userSessionsSql,
    "events_json_props" -> Events.jsonPropsSummarySql,
    "events_inter_event_gaps" -> Events.interEventGapsSql,
    "events_funnel" -> Events.signupClickPurchaseFunnelSql,
    "events_cohort_retention" -> Events.cohortRetentionSql,
    "asof_last_purchase" -> AsofJoin.lastPurchaseBeforeClickSql,
    "asof_next_error" -> AsofJoin.nextErrorAfterClickSql,
    "range_errors_near_clicks" -> AsofJoin.errorsNearClicksSql,
    "dedup_exact" -> Dedup.exactDedupSql,
    "dedup_minhash_signatures" -> Dedup.minhashSignaturesSql,
    "dedup_lsh_candidates" -> Dedup.lshCandidatePairsSql,
    "dedup_jaccard_verified" -> Dedup.jaccardVerifiedPairsSql,
    "dedup_simhash" -> Dedup.simhashSignaturesSql,
    "dedup_clusters" -> Dedup.duplicateClustersSql,
    "pipeline_clean_corpus" -> Pipeline.cleanCorpusSql,
    "knn_brute_force" -> Similarity.bruteForceKnnSql,
    "ann_lsh_bucket_stats" -> Similarity.lshBucketStatsSql,
    "embedding_near_dups" -> Similarity.embeddingNearDupsSql,
    "ann_ivf_assign" -> Similarity.ivfAssignSql,
    "ann_ivf_cell_stats" -> Similarity.ivfCellStatsSql,
    "ann_ivf_search" -> Similarity.ivfSearchSql,
    "ann_ivf_search_multiprobe" -> Similarity.ivfSearchMultiprobeSql,
    "ann_ivf_index_search" -> Similarity.ivfSearchMultiprobeSql,
    "text_token_stats" -> TextOps.tokenStatsSql,
    "text_quality_scores" -> TextOps.qualityScoresSql,
    "text_language_id" -> TextOps.languageIdSql,
    "text_fingerprints" -> TextOps.fingerprintsSql,
    "text_top_tokens" -> TextOps.topTokensSql,
    "text_deterministic_sample" -> TextOps.deterministicSampleSql,
    "map_token_counts" -> TextOps.tokenCountMapSql,
    "text_tfidf_top_terms" -> TextOps.tfidfTopTermsSql,
    "text_bigram_counts" -> TextOps.bigramCountsSql,
    "mm_binary_metadata" -> Multimodal.binaryMetadataSql,
    "mm_decode_features" -> Multimodal.decodeFeaturesSql,
    "mm_payload_chunks" -> Multimodal.payloadChunksSql,
    "mm_binary_dedup" -> Multimodal.binaryDedupSql,
    "doc_embedding_fusion" -> Multimodal.docEmbeddingFusionSql,
    "events_transition_counts" -> Events.transitionCountsSql,
    "events_hourly_anomalies" -> Events.hourlyAnomaliesSql,
    "skew_salted_event_totals" -> Skew.eventTypeTotalsSaltedSql,
    "skew_salted_join" -> Skew.eventTypeJoinSaltedSql
    // approx_sketches intentionally has no oracle: sketch internals are
    // engine-specific; the exact counterparts are verified above.
  )
}
