package graft.tools

import java.nio.file.{Files, Paths}

/** Dump formatted physical plans for headline queries → used to author and
  * refresh PLANS.md. Run: sbt "runMain graft.tools.DumpPlans /tmp/plans"
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/plans")
    Files.createDirectories(Paths.get(outDir))
    val spark = graft.core.GraftSession.local("plans", "32")
    val d = "/root/testdata/sf0.1"
    val picks = Seq(
      "q1_pricing_summary", "q6_forecast_revenue", "q3_shipping_priority",
      "q5_local_supplier", "top10_lineitems", "dedup_lsh_candidates",
      "knn_brute_force", "asof_last_purchase", "events_user_sessions",
      "skew_salted_event_totals",
      "zonemap_orders_daterange", "zorder_rectangle", "text_contamination",
      "dedup_lsh_index_candidates", "events_streaming_topk",
      "ann_sq_search", "ann_pq_adc_search", "events_heavy_hitters",
      "text_weighted_sample",
      "q4_priority_census", "q7_nation_volume", "q9_product_profit",
      "q10_returned_revenue", "mv_pricing_summary", "rolling_spend_30d",
      "text_shingle_udtf", "dedup_jaccard_verified",
      "q2_min_cost_supplier", "q8_market_share", "q11_important_parts",
      "q12_delay_census", "q13_customer_distribution", "q14_promo_revenue",
      "q15_top_supplier", "q16_supplier_census", "q17_small_qty_revenue",
      "q18_large_volume_customers", "q19_disjunctive_revenue",
      "q20_volume_share_suppliers", "q21_waiting_suppliers",
      "q22_dormant_customers",
      "ann_ivfpq_search", "text_lm_score", "snapshot_orders_asof",
      "ann_ivf_batch_search",
      "ann_ivfpq_batch_search", "dedup_shared_ngrams",
      "dedup_normalized_exact", "dedup_containment",
      "dedup_simhash_pairs", "ann_ivf_index_search_trained",
      "dedup_report_streamed",
      "dedup_exact_jaccard_join", "dedup_delta_candidates",
      "dedup_delta_candidates_streamed", "dedup_lsh_candidates_k12",
      "ann_ivf_filtered_search", "ann_ivf_filtered_batch_search",
      "dedup_simhash_pairs_wide",
      "dedup_semantic", "dedup_semantic_delta", "text_global_shuffle",
      "text_shard_balance",
      "text_chunk_windows", "text_temperature_mixture", "text_span_scrub",
      "text_curriculum_export", "text_chunked_export", "semantic_cell_drift",
      "ann_ivf_compacted_search",
      "dedup_delta_candidates_compacted", "dedup_lsh_ingest",
      "takedown_scan", "takedown_ivf_search",
      "text_subword_tokens", "text_subword_budget_cutoff")
    picks.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"$name.txt"), txt)
      println(s"wrote $name")
    }
    spark.stop()
  }
}
