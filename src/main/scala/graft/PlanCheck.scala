package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected queries so the
  * scale properties are inspectable — broadcast joins where expected,
  * filters/projections pushed into the parquet scans, wide whole-stage
  * codegen spans, no stray shuffles. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_scan_project", "q13_join_lookup", "q16_dedup_keepfirst",
               "b01_pricing_summary", "b02_revenue_by_nation",
               "x05_dedup_exact", "x09_sim_topk",
               "q28_asof_join", "q29_range_join", "q39_range_rule",
               "x14_dedup_cluster", "x16_dedup_incremental",
               "q72_exists_subquery", "q73_lateral_topk", "q74_bloom_semi",
               "q81_recursive_cte", "x38_chunk_overlap", "x40_bm25_topk",
               "x34_inverted_index", "x35_shuffle_shard",
               "x41_weighted_mix", "q84_skew_profile", "x42_line_dedup",
               "x43_vocab_apply", "x44_length_trim", "x45_ngram_novelty",
               "x46_unigram_surprise", "x47_source_overlap",
               "q85_event_funnel", "q86_retention_cohorts",
               "q87_mad_outliers", "x48_filter_funnel",
               "x49_source_cap", "x50_lang_quota",
               "x51_distinctive_tokens", "x52_candidate_quality",
               "x53_leakage_split",
               "q88_markov_transitions", "q89_interval_peak",
               "q90_weighted_median", "x54_contamination_ppm",
               "x55_cross_source_neardup", "x56_bigram_surprise",
               "x57_length_bands", "x58_heavy_hitters",
               "q91_triangle_count",
               "q92_pagerank", "q93_streaks", "q94_allocation",
               "x59_temperature_mix", "x60_dedup_survivorship",
               "x61_token_fertility",
               "q95_zorder_locality", "q96_entity_resolution",
               "q97_bitmap_distinct", "x62_cdc_chunks",
               "q98_attribution", "q99_incremental_rollup",
               "q100_seq_pattern", "q101_sliding_distinct",
               "x63_source_datasheet", "q102_market_basket",
               "x64_embedding_drift", "q103_time_weighted_avg",
               "q104_equidepth_hist", "q105_ri_audit",
               "b03_bucketed_revenue", "x15_approx_sketch",
               "q106_exact_quantiles", "x65_bottomk_sample",
               "x66_bpe_pairs", "x67_repeated_spans",
               "x68_vocab_incremental", "q107_zonemap_prune",
               "x69_hyperplane_lsh", "x70_hybrid_rrf",
               "x71_snapshot_diff", "x72_importance_weights",
               "x73_ivf_search", "q108_scd2_intervals",
               "x74_cluster_census", "q109_merge_apply",
               "q110_interval_lookup", "q111_setsim_join",
               "q112_skyline", "q113_mad_outliers", "q114_moving_median",
               "q115_ivm_join", "q117_ivm_retract", "x77_phrase_search",
               "x81_cms_freq", "x84_sketch_rollup", "x85_jw_entity_match",
               "x86_containment_join", "x90_partial_containment",
               "x92_cluster_incremental", "x93_cms_joinsize",
               "x94_kmv_cardinality", "x95_sorted_neighborhood",
               "x96_phash_neardup", "x97_pps_systematic",
               "x99_editdist_join", "x100_reciprocal_match",
               "x101_quality_report", "x102_golden_record",
               "x103_golden_incremental", "x104_cosine_setjoin",
               "x105_video_neardup", "b04_sketch_steady", "b05_ann_steady",
               "b06_ivm_steady", "b07_join_order", "x108_aqp_sample",
               "x109_hierarchy_rollup", "x110_salted_join",
               "x111_digest_reconcile", "x112_cusum_alarms",
               "x113_ushape_attribution", "x114_rfm_segments",
               "x115_weighted_sssp", "b08_aqp_steady", "q118_bag_setops",
               "x125_kmeans_embed", "x126_semantic_dedup",
               "x127_ivf_recall", "x128_semantic_incremental",
               "x129_pq_encode", "x130_pq_recall", "x131_ivfadc_search")
    val spark = Sessions.local("8")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
