"""Zero-row robustness: at 100 TB, empty inputs are routine (an empty
day partition, a filtered-out source, a fresh table). Every operator
family must plan and execute over 0-row tables without crashing —
adaptive branches that .first() a scalar (df caps, certificates,
watermarks) must tolerate NULL aggregates, and iterative builds
(k-means, PQ, components) must converge on nothing.
"""

from __future__ import annotations

import os

import pytest

from openaq_lcs_fetch_spark import tables
from openaq_lcs_fetch_spark.plans import QUERIES

#: one query per operator family, including every round-4 addition
REPRESENTATIVE = (
    "pricing_summary", "region_revenue", "top_revenue_orders",
    "latest_3_per_user", "measurand_normalize", "dedup_exact",
    "minhash_lsh_pairs", "ngram_jaccard_top", "containment_pairs",
    "passage_dedup", "doc_lm_score", "weighted_sample", "decontaminate",
    "corpus_pipeline", "kmv_distinct_users", "sequence_pack",
    "semantic_dedup", "kmeans_clusters", "pq_search", "ivf_pq_search",
    "ann_rerank", "embedding_dim_stats", "cosine_topk",
    "asof_calibration", "views_before_purchase", "session_peak_concurrency",
    "user_sessions", "approx_event_stats", "salted_type_stats",
    "dedup_components", "token_budget_select", "media_features",
    "wealthy_inactive_customers", "event_type_pivot", "stratified_sample",
    "bm25_scores", "doc_chunking",
    "funnel_conversion", "retention_cohorts", "ewma_user_value",
    "value_interpolate", "hourly_completeness",
    # round-4b additions
    "scd2_intervals", "locf_fill", "trailing_1h_stats", "embedding_covariance", "jl_project", "dup_span_stats", "user_value_trend", "zorder_locality", "kmv_daily_merge", "cms_user_counts", "time_weighted_avg", "conjunctive_search", "event_type_affinity", "event_transitions", "value_histogram", "incremental_hourly_merge", "type_day_chisq", "record_breaking_values", "week_over_week_reconcile",
    # round-4c additions
    "bpe_pair_counts", "vocab_oov_rate", "bloom_membership",
    "split_leakage_audit", "embedding_int8_quant", "ctfidf_top_terms",
    "domain_cap_sample", "quality_winsorize", "pca_power_iteration",
    "token_pagerank", "streaming_user_final_state", "streaming_click_nobuy", "cdc_apply", "ppjoin_pairs",
    "fk_violation_audit", "events_profile", "ohlc_bars",
    "dedup_shrink_report", "fuzzy_name_match", "logreg_gd_steps",
    "pareto_front_parts", "event_motifs", "interval_union_length",
    "ab_test_zstat", "quality_percent_rank", "region_monthly_growth",
    "feature_auc", "isotonic_fit", "salted_join_stats",
    "weighted_median_value", "cusum_changepoint", "longest_streak",
    "dau_wau_stickiness", "cohort_ltv", "seasonal_naive_error",
    # round-5 additions
    "equi_depth_quantiles", "value_outliers_3sigma", "lag_features",
    "max_drawdown", "theil_sen_daily_slope", "value_mad",
    "fuzzy_er_clusters", "part_cheapest_offer", "customers_all_brands",
    "copurchase_triangles", "streaming_dedup_ww", "basket_lift_rules", "hourly_autocorr24", "reliability_bins", "global_rank_sample", "k_anonymity_audit", "geo_tz_counts", "corpus_mix_weights", "hour_of_day_profile", "streaming_value_histogram",
    # round-6 additions
    "item_item_cosine", "gini_revenue", "benford_digits",
    "order_price_reconcile", "kaplan_meier", "hourly_type_correlation",
    "ma_crossover", "new_vs_returning", "iqr_fences_outliers",
    "user_type_impurity", "source_lang_tv", "centroid_lang_classifier",
    "streaming_sliding_counts", "weekday_anova", "cramers_v",
    "churn_features", "nearest_poi", "hll_distinct_events", "bfs_hops",
    "quality_quantile_map", "hourly_value_emd",
    "ols_hourly_trend", "transition_dwell_times", "hourly_ks_drift",
    "mase_naive_eval", "wilson_proportion_ci", "bpe_train_merges",
    "seasonal_decompose_24",
    # round-7 additions
    "hll_distinct_fast", "clustering_coefficients", "fk_integrity_audit",
    "skew_audit", "inverted_postings", "last_touch_attribution",
    # round-7b additions
    "hybrid_rrf_fusion", "ann_ndcg_eval", "compaction_bins",
    # round-8 additions
    "ngram_novelty_curve", "degree_assortativity", "kcore_nodes",
    "rfm_segments", "l_diversity_audit", "histogram_selectivity_audit",
    "encoding_cost_audit", "timed_funnel", "seasonal_hour_outliers",
    "heavy_hitters_twophase", "cross_source_dups", "source_dataset_card",
    "join_explosion_audit", "ivf_recall_curve", "ship_latency_percentiles",
    "doc_length_histogram", "session_entry_conversion",
    "column_correlation_audit", "minhash_error_audit",
    "boilerplate_ngrams", "token_freq_spectrum", "brand_rank_shift",
    # round-9 additions (sink/checkpoint round-trips)
    "measures_csv_roundtrip", "measures_json_roundtrip",
    "station_upsert_flow", "checkpoint_roundtrip", "run_log_roundtrip",
    # round-12 additions
    "preflight_salted_join", "zorder_float_guard",
    "retry_backoff_flow", "secrets_merge_flow", "compact_roundtrip",
    # round-13 additions
    "salted_path_join", "http_pushdown_audit", "rate_floor_flow",
)


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    """Every testdata table, schema-identical but 0 rows."""
    dst = str(tmp_path_factory.mktemp("sf_empty"))
    for name in tables.TABLE_NAMES:
        (
            spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
            .limit(0)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(dst, f"{name}.parquet"))
        )
    return dst


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    # no assertion on the count: global aggregates legitimately emit a
    # row over empty input; the property is "plans and runs"
    QUERIES[name].fn(spark, empty_sf_dir).count()
