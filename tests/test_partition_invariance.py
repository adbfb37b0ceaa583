"""The determinism contract under a DIFFERENT execution geometry: the
driver owns its session, so results must be bit-identical whatever
parallelism/shuffle-partition count it picks. Runs a representative
query set in a subprocess with local[3]/7 shuffle partitions (the
shared test session can't change master) and hash-compares with DuckDB.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys, math
sys.path.insert(0, {repo!r})
import duckdb
import pandas as pd
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[3]")
         .config("spark.sql.shuffle.partitions", "7").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
qs, osql = E.queries(), E.oracle_sql()
sf = "/root/testdata/sf0.001"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {{t}} AS SELECT * FROM '{{sf}}/{{t}}.parquet'")

def canon(df):
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        out = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                out.append("NULL")
            elif isinstance(v, float):
                out.append(repr(v))
            elif isinstance(v, pd.Timestamp):
                out.append(v.isoformat())
            else:
                out.append(str(v))
        rows.append(tuple(out))
    return sorted(rows)

for n in ["pricing_summary", "minhash_lsh_pairs", "kmeans_clusters",
          "hourly_rollup", "nation_revenue_share",
          "decontaminate", "doc_repetition", "pq_search",
          "sequence_pack", "semantic_dedup", "asof_calibration",
          "containment_pairs", "session_window_stats", "token_budget_select",
          "passage_dedup", "doc_lm_score", "weighted_sample",
          "ivf_pq_search", "ann_rerank", "embedding_dim_stats",
          "wealthy_inactive_customers", "bm25_scores", "doc_chunking",
          "funnel_conversion", "retention_cohorts", "ewma_user_value",
          "value_interpolate", "hourly_completeness",
          "scd2_intervals", "locf_fill", "trailing_1h_stats",
          "embedding_covariance", "jl_project", "dup_span_stats",
          "user_value_trend", "zorder_locality", "kmv_daily_merge",
          "cms_user_counts", "time_weighted_avg", "conjunctive_search",
          "event_type_affinity", "event_transitions", "value_histogram",
          "incremental_hourly_merge", "type_day_chisq",
          "record_breaking_values", "week_over_week_reconcile",
          "bpe_pair_counts", "vocab_oov_rate", "bloom_membership",
          "split_leakage_audit", "embedding_int8_quant", "ctfidf_top_terms",
          "domain_cap_sample", "quality_winsorize", "pca_power_iteration",
          "token_pagerank", "streaming_user_final_state", "cdc_apply", "ppjoin_pairs",
          "fk_violation_audit", "events_profile", "ohlc_bars",
          "dedup_shrink_report", "fuzzy_name_match", "logreg_gd_steps",
          "pareto_front_parts", "event_motifs", "interval_union_length",
          "ab_test_zstat", "quality_percent_rank", "region_monthly_growth",
          "feature_auc", "isotonic_fit", "salted_join_stats",
          "weighted_median_value", "cusum_changepoint", "longest_streak",
          "dau_wau_stickiness", "cohort_ltv", "seasonal_naive_error",
          "equi_depth_quantiles", "value_outliers_3sigma", "lag_features", "max_drawdown", "theil_sen_daily_slope",
          "value_mad", "fuzzy_er_clusters", "part_cheapest_offer", "customers_all_brands", "copurchase_triangles", "basket_lift_rules", "hourly_autocorr24", "reliability_bins", "global_rank_sample", "k_anonymity_audit", "geo_tz_counts",
          "corpus_mix_weights", "hour_of_day_profile",
          "item_item_cosine", "gini_revenue", "benford_digits",
          "order_price_reconcile", "kaplan_meier", "hourly_type_correlation",
          "ma_crossover", "new_vs_returning", "iqr_fences_outliers",
          "user_type_impurity", "source_lang_tv", "centroid_lang_classifier",
          "weekday_anova", "cramers_v", "churn_features", "nearest_poi",
          "hll_distinct_events", "bfs_hops",
          "quality_quantile_map", "hourly_value_emd",
          "ols_hourly_trend", "transition_dwell_times",
          "hourly_ks_drift", "mase_naive_eval", "wilson_proportion_ci",
          "bpe_train_merges", "seasonal_decompose_24",
          # round-7 additions
          "hll_distinct_fast", "clustering_coefficients",
          "fk_integrity_audit", "skew_audit", "inverted_postings",
          "last_touch_attribution",
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
          "station_upsert_flow", "checkpoint_roundtrip",
          "run_log_roundtrip",
          # round-12 additions
          "preflight_salted_join", "zorder_float_guard",
          "retry_backoff_flow", "secrets_merge_flow",
          "compact_roundtrip",
          # round-13 additions
          "salted_path_join", "http_pushdown_audit", "rate_floor_flow"]:
    s = canon(qs[n](spark, sf).toPandas())
    o = canon(con.sql(osql[n]).df())
    assert s == o, n

# kmv_daily_merge is VACUOUS at sf0.001 (fewer than k=64 distinct user
# hashes -> both engines return 0 rows), so its estimate-parity claim
# re-proves at sf0.01 under this geometry, non-empty by assertion.
sf01 = "/root/testdata/sf0.01"
con01 = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con01.sql(f"CREATE VIEW {{t}} AS SELECT * FROM '{{sf01}}/{{t}}.parquet'")
kdf = qs["kmv_daily_merge"](spark, sf01).toPandas()
assert len(kdf) == 1, "kmv must be non-vacuous at sf0.01"
assert canon(kdf) == canon(con01.sql(osql["kmv_daily_merge"]).df())
print("INVARIANT_OK")
"""


def test_results_invariant_to_parallelism():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=repo)],
        capture_output=True, text=True, timeout=420,
    )
    assert "INVARIANT_OK" in proc.stdout, proc.stderr[-2000:]
