#!/usr/bin/env python
"""Per-query runtime profile via the Spark status REST API → docs/PROFILE.md.

Runs each headline query, then pulls executed-job stage metrics
(task time, shuffle read/write bytes, records, spill) from the local
status endpoint (`sc.uiWebUrl`/api/v1) — the same numbers the Spark UI
shows, no listener plumbing needed. The committed artifact makes
shuffle-volume regressions reviewable: a query whose shuffle bytes jump
10× between commits shows up as a diff.

Run from the repo root: ``python tools/profile_queries.py [sf_dir]``.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openaq_lcs_fetch_spark.plans import QUERIES
from openaq_lcs_fetch_spark.session import get_spark

#: queries whose shuffle profile is load-bearing for the 100 TB design
PROFILED = [
    "pricing_summary",
    "region_revenue",
    "top_revenue_orders",
    "large_quantity_orders",
    "last_shipper_suppliers",
    "minhash_lsh_pairs",
    "ngram_jaccard_top",
    "simhash_near_dups",
    "tfidf_top_terms",
    "ann_ivf_search",
    "streaming_hourly",
    "decontaminate",
    "doc_repetition",
    "pq_search",
    "corpus_pipeline",
    "views_before_purchase",
    "session_peak_concurrency",
    "kmv_distinct_users",
    "asof_next_calibration",
    "asof_calibration",
    "sequence_pack",
    "semantic_dedup",
    "session_window_stats",
    "dedup_components",
    # round 4
    "containment_pairs",
    "passage_dedup",
    "doc_lm_score",
    "weighted_sample",
    "ivf_pq_search",
    "ann_rerank",
    "embedding_dim_stats",
    "late_shipped_priorities",
    "wealthy_inactive_customers",
    "streaming_enriched_hourly",
    # round 4b
    "dup_span_stats",
    "embedding_covariance",
    "jl_project",
    "trailing_1h_stats",
    "time_weighted_avg",
    "user_value_trend",
    "zorder_locality",
    "kmv_daily_merge",
    "cms_user_counts",
    "incremental_hourly_merge",
    # round 4c
    "streaming_click_nobuy",
    "bpe_pair_counts",
    "vocab_oov_rate",
    "bloom_membership",
    "split_leakage_audit",
    "embedding_int8_quant",
    "ctfidf_top_terms",
    "domain_cap_sample",
    "quality_winsorize",
    "pca_power_iteration",
    "token_pagerank",
    "streaming_user_final_state",
    # round 5: rewritten-for-scale statistics + new operator families
    "weighted_median_value",
    "cusum_changepoint",
    "isotonic_fit",
    "fuzzy_name_match",
    "equi_depth_quantiles",
    "value_mad",
    "max_drawdown",
    "theil_sen_daily_slope",
    "fuzzy_er_clusters",
    "copurchase_triangles",
    "customers_all_brands",
    "part_cheapest_offer",
    "basket_lift_rules",
    "hourly_autocorr24",
    "reliability_bins",
    "global_rank_sample",
    # round 6
    "item_item_cosine",
    "gini_revenue",
    "benford_digits",
    "order_price_reconcile",
    "kaplan_meier",
    "hourly_type_correlation",
    "iqr_fences_outliers",
    "user_type_impurity",
    "centroid_lang_classifier",
    "nearest_poi",
    "weekday_anova",
    "cramers_v",
    "churn_features",
    "quality_quantile_map",
    "hourly_value_emd",
    "ols_hourly_trend",
    "transition_dwell_times",
    "hourly_ks_drift",
    "mase_naive_eval",
    "wilson_proportion_ci",
    "bpe_train_merges",
    "seasonal_decompose_24",
    # round 7: the round-6 queries that had bench rows but no profile
    # (bfs_hops' iterative frontier loop is where a partition-count
    # regression would hide) + the new production-form HLL
    "bfs_hops",
    "hll_distinct_events",
    "hll_distinct_fast",
    "source_lang_tv",
    "ma_crossover",
    "new_vs_returning",
    # round 7 additions
    "clustering_coefficients",
    "fk_integrity_audit",
    "skew_audit",
    "inverted_postings",
    "last_touch_attribution",
    # round 7b additions
    "hybrid_rrf_fusion",
    "ann_ndcg_eval",
    "compaction_bins",
    # round 8: the remaining >1 s bench queries without a profile row
    # (the streaming trio's state/shuffle shape, the similarity pair,
    # and the rollup family whose walls are scan-dominated)
    "streaming_dedup_ww",
    "streaming_value_histogram",
    "streaming_sliding_counts",
    "simhash_docs",
    "measurand_normalize",
    "lineitem_melt_stats",
    "kmeans_clusters",
    "pricing_rollup",
    "nation_market_share",
    "dedup_overlapping",
    "user_sessions",
    "ann_bucket_search",
    "embedding_near_dups",
    "ann_multiprobe_search",
    "geo_tz_counts",
    # round 8 additions
    "ngram_novelty_curve",
    "degree_assortativity",
    "kcore_nodes",
    "rfm_segments",
    "l_diversity_audit",
    "histogram_selectivity_audit",
    "encoding_cost_audit",
    "timed_funnel",
    "seasonal_hour_outliers",
    "heavy_hitters_twophase",
    "cross_source_dups",
    "source_dataset_card",
    "join_explosion_audit",
    "ivf_recall_curve",
    "ship_latency_percentiles",
    "doc_length_histogram",
    "session_entry_conversion",
    "column_correlation_audit",
    "minhash_error_audit",
    "boilerplate_ngrams",
    "token_freq_spectrum",
    "brand_rank_shift",
    # round 9: the last >1 s bench queries without a profile row, plus
    # the new sink round-trips (their job breadth is the profile story)
    "daily_from_hourly",
    "cohort_ltv",
    "measures_csv_roundtrip",
    "measures_json_roundtrip",
    "station_upsert_flow",
    "checkpoint_roundtrip",
    "run_log_roundtrip",
    # round 10: the stats-planner and manifest-reader proofs (their
    # profile story is the ANALYZE pass + the pruned scan's file count)
    "stats_join_strategy",
    "range_read_roundtrip",
    "stats_accuracy_audit",
    "vacuum_roundtrip",
    "provider_pipeline_flow",
    "provider_zip_arrays_flow",
    "provider_keyed_map_flow",
    "provider_enriched_flow",
    "provider_mobile_flow",
    # round 11: the run_source composition proof (profile story: two
    # full lifecycle invocations' job breadth)
    "run_source_roundtrip",
    # the pre-flight's profile story: two key-column ANALYZE passes,
    # zero joined rows materialized
    "join_preflight_audit",
    # z-order payoff proof: one rewrite shuffle, then a 1-file read
    "zorder_range_read",
    # two real streaming invocations sharing a checkpoint: the profile
    # story is micro-batch count, not data volume
    "provider_stream_roundtrip",
    # five run_source invocations across two ticks: dispatch-bounded
    "scheduler_tick_roundtrip",
    # K6: one previewed + one real lifecycle invocation
    "dry_run_preview",
    # S3 two-phase backfill: 4 listing pages driver-side, files
    # fetched 2-per-task on executors
    "backfill_flow",
    # round 12: preflight→salted-join mitigation — profile story: the
    # hot-key stats pass + the salted (key, _salt) shuffle join
    "preflight_salted_join",
    # retry proof: Python-DataSource scan with 8 absorbed transient
    # faults; secrets: driver-only fixture; float guard: footer sweep
    # + one full scan (the guard) + one pruned scan
    "retry_backoff_flow",
    "secrets_merge_flow",
    "zorder_float_guard",
    # the folded small-files compaction: 64-file fragment, one
    # shuffle-free coalesce rewrite, readback aggregate
    "compact_roundtrip",
    # round 13: sidecar-driven salted route (compact+ANALYZE hot_keys
    # → path join routes salted); pushdown audit (DataSource scan with
    # the predicate consumed at source); rate floor (one 3-page task
    # paced at 120 ms)
    "salted_path_join",
    "http_pushdown_audit",
    "rate_floor_flow",
]


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def _fmt_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if n < 1024:
            return f"{n:.0f} {unit}" if unit == "B" else f"{n:.1f} {unit}"
        n /= 1024
    return f"{n:.1f} TiB"


def profile(sf_dir: str) -> str:
    # the engine session runs UI-less; the profiler needs the status API
    # (unconditional — an exported SPARK_GRAFT_UI=false must not win here)
    os.environ["SPARK_GRAFT_UI"] = "true"
    spark = get_spark()
    sc = spark.sparkContext
    base = sc.uiWebUrl
    if base is None:
        raise SystemExit(
            "Spark UI disabled — run in a fresh process (the profiler sets "
            "SPARK_GRAFT_UI=true before the session is created)"
        )
    app_id = sc.applicationId
    lines = [
        "# Query runtime profile (status-API stage metrics)",
        "",
        f"Generated by `tools/profile_queries.py` at `{sf_dir}`, "
        f"local[{sc.defaultParallelism}]. Shuffle bytes are the "
        "scale-limiting quantity: sf0.01 is ~10 MB of table data, so a "
        "100 TB deployment is ~10^7× this input — per-query shuffle "
        "grows roughly linearly (the plans avoid super-linear joins), "
        "so read each MiB below as ~10 TiB of cluster shuffle at target "
        "scale.",
        "",
        "| query | wall s | jobs | stages | tasks | task-time s | shuffle write | shuffle read | spill |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name in PROFILED:
        q = QUERIES[name]
        # attribute by job group, not job-id deltas: a straggler job
        # finishing after the snapshot (or listing eviction under
        # spark.ui.retainedJobs) bled neighboring queries' stages into
        # each other's rows (measured: basket_lift_rules 1.2→1.7 MiB
        # between two runs of this script with identical plans)
        sc.setJobGroup(f"profile:{name}", name)
        before = {j["jobId"] for j in _api(base, f"applications/{app_id}/jobs")}
        t0 = time.perf_counter()
        try:
            q.fn(spark, sf_dir).collect()
        finally:
            sc.setJobGroup("profile:idle", "idle")
        wall = time.perf_counter() - t0
        # group match for this thread's jobs; streaming micro-batch jobs
        # run on the stream-execution thread (job group is thread-local,
        # so they carry none) → pick those up via the id delta, which
        # now excludes OTHER queries' stragglers because those carry
        # their own group tag
        jobs = [
            j
            for j in _api(base, f"applications/{app_id}/jobs")
            if j.get("jobGroup") == f"profile:{name}"
            or (j["jobId"] not in before and not str(
                j.get("jobGroup") or "").startswith("profile:"))
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        n_tasks = task_ms = sw = sr = spill = 0
        seen_stages = 0
        for sid in stage_ids:
            try:
                attempts = _api(base, f"applications/{app_id}/stages/{sid}")
            except Exception:
                continue  # skipped stage (reused exchange) → no attempt data
            for st in attempts:
                if st.get("status") == "SKIPPED":
                    continue
                seen_stages += 1
                n_tasks += st.get("numCompleteTasks", 0)
                task_ms += st.get("executorRunTime", 0)
                sw += st.get("shuffleWriteBytes", 0)
                sr += st.get("shuffleReadBytes", 0)
                spill += st.get("diskBytesSpilled", 0)
        lines.append(
            f"| {name} | {wall:.2f} | {len(jobs)} | {seen_stages} | {n_tasks} "
            f"| {task_ms / 1000:.1f} | {_fmt_bytes(sw)} | {_fmt_bytes(sr)} "
            f"| {_fmt_bytes(spill)} |"
        )
        print(lines[-1], flush=True)
    lines += [
        "",
        "Reading the table:",
        "",
        "- **shuffle read ≥ shuffle write** per query; read = 2×write "
        "(e.g. minhash_lsh_pairs) means one exchange feeds two consumers "
        "— reuse working. Lost reuse shows as *duplicated writes*.",
        "- **spill = 0** everywhere at this SF; the per-partition sizing "
        "(`spark.sql.shuffle.partitions` scaled to input) is what keeps "
        "it zero at larger SFs.",
        "- task-time ≫ wall ⇒ the 32 cores are actually parallel "
        "(whole-stage codegen spans, no driver serialization).",
    ]
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    md = profile(sf)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "PROFILE.md")
    with open(out, "w") as f:
        f.write(md)
    print(f"wrote {out}")
