"""Query plans registered for the correctness driver.

Importing this package loads every query module and fills
``registry.QUERIES`` — the single source of truth consumed by
``__spark_entry__.queries()`` / ``oracle_sql()``.

The correctness driver verifies the FIRST 50 registry entries per
round, so ordering is a verification-coverage decision (a rotation),
made explicit by ``registry.promote``:

* round 1 verified the relational/etl half (CORRECTNESS_r01, 50 green);
* round 2 front-loaded textops/simsearch/streaming/windows/temporal
  (CORRECTNESS_r02: 44 green, 6 red — all one timestamp-ingestion bug);
* round 3 promoted the 12 never-verified mid-round-2 queries plus the
  6 r02 reds, backfilled with the r01 relational/etl set
  (CORRECTNESS_r03: 49 green + 1 deliberate no_oracle);
* round 4 (here): never-verified queries outrank everything, and there
  are 46 of them — 11 late-round-3 (session windows, sequence packing,
  semantic dedup, recall eval, chained/session streaming, containment,
  media, lsh-verified, token budget), ``approx_event_stats`` (driver-red
  ``no_oracle`` in r03, made hash-checkable this round), 16 mid-round-4
  (passage dedup … hourly completeness), and 18 late-round-4 (SCD2 …
  record-breaking values). The remaining 4 slots take four
  flagship round-4c additions (stream-stream outer join, timeout state
  expiry, PCA power iteration, logistic-regression GD) — first-time
  signal outranks re-verifying r01 greens. Everything else —
  14 more r01-stale relational/etl + the r02-green textops/simsearch
  set — is the round-5 rotation TODO; ``tools/check_all.py`` (and the
  repo's own 193-case parity suite) still re-proves the FULL registry
  against DuckDB locally every round, so rotation only decides which
  proof the driver itself replays.

Round-5 rotation TODO: promote the round-4c queries without a driver
row (``week_over_week_reconcile``, ``bpe_pair_counts``, ``vocab_oov_rate``, ``bloom_membership``, ``split_leakage_audit``, ``embedding_int8_quant``, ``ctfidf_top_terms``, ``domain_cap_sample``, ``quality_winsorize``, ``token_pagerank``, ``cdc_apply``, ``ppjoin_pairs``, ``fk_violation_audit``, ``events_profile``, ``ohlc_bars``, ``dedup_shrink_report``, ``fuzzy_name_match``, ``pareto_front_parts``, ``event_motifs``,
``interval_union_length``, ``ab_test_zstat``, ``quality_percent_rank``, ``region_monthly_growth``, ``feature_auc``, ``isotonic_fit``, ``salted_join_stats``, ``weighted_median_value``, ``cusum_changepoint``, ``longest_streak``, ``dau_wau_stickiness``, ``cohort_ltv``, ``seasonal_naive_error``), then the r02-green textops/simsearch set
(last driver row round 2), then the stale r01 rollup/relational/etl
queries
(``hour_ending_rollup``-adjacent group below), newest-signal last.
"""

from . import registry

from . import relational  # noqa: F401
from . import relational_adv  # noqa: F401
from . import etl  # noqa: F401
from . import llmops  # noqa: F401
from . import pq  # noqa: F401
from . import rangejoin_q  # noqa: F401
from . import temporal  # noqa: F401
from . import streaming_q  # noqa: F401
from . import windows_q  # noqa: F401
from . import textops  # noqa: F401
from . import simsearch  # noqa: F401
from . import layout  # noqa: F401

# Round-4 driver window (slots 1-50): all 46 never-verified queries,
# then 4 stalest (r01) — see module docstring.
registry.promote(
    [
        # never driver-verified (registered mid/late round 3)
        "session_window_stats",
        "sequence_pack",
        "semantic_dedup",
        "ann_recall_eval",
        "streaming_dedup_hourly",
        "streaming_sessions",
        "containment_pairs",
        "media_features",
        "media_frame_sample",
        "lsh_verified_pairs",
        "token_budget_select",
        # no_oracle in r03; made driver-checkable this round
        "approx_event_stats",
        # never driver-verified (registered mid-round 4)
        "passage_dedup",
        "doc_lm_score",
        "weighted_sample",
        "ivf_pq_search",
        "streaming_enriched_hourly",
        "ann_rerank",
        "embedding_dim_stats",
        "late_shipped_priorities",
        "wealthy_inactive_customers",
        "bm25_scores",
        "doc_chunking",
        "funnel_conversion",
        "retention_cohorts",
        "ewma_user_value",
        "value_interpolate",
        "hourly_completeness",
        # never driver-verified (registered late round 4)
        "scd2_intervals",
        "locf_fill",
        "trailing_1h_stats",
        "embedding_covariance",
        "jl_project",
        "dup_span_stats",
        "user_value_trend",
        "zorder_locality",
        "kmv_daily_merge",
        "cms_user_counts",
        "time_weighted_avg",
        "conjunctive_search",
        "event_type_affinity",
        "event_transitions",
        "value_histogram",
        "incremental_hourly_merge",
        "type_day_chisq",
        "record_breaking_values",
        # flagship round-4c additions (never driver-verified; first-time
        # signal beats re-verifying r01 greens — swapped in before the
        # round-4 driver run)
        "streaming_click_nobuy",
        "streaming_user_final_state",
        "pca_power_iteration",
        "logreg_gd_steps",
    ]
)

QUERIES = registry.QUERIES

__all__ = ["QUERIES", "registry"]
