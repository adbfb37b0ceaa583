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
* round 4: never-verified queries outrank everything, and there
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

* round 5 (here): the 32 round-4c queries that never had a driver row,
  then r05-new queries as they land, then the stalest r02-green textops
  backfill. Remaining rotation debt for round 6: the r02-green
  simsearch set (``cosine_topk`` … ``embedding_near_dups``), the rest
  of the r02 windows/etl group (``pricing_rollup`` …
  ``range_window_counts``), then the stale r01 relational/etl queries.
``tools/check_all.py`` still re-proves the FULL registry against DuckDB
locally every round; rotation only decides which proof the driver
itself replays. Three late-round-5 additions land AFTER slot 50 on
purpose (``corpus_mix_weights``, ``hour_of_day_profile``,
``streaming_value_histogram``) — they head the round-6 rotation
together with the stale r02 textops/simsearch backfill listed above.
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

# Round-5 driver window (slots 1-50): the 32 round-4c queries that have
# never had a driver row (CORRECTNESS_r04 retired the previous 46+4), then
# r05-new queries as they land (first-time signal beats re-verification),
# then the stalest r02-green textops set backfilling to 50.
registry.promote(
    [
        # never driver-verified (registered round 4c)
        "week_over_week_reconcile",
        "bpe_pair_counts",
        "vocab_oov_rate",
        "bloom_membership",
        "split_leakage_audit",
        "embedding_int8_quant",
        "ctfidf_top_terms",
        "domain_cap_sample",
        "quality_winsorize",
        "token_pagerank",
        "cdc_apply",
        "ppjoin_pairs",
        "fk_violation_audit",
        "events_profile",
        "ohlc_bars",
        "dedup_shrink_report",
        "fuzzy_name_match",
        "pareto_front_parts",
        "event_motifs",
        "interval_union_length",
        "ab_test_zstat",
        "quality_percent_rank",
        "region_monthly_growth",
        "feature_auc",
        "isotonic_fit",
        "salted_join_stats",
        "weighted_median_value",
        "cusum_changepoint",
        "longest_streak",
        "dau_wau_stickiness",
        "cohort_ltv",
        "seasonal_naive_error",
        # r05-new queries (never verified — first-time signal)
        "equi_depth_quantiles",
        "value_outliers_3sigma",
        "lag_features",
        "max_drawdown",
        "theil_sen_daily_slope",
        "fuzzy_er_clusters",
        "part_cheapest_offer",
        "value_mad",
        "customers_all_brands",
        "copurchase_triangles",
        "streaming_dedup_ww",
        "basket_lift_rules",
        "hourly_autocorr24",
        "reliability_bins",
        "global_rank_sample",
        "k_anonymity_audit",
        "geo_tz_counts",
        # stalest backfill: last driver row round 2 (textops)
        "doc_token_stats",
    ]
)

QUERIES = registry.QUERIES

__all__ = ["QUERIES", "registry"]
