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

* round 6: the 3 never-verified round-5-tail queries, round-6's
  new queries, the 18 round-1-stale queries, then round-2-stale
  backfill (simsearch → windows/etl → textops head) —
  CORRECTNESS_r06: 50/50 green, r01 staleness zeroed;
* round 7: six new queries, then ALL 42 remaining round-2-stale
  queries (velocity was capped at 6 new precisely so the whole r02
  debt fits one window), then two round-3 backfills
  (CORRECTNESS_r07: 50/50 green, r02 staleness zeroed). Exactly three
  round-7b queries landed AFTER slot 50 on purpose (``hybrid_rrf_fusion``,
  ``ann_ndcg_eval``, ``compaction_bins``) — they spend round 8's entire
  new-query budget.
* round 8 (here): the three round-7b queries (the only registered
  queries with zero driver rows) in slots 1-3, then ALL 47 r03-stale
  queries — exactly 50 slots, so in-window new-query velocity is 0 and
  every round-8 addition lands after slot 50 to head the round-9
  window. After this window the never-verified set is empty and no
  driver row is older than round 4. Round 8 added 22 queries
  (ngram_novelty_curve … brand_rank_shift); the round-9 window is
  therefore those 22 never-verified + 28 of the 50 r04-stale rows —
  again exactly 50 — leaving 22 r04-stale for round 10 (velocity ≤ 28
  that round keeps the ledger monotone).

The ledger above is now DERIVED, not hand-maintained: once a round's
CORRECTNESS_r{N}.json is committed, ``python tools/rotation_audit.py``
prints each query's newest green driver row, the staleness histogram,
and the next 50-slot window under this exact policy (never-verified →
red-last-window → least-recently-green).
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

# Round-8 driver window (slots 1-50), executing the rotation the
# round-7 verdict prescribed: (1) the three round-7b queries — the ONLY
# registered queries with zero driver rows — in slots 1-3; (2) ALL 47
# queries whose newest green driver row is ROUND 3 (the r03
# relational/etl block, the r03 llmops/sketch block, and the r03
# temporal/streaming remainder). 3 + 47 = exactly 50 slots, so round-8
# new-query velocity inside the window is 0 by design: every query
# added this round lands AFTER slot 50 and heads the round-9 window.
# After this window, no driver row is older than round 4 and the
# never-verified set is empty (``tools/rotation_audit.py`` derives
# both claims from the committed CORRECTNESS files).
registry.promote(
    [
        # (1) round-7b queries — never driver-verified (zero rows)
        "hybrid_rrf_fusion",
        "ann_ndcg_eval",
        "compaction_bins",
        # (2) last driver row = round 3: relational/etl block
        "top_revenue_orders",
        "region_revenue",
        "brand_top_parts",
        "priority_monthly",
        "lineitem_melt_stats",
        "customers_without_orders",
        "supplier_nation_stats",
        "cheapest_parts_per_brand",
        "nation_pair_volume",
        "promo_revenue_share",
        "disjunctive_part_revenue",
        "large_quantity_orders",
        "returned_item_customers",
        "nation_market_share",
        "top_value_parts",
        "brand_supplier_counts",
        "last_shipper_suppliers",
        "engaged_users",
        "status_priority_sets",
        "nation_revenue_share",
        "forecast_revenue",
        "small_quantity_revenue",
        "customer_order_distribution",
        "top_supplier",
        # (2) last driver row = round 3: operator/etl remainder
        "measurand_normalize",
        "time_range_filter",
        "sentinel_clean",
        "whitelist_semi",
        "latest_3_per_user",
        "first_event_per_user",
        "dedup_overlapping",
        # (2) last driver row = round 3: llmops/sketch block
        "decontaminate",
        "pii_scrub",
        "gopher_quality",
        "doc_repetition",
        "corpus_pipeline",
        "kmv_distinct_users",
        "pq_codes",
        "pq_search",
        "ann_ivf_multicell",
        # (2) last driver row = round 3: temporal/streaming remainder
        "views_before_purchase",
        "session_peak_concurrency",
        "asof_next_calibration",
        "asof_calibration",
        "streaming_gaps",
        "streaming_click_to_buy",
        "user_sessions",
    ]
)

QUERIES = registry.QUERIES

__all__ = ["QUERIES", "registry"]
