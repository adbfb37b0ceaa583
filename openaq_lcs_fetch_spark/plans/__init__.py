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
* round 8: the three round-7b queries (the only registered
  queries with zero driver rows) in slots 1-3, then ALL 47 r03-stale
  queries — exactly 50 slots, in-window new-query velocity 0
  (CORRECTNESS_r08: 50/50 green, r03 staleness zeroed). Round 8 added
  22 queries (ngram_novelty_curve … brand_rank_shift) after slot 50.
* round 9: those 22 never-verified round-8 queries in slots
  1-22, then the 28 OLDEST r04-stale queries (audit order:
  late_shipped_priorities … locf_fill) — again exactly 50. The
  remaining 22 r04-stale rows (trailing_1h_stats …
  week_over_week_reconcile) head the round-10 window together with
  round 9's five sink round-trips (measures_csv/json_roundtrip,
  station_upsert_flow, checkpoint_roundtrip, run_log_roundtrip — all
  after slot 50 by design): 22 + 5 = 27 slots, leaving ≤ 23 for
  round-10 additions to keep the ledger monotone.
* round 10: exactly the composition round 9 prescribed — the
  5 never-verified sink round-trips in slots 1-5, round 10's two
  additions (``stats_join_strategy``, the ANALYZE-stats broadcast-vs-
  shuffle consumer; ``range_read_roundtrip``, the manifest-pruned
  range reader driven end-to-end — both convert previously pytest-only
  engine infrastructure into driver proofs, the round-9 pattern) in
  slots 6-7, then the 22 r04-stale queries, then the 21 OLDEST
  r05-stale queries (fk_violation_audit … split_leakage_audit).
  5 + 2 + 22 + 21 = exactly 50. After this round the r04 bucket is
  empty and r05 holds 29 rows. Seven round-10 additions land AFTER
  slot 50 on purpose (``stats_accuracy_audit``, the ANALYZE-document-
  vs-exact audit; ``vacuum_roundtrip``, the retention vacuum's
  file-granular semantics reproduced in SQL; the five provider-shape
  flow proofs ``provider_pipeline_flow`` / ``provider_zip_arrays_flow``
  / ``provider_keyed_map_flow`` / ``provider_enriched_flow`` /
  ``provider_mobile_flow`` — every pipeline shape in the provider
  registry): they head the round-11 window with the 29 r05-stale rows
  and the 14 oldest r06 rows — 7 + 29 + 14 = exactly 50, zeroing r05
  in round 11 with in-window velocity 0.
* round 11: exactly that composition — the 7 never-verified
  round-10 additions in slots 1-7, the 29 r05-stale rows, the 14
  oldest r06 rows. Round-11 additions land AFTER slot 50 on purpose
  (``run_source_roundtrip``, the one-call §3.1 lifecycle composition;
  ``zorder_range_read``, z-order write + manifest-pruned 2-D box read
  composed end-to-end; ``join_preflight_audit``, the Selinger
  estimate consulted as a join blow-up pre-flight;
  ``provider_stream_roundtrip``, the streaming runner driven like two
  cron ticks sharing one checkpoint; ``scheduler_tick_roundtrip``, the
  scheduler's cadence gating + per-source isolation composed with the
  engine; ``dry_run_preview``, K6's no-write preview contract;
  ``backfill_flow``, the S3 two-phase token-paginated backfill with
  sorted early-exit): they head the round-12 window.
  CORRECTNESS_r11: 50/50 green, r05 staleness zeroed.
* round 12 (here): the 7 never-verified round-11 additions in slots
  1-7, then ALL 36 r06-stale rows in audit order, then the 7 OLDEST
  r07 rows — 7 + 36 + 7 = exactly 50, zeroing r06. Round-12 additions
  land AFTER slot 50 on purpose — exactly five
  (``preflight_salted_join``, the pre-flight escalated to a routed
  salted join; ``retry_backoff_flow``, X2's per-call retry driven
  through the Python DataSource; ``secrets_merge_flow``, S6's config
  merge contract; ``zorder_float_guard``, the float/decimal truncation
  guard's negative proof; ``compact_roundtrip``, the unified
  compaction surface's own proof — ``compact_parquet`` folded into
  ``storage.py`` beside the driver-proven ``compact_by_time``): they
  head the round-13 window with 43 r07-stale rows.
* round 13 (here): the 5 never-verified round-12 additions in slots
  1-5, then ALL 43 r07-stale rows in audit order, then the 2 OLDEST
  r08 rows — 5 + 43 + 2 = exactly 50, zeroing r07. Round-13 additions
  land AFTER slot 50 on purpose (``http_pushdown_audit``, S2's
  filter/column pushdown through the Python DataSource made
  driver-visible; ``rate_floor_flow``, X2's ``min_call_interval_ms``
  pacing proven via per-call timestamps; ``salted_path_join``, the
  sidecar-persisted ``hot_keys`` stats driving the salted route purely
  from ``_stats.json`` on disk): they head the round-14 window with
  the 48 remaining r08-stale rows — 3 + 48 = 51, one over, so round 14
  takes the 3 + 47 oldest and round 15 clears the last r08 row.

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
from . import sinks_q  # noqa: F401
from . import providers_q  # noqa: F401

# Round-13 driver window (slots 1-50), executing the composition the
# round-12 ledger prescribed (and ``tools/rotation_audit.py`` derives
# identically — in-window new-query velocity is 0, so the audit's
# never-verified → least-recently-green ranking IS the window):
# (1) the 5 never-verified round-12 additions (the salted-join route,
# the z-order float negative proof, the unified compaction proof, the
# retry counters, the secrets merge contract); (2) ALL 43 r07-stale
# queries in audit order; (3) the 2 OLDEST r08-stale queries.
# 5 + 43 + 2 = exactly 50 slots. After this round: r07 staleness
# zeroed, r08 down to 48 rows (they head rounds 14-15 together with
# round 13's own post-slot-50 additions).
registry.promote(
    [
        # (1) round-12 additions — never driver-verified
        "preflight_salted_join",
        "zorder_float_guard",
        "compact_roundtrip",
        "retry_backoff_flow",
        "secrets_merge_flow",
        # (2) all 43 r07-stale queries, audit order
        "simhash_docs",
        "ngram_jaccard_top",
        "minhash_signatures",
        "minhash_lsh_pairs",
        "multimodal_meta",
        "simhash_near_dups",
        "corpus_clean",
        "bpe_token_stats",
        "token_doc_freq",
        "doc_winnow",
        "corpus_sample",
        "corpus_split",
        "tfidf_top_terms",
        "bigram_lift_top",
        "dedup_components",
        "sample_k_per_source",
        "dedup_keep_best",
        "inverted_postings",
        "ann_lsh_buckets",
        "ann_bucket_search",
        "label_centroids",
        "embedding_norms",
        "ann_ivf_search",
        "ann_multiprobe_search",
        "kmeans_clusters",
        "ann_ivf_probe2",
        "range_window_counts",
        "last_touch_attribution",
        "streaming_hourly",
        "pricing_rollup",
        "sliding_3h_counts",
        "embedding_near_dups",
        "orders_cube",
        "value_changes",
        "customer_deciles",
        "cumulative_monthly_revenue",
        "event_type_pivot",
        "stratified_sample",
        "salted_type_stats",
        "brand_weighted_price",
        "purchase_streaks",
        "hll_distinct_fast",
        "skew_audit",
        # (3) the 2 oldest r08-stale queries, audit order
        "top_revenue_orders",
        "region_revenue",
    ]
)

QUERIES = registry.QUERIES

__all__ = ["QUERIES", "registry"]
