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
* round 7 (here): six new queries, then ALL 42 remaining round-2-stale
  queries (velocity was capped at 6 new precisely so the whole r02
  debt fits one window), then two round-3 backfills. After this
  window, no driver row should be older than round 3; round 8 owes the
  other 47 r03-stale rows (new-query velocity ≤ 3 that round).
  Exactly three round-7b queries land AFTER slot 50 on purpose
  (``hybrid_rrf_fusion``, ``ann_ndcg_eval``, ``compaction_bins``) —
  they spend round 8's entire 3-slot new-query budget, so the round-8
  window is 3 never-verified + the 47 r03-stale rows, closing ALL
  remaining staleness in one window.

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

# Round-7 driver window (slots 1-50), executing the rotation the
# round-6 verdict prescribed: (1) round-7's six new queries (first-time
# signal outranks re-verification); (2) ALL 42 queries whose most
# recent driver row is ROUND 2 — the r02 simsearch set, the r02
# windows/etl group, and the r02 textops remainder — which zeroes the
# r02 staleness debt in one window; (3) two round-3-stale backfills
# (the flagship pricing_summary and the semantics-changed
# streaming_hourly — the two most valuable r03 re-proofs). Remaining
# debt for round 8: the other 47 r03-stale queries (fits one window if
# round-8 new-query velocity stays ≤ 3).
registry.promote(
    [
        # (1) round-7 new queries (never driver-verified)
        "hll_distinct_fast",
        "clustering_coefficients",
        "fk_integrity_audit",
        "skew_audit",
        "inverted_postings",
        "last_touch_attribution",
        # (2) last driver row = round 2: simsearch set
        "ann_lsh_buckets",
        "ann_bucket_search",
        "label_centroids",
        "embedding_norms",
        "ann_ivf_search",
        "ann_multiprobe_search",
        "kmeans_clusters",
        "ann_ivf_probe2",
        "embedding_near_dups",
        # (2) last driver row = round 2: windows/etl group
        "pricing_rollup",
        "sliding_3h_counts",
        "orders_cube",
        "value_changes",
        "customer_deciles",
        "cumulative_monthly_revenue",
        "event_type_pivot",
        "stratified_sample",
        "salted_type_stats",
        "brand_weighted_price",
        "purchase_streaks",
        "range_window_counts",
        # (2) last driver row = round 2: textops remainder + misc
        "doc_language",
        "doc_quality",
        "doc_fingerprint",
        "dedup_exact",
        "simhash_docs",
        "ngram_jaccard_top",
        "minhash_signatures",
        "minhash_lsh_pairs",
        "simhash_near_dups",
        "dedup_keep_best",
        "dedup_components",
        "doc_winnow",
        "bigram_lift_top",
        "bpe_token_stats",
        "token_doc_freq",
        "tfidf_top_terms",
        "corpus_clean",
        "corpus_sample",
        "corpus_split",
        "multimodal_meta",
        "sample_k_per_source",
        # (3) round-3-stale backfill
        "pricing_summary",
        "streaming_hourly",
    ]
)

QUERIES = registry.QUERIES

__all__ = ["QUERIES", "registry"]
