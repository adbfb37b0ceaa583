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
* round 3 (here) promotes the 12 queries that have NEVER had a driver
  row (llmops / pq / rangejoin_q, registered mid-round-2 at positions
  51-62) plus the 6 red-in-r02 queries now fixed, then lets the
  relational/etl set — unverified since round 1 — fill the remaining
  32 window slots for re-verification. The r02-green half rotates to
  the back; ``tools/check_all.py`` still re-proves the full registry
  against DuckDB locally every round.

* round 4 (here) promotes the 11 queries that have NEVER had a driver
  row (the late-round-3 six plus containment/media/lsh_verified/
  token_budget, registered mid-round-3), then ``approx_event_stats``
  (no_oracle in r03, made driver-checkable this round), then the 18
  queries last verified in round 1 (three rounds stale), and fills the
  remaining 20 slots with the oldest half of the r02-green textops set
  plus ``embedding_near_dups`` (its plan is touched this round). The
  r02-green remainder (ANN/simsearch + windows/relational, 24 queries)
  is the round-5 rotation TODO; ``tools/check_all.py`` still re-proves
  the full registry against DuckDB locally every round.

Round-5 rotation TODO: promote the 11 queries registered this round
(``passage_dedup``, ``doc_lm_score``, ``weighted_sample``,
``ivf_pq_search``, ``streaming_enriched_hourly``, ``ann_rerank``,
``embedding_dim_stats``, ``late_shipped_priorities``,
``wealthy_inactive_customers``, ``bm25_scores``, ``doc_chunking``,
``funnel_conversion``, ``retention_cohorts``, ``ewma_user_value``,
``value_interpolate``, ``hourly_completeness``, plus the later
round-4 additions ``scd2_intervals``, ``locf_fill``,
``trailing_1h_stats``, ``embedding_covariance``, ``jl_project``,
``dup_span_stats``, ``user_value_trend``, ``zorder_locality``,
``kmv_daily_merge``, ``cms_user_counts``, ``time_weighted_avg``,
``conjunctive_search``, ``event_type_affinity``, ``event_transitions``,
``value_histogram``, ``incremental_hourly_merge``, ``type_day_chisq``
— no driver row yet) plus the r02-green remainder above; backfill with
whatever round 4's window left stalest.
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

# Round-4 driver window (slots 1-50), stalest-first.
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
        # last verified round 1 — three rounds stale
        "watermark_summary",
        "distinct_users",
        "hourly_rollup",
        "hour_ending_rollup",
        "cohort_union",
        "enrich_misses",
        "tz_daily",
        "props_extract",
        "recent_orders",
        "latest_complete_hour",
        "order_calendar",
        "distinct_pairs",
        "ingest_id_join",
        "value_percentiles",
        "daily_from_hourly",
        "quarantine_summary",
        "profile_numerics",
        "table_manifest",
        # last verified round 2 — textops (oldest of the r02 set) plus
        # embedding_near_dups, whose plan is touched this round
        "embedding_near_dups",
        "doc_token_stats",
        "doc_language",
        "doc_quality",
        "doc_fingerprint",
        "dedup_exact",
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
    ]
)

QUERIES = registry.QUERIES

__all__ = ["QUERIES", "registry"]
