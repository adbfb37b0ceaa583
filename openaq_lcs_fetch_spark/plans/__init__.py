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

Round-4 rotation TODO: promote the six queries added late in round 3
(``session_window_stats``, ``sequence_pack``, ``semantic_dedup``,
``ann_recall_eval``, ``streaming_dedup_hourly``, ``streaming_sessions``
— none has a driver row yet) plus the r02-green textops/simsearch set,
now the least-recently-verified.
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

# Round-3 driver window, slots 1-18: never-driver-verified (12) + fixed
# round-2 reds (6). Slots 19-50 fall to relational/relational_adv/etl
# (round-1 set, due for re-check) by the import order above.
registry.promote(
    [
        # never verified by the driver (added mid-round-2)
        "decontaminate",
        "pii_scrub",
        "gopher_quality",
        "doc_repetition",
        "corpus_pipeline",
        "kmv_distinct_users",
        "pq_codes",
        "pq_search",
        "ann_ivf_multicell",
        "views_before_purchase",
        "session_peak_concurrency",
        "asof_next_calibration",
        # red in CORRECTNESS_r02, fixed this round (timestamp boundary)
        "user_sessions",
        "asof_calibration",
        "approx_event_stats",
        "streaming_hourly",
        "streaming_gaps",
        "streaming_click_to_buy",
    ]
)

QUERIES = registry.QUERIES

__all__ = ["QUERIES", "registry"]
