"""Query plans registered for the correctness driver.

Importing this package loads every query module and fills
``registry.QUERIES`` — the single source of truth consumed by
``__spark_entry__.queries()`` / ``oracle_sql()``.
"""

from . import registry

# Registration order matters: the correctness driver verifies the FIRST 50
# registry entries per round.  Round 1 verified the relational/etl half
# (CORRECTNESS_r01.json, 50/50 green); round 2 front-loads the previously
# unchecked textops/simsearch/streaming/windows/temporal queries so they
# land inside the driver's verification window.
from . import textops  # noqa: F401
from . import simsearch  # noqa: F401
from . import streaming_q  # noqa: F401
from . import windows_q  # noqa: F401
from . import temporal  # noqa: F401
from . import llmops  # noqa: F401  (round-2 ops: next in line for the driver window)
from . import pq  # noqa: F401  (product-quantization ANN)
from . import rangejoin_q  # noqa: F401  (point-in-interval range join)
from . import relational  # noqa: F401
from . import relational_adv  # noqa: F401
from . import etl  # noqa: F401

QUERIES = registry.QUERIES

__all__ = ["QUERIES", "registry"]
