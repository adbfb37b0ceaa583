"""Query plans registered for the correctness driver.

Importing this package loads every query module and fills
``registry.QUERIES`` — the single source of truth consumed by
``__spark_entry__.queries()`` / ``oracle_sql()``.
"""

from . import registry
from . import relational  # noqa: F401
from . import relational_adv  # noqa: F401
from . import etl  # noqa: F401
from . import textops  # noqa: F401
from . import simsearch  # noqa: F401
from . import streaming_q  # noqa: F401
from . import windows_q  # noqa: F401
from . import temporal  # noqa: F401

QUERIES = registry.QUERIES

__all__ = ["QUERIES", "registry"]
