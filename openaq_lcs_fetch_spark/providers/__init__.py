"""Provider registry — the engine's extension point (SURVEY.md §2.10).

The reference dispatches by dynamic require of fetcher/providers/*.js
(providers.js:26-30) to a module exporting ``async processor(source)``.
Here: a registry of Provider classes, each a declarative DataFrame
pipeline ``(spark, config) -> (measures, stations)``.
"""

from .base import REGISTRY, Provider, processor, register  # noqa: F401
from . import wide_csv  # noqa: F401
from . import zip_arrays  # noqa: F401
from . import keyed_map  # noqa: F401
from . import mobile  # noqa: F401
from . import enriched  # noqa: F401
