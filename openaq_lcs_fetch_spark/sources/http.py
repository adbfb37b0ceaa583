"""Paginated HTTP source (SURVEY.md S1/S2/S3).

The reference fetches REST pages in a driver-side loop
(habitatmap.js:166-207 offset pagination, cmu.js:246-274 token
pagination with sorted early-exit). Spark-first design:

* **Known page count** → a real PySpark ``DataSource``: one
  ``InputPartition`` per page range, so fetching parallelizes across
  executors exactly like a partitioned file scan (this is what scales —
  page fetch is embarrassingly parallel).
* **Unknown page count / early-exit** → bounded driver enumeration
  (the reference's model) that stops on an empty page or a predicate,
  then ``createDataFrame`` — correct but driver-bound; use only for
  small control-plane reads.

The fetcher is pluggable as ``"module.sub:function"`` so tests inject
deterministic fakes and no network is touched. A fetcher has signature
``fetch(options: dict, page: int) -> list[tuple]``.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

try:  # PySpark 4 Python DataSource API
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older PySpark
    HAS_DATASOURCE_API = False
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    InputPartition = object  # type: ignore[assignment,misc]

try:  # filter pushdown classes (PySpark >= 4.1)
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
    )

    _PUSHABLE = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
    _OPS = {
        "EqualTo": lambda a, b: a == b,
        "GreaterThan": lambda a, b: a > b,
        "GreaterThanOrEqual": lambda a, b: a >= b,
        "LessThan": lambda a, b: a < b,
        "LessThanOrEqual": lambda a, b: a <= b,
    }
    HAS_FILTER_PUSHDOWN = True
except ImportError:  # pragma: no cover
    _PUSHABLE = ()
    _OPS = {}
    HAS_FILTER_PUSHDOWN = False


def resolve_fetcher(spec: str) -> Callable[[dict, int], list]:
    """'pkg.mod:func' → callable (importable on executors)."""
    mod_name, _, fn_name = spec.partition(":")
    mod = importlib.import_module(mod_name)
    return getattr(mod, fn_name)


if HAS_DATASOURCE_API:

    class PageRange(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class PaginatedReader(DataSourceReader):
        """F2 source-side predicate pushdown: Catalyst offers the scan's
        filters via pushFilters; simple comparisons are accepted and
        (a) forwarded to the fetcher as request options — the Spark twin
        of purpleair's max_age/location_type URL params
        (purpleair.js:120-125) — and (b) re-applied to fetched rows, so
        a fetcher that ignores them stays correct."""

        def __init__(self, schema, options: dict):
            self._schema = schema
            self._options = dict(options)
            self._pages = int(options.get("pages", 1))
            self._pages_per_task = int(options.get("pages_per_task", 1))
            self._pushed: list = []

        def pushFilters(self, filters):  # noqa: N802 (Spark API name)
            for f in filters:
                if isinstance(f, _PUSHABLE) and len(f.attribute) == 1:
                    self._pushed.append(
                        (type(f).__name__, f.attribute[0], f.value)
                    )
                else:
                    yield f  # not supported here → Spark applies it

        def partitions(self) -> Sequence["PageRange"]:
            step = self._pages_per_task
            return [
                PageRange(i, min(i + step, self._pages))
                for i in range(0, self._pages, step)
            ]

        def read(self, partition: "PageRange") -> Iterator[tuple]:
            opts = dict(self._options)
            if self._pushed:
                # expose to the fetcher (it may translate these into API
                # query params, e.g. max_age / modified_since)
                opts["pushed_filters"] = repr(self._pushed)
            fetch = resolve_fetcher(opts["fetcher"])
            idx = {f.name: i for i, f in enumerate(self._schema.fields)}
            preds = [
                (_OPS[op], idx[col], val)
                for op, col, val in self._pushed
                if col in idx
            ]
            for page in range(partition.start, partition.end):
                for row in fetch(opts, page):
                    if all(
                        row[i] is not None and op(row[i], val)
                        for op, i, val in preds
                    ):
                        yield row

    class PaginatedHTTPDataSource(DataSource):
        """spark.read.format('paginated_http')
        .option('fetcher', 'mod:fn').option('pages', n)
        .schema(ddl).load()
        """

        @classmethod
        def name(cls) -> str:
            return "paginated_http"

        def reader(self, schema) -> "PaginatedReader":
            return PaginatedReader(schema, self.options)


def register(spark: SparkSession) -> None:
    """Register the datasource on a session (idempotent)."""
    if not HAS_DATASOURCE_API:  # pragma: no cover
        raise RuntimeError("PySpark >= 4 required for the Python DataSource API")
    from ..session import ship_package

    ship_package(spark)  # fetcher modules must import on executors
    try:
        spark.dataSource.register(PaginatedHTTPDataSource)
    except Exception:
        pass  # already registered


def read_paginated(
    spark: SparkSession,
    fetcher: str,
    pages: int,
    schema_ddl: str,
    pages_per_task: int = 1,
    **options: str,
) -> DataFrame:
    """Parallel path: one task per page range (S2 at scale)."""
    register(spark)
    reader = (
        spark.read.format("paginated_http")
        .schema(schema_ddl)
        .option("fetcher", fetcher)
        .option("pages", str(pages))
        .option("pages_per_task", str(pages_per_task))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_until_exhausted(
    spark: SparkSession,
    fetcher: str,
    schema_ddl: str,
    max_pages: int = 1000,
    stop: Callable[[list], bool] | None = None,
    **options,
) -> DataFrame:
    """Sequential early-exit path (S3: cmu.js:260-264 stops when the
    sorted page crosses the checkpoint). Driver-bound by design — use
    for control-plane listings, not bulk data."""
    fetch = resolve_fetcher(fetcher)
    rows: list = []
    for page in range(max_pages):
        batch = fetch(dict(options), page)
        if not batch:
            break
        rows.extend(batch)
        if stop is not None and stop(batch):
            break
    return spark.createDataFrame(rows, schema_ddl)
