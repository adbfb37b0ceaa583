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
import json
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..localdf import local_df

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
            from .retry import with_retries

            # X2 bounded concurrency, request-rate half: the reference
            # throttles API calls (pLimit(10) cmu.js:74, batch(...,20)
            # airgradient.js:101-110); partitioning bounds the PARALLEL
            # half, this bounds the per-task call RATE. 0 = off.
            interval_s = int(opts.get("min_call_interval_ms", "0")) / 1000.0
            import time as _time

            first = True
            for page in range(partition.start, partition.end):
                if not first and interval_s > 0:
                    _time.sleep(interval_s)
                first = False
                # per-CALL retry: a transient provider hiccup costs one
                # backoff, not a whole-task re-fetch of the page range
                for row in with_retries(lambda: fetch(opts, page)):
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

    class FileBatch(InputPartition):
        def __init__(self, files: list[str]):
            self.files = files

    class FileBackfillReader(DataSourceReader):
        """Phase 2 of the two-phase backfill (see ``read_backfill``):
        the driver has already enumerated file ids; each task fetches
        and parses its batch of files — the distributed twin of cmu.js's
        pLimit(10) concurrent processFile loop (cmu.js:75-99)."""

        def __init__(self, schema, options: dict):
            self._options = dict(options)
            self._files: list[str] = json.loads(options["files"])
            self._per_task = int(options.get("files_per_task", "1"))

        def partitions(self) -> Sequence["FileBatch"]:
            s = self._per_task
            return [
                FileBatch(self._files[i : i + s])
                for i in range(0, len(self._files), s)
            ] or [FileBatch([])]

        def read(self, partition: "FileBatch") -> Iterator[tuple]:
            from .retry import with_retries

            fetch = resolve_fetcher(self._options["file_fetcher"])
            for file_id in partition.files:
                yield from with_retries(
                    lambda: fetch(self._options, file_id)
                )

    class FileBackfillDataSource(DataSource):
        """spark.read.format('file_backfill')
        .option('file_fetcher', 'mod:fn').option('files', json_list)
        .schema(ddl).load()
        """

        @classmethod
        def name(cls) -> str:
            return "file_backfill"

        def reader(self, schema) -> "FileBackfillReader":
            return FileBackfillReader(schema, self.options)


def register(spark: SparkSession) -> None:
    """Register the datasources on a session (idempotent)."""
    if not HAS_DATASOURCE_API:  # pragma: no cover
        raise RuntimeError("PySpark >= 4 required for the Python DataSource API")
    from ..session import ship_package

    ship_package(spark)  # fetcher modules must import on executors
    for ds in (PaginatedHTTPDataSource, FileBackfillDataSource):
        try:
            spark.dataSource.register(ds)
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


def enumerate_listing(
    lister: str,
    since: str | None = None,
    max_pages: int = 10_000,
    **options,
) -> list[str]:
    """Phase 1 of the two-phase backfill: token-paginated,
    name-DESCENDING file listing with sorted early-exit at the
    checkpoint — cmu.js:246-274 ``listAcrossPagination`` semantics
    (``orderBy: 'name desc'``; the first name below ``gte`` ends the
    whole listing).

    Driver-side ON PURPOSE: this is the control plane — it moves file
    NAMES (bytes), never file contents. A years-long backfill lists
    tens of thousands of names in a handful of token round-trips; the
    data plane (``FileBackfillReader``) is what must parallelize, and
    does.

    ``lister`` has signature
    ``list_page(options, token) -> (names_desc, next_token)`` with
    ``next_token is None`` ending the listing.
    """
    fetch = resolve_fetcher(lister)
    token = None
    names: list[str] = []
    for _ in range(max_pages):
        batch, token = fetch(dict(options), token)
        for name in batch:
            if since is not None and name < since:
                return names  # sorted desc → nothing older is relevant
            names.append(name)
        if token is None:
            return names
    # listing did NOT terminate: silently returning a prefix would let
    # the caller advance the checkpoint past files never enumerated — a
    # permanent, invisible data gap. Fail loudly instead.
    raise RuntimeError(
        f"enumerate_listing exhausted max_pages={max_pages} with a live "
        "continuation token — raise max_pages (the checkpoint must not "
        "advance past unseen files)"
    )


def read_backfill(
    spark: SparkSession,
    lister: str,
    file_fetcher: str,
    schema_ddl: str,
    since: str | None = None,
    files_per_task: int = 1,
    **options: str,
) -> tuple[DataFrame, str | None]:
    """Two-phase historical backfill (S3 at scale — the parallel mirror
    of ``read_until_exhausted``, VERDICT.md round-1 item 6):

    1. the driver enumerates file ids via token pagination with the
       sorted early-exit bound (cheap, control plane);
    2. executors fetch + parse the files, ``files_per_task`` per task
       (``FileBackfillReader`` partitions — the scan parallelizes like
       a file source, cmu.js:75-99's bounded-concurrency loop at
       cluster width).

    Returns ``(df, greatest_name)`` — the lexically greatest file name
    is the next checkpoint (cmu.js:90-91 greatestTimestamp), saved by
    the caller AFTER the write commits, same crash-safety order as the
    engine's watermark handling.
    """
    names = enumerate_listing(lister, since=since, **options)
    register(spark)
    reader = (
        spark.read.format("file_backfill")
        .schema(schema_ddl)
        .option("file_fetcher", file_fetcher)
        .option("files", json.dumps(names))
        .option("files_per_task", str(files_per_task))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(), (max(names) if names else None)


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
    return local_df(spark, rows, schema_ddl)
