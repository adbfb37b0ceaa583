"""Physical-layout utilities for the 100 TB path.

The measures store is append-heavy and join-heavy on stable keys
(sensor_id / orderkey-like). Two layout levers Spark gives us:

* **partitionBy(provider, day)** on write → partition pruning at read
  (the reference's ``{provider}/{YYYY-MM-DD}`` key layout,
  providers.js:168-185, made first-class);
* **bucketBy(k, key)** on both sides of a recurring join → co-located
  sort-merge join with NO Exchange on either side. At 1000 executors
  this removes the single largest shuffle in the workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    (
        df.write.mode("overwrite")
        .partitionBy(*partition_cols)
        .format(fmt)
        .save(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed managed table (bucket layout is metastore
    metadata — path-based parquet can't carry it)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables — the plan has no Exchange on
    either input (verify: `assert_no_shuffle_join`)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)


def stats_aware_path_join(
    spark: SparkSession,
    left_path: str,
    right_path: str,
    on,
    threshold_bytes: int | None = None,
    how: str = "inner",
    mitigate_skew: bool = True,
) -> DataFrame:
    """Join two parquet datasets with the physical strategy chosen from
    their ``_stats.json`` sidecars (``stats.collect_table_stats`` →
    ``stats.write_stats``) — the engine path that consumes the ANALYZE
    collector. A missing sidecar means that side is never broadcast;
    with neither sidecar present the join is a pinned shuffle (the safe
    plan at unknown scale). At 100 TB this is the decision that keeps a
    mis-sized dimension from being shipped to 1000 executors — or a
    25-row dimension from paying an all-to-all shuffle."""
    from .stats import BROADCAST_DEFAULT_BYTES, read_stats, stats_aware_join

    if threshold_bytes is None:
        threshold_bytes = BROADCAST_DEFAULT_BYTES
    return stats_aware_join(
        spark.read.parquet(left_path),
        spark.read.parquet(right_path),
        on,
        read_stats(left_path),
        read_stats(right_path),
        threshold_bytes,
        how=how,
        mitigate_skew=mitigate_skew,
    )


def plan_has_exchange(df: DataFrame, include_broadcast: bool = False) -> bool:
    """True if the physical plan shuffles (optionally also counting
    broadcast exchanges — those are cheap dimension ships, not the
    all-to-all shuffle bucketing eliminates)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if not include_broadcast:
        plan = plan.replace("BroadcastExchange", "")
    return "Exchange" in plan


def zorder_column(cols, bits: int = 16):
    """Z-order (Morton) key over integer columns: bit-interleave the low
    ``bits`` of each column so lexicographic order on the result is a
    space-filling curve — rows close in ANY dimension land close in the
    sort. Pure Column arithmetic (bits·len(cols) disjoint-bit terms, no
    UDF), so it runs in whole-stage codegen.

    Scale the inputs to COMPARABLE ranges first (e.g. multiply the
    narrow dimension up): interleaving a 0-150 key with a 0-720 key
    unscaled lets the wide dimension's high bits dominate the curve and
    the narrow dimension barely clusters.

    The 100 TB use: ``repartitionByRange(zorder_column([...]))`` before
    write gives every file a bounded min/max envelope in EVERY clustered
    dimension, so parquet row-group stats prune scans on any of them —
    single-column sort layouts prune only their own column.
    """
    from pyspark.sql import functions as F

    m = len(cols)
    z = F.lit(0).cast("long")
    for k in range(bits):
        for i, c in enumerate(cols):
            col = c if not isinstance(c, str) else F.col(c)
            bit = F.shiftright(col.cast("long"), k).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, k * m + i)
    return z


def sql_zorder(exprs: list[str], bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_column` (same bit terms)."""
    m = len(exprs)
    terms = []
    for k in range(bits):
        for i, e in enumerate(exprs):
            terms.append(f"(((({e}) >> {k}) & 1) << {k * m + i})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame, path: str, zcol, n_files: int = 32
) -> None:
    """Range-partition on the z-order key and write: each output file
    covers one contiguous z-range = a bounded rectangle in every
    clustered dimension."""
    (
        df.repartitionByRange(n_files, zcol.asc())
        .write.mode("overwrite")
        .parquet(path)
    )


def parquet_bytes(path: str) -> int:
    """Total bytes of parquet data under ``path`` (local FS walk)."""
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def parquet_file_count(path: str) -> int:
    import os

    return sum(
        f.endswith(".parquet")
        for _root, _dirs, files in os.walk(path)
        for f in files
    )


def _exchange_paths(a: str, b: str) -> bool:
    """Atomically SWAP two paths in one syscall — Linux
    ``renameat2(RENAME_EXCHANGE)``. Returns False when unavailable
    (non-Linux, libc without the wrapper, or a filesystem that rejects
    the flag — e.g. some network mounts), letting the caller fall back
    to a two-rename publish. Both paths must exist and live on the
    same filesystem."""
    import ctypes
    import os
    import sys

    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        fn = libc.renameat2
    except (OSError, AttributeError):
        return False
    # declared explicitly rather than relying on ctypes' int-sized
    # defaults, so the call is well-defined on any 64-bit ABI
    fn.argtypes = [
        ctypes.c_int, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_char_p,
        ctypes.c_uint,
    ]
    fn.restype = ctypes.c_int
    AT_FDCWD = -100
    RENAME_EXCHANGE = 2
    ctypes.set_errno(0)
    ret = fn(AT_FDCWD, os.fsencode(a), AT_FDCWD, os.fsencode(b), RENAME_EXCHANGE)
    if ret != 0:
        # EINVAL/ENOSYS/EXDEV → flag unsupported here; anything else is
        # still a safe False (caller's two-rename fallback), but make
        # the unexpected fallback observable instead of silent
        import errno
        import warnings

        err = ctypes.get_errno()
        # ENOENT: the documented both-paths-must-exist precondition;
        # EINVAL/ENOSYS/EXDEV: kernel/filesystem without the flag
        if err not in (errno.ENOENT, errno.EINVAL, errno.ENOSYS, errno.EXDEV):
            warnings.warn(
                f"renameat2(RENAME_EXCHANGE) failed with errno {err} "
                f"({errno.errorcode.get(err, '?')}) for {a!r} <-> {b!r}; "
                "falling back to the non-atomic two-rename publish",
                stacklevel=2,
            )
    return ret == 0


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Size-targeted small-files compaction (SURVEY §2.9 partitioning
    hygiene) — the sibling of :func:`compact_by_time` for layouts with
    no time dimension to bin on. Formerly ``sinks/compact.py``; moved
    here so the repo has ONE compaction module.

    Streaming sinks and fine-grained partitionBy layouts accrete many
    small files; at scale each file is a task, a listing entry, and a
    scheduling unit, so a table of 10⁶ kilobyte files can cost more to
    PLAN than to read. This rewrites the prefix into
    ceil(bytes/target) files. Shuffle-free (``coalesce``: existing
    partitions concatenate map-side, no Exchange).

    Publish semantics: the rewrite lands in a temp directory, then on
    Linux the temp and live directories are swapped in ONE
    ``renameat2(RENAME_EXCHANGE)`` syscall — a local reader observes
    the old layout or the new one, never a missing path. Where the
    exchange syscall is unavailable the publish falls back to two
    renames (old→bak, tmp→live), which has a sub-millisecond window
    in which the path is absent — acceptable for the single-writer
    maintenance pass this implements, and moot on an object-store
    deployment, which swaps a manifest/pointer instead (the same
    two-phase publish the measures sink uses; the compaction PLAN is
    identical). Returns the new file count.

    Prefer :func:`compact_by_time` when the table HAS a timestamp
    column — its one-file-per-time-bin output keeps min/max-ts pruning
    power that a bare coalesce destroys.
    """
    import math
    import shutil
    import uuid

    n_files = max(1, math.ceil(parquet_bytes(path) / target_file_bytes))
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).coalesce(n_files).write.mode("overwrite").parquet(tmp)
    if _exchange_paths(tmp, path):
        shutil.rmtree(tmp)  # tmp now holds the OLD layout
    else:
        bak = f"{path}.bak-{uuid.uuid4().hex[:8]}"
        shutil.move(path, bak)
        shutil.move(tmp, path)
        shutil.rmtree(bak)
    return parquet_file_count(path)


def compact_by_time(
    df: DataFrame,
    ts_col: str,
    path: str,
    n_bins: int = 8,
    collect_stats: bool = False,
    hot_keys: list[str] | None = None,
) -> int:
    """Execute the ``compaction_bins`` plan: pack event DAYS in time
    order into ``n_bins`` row-balanced bins and rewrite the dataset as
    exactly one time-sorted file per bin.

    This is the OPTIMIZE/compaction primitive of a lakehouse table —
    the *executor* for the planning query ``plans/layout.py:
    compaction_bins`` (same day spine, same cumulative-target math).
    Scale shape: the day→bin map is a calendar-sized rollup broadcast
    into a narrow map-side tag; `repartition(n_bins, bin)` gives each
    bin exactly one task, so `partitionBy(bin)` emits exactly one file
    per bin; `sortWithinPartitions(ts)` keeps min/max-ts pruning power
    in the rewritten files. One shuffle total (the bin repartition) —
    the rollup and broadcast are day-spine-sized.

    ``collect_stats`` refreshes the ``_stats.json`` sidecar from the
    rewritten dataset (OPTIMIZE also ANALYZEs — the compaction pass is
    the natural moment, the data was just read anyway), so
    :func:`stats_aware_path_join` plans against current numbers.
    ``hot_keys`` (requires ``collect_stats``) names the table's
    DECLARED join keys: each gets the exact top-values pass
    (``stats.collect_table_stats(hot_keys=...)``) persisted into the
    sidecar, so the salted-join mitigation (``stats._salted_route``)
    can fire from disk — without it the sidecar carries no skew
    evidence and ``stats_aware_path_join`` can only warn on an
    exploding hot-key join, never route it.

    Returns the number of bins written.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if hot_keys and not collect_stats:
        raise ValueError(
            "compact_by_time: hot_keys requires collect_stats=True "
            "(skew evidence lives in the _stats.json sidecar)"
        )
    per_day = df.groupBy(F.date_trunc("day", ts_col).alias("_d")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    per_day = per_day.localCheckpoint()  # roots target + packing (plan twin)
    tgt = per_day.agg(
        F.expr(f"(sum(_n) + {n_bins - 1}) div {n_bins}").alias("_target")
    )
    cum = per_day.withColumn(
        "_cum0", F.sum("_n").over(Window.orderBy("_d")) - F.col("_n")
    )
    day_bins = (
        cum.crossJoin(F.broadcast(tgt))
        .select("_d", F.expr("_cum0 div _target").alias("_bin"))
        .localCheckpoint()
    )
    n = day_bins.select("_bin").distinct().count()
    tagged = df.join(
        F.broadcast(day_bins),
        F.date_trunc("day", ts_col) == F.col("_d"),
    ).drop("_d")
    (
        tagged.repartition(max(n, 1), "_bin")
        # leading _bin satisfies the dynamic-partition writer's required
        # ordering (no extra, stability-unspecified sort gets inserted),
        # so each bin's file keeps strict ts order
        .sortWithinPartitions("_bin", ts_col)
        .write.mode("overwrite")
        .partitionBy("_bin")
        .parquet(path)
    )
    if collect_stats:
        from .stats import collect_table_stats, write_stats

        write_stats(
            collect_table_stats(
                df.sparkSession.read.parquet(path), hot_keys=hot_keys
            ),
            path,
        )
    return n


def file_time_spans(
    path: str, ts_col: str = "ts"
) -> dict[str, tuple[int | None, int | None]]:
    """Per-file (min_us, max_us) time spans from parquet FOOTER
    statistics — the shared manifest primitive under both
    :func:`vacuum_by_retention` (file-skipping deletes) and
    :func:`read_time_range` (file-skipping reads). Driver-side,
    O(files), no Spark job; every stats flavor normalized to epoch
    MICROseconds (naive datetimes pinned to UTC, raw int64 nanos
    // 1000). A file whose span cannot be established maps to
    (None, None) — callers must treat unknown as "could be anything"
    (vacuum keeps it, the range reader scans it). Legacy
    INT96-timestamp files (stats-less) fall back to reading the single
    ts column, column-pruned.
    """
    import datetime
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    def _to_us(v) -> int:
        if hasattr(v, "timestamp"):  # datetime
            # Stored values are UTC instants; a NAIVE datetime fed to
            # .timestamp() would be read in the machine's local tz
            # (DST-dependent cutoff skew) — pin it to UTC first.
            if v.tzinfo is None:
                v = v.replace(tzinfo=datetime.timezone.utc)
            return int(v.timestamp() * 1_000_000)
        v = int(v)  # raw int64 epoch: the nanosAsLong ingest path is ns
        return v // 1000

    files = sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    spans: dict[str, tuple[int | None, int | None]] = {}
    for f in files:
        lo = hi = None
        try:
            md = pq.read_metadata(f)
            # row_group(rg).column(i) indexes FLATTENED parquet leaf
            # columns — an arrow top-level field index diverges as soon
            # as any nested column precedes ts_col, silently reading
            # another column's stats. Resolve the leaf index from the
            # parquet schema's own leaf paths instead.
            idx = -1
            for li in range(len(md.schema.names)):
                if md.schema.column(li).path == ts_col:
                    idx = li
                    break
            if idx >= 0:
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        lo = hi = None
                        break
                    mn, mx = _to_us(st.min), _to_us(st.max)
                    lo = mn if lo is None else min(lo, mn)
                    hi = mx if hi is None else max(hi, mx)
        except Exception:
            lo = hi = None  # unreadable footer → unknown (never guess)
        if lo is None:
            try:
                import pyarrow.compute as pc

                col = pq.read_table(f, columns=[ts_col])[ts_col]
                if pa.types.is_timestamp(col.type):
                    col = col.cast(pa.timestamp("us"))
                mn, mx = pc.min(col).as_py(), pc.max(col).as_py()
                if mn is not None:
                    lo, hi = _to_us(mn), _to_us(mx)
            except Exception:
                lo = hi = None
        spans[f] = (lo, hi)
    return spans


def file_int_spans(
    path: str, cols: list[str]
) -> dict[str, dict[str, tuple[int | None, int | None]]]:
    """Per-file (min, max) envelopes for INTEGER columns from parquet
    FOOTER statistics — the multi-dimension sibling of
    :func:`file_time_spans`, and the manifest primitive under
    :func:`read_int_box`. One metadata read per file covers every
    requested column (driver-side, O(files), no Spark job). A column
    whose span cannot be established maps to (None, None) — callers
    must treat unknown as "could be anything" and scan the file.

    This is what makes :func:`write_zordered` pay off at read time: a
    z-ordered layout gives every file a bounded min/max envelope in
    EVERY clustered dimension, and these envelopes are exactly those
    bounds, read once on the driver instead of per-query inside the
    scan.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    spans: dict[str, dict[str, tuple[int | None, int | None]]] = {}
    for f in files:
        per_col: dict[str, tuple[int | None, int | None]] = {
            c: (None, None) for c in cols
        }
        try:
            md = pq.read_metadata(f)
            # leaf-path resolution, same reasoning as file_time_spans:
            # flattened leaf indexes diverge from top-level field
            # indexes as soon as any nested column precedes ours
            idx = {
                md.schema.column(li).path: li
                for li in range(len(md.schema.names))
            }
            for c in cols:
                li = idx.get(c)
                if li is None:
                    continue
                sch = md.schema.column(li)
                # TRUE integer columns ONLY — both levels must agree:
                # * physical INT32/INT64: int(stats) of a FLOAT column
                #   truncates, and a truncated file-max below the box
                #   lower bound would wrongly EXCLUDE a file that holds
                #   in-box rows (5.9 → 5 < box-lo 5.5).
                # * logical NONE/Int: Spark writes decimal(≤18, s>0)
                #   with an INT physical type, so the physical check
                #   alone lets scaled decimals through and int(st.min)
                #   silently truncates 5.99 → 5 — the exact hazard the
                #   float guard documents. DATE/TIME/TIMESTAMP logicals
                #   are rejected for the same reason (stats decode to
                #   non-int Python values). Rejected columns stay
                #   unknown → always scanned.
                if sch.physical_type not in ("INT32", "INT64"):
                    continue
                lt = str(sch.logical_type.type).upper()
                if lt not in ("NONE", "INT"):
                    continue
                # per-column try: one undecodable column must not
                # discard the envelopes already read for this file
                try:
                    lo = hi = None
                    ok = True
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(li).statistics
                        if st is None or not st.has_min_max:
                            ok = False
                            break
                        mn, mx = int(st.min), int(st.max)
                        lo = mn if lo is None else min(lo, mn)
                        hi = mx if hi is None else max(hi, mx)
                    if ok and lo is not None:
                        per_col[c] = (lo, hi)
                except Exception:
                    pass  # this column unknown; keep the others
        except Exception:
            pass  # unreadable footer → all-unknown (never guess)
        spans[f] = per_col
    return spans


def read_int_box(
    spark: SparkSession,
    path: str,
    bounds: dict[str, tuple[int, int]],
) -> tuple[DataFrame, dict]:
    """Manifest-pruned BOX read over a z-ordered (or otherwise
    multi-dimension-clustered) layout: select only the files whose
    footer envelope overlaps ``[lo, hi]`` in EVERY bounded column, then
    apply the residual row-level predicates (plain integer comparisons
    → native PushedFilters → row-group pruning inside the selected
    files). Files with an unknown envelope in any bounded column are
    always scanned — missing evidence never drops data.

    The 100 TB case this exists for: a 2-D predicate on a layout
    clustered with :func:`write_zordered`. A time-sorted layout prunes
    only time; the z-order envelopes prune on BOTH dimensions, and the
    driver-side manifest pass makes that pruning one footer sweep
    instead of a per-query scan-time cost over ~100k files. Returns
    ``(df, plan)`` with plan = {"n_total", "n_selected", "selected"}.
    """
    import os

    from pyspark.sql import functions as F

    spans = file_int_spans(path, list(bounds))
    selected = []
    for f, per_col in spans.items():
        keep = True
        for c, (b_lo, b_hi) in bounds.items():
            lo, hi = per_col.get(c, (None, None))
            if lo is None:
                continue  # unknown: cannot exclude on this column
            if hi < b_lo or lo > b_hi:
                keep = False
                break
        if keep:
            selected.append(f)
    plan = {
        "n_total": len(spans),
        "n_selected": len(selected),
        "selected": [os.path.relpath(f, path) for f in selected],
    }
    if not selected:
        df = spark.read.parquet(path).limit(0)
    else:
        # basePath: keep Hive-style partition columns, same contract
        # (and same two-branch schema agreement) as read_time_range
        df = spark.read.option("basePath", path).parquet(*selected)
    for c, (b_lo, b_hi) in bounds.items():
        df = df.filter((F.col(c) >= F.lit(b_lo)) & (F.col(c) <= F.lit(b_hi)))
    return df, plan


def read_time_range(
    spark: SparkSession,
    path: str,
    start_us: int,
    end_us: int,
    ts_col: str = "ts",
) -> tuple[DataFrame, dict]:
    """Manifest-pruned time-range read: select only the files whose
    footer span overlaps ``[start_us, end_us]`` (inclusive), hand THAT
    list to ``spark.read.parquet``, and apply the residual row-level
    predicate on top. Files with unknown spans are always scanned —
    missing evidence never drops data (the vacuum's stance, mirrored).

    This is the read-side payoff of the same O(files) driver-side
    manifest pass the vacuum uses: when the dataset is not
    partitionBy'd on time (e.g. the compact_by_time layout, whose bins
    are time-sorted but not day-keyed), Spark's catalog has no
    partition values to prune on, and row-group skipping still pays a
    footer read per file PER QUERY inside the scan — at 100 TB /
    ~100k files, planning the file list once on the driver and reading
    only the overlap is the difference between touching 3 files and
    listing 100k. Returns ``(df, plan)`` where plan =
    {"n_total", "n_selected", "selected"} for observability; an empty
    selection returns an empty DataFrame with the dataset's schema.
    """
    import os

    spans = file_time_spans(path, ts_col)
    selected = [
        f
        for f, (lo, hi) in spans.items()
        if lo is None or (hi >= start_us and lo <= end_us)
    ]
    plan = {
        "n_total": len(spans),
        "n_selected": len(selected),
        "selected": [os.path.relpath(f, path) for f in selected],
    }
    if not selected:
        df = spark.read.parquet(path).limit(0)
    else:
        # basePath keeps Hive-style partition columns (the _bin= dirs
        # compact_by_time writes, day= from the JSON sink): a bare
        # parquet(*selected) read roots discovery at each FILE and
        # silently drops them — and the empty-selection branch above
        # (whole-root read) would keep them, so the two branches would
        # disagree on schema.
        df = spark.read.option("basePath", path).parquet(*selected)
    from pyspark.sql import functions as F

    from .functions.timestamps import micros
    from .tables import normalize_ts

    # normalize_ts + micros: the dataset may store ts as TIMESTAMP,
    # TIMESTAMP_NTZ, or raw int64 nanos — the same three shapes the
    # ingest boundary handles (tables.normalize_ts); a raw cast would
    # misread the bigint flavor as seconds
    df = normalize_ts(df, ts_col)
    if dict(df.dtypes)[ts_col] == "timestamp":
        # the post-normalize_ts common case (it canonicalizes bigint
        # nanos and TIMESTAMP_NTZ to TIMESTAMP): native timestamp
        # bounds (constant-folded literals) reach the scan as
        # PushedFilters → parquet row-group pruning INSIDE the
        # selected files; a unix_micros()-wrapped predicate would not
        # push. Equivalent to the micros comparison: both are µs
        # precision, bounds inclusive.
        c = F.col(ts_col)
        return (
            df.filter(
                (c >= F.timestamp_micros(F.lit(start_us)))
                & (c <= F.timestamp_micros(F.lit(end_us)))
            ),
            plan,
        )
    # any other shape (a ts column normalize_ts doesn't recognize):
    # correct-but-unpushed micros residual
    us = micros(F.col(ts_col))
    return df.filter((us >= start_us) & (us <= end_us)), plan


def vacuum_by_retention(
    path: str,
    ts_col: str = "ts",
    keep_days: int = 30,
    dry_run: bool = False,
) -> dict:
    """Retention vacuum for a parquet dataset: delete every data file
    whose ENTIRE time range is older than ``max(ts) - keep_days`` —
    the companion primitive to :func:`compact_by_time` (compaction
    bounds file count going forward, retention bounds history).

    Decisions come from parquet FOOTER min/max statistics only — no
    data is read, no Spark job runs; this is driver-side metadata work
    exactly like a lakehouse VACUUM, O(files) regardless of data
    volume. The cutoff anchors on the dataset's own newest timestamp
    (deterministic, no wall clock). A file straddling the cutoff is
    kept whole: retention is file-granular by design — run
    compact_by_time first if the tail must be trimmed exactly (its
    time-sorted one-file-per-bin layout makes straddlers rare).

    A vacuum that deletes anything also removes the ``_stats.json``
    sidecar (``stats_invalidated`` in the return dict): the document's
    n_rows/min/max no longer describe the dataset, and a stale "small"
    claim could broadcast a table that isn't — the planner's
    missing-stats stance (never broadcast) is the safe fallback until
    the next ANALYZE or ``compact_by_time(collect_stats=True)``.

    Returns {"cutoff_us", "n_deleted", "n_kept", "deleted", "kept",
    "stats_invalidated"}
    (cutoff in epoch MICROseconds — every stats flavor is normalized:
    datetime stats via epoch conversion, raw int64 nanos // 1000);
    paths relative to ``path``; with ``dry_run`` nothing is removed.
    Files whose range cannot be established (no stats AND unreadable
    column — e.g. a corrupt footer) are always kept: missing evidence
    never deletes data. Legacy INT96-timestamp files (Spark's stats-
    less deprecated default; our sessions write TIMESTAMP_MICROS, see
    session.RUNTIME_CONF) fall back to reading the single ts column —
    still driver-side and column-pruned, the documented cost of
    inheriting a deprecated layout.
    """
    import os

    spans = file_time_spans(path, ts_col)
    files = sorted(spans)

    known_max = [hi for _, hi in spans.values() if hi is not None]
    if not known_max:
        rel = [os.path.relpath(f, path) for f in files]
        return {
            "cutoff_us": None,
            "n_deleted": 0,
            "n_kept": len(files),
            "deleted": [],
            "kept": rel,
            "stats_invalidated": False,
        }
    cutoff = max(known_max) - keep_days * 86_400_000_000
    deleted, kept = [], []
    for f in files:
        _, hi = spans[f]
        if hi is not None and hi < cutoff:
            deleted.append(os.path.relpath(f, path))
            if not dry_run:
                os.remove(f)
        else:
            kept.append(os.path.relpath(f, path))
    stats_invalidated = False
    sidecar = os.path.join(path, "_stats.json")
    if deleted and not dry_run and os.path.exists(sidecar):
        os.remove(sidecar)
        stats_invalidated = True
    return {
        "cutoff_us": cutoff,
        "n_deleted": len(deleted),
        "n_kept": len(kept),
        "deleted": deleted,
        "kept": kept,
        "stats_invalidated": stats_invalidated,
    }
