"""Point-in-interval (range) join — the sibling of the as-of join
(operators/asof.py): match point rows into interval rows on a key plus
``start <= ts < end``.

Spark has no native range-join strategy; the naive formulation
``points.join(intervals, (key) & (ts >= start) & (ts < end))`` compiles
to a broadcast-nested-loop or sort-merge with a residual range filter —
O(points × intervals-per-key) comparisons, quadratic on hot keys.

Scale-safe shape (the same grid-bucketing idea the skew-free as-of join
uses): pick a bucket width, explode each interval over the buckets it
covers, and equi-join on (key, bucket) with the exact range predicate
as a post-filter. Each point meets only the intervals that touch its
bucket — join fan-out is bounded by intervals-per-bucket, never by the
whole key group. Bucket width trades replication (long intervals cover
many buckets) against candidate precision; callers pass one matched to
their interval length distribution, e.g. the session-length p95.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.timestamps import micros


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same ``keys``) with
    ``start <= ts < end``, via (key, time-bucket) equi-join.

    ``how='inner'`` keeps matched points; ``'left'`` keeps unmatched
    points with NULL interval columns (interval columns must not clash
    with point column names, standard join hygiene).
    """
    # bucket at MICROSECOND precision — unix_timestamp truncates to
    # whole seconds, and a sub-second interval end in the first second
    # after a bucket boundary would place e_bkt one bucket low and drop
    # valid matches (the as-of join buckets at micros for the same
    # reason, operators/asof.py). micros() is the NTZ-safe axis helper.
    b_us = F.lit(bucket_seconds * 1_000_000)
    pt = points.withColumn(
        "_bkt", F.floor(micros(F.col(ts_col)) / b_us).cast("long")
    )
    s_bkt = F.floor(micros(F.col(start_col)) / b_us).cast("long")
    # end is exclusive: an interval ending exactly on a bucket boundary
    # does not cover that bucket
    e_bkt = F.floor((micros(F.col(end_col)) - F.lit(1)) / b_us).cast("long")
    iv = intervals.withColumn(
        "_bkt", F.explode(F.sequence(s_bkt, F.greatest(e_bkt, s_bkt)))
    )
    on = [*keys, "_bkt"]
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    if how == "inner":
        return pt.join(iv, on).filter(cond).drop("_bkt")
    if how == "left":
        # anti-join on a frozen surrogate id, NOT on the point columns:
        # NULL point values make column-equality anti-joins keep matched
        # rows a second time (null-unsafe equality). The checkpoints pin
        # the nondeterministic id assignment AND stop the bucketized
        # join from being evaluated twice (union branch + anti build).
        pt = pt.withColumn("_pid", F.monotonically_increasing_id()).localCheckpoint(
            eager=True
        )
        matched = pt.join(iv, on).filter(cond).localCheckpoint(eager=True)
        iv_cols = [c for c in intervals.columns if c not in keys]
        missing = pt.join(matched.select("_pid"), "_pid", "left_anti")
        for c in iv_cols:
            missing = missing.withColumn(c, F.lit(None).cast(dict(matched.dtypes)[c]))
        return matched.unionByName(missing).drop("_bkt", "_pid")
    raise ValueError(f"unsupported how={how!r} (inner|left)")


def interval_overlap_condition(
    a_start: Column, a_end: Column, b_start: Column, b_end: Column
) -> Column:
    """Half-open interval overlap: [a_start, a_end) ∩ [b_start, b_end) ≠ ∅."""
    return (a_start < b_end) & (b_start < a_end)
