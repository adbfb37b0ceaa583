"""As-of join — an operator Spark's DataFrame API lacks (the brief's
canonical example of a custom operator composed from existing ops).

``asof_join(left, right, key, ts)``: for every left row, attach the
most recent right row with ``right.ts <= left.ts`` within the same key.

Spark-first realization (no UDF, one shuffle):
  1. tag both sides and union on (key, ts);
  2. per-key window ordered by (ts, tag) with ``last(value,
     ignorenulls=True)`` carries the latest right-side payload forward;
  3. keep only left rows.

The shuffle is a single hash partition on the key (both sides
co-partitioned); within partitions it's one sort — the same cost
profile as a sort-merge join, which is exactly what a native as-of
join would plan. Right-side rows at equal ts sort first (inclusive
``<=`` semantics, matching DuckDB's ASOF JOIN used as the oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    ts: str,
    value_cols: Sequence[str] | None = None,
    suffix: str = "asof_",
) -> DataFrame:
    """Left as-of join; right ``value_cols`` arrive prefixed with
    ``suffix`` plus ``{suffix}ts`` (the matched right timestamp), NULL
    when no right row precedes the left row."""
    keys = [key] if isinstance(key, str) else list(key)
    value_cols = value_cols or [c for c in right.columns if c not in (*keys, ts)]

    # the right payload travels as ONE struct so (ts, values) stay
    # atomic — a matched right row with a NULL value column must yield
    # that NULL, never an older row's value (DuckDB ASOF semantics)
    rtypes = dict(right.dtypes)
    payload_t = (
        "struct<_ts:" + rtypes[ts] + ","
        + ",".join(f"{c}:{rtypes[c]}" for c in value_cols)
        + ">"
    )
    l_tag = left.withColumn("_is_right", F.lit(0)).withColumn(
        "_r", F.lit(None).cast(payload_t)
    )
    r_tag = right.select(
        *keys,
        F.col(ts),
        F.lit(1).alias("_is_right"),
        F.struct(
            F.col(ts).alias("_ts"), *[F.col(c) for c in value_cols]
        ).alias("_r"),
    )
    for c in left.columns:
        if c not in (*keys, ts):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    unioned = l_tag.unionByName(r_tag)
    # right rows first at equal ts → inclusive <= matching. The payload
    # struct is the FINAL sort key: duplicate right rows at the same
    # (key, ts) would otherwise resolve by partition order — the match
    # is deterministically the struct-max duplicate instead.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).asc(), F.col("_is_right").desc(), F.col("_r").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_match",
        F.last(F.when(F.col("_is_right") == 1, F.col("_r")), ignorenulls=True).over(w),
    )
    out = carried.filter(F.col("_is_right") == 0)
    for c in value_cols:
        out = out.withColumn(f"{suffix}{c}", F.col(f"_match.{c}"))
    out = out.withColumn(f"{suffix}ts", F.col("_match._ts"))
    return out.drop("_is_right", "_r", "_match")
