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

    l_tag = left.withColumn("_is_right", F.lit(0))
    for c in value_cols:
        l_tag = l_tag.withColumn(f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    l_tag = l_tag.withColumn("_r_ts", F.lit(None).cast(dict(right.dtypes)[ts]))

    r_tag = right.select(
        *keys,
        F.col(ts),
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(ts).alias("_r_ts"),
    )
    for c in left.columns:
        if c not in (*keys, ts):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    unioned = l_tag.unionByName(r_tag)
    # right rows first at equal ts → inclusive <= matching
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned
    for c in value_cols:
        carried = carried.withColumn(
            f"{suffix}{c}", F.last(F.when(F.col("_is_right") == 1, F.col(f"_r_{c}")), ignorenulls=True).over(w)
        )
    carried = carried.withColumn(
        f"{suffix}ts", F.last(F.when(F.col("_is_right") == 1, F.col("_r_ts")), ignorenulls=True).over(w)
    )
    drop = ["_is_right", "_r_ts"] + [f"_r_{c}" for c in value_cols]
    return carried.filter(F.col("_is_right") == 0).drop(*drop)
