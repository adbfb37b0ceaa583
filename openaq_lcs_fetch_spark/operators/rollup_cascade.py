"""Multi-resolution rollup cascade (the 'hypertable rollup' custom
operator from the brief): maintain hour → day → month aggregates where
each level re-aggregates the level below instead of rescanning raw.

The invariant that makes this valid at 100 TB: every aggregate carried
is *mergeable* (count, sum-in-decimal, min, max — avg is derived
sum/count at read time). Coarser levels touch 1/24th, 1/720th ... of
the rows; incremental maintenance re-rolls only the buckets the new
data touched.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: mergeable aggregate set carried at every level
_AGGS = ("n", "sum_value", "min_value", "max_value")


def rollup_from_raw(
    df: DataFrame, ts_col: str, keys: Sequence[str], value_col: str, level: str
) -> DataFrame:
    """Base rollup at ``level`` ('hour'|'day'|'month') from raw rows."""
    return df.groupBy(
        F.date_trunc(level, F.col(ts_col)).alias("bucket"), *keys
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(27,6)")).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def coarsen(rollup: DataFrame, keys: Sequence[str], level: str) -> DataFrame:
    """Re-aggregate a finer rollup into ``level`` — raw is never
    rescanned; every aggregate merges losslessly."""
    return rollup.groupBy(
        F.date_trunc(level, F.col("bucket")).alias("bucket"), *keys
    ).agg(
        F.sum("n").alias("n"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def finalize(rollup: DataFrame) -> DataFrame:
    """Read-time derived metrics (avg from mergeable sum/count)."""
    return rollup.withColumn(
        "avg_value", (F.col("sum_value").cast("double") / F.col("n"))
    ).withColumn("sum_value", F.col("sum_value").cast("double"))
