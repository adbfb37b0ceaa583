"""Bucketed-table sink — the co-located-join scale lever (SURVEY §2.9).

At 100 TB the dominant recurring cost of a fact-fact join is the
shuffle of both sides on the join key, paid on EVERY run. Hive-style
bucketing pays it once at write time: ``bucketBy(n, key)`` hash-splits
each output partition into n files by key, and a later join of two
tables bucketed on the same key with the same n compiles to a
SortMergeJoin with ZERO Exchange on either side — the file layout IS
the partitioning. The reference's daily object-store layout
(providers.js:168-185) is the time-axis analogue; bucketing is the
key-axis one Spark adds on top.

Contract notes (all enforced by Spark, surfaced here for callers):
* bucketed writes must go through ``saveAsTable`` (the metastore keeps
  the bucket spec; a bare ``parquet(path)`` write silently drops it);
* both join sides need the SAME bucket count for exchange-free joins
  (mismatched counts re-shuffle the smaller side);
* ``spark.sql.sources.bucketing.enabled`` (default true) must be on at
  read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    managed table. Sorting within buckets lets the later SortMergeJoin
    skip its sort stage too — the join degrades to a pure merge."""
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (metastore path —
    a raw file read would lose the layout and re-shuffle on join)."""
    return spark.table(table)
