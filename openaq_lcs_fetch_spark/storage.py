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


def plan_has_exchange(df: DataFrame, include_broadcast: bool = False) -> bool:
    """True if the physical plan shuffles (optionally also counting
    broadcast exchanges — those are cheap dimension ships, not the
    all-to-all shuffle bucketing eliminates)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if not include_broadcast:
        plan = plan.replace("BroadcastExchange", "")
    return "Exchange" in plan
