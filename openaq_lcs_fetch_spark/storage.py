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
