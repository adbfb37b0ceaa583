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


def compact_by_time(
    df: DataFrame,
    ts_col: str,
    path: str,
    n_bins: int = 8,
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

    Returns the number of bins written.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

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
    return n
