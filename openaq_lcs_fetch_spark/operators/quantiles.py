"""Exact distributed order statistics via grid prefix sums.

The scale problem: an exact quantile is an order statistic, and the
naive plan — a running-sum window over the raw rows partitioned by the
(often low-cardinality) group key — funnels the whole table through
#groups reducers. The scale shape used here (and proven per-query by
``tests/test_plan_properties.py``) is a two-level GRID:

1. one rollup per key: (min, max, total weight);
2. map-side-combined weight counts on a fixed-width value grid
   (monotone affine bucketing — cell order == value order, so WHERE the
   cell boundaries land can never change the answer);
3. each requested fraction's CROSSING CELL falls out of one window over
   the <=GRID-row grid table crossed with the tiny fraction spec;
4. only rows landing in a broadcast-selected cell are re-read and
   resolved over in-cell DISTINCT values.

Answers are actual data values (lower quantiles — no interpolation, no
cross-engine float hazard); every event-volume pass is a scan + map-side
aggregate. Pathological value skew (all mass in one cell) degrades step
4 to distinct-values-in-cell rows; a second grid level would recurse.

Used by ``weighted_median_value``, ``equi_depth_quantiles`` and
``value_mad`` — one operator, three query surfaces.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..localdf import local_df

GRID = 4096


def grid_stats(
    df: DataFrame, key: str, value: str, weight: Column | None = None
) -> DataFrame:
    """Per-key (``_k``, ``_vmin``, ``_vmax``, ``_tw``) in the internal
    format ``grid_quantiles(stats=...)`` consumes, localCheckpointed
    (the caller reuses it across passes — see value_mad, which derives
    its SECOND pass's stats from the first's instead of re-scanning)."""
    w = weight if weight is not None else F.lit(1)
    e = df.select(F.col(key).alias("_k"), F.col(value).alias("_v"), w.alias("_w"))
    # eager, deliberately: a lazy checkpoint here was A/B'd r15 (4
    # interleaved rounds across the four grid consumers) and measured
    # neutral-to-slightly-worse — materializing inside the first
    # broadcast build stalls what the eager job overlaps with plan
    # analysis — so the up-front job stays
    return e.groupBy("_k").agg(
        F.min("_v").alias("_vmin"),
        F.max("_v").alias("_vmax"),
        F.sum("_w").alias("_tw"),
    ).localCheckpoint()


def grid_quantiles(
    df: DataFrame,
    key: str,
    value: str,
    weight: Column | None = None,
    fractions: Sequence[tuple[int, int]] = ((1, 2),),
    grid: int = GRID,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Exact lower weighted quantiles per ``key``.

    For each (num, den) in ``fractions`` returns the first value, in
    ``value`` order, whose cumulative weight satisfies
    den·cum >= num·total — the lower quantile at fraction num/den.

    Returns (key, num, den, qvalue, total_weight): one row per key per
    fraction (keys whose total weight is 0 still resolve — the first
    populated cell/value wins, matching the all-zero-weight convention
    of a running-sum formulation).

    Contract (three clauses):

    * ``value`` must be non-NULL. NULLs would sort NULLS FIRST in
      Spark's window but NULLS LAST in a DuckDB oracle's ORDER BY —
      filter them (or impute) BEFORE calling.
    * ``value`` must be non-NaN when the column is floating: a NaN
      passes ``isNotNull`` but its bucket expression NULLs out after
      the int cast, landing NaN mass in a NULL cell that sorts first
      in Spark while DuckDB orders NaN last — a silent cross-engine
      divergence. Callers on double columns filter
      ``isNotNull() & ~isnan()`` on the Spark side and
      ``IS NOT NULL AND NOT isnan(...)`` in their oracles, keeping
      both engines on the same row set even if NaN enters the data.
    * ``key`` must be DIMENSION-sized (e.g. the 5 event types): the
      per-key stats and the keys×fractions crossing table are
      broadcast, so a high-cardinality key would blow past the
      broadcast threshold / driver memory. For big keys use a plain
      windowed rank per key instead — with many keys the per-key row
      count is small and the window parallelizes on its own.

    ``stats`` (optional) is a caller-supplied per-key stats frame in
    :func:`grid_stats` format, skipping this call's own stats scan.
    Contract: ``_tw`` must EXACTLY equal the sum of weights per key
    (it is the quantile threshold's denominator); ``_vmin``/``_vmax``
    only need to BOUND the values (``_vmin <= v <= _vmax``) — the
    bucketing stays monotone affine under any bounds, and the answer
    is a data-value selection, so where the cell boundaries land can
    never change it (looser bounds only cost resolution).
    """
    spark = df.sparkSession
    w = weight if weight is not None else F.lit(1)
    e = df.select(F.col(key).alias("_k"), F.col(value).alias("_v"), w.alias("_w"))
    # stats (one row per key) is broadcast into THREE consumers below;
    # without materialization each broadcast re-scans the caller's
    # frame — at corpus scale that is 3 extra fact scans per
    # grid_quantiles call (value_mad's two chained calls planned 35
    # parquet scans before this checkpoint + the call-site one)
    if stats is None:
        stats = grid_stats(df, key, value, weight)
    bucket = F.when(
        F.col("_vmax") > F.col("_vmin"),
        F.least(
            F.lit(grid - 1),
            F.floor(
                (F.col("_v") - F.col("_vmin"))
                / (F.col("_vmax") - F.col("_vmin"))
                * grid
            ),
        ),
    ).otherwise(F.lit(0))
    eb = (
        e.join(F.broadcast(stats), "_k")
        .withColumn("_bkt", bucket.cast("int"))
        .select("_k", "_v", "_w", "_bkt")
    )
    cells = eb.groupBy("_k", "_bkt").agg(F.sum("_w").alias("_bw"))
    wb = Window.partitionBy("_k").orderBy("_bkt")
    qspec = local_df(
        spark, [(int(n), int(d)) for n, d in fractions], "num int, den int"
    )
    crossing = (
        cells.withColumn(
            "_cumb", F.sum("_bw").over(wb.rowsBetween(Window.unboundedPreceding, 0))
        )
        .join(F.broadcast(stats.select("_k", "_tw")), "_k")
        .crossJoin(F.broadcast(qspec))
        .filter(F.col("den") * F.col("_cumb") >= F.col("num") * F.col("_tw"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_k", "num", "den").orderBy("_bkt")
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(
            "_k",
            "num",
            "den",
            F.col("_bkt").alias("_sel"),
            (F.col("_cumb") - F.col("_bw")).alias("_before"),
            "_tw",
        )
    )
    inb = eb.join(F.broadcast(crossing), "_k").filter(F.col("_bkt") == F.col("_sel"))
    vals = inb.groupBy("_k", "num", "den", "_v").agg(
        F.sum("_w").alias("_vw"),
        F.min("_before").alias("_before"),
        F.min("_tw").alias("_tw"),
    )
    wv = Window.partitionBy("_k", "num", "den").orderBy("_v")
    picked = (
        vals.withColumn(
            "_cumv", F.sum("_vw").over(wv.rowsBetween(Window.unboundedPreceding, 0))
        )
        .filter(
            F.col("den") * (F.col("_before") + F.col("_cumv"))
            >= F.col("num") * F.col("_tw")
        )
        .withColumn("_rn", F.row_number().over(wv))
        .filter(F.col("_rn") == 1)
    )
    return picked.select(
        F.col("_k").alias(key),
        "num",
        "den",
        F.col("_v").alias("qvalue"),
        F.col("_tw").alias("total_weight"),
    )


def range_bucket(x: str, lo: str, hi: str, k: int) -> Column:
    """Integer-exact range bucketing: ((x−lo)·k) div (hi−lo+1), clipped
    to [0, k−1]. Operands must be non-negative-ordered integers
    (x ∈ [lo, hi]). Paired with :func:`sql_range_bucket` so the Spark
    plan and its DuckDB oracle compute the same function — the float
    variant is a measured cross-engine trap (DuckDB `/` is float
    division and its BIGINT cast rounds half-even; see
    docs/ORACLE_NOTES.md and the reliability_bins 9-vs-10-bin split)."""
    return F.least(
        F.lit(k - 1), F.expr(f"(({x} - {lo}) * {k}) div ({hi} - {lo} + 1)")
    )


def sql_range_bucket(x: str, lo: str, hi: str, k: int) -> str:
    """DuckDB twin of :func:`range_bucket` (integer `//`, same clip)."""
    return f"LEAST({k - 1}, (({x} - ({lo})) * {k}) // (({hi}) - ({lo}) + 1))"
