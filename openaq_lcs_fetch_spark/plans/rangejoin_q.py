"""Range-join queries (point-in-interval) — operators/rangejoin.py
driven end-to-end with a DuckDB oracle.

The naive SQL formulation (the oracle) is a key-equi join with a range
residual — fine for an oracle, quadratic on hot keys for an engine.
The Spark plan buckets time so candidates are bounded per (key,
bucket); the plan-regression test pins the absence of nested-loop
joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timestamps import micros
from ..operators.rangejoin import point_in_interval_join
from .registry import query, t

_VIEWS_ORACLE = """
SELECT p.event_id AS purchase_id,
       CAST(COUNT(v.event_id) AS BIGINT) AS n_views_before
FROM events p
LEFT JOIN events v
  ON v.user_id = p.user_id
 AND v.event_type = 'view'
 AND v.ts >= p.ts - INTERVAL 1 HOUR
 AND v.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
"""


@query("views_before_purchase", _VIEWS_ORACLE)
def views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: how many view events the user made in the hour
    before. Intervals = [purchase - 1h, purchase) per purchase event;
    points = view events; joined on (user, hour-bucket) so a hot user
    never degenerates into an all-pairs comparison."""
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    matched = point_in_interval_join(
        views,
        purchases,
        keys=["user_id"],
        ts_col="ts",
        start_col="w_start",
        end_col="w_end",
        bucket_seconds=3600,
    )
    counts = matched.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_views_before")
    )
    return (
        purchases.select("purchase_id")
        .join(counts, "purchase_id", "left")
        .select(
            "purchase_id",
            F.coalesce(F.col("n_views_before"), F.lit(0)).alias("n_views_before"),
        )
    )


# ---------------------------------------------------------------------------
# session_peak_concurrency — how many user sessions are open at once,
# by sweep-line: +1 at each session start, -1 at each end, running sum
# over the global time order. NO join at all — the interval-analytics
# questions that tempt an O(n²) self-join ("how many overlap?") are one
# sort + one window when phrased as a sweep.
# ---------------------------------------------------------------------------

_PEAK_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                   OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
  SELECT user_id, sess_no, MIN(ts) AS s_start,
         MAX(ts) + INTERVAL 30 MINUTE AS s_end
  FROM (SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC
                 ROWS UNBOUNDED PRECEDING) AS sess_no
        FROM gaps)
  GROUP BY user_id, sess_no
),
deltas AS (
  SELECT s_start AS t, 1 AS d FROM sess
  UNION ALL
  SELECT s_end AS t, -1 AS d FROM sess
),
sweep AS (
  SELECT t, SUM(d) AS d FROM deltas GROUP BY t
),
run AS (
  SELECT t, SUM(d) OVER (ORDER BY t ASC ROWS UNBOUNDED PRECEDING) AS open
  FROM sweep
)
SELECT CAST(MAX(open) AS BIGINT) AS peak_concurrent,
       CAST(COUNT(*) AS BIGINT) AS n_change_points
FROM run
"""


@query("session_peak_concurrency", _PEAK_ORACLE)
def session_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous sessions (30-min-gap sessionization, session
    end = last event + 30 min). Same-instant starts/ends collapse into
    one change point BEFORE the running sum (the groupBy), so ordering
    among simultaneous deltas can't affect the max. The global running
    sum is a single-partition window over CHANGE POINTS (bounded by
    distinct timestamps, not events) — at extreme scale this last step
    re-aggregates per coarse time range first; here change points are
    already the reduced set."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = micros(F.col("ts")) - micros(F.lag("ts").over(w))
    new_sess = F.when(gap > 1_800_000_000, 1).when(
        F.lag("ts").over(w).isNull(), 1
    ).otherwise(0)
    wrun = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    sess = (
        e.select("user_id", "ts", "event_id")
        .withColumn("sess_no", F.sum(new_sess).over(wrun))
        .groupBy("user_id", "sess_no")
        .agg(
            F.min("ts").alias("s_start"),
            F.timestamp_add("MINUTE", F.lit(30), F.max("ts")).alias("s_end"),
        )
    )
    deltas = sess.select(F.col("s_start").alias("t"), F.lit(1).alias("d")).unionByName(
        sess.select(F.col("s_end").alias("t"), F.lit(-1).alias("d"))
    )
    sweep = deltas.groupBy("t").agg(F.sum("d").alias("d"))
    wall = Window.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    run = sweep.withColumn("open", F.sum("d").over(wall))
    return run.agg(
        F.max("open").cast("long").alias("peak_concurrent"),
        F.count(F.lit(1)).cast("long").alias("n_change_points"),
    )


# ---------------------------------------------------------------------------
# asof_next_calibration — the FORWARD as-of: each event picks up the
# next calibration mark at or after its timestamp (the mirror of
# asof_calibration, via the backward-on-negated-micros reduction in
# operators/asof.py::asof_join_forward; same skew-free bucketing).
# ---------------------------------------------------------------------------

_NEXT_ORACLE = """
WITH types AS (SELECT unnest(['click','view','purchase','signup','error']) AS event_type),
marks AS (
  SELECT t.event_type,
         unnest(generate_series(TIMESTAMP '2024-01-01 03:00:00',
                                TIMESTAMP '2024-01-31 00:00:00',
                                INTERVAL 6 HOUR)) AS calib_ts
  FROM types t
),
calib AS (
  SELECT event_type, calib_ts,
         CAST((epoch(calib_ts) / 3600) % 7 AS DOUBLE) / 10.0 AS factor
  FROM marks
),
nxt AS (
  SELECT e.event_id, e.event_type, e.ts,
         (SELECT MIN(c.calib_ts) FROM calib c
           WHERE c.event_type = e.event_type AND c.calib_ts >= e.ts) AS asofnext_ts
  FROM events e
)
SELECT n.event_id, n.event_type, n.ts, n.asofnext_ts,
       c.factor AS asofnext_factor
FROM nxt n
LEFT JOIN calib c
  ON c.event_type = n.event_type AND c.calib_ts = n.asofnext_ts
"""


@query("asof_next_calibration", _NEXT_ORACLE)
def asof_next_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join_forward
    from .temporal import _calib

    e = t(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    calib = _calib(spark).withColumnRenamed("calib_ts", "ts")
    # dimension-sized right side → broadcast fast path (no fact shuffle)
    joined = asof_join_forward(
        e, calib, key="event_type", ts="ts", value_cols=["factor"],
        bucket_seconds=86_400, broadcast_right=True,
    )
    return joined.select(
        "event_id", "event_type", "ts",
        F.col("asofnext_ts"), F.col("asofnext_factor"),
    )
