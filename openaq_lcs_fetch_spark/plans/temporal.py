"""Temporal join queries: as-of and range joins (operators Spark's
DataFrame API lacks — composed per the brief's custom-operator ladder,
verified against DuckDB's *native* ASOF JOIN / range predicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join_broadcast
from .registry import query, t

# ---------------------------------------------------------------------------
# asof_calibration — every event picks up the latest calibration factor
# at or before its timestamp (per event_type). The calibration table is
# generated deterministically (6-hourly marks) in both engines.
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
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
)
SELECT e.event_id, e.event_type, e.ts,
       c.calib_ts AS asof_ts, c.factor AS asof_factor
FROM events e
ASOF LEFT JOIN calib c
  ON e.event_type = c.event_type AND e.ts >= c.calib_ts
"""


def _calib(spark: SparkSession) -> DataFrame:
    types = spark.createDataFrame(
        [("click",), ("view",), ("purchase",), ("signup",), ("error",)],
        "event_type string",
    )
    marks = types.select(
        "event_type",
        F.explode(
            F.sequence(
                F.lit("2024-01-01 03:00:00").cast("timestamp"),
                F.lit("2024-01-31 00:00:00").cast("timestamp"),
                F.expr("INTERVAL 6 HOURS"),
            )
        ).alias("calib_ts"),
    )
    factor = ((F.unix_timestamp("calib_ts") / 3600) % 7).cast("double") / F.lit(10.0)
    return marks.withColumn("factor", factor)


@query("asof_calibration", _ASOF_ORACLE)
def asof_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    calib = _calib(spark).withColumnRenamed("calib_ts", "ts")
    # calibration marks are dimension-sized (5 types x 6-hourly) → the
    # broadcast as-of plan: the events fact table is never shuffled or
    # sorted, the match resolves in a codegen array projection. The
    # windowed skew-free plan (asof_join) stays the fact-vs-fact tool.
    joined = asof_join_broadcast(
        e, calib, key="event_type", ts="ts", value_cols=["factor"],
        bucket_seconds=86_400,
    )
    return joined.select(
        "event_id",
        "event_type",
        "ts",
        F.col("asof_ts"),
        F.col("asof_factor"),
    )


# ---------------------------------------------------------------------------
# range_window_counts — range join: events within ±10 min of each marker
# (the first 20 signups). Markers are dimension-sized → broadcast
# nested-loop with a range predicate; never a full cartesian.
# ---------------------------------------------------------------------------

_RANGE_ORACLE = """
WITH markers AS (
  SELECT event_id AS marker_id, ts AS marker_ts
  FROM events WHERE event_type = 'signup'
  ORDER BY ts ASC, event_id ASC LIMIT 20
)
SELECT m.marker_id, COUNT(*) AS n_nearby
FROM markers m JOIN events e
  ON e.ts >= m.marker_ts - INTERVAL 10 MINUTE
 AND e.ts <= m.marker_ts + INTERVAL 10 MINUTE
GROUP BY m.marker_id
"""


@query("range_window_counts", _RANGE_ORACLE)
def range_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    markers = (
        e.filter(F.col("event_type") == "signup")
        .select(F.col("event_id").alias("marker_id"), F.col("ts").alias("marker_ts"))
        .orderBy(F.col("marker_ts").asc(), F.col("marker_id").asc())
        .limit(20)
    )
    lo = F.col("marker_ts") - F.expr("INTERVAL 10 MINUTES")
    hi = F.col("marker_ts") + F.expr("INTERVAL 10 MINUTES")
    joined = e.join(F.broadcast(markers), (F.col("ts") >= lo) & (F.col("ts") <= hi))
    return joined.groupBy("marker_id").agg(F.count(F.lit(1)).alias("n_nearby"))
