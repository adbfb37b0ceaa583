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
