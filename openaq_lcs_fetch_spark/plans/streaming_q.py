"""Driver-visible streaming query: a real Structured Streaming job whose
bounded result is verifiable against a batch SQL oracle (tumbling-hour
windows align exactly with date_trunc('hour'))."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.pipeline import (
    hourly_window_counts,
    read_events_stream,
    run_available_now,
)
from .registry import query

_STREAMING_ORACLE = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


@query("streaming_hourly", _STREAMING_ORACLE)
def streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir)
    windowed = hourly_window_counts(stream)
    out = run_available_now(windowed, output_mode="complete")
    return out.select(
        F.col("w.start").alias("hour"), "event_type", "n"
    )
