"""Streaming flavor of a provider pipeline (SURVEY.md Phase 3).

The same transform that runs in the batch provider runs here on a
``readStream`` input — the engine's dataflows are trigger-agnostic:

    cron + checkpoint (reference)  ≙  trigger + checkpointLocation
    re-fetch overlap (T3/T4)       ≙  withWatermark + dropDuplicates
    per-frequency cadence (T1)     ≙  TRIGGER_BY_FREQUENCY
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..measurands import measurand_dim
from ..providers.keyed_map import LOOKUP, RAW_SCHEMA, transform_measures
from .pipeline import TRIGGER_BY_FREQUENCY


def keyed_map_stream(spark: SparkSession, config: dict[str, Any]) -> DataFrame:
    """readStream twin of KeyedMapProvider.process — returns the
    streaming measures DataFrame (caller picks the sink)."""
    meta = config.get("meta", {})
    raw = spark.readStream.schema(RAW_SCHEMA).json(meta["path"])
    measures = transform_measures(
        raw, measurand_dim(spark, LOOKUP), config["provider"]
    )
    # T3/T4: bound duplicate state by the allowed lateness
    return measures.withWatermark("timestamp", meta.get("lateness", "3 hours")).dropDuplicates(
        ["sensor_id", "timestamp"]
    )


def start_to_parquet(
    measures: DataFrame,
    out_path: str,
    checkpoint: str,
    frequency: str = "hour",
    available_now: bool = False,
):
    """writeStream with the reference's cadence model (T1): the source
    frequency picks the processing-time trigger; availableNow drains a
    bounded backlog (≙ one cron invocation)."""
    writer = (
        measures.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=TRIGGER_BY_FREQUENCY[frequency])
    return writer.start()
