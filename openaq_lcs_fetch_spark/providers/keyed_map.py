"""Keyed-map provider (the smartsense/airqoon shape,
reference providers/smartsense.js, providers/airqoon.js).

Readings arrive as an object keyed by measurand
(smartsense.js:109-125, airqoon.js:156-159); pipeline: map-entries melt
(R2, explode(map_entries)) → sentinel recode ('inv'/'n/a' → NULL +
flag, NOT -999 — SURVEY.md §2.11 divergence note) → normalize → ISO
timestamps (C5).

Config meta: path (JSON lines: device_id, ts, readings map).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import clean_measure, sentinel_flag
from ..functions.ids import sensor_id
from ..functions.timestamps import from_iso
from ..measurands import measurand_dim
from ..operators.dedup import first_per_key
from ..operators.reshape import explode_map
from ..sources.files import read_json
from ..config import source_label
from .base import Provider, register

LOOKUP = (
    ("pm25", "pm25", "µg/m³"),
    ("pm10", "pm10", "µg/m³"),
    ("no2", "no2", "ppb"),
    ("co", "co", "ppb"),
    ("temp", "temperature", "c"),
)


RAW_SCHEMA = (
    "device_id string, ts string, lat double, lon double, readings map<string,string>"
)


def transform_measures(raw: DataFrame, dim: DataFrame, provider: str) -> DataFrame:
    """The pure dataflow: raw keyed-map rows → normalized measures.

    Batch/streaming agnostic — every step is a narrow DataFrame
    transformation (melt, broadcast join, scalar exprs), so the same
    function runs on ``spark.read`` and ``spark.readStream`` inputs
    (see streaming/provider_stream.py).
    """
    melted = explode_map(raw, "readings", key_name="input_param", value_name="raw_value")
    joined = melted.join(F.broadcast(dim), on="input_param", how="inner")
    return joined.select(
        sensor_id(F.lit(provider), F.col("device_id"), F.col("parameter")).alias(
            "sensor_id"
        ),
        (clean_measure(F.col("raw_value")) * F.col("scale")).alias("measure"),
        from_iso(F.col("ts")).alias("timestamp"),
        F.col("lon").alias("longitude"),
        F.col("lat").alias("latitude"),
        sentinel_flag(F.col("raw_value")).alias("flags"),
    ).filter(F.col("measure").isNotNull() | F.col("flags").isNotNull())


@register
class KeyedMapProvider(Provider):
    name = "keyed_map"

    def process(
        self, spark: SparkSession, config: dict[str, Any]
    ) -> tuple[DataFrame, DataFrame]:
        meta = config.get("meta", {})
        raw = read_json(spark, meta["path"], RAW_SCHEMA)
        measures = transform_measures(
            raw, measurand_dim(spark, LOOKUP), source_label(config)
        )

        stations = first_per_key(
            raw.select(
                F.col("device_id").alias("sensor_node_id"),
                F.lit(source_label(config)).alias("sensor_node_source_name"),
                F.array(F.col("lon"), F.col("lat")).alias("sensor_node_geometry"),
                F.lit(False).alias("sensor_node_ismobile"),
            ),
            ["sensor_node_id"],
            [F.col("sensor_node_source_name").asc()],
        )
        return measures, stations
