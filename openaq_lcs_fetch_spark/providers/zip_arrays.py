"""Parallel-arrays provider (the purpleair shape,
reference providers/purpleair.js).

The API returns ``{fields: [...], data: [[...], ...]}``
(purpleair.js:127-143); pipeline: zip-decode (R4, map_from_arrays) →
per-measurand melt with null skip (R1/F6, purpleair.js:58-76) → unit
normalize (C1) → unix-seconds timestamps (C5, purpleair.js:73) →
optional equality filter by configured sensor id (F3,
purpleair.js:41-44).

Config meta: path (JSON file with fields/data), station_field,
ts_field, lat_field, lon_field, source_id (optional F3 filter).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import coerce_number
from ..functions.ids import sensor_id
from ..functions.timestamps import from_unix_seconds
from ..measurands import measurand_dim
from ..operators.dedup import first_per_key
from ..operators.reshape import zip_arrays
from ..sources.files import read_json
from ..config import config_lookup, source_label
from .base import Provider, register

LOOKUP = (
    ("pm1.0_atm", "pm1", "µg/m³"),
    ("pm2.5_atm", "pm25", "µg/m³"),
    ("pm10.0_atm", "pm10", "µg/m³"),
    ("0.3_um_count", "um003", "pp100ml"),
    ("humidity", "relativehumidity", "%"),
    ("temperature", "temperature", "f"),
    ("pressure", "pressure", "pa"),
)


@register
class ZipArraysProvider(Provider):
    name = "zip_arrays"

    def process(
        self, spark: SparkSession, config: dict[str, Any]
    ) -> tuple[DataFrame, DataFrame]:
        meta = config.get("meta", {})
        station_f = meta.get("station_field", "sensor_index")
        ts_f = meta.get("ts_field", "last_seen")
        lat_f, lon_f = meta.get("lat_field", "latitude"), meta.get("lon_field", "longitude")

        raw = read_json(
            spark, meta["path"], "fields array<string>, data array<array<string>>"
        )
        records = zip_arrays(raw, "fields", "data", out_col="rec")

        if meta.get("source_id"):  # F3 equality filter by env key
            records = records.filter(
                F.col("rec").getItem(station_f) == meta["source_id"]
            )

        # purpleair.js:7-23: the provider's field table is config data
        lookup = config_lookup(config, LOOKUP)
        dim = measurand_dim(spark, lookup)
        params = [r[0] for r in lookup]
        # R2: melt the record map over the lookup's params, keeping nulls out
        melted = records.select(
            F.col("rec"),
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(p).alias("input_param"),
                        F.col("rec").getItem(p).alias("raw_value"),
                    )
                    for p in params
                ])
            ).alias("kv"),
        ).select("rec", "kv.input_param", "kv.raw_value")
        melted = melted.filter(F.col("raw_value").isNotNull())

        joined = melted.join(F.broadcast(dim), on="input_param", how="inner")
        measures = joined.select(
            sensor_id(
                F.lit(source_label(config)),
                F.col("rec").getItem(station_f),
                F.col("parameter"),
            ).alias("sensor_id"),
            (coerce_number(F.col("raw_value")) * F.col("scale")).alias("measure"),
            from_unix_seconds(F.col("rec").getItem(ts_f)).alias("timestamp"),
            F.col("rec").getItem(lon_f).cast("double").alias("longitude"),
            F.col("rec").getItem(lat_f).cast("double").alias("latitude"),
            F.lit(None).cast("map<string,string>").alias("flags"),
        ).filter(F.col("measure").isNotNull())

        stations = first_per_key(
            records.select(
                F.col("rec").getItem(station_f).alias("sensor_node_id"),
                F.lit(source_label(config)).alias("sensor_node_source_name"),
                F.array(
                    F.col("rec").getItem(lon_f).cast("double"),
                    F.col("rec").getItem(lat_f).cast("double"),
                ).alias("sensor_node_geometry"),
                F.lit(False).alias("sensor_node_ismobile"),
            ),
            ["sensor_node_id"],
            # geometry tiebreak: the source name is a constant literal,
            # which would leave the surviving row arbitrary
            [F.col("sensor_node_geometry").asc_nulls_last()],
        )
        return measures, stations
