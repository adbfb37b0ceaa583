"""Enriched-measurements provider (the clarity shape,
reference providers/clarity.js) — the most involved reference pipeline:

* measurements arrive as flat JSON rows with a datasource id;
* a datasource dimension enriches each row (clarity.js:63-108), misses
  are tracked as a side-output (missing_datasources, :51-56) — J2;
* QC codes ride along as a flags map (`{'clarity/qc': m.qc}`, :163)
  rather than dropping or mangling the value;
* output feeds the v0.1 JSON payload (meta/measures/locations,
  :177-190) with matching_method 'ingest-id' (J3).

Config meta: path (JSON lines), datasources_path (JSON lines dim:
datasource_id, datasource_name). ``process`` returns (measures,
stations); ``process_with_misses`` also returns the miss report.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ids import sensor_id
from ..functions.timestamps import from_iso
from ..measurands import measurand_dim
from ..operators.dedup import first_per_key
from ..operators.joins import enrich_with_miss_report
from ..sources.files import read_json
from ..config import config_lookup, source_label
from .base import Provider, register

LOOKUP = (
    ("pm2_5ConcMass", "pm25", "µg/m³"),
    ("pm10ConcMass", "pm10", "µg/m³"),
    ("no2Conc", "no2", "ppb"),
    ("o3Conc", "ozone", "ppb"),
)

RAW_SCHEMA = (
    "measurement_id string, datasource_id string, ts string, "
    "lat double, lon double, characteristic string, value double, qc string"
)

DATASOURCE_SCHEMA = "datasource_id string, datasource_name string"


@register
class EnrichedProvider(Provider):
    name = "enriched"

    def process_with_misses(
        self, spark: SparkSession, config: dict[str, Any]
    ) -> tuple[DataFrame, DataFrame, DataFrame]:
        meta = config.get("meta", {})
        raw = read_json(spark, meta["path"], RAW_SCHEMA)
        dsdim = read_json(spark, meta["datasources_path"], DATASOURCE_SCHEMA)

        # J2: broadcast left-join enrich + distinct miss side-output
        enriched, misses = enrich_with_miss_report(raw, dsdim, "datasource_id")
        matched = enriched.filter(F.col("datasource_name").isNotNull())

        # clarity.js:27-29: clarity accepts exactly one characteristic,
        # pm2_5ConcMassIndividual — config data, not a code fork
        dim = measurand_dim(spark, config_lookup(config, LOOKUP))
        joined = matched.join(
            F.broadcast(dim),
            matched["characteristic"] == dim["input_param"],
            "inner",
        )
        measures = joined.select(
            sensor_id(
                F.col("datasource_name"), F.col("datasource_id"), F.col("parameter")
            ).alias("sensor_id"),
            (F.col("value") * F.col("scale")).alias("measure"),
            from_iso(F.col("ts")).alias("timestamp"),
            F.col("lon").alias("longitude"),
            F.col("lat").alias("latitude"),
            # QC code rides as a flag (clarity.js:163), value untouched
            F.when(
                F.col("qc").isNotNull() & (F.col("qc") != ""),
                F.create_map(F.lit("enriched/qc"), F.col("qc")),
            ).otherwise(F.lit(None).cast("map<string,string>")).alias("flags"),
        )

        stations = first_per_key(
            matched.select(
                F.col("datasource_id").alias("sensor_node_id"),
                F.col("datasource_name").alias("sensor_node_site_name"),
                F.lit(source_label(config)).alias("sensor_node_source_name"),
                F.array(F.col("lon"), F.col("lat")).alias("sensor_node_geometry"),
                F.lit(False).alias("sensor_node_ismobile"),
            ),
            ["sensor_node_id"],
            [F.col("sensor_node_site_name").asc()],
        )
        return measures, stations, misses

    def process(
        self, spark: SparkSession, config: dict[str, Any]
    ) -> tuple[DataFrame, DataFrame]:
        measures, stations, _misses = self.process_with_misses(spark, config)
        return measures, stations
