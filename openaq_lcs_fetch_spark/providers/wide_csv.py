"""Wide-CSV provider (the CMU shape, reference providers/cmu.js).

Pipeline: CSV scan (S4, all-string schema — the raw feed is stringly)
→ melt wide parameter columns to long (R1, cmu.js:169-177) → sentinel
clean (F6: 'NaN' skips, cmu.js:171) → broadcast measurand join +
normalize (J1/C1) → ingest-id (C3, cmu.js:309-311) → local-time parse
with tz + fixed shift (C6, cmu.js:183-220: 'YYYY-MM-DD HH_mm' in
America/New_York minus 15 min) → measures; stations from first-wins
dedup of site rows (A7, cmu.js:143-166).

Config meta: path, timestamp_col, ts_format, tz, shift_minutes,
station_col, site_col, lat_col, lon_col, params (comma list).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import clean_measure, sentinel_flag
from ..functions.ids import sensor_id
from ..functions.timestamps import from_local
from ..measurands import measurand_dim
from ..operators.dedup import first_per_key
from ..operators.reshape import melt
from ..sources.files import read_csv
from ..config import source_label
from .base import Provider, register

#: provider-facing lookup rows (input_param, parameter, unit) — data,
#: like cmu's measurand request list.
LOOKUP = (
    ("CO", "co", "ppb"),
    ("NO2", "no2", "ppb"),
    ("O3", "ozone", "ppb"),
    ("PM025", "pm25", "µg/m³"),
    ("SO2", "so2", "ppb"),
    ("T", "temperature", "c"),
    ("RH", "relativehumidity", "%"),
    ("P", "pressure", "pa"),
)


@register
class WideCsvProvider(Provider):
    name = "wide_csv"

    def process(
        self, spark: SparkSession, config: dict[str, Any]
    ) -> tuple[DataFrame, DataFrame]:
        meta = config.get("meta", {})
        params = meta.get("params", "CO,NO2,O3,PM025,SO2,T,RH,P").split(",")
        station_col = meta.get("station_col", "Anon_Name")
        site_col = meta.get("site_col", "Site_Name")
        ts_col = meta.get("timestamp_col", "Timestamp")
        id_cols = [station_col, site_col, ts_col, meta.get("lat_col", "Lat"), meta.get("lon_col", "Lon")]

        ncols = len(id_cols) + len(params)
        schema = ", ".join(f"`{c}` string" for c in id_cols + params)
        raw = read_csv(spark, meta["path"], schema, header=True)
        assert len(raw.columns) == ncols

        long = melt(raw, id_cols, params, var_name="input_param", value_name="raw_value")
        cleaned = long.withColumn("value", clean_measure(F.col("raw_value"))).withColumn(
            "flags", sentinel_flag(F.col("raw_value"))
        )
        dim = measurand_dim(spark, LOOKUP)
        joined = cleaned.join(F.broadcast(dim), on="input_param", how="inner")
        ts = from_local(
            F.col(ts_col),
            meta.get("ts_format", "yyyy-MM-dd HH_mm"),
            meta.get("tz", "America/New_York"),
            int(meta.get("shift_minutes", "-15")),
        )
        measures = joined.select(
            sensor_id(F.lit(source_label(config)), F.col(station_col), F.col("parameter")).alias(
                "sensor_id"
            ),
            (F.col("value") * F.col("scale")).alias("measure"),
            ts.alias("timestamp"),
            F.lit(None).cast("double").alias("longitude"),
            F.lit(None).cast("double").alias("latitude"),
            F.col("flags"),
        ).filter(F.col("measure").isNotNull() | F.col("flags").isNotNull())

        stations = first_per_key(
            raw.select(
                F.col(station_col).alias("sensor_node_id"),
                F.col(site_col).alias("sensor_node_site_name"),
                F.lit(source_label(config)).alias("sensor_node_source_name"),
                F.array(
                    F.col(meta.get("lon_col", "Lon")).cast("double"),
                    F.col(meta.get("lat_col", "Lat")).cast("double"),
                ).alias("sensor_node_geometry"),
                F.lit(False).alias("sensor_node_ismobile"),
            ),
            ["sensor_node_id"],
            [F.col("sensor_node_site_name").asc()],
        )
        return measures, stations
