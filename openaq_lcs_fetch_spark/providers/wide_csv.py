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

Per-provider fidelity knobs (config data, mirroring each reference
provider's one-off logic):

* ``meta.lookup`` — provider measurand table (cmu.js:23-34 verbatim,
  cpcb.js:30-52 with its O3/OZONE/O3AAQMS and PM2/PM2.5/PM25 alias
  fan-in, iqair.js:40-42);
* ``meta.hour_ending_minutes`` — forward shift to hour-ending labels
  (iqair.js:142 adds 1 hour to 'Datetime_start(UTC)');
* ``meta.drop_current_hour`` + ``meta.as_of`` — exclude the running
  hour: the feed reports a rolling average, so the current hour is
  always wrong (airgradient.js:138-161);
* ``meta.refetch_previous_day`` + ``meta.daily_pattern`` +
  ``meta.as_of`` — scan yesterday's daily partition alongside today's
  because values arrive delayed (iqair.js:167-201 overfetch), then
  first-wins dedup on (sensor_id, timestamp).
"""

from __future__ import annotations

from datetime import (
    date as _date,
    datetime as _dt,
    timedelta as _timedelta,
    timezone as _timezone,
)
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import clean_measure, sentinel_flag
from ..functions.ids import sensor_id
from ..functions.timestamps import from_local
from ..measurands import measurand_dim
from ..operators.dedup import dedup_events, first_per_key
from ..operators.reshape import melt
from ..sources.files import read_csv
from ..config import config_lookup, source_label
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


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Path existence via the JVM Hadoop FileSystem — scheme-aware
    (file://, hdfs://, s3a://), unlike os.path.exists which silently
    reports every non-local path as missing."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


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
        # as_of defaults to the wall clock — the reference's 'now'
        # (iqair.js:167, airgradient.js:143); tests and replays pin it
        # in config for determinism
        as_of = meta.get("as_of") or _dt.now(_timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%S"
        )
        path: str | list[str] = meta["path"]
        if meta.get("refetch_previous_day") and meta.get("daily_pattern"):
            # iqair.js:167-201: values are often delayed, so every run
            # re-reads the previous day's partition alongside today's;
            # the duplicate hours dedupe below. Two computed partition
            # paths = partition pruning, not a full-directory scan.
            day = as_of[:10]
            prev = str(_date.fromisoformat(day) - _timedelta(days=1))
            base, pattern = meta["path"], meta["daily_pattern"]
            path = [f"{base}/{pattern.format(date=d)}" for d in (day, prev)]
            # a not-yet-written partition (today's file before the first
            # upload) is normal, not an error — the reference tolerates
            # the 404 and proceeds with what exists. Checked through the
            # Hadoop FileSystem API so s3a://hdfs:// paths behave like
            # local ones.
            existing = [p for p in path if _fs_exists(spark, p)]
            path = existing or path  # all missing → loud scan error
        raw = read_csv(spark, path, schema, header=True)
        assert len(raw.columns) == ncols

        # codegen_safe: the clean+flag pair below shares the sentinel
        # subexpression, which over an Expand output breaks whole-stage
        # codegen on this Spark version (see melt's docstring) — the
        # Generate shape keeps the provider's hot stage compiled
        long = melt(
            raw, id_cols, params,
            var_name="input_param", value_name="raw_value",
            codegen_safe=True,
        )
        cleaned = long.withColumn("value", clean_measure(F.col("raw_value"))).withColumn(
            "flags", sentinel_flag(F.col("raw_value"))
        )
        dim = measurand_dim(spark, config_lookup(config, LOOKUP))
        joined = cleaned.join(F.broadcast(dim), on="input_param", how="inner")
        ts = from_local(
            F.col(ts_col),
            meta.get("ts_format", "yyyy-MM-dd HH_mm"),
            meta.get("tz", "America/New_York"),
            int(meta.get("shift_minutes", "-15")),
        )
        hour_ending = int(meta.get("hour_ending_minutes", 0))
        if hour_ending:
            # iqair.js:142: Datetime_start(UTC) + 1h → hour-ending label
            ts = F.timestamp_add("MINUTE", F.lit(hour_ending), ts)
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
        if meta.get("drop_current_hour"):
            # airgradient.js:149-161: "the current hour is always wrong
            # because it's a rolling average" — keep strictly-older hours
            measures = measures.filter(
                F.col("timestamp")
                < F.date_trunc("hour", F.lit(as_of).cast("timestamp"))
            )
        if meta.get("refetch_previous_day"):
            measures = dedup_events(
                measures, ["sensor_id", "timestamp"], "measure"
            )

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
            # geometry tiebreaks same-named sites → deterministic registry
            [
                F.col("sensor_node_site_name").asc_nulls_last(),
                F.col("sensor_node_geometry").asc_nulls_last(),
            ],
        )
        return measures, stations
