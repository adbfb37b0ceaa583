"""Keyed-map provider (the smartsense/airqoon/senstate/purpleair shape,
reference providers/smartsense.js, airqoon.js, senstate.js, ...).

Readings arrive as an object keyed by measurand
(smartsense.js:109-125, airqoon.js:156-159); pipeline: map-entries melt
(R2, explode(map_entries)) → sentinel recode ('inv'/'n/a' → NULL +
flag, NOT -999 — SURVEY.md §2.11 divergence note) → normalize → ISO
timestamps (C5).

Per-provider fidelity is config data, not code forks (the reference
keeps one pipeline per provider file but the deltas are lookup tables
and small row-window policies):

* ``meta.lookup`` — the provider's measurand table verbatim (e.g.
  senstate.js:13-25 maps 'PM10'→pm1 and 'PM100'→pm10 — deliberately);
* ``meta.unit_filter`` — only lookup rows with these raw units
  participate (lovemyair.js:121-122 allowedUnits = ['ug/m3']);
* ``meta.last_sets`` / ``meta.drop_latest_reading`` — keep the last N
  reading sets per device and drop the newest (possibly incomplete)
  one (aernode.js:115-118 slice window);
* ``meta.last_k_per_param`` — keep each sensor's most recent K
  readings (lovemyair.js:127, miri.js:132 slice(-3));
* ``meta.hour_ending_minutes`` — shift timestamps forward to the
  hour-ending convention (aernode.js:119 +60 min);
* rows with a NULL device id are always dropped — the miri listing's
  first element is a metadata object, not a device (miri.js:74).

Config meta: path (JSON lines: device_id, ts, readings map).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cleaning import clean_measure, sentinel_flag
from ..functions.ids import sensor_id
from ..functions.timestamps import from_iso
from ..measurands import measurand_dim
from ..operators.dedup import first_per_key
from ..operators.reshape import explode_map
from ..sources.files import read_json
from ..config import config_lookup, source_label
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


def transform_measures(
    raw: DataFrame,
    dim: DataFrame,
    provider: str,
    meta: dict[str, Any] | None = None,
) -> DataFrame:
    """The pure dataflow: raw keyed-map rows → normalized measures.

    Batch/streaming agnostic — every step is a narrow DataFrame
    transformation (melt, broadcast join, scalar exprs), so the same
    function runs on ``spark.read`` and ``spark.readStream`` inputs
    (see streaming/provider_stream.py). The ONE shared implementation
    carries the per-provider quirks (hour-ending shift; the bounded
    last-K windows are batch-only and applied by the caller) so batch
    and streaming never diverge on a provider's semantics.
    """
    melted = explode_map(raw, "readings", key_name="input_param", value_name="raw_value")
    return normalize_melted(melted, dim, provider, meta)


def normalize_melted(
    melted: DataFrame,
    dim: DataFrame,
    provider: str,
    meta: dict[str, Any] | None = None,
) -> DataFrame:
    """Melted (device_id, ts, lat, lon, input_param, raw_value) rows →
    normalized measures. The single normalization implementation both
    the batch and streaming paths call — per-provider semantics live
    here and in the config-driven ``dim``, never in a path-local copy."""
    meta = meta or {}
    joined = melted.join(F.broadcast(dim), on="input_param", how="inner")
    ts = from_iso(F.col("ts"))
    shift = int(meta.get("hour_ending_minutes", 0))
    if shift:
        # aernode.js:119: time + 60 min → hour-ending label
        ts = F.timestamp_add("MINUTE", F.lit(shift), ts)
    return joined.select(
        sensor_id(F.lit(provider), F.col("device_id"), F.col("parameter")).alias(
            "sensor_id"
        ),
        (clean_measure(F.col("raw_value")) * F.col("scale")).alias("measure"),
        ts.alias("timestamp"),
        F.col("lon").alias("longitude"),
        F.col("lat").alias("latitude"),
        sentinel_flag(F.col("raw_value")).alias("flags"),
    ).filter(F.col("measure").isNotNull() | F.col("flags").isNotNull())


def provider_dim(spark: SparkSession, config: dict[str, Any]) -> DataFrame:
    """Config-driven measurand dimension shared by the batch and
    streaming paths: per-provider lookup + unit allowlist."""
    meta = config.get("meta", {})
    lookup = config_lookup(config, LOOKUP)
    unit_filter = meta.get("unit_filter")
    if unit_filter:
        # lovemyair.js:121-122: parameters whose reported units are
        # not allowlisted are never fetched
        lookup = tuple(r for r in lookup if r[2] in set(unit_filter))
    return measurand_dim(spark, lookup)


def _apply_row_windows(raw: DataFrame, meta: dict[str, Any]) -> DataFrame:
    """Per-device reading-set policies, expressed as rank windows.

    A "reading set" is one raw row (one device_id+ts with its readings
    map), the Spark twin of the reference's per-station measurement
    batch. Windows partition by device — bounded cardinality per
    device (providers report minutes-to-hours of history), so no
    skewed global shuffle at scale.
    """
    last_sets = int(meta.get("last_sets", 0))
    drop_latest = bool(meta.get("drop_latest_reading", False))
    if last_sets or drop_latest:
        w = Window.partitionBy("device_id").orderBy(F.col("ts").desc())
        ranked = raw.withColumn("_set_rank", F.dense_rank().over(w))
        # aernode.js:116 keeps the trailing parametersCount*3 rows
        # (3 sets), then :118 slice(0, -parametersCount) drops the
        # newest set — the running, incomplete one.
        if last_sets:
            ranked = ranked.filter(F.col("_set_rank") <= F.lit(last_sets))
        if drop_latest:
            ranked = ranked.filter(F.col("_set_rank") > F.lit(1))
        raw = ranked.drop("_set_rank")
    return raw


def _apply_param_window(melted: DataFrame, meta: dict[str, Any]) -> DataFrame:
    last_k = int(meta.get("last_k_per_param", 0))
    if not last_k:
        return melted
    # lovemyair.js:127 / miri.js:132: slice(-3) of each sensor's
    # measurement list — most recent K readings per (device, param).
    # raw_value tiebreaks same-timestamp readings (overlapping re-reads)
    # so the survivor set is deterministic under retries/re-plans.
    w = Window.partitionBy("device_id", "input_param").orderBy(
        F.col("ts").desc(), F.col("raw_value").asc()
    )
    return (
        melted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.lit(last_k))
        .drop("_rn")
    )


@register
class KeyedMapProvider(Provider):
    name = "keyed_map"

    def process(
        self, spark: SparkSession, config: dict[str, Any]
    ) -> tuple[DataFrame, DataFrame]:
        meta = config.get("meta", {})
        raw = read_json(spark, meta["path"], RAW_SCHEMA)
        # miri.js:74: listing element 0 is metadata, not a device
        raw = raw.filter(F.col("device_id").isNotNull())

        # stations come from the device listing BEFORE any reading-set
        # slicing (the reference registers stations independently of
        # measurement windows, aernode.js:104-113) — a device whose only
        # set is the dropped newest one still registers
        stations = first_per_key(
            raw.select(
                F.col("device_id").alias("sensor_node_id"),
                F.lit(source_label(config)).alias("sensor_node_source_name"),
                F.array(F.col("lon"), F.col("lat")).alias("sensor_node_geometry"),
                F.lit(False).alias("sensor_node_ismobile"),
            ),
            ["sensor_node_id"],
            # geometry is the tiebreak — a device reporting two positions
            # (GPS drift) must register deterministically or diff_upsert
            # sees a different content_hash every run
            [F.col("sensor_node_geometry").asc_nulls_last()],
        )

        windowed = _apply_row_windows(raw, meta)
        # melt → bounded last-K per (device, param) → the SAME
        # normalization the streaming path runs (normalize_melted)
        melted = explode_map(
            windowed, "readings", key_name="input_param", value_name="raw_value"
        )
        melted = _apply_param_window(melted, meta)
        measures = normalize_melted(
            melted, provider_dim(spark, config), source_label(config), meta
        )
        return measures, stations
