"""Explicit StructType schemas — the engine never infers schemas.

Mirrors the reference's fixed, code-declared shapes (SURVEY.md §1.3):
source configs are JSON-Schema-validated (reference ``schema/v1.json``),
station/measure shapes are fixed by class constructors (reference
``fetcher/lib/station.js``, ``fetcher/lib/measure.js``). Here every
table gets a StructType and ingestion casts strictly at the boundary.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Measurement fact rows (reference fetcher/lib/measure.js:6-44)
# ---------------------------------------------------------------------------

#: Fixed-station measure: (sensor_id, measure, timestamp)
#: (reference measure.js:14 — CSV header 'sensor_id,measure,timestamp').
MEASUREMENT_FIXED = T.StructType(
    [
        T.StructField("sensor_id", T.StringType(), False),
        T.StructField("measure", T.DoubleType(), True),
        T.StructField("timestamp", T.TimestampType(), False),
    ]
)

#: Mobile measure adds coordinates (reference measure.js:16, :72-78).
MEASUREMENT_MOBILE = T.StructType(
    list(MEASUREMENT_FIXED.fields)
    + [
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("latitude", T.DoubleType(), True),
    ]
)

#: Some providers attach QC flags (reference providers/clarity.js:163
#: `flags: {'clarity/qc': m.qc}`). We standardize: every cleaned fact can
#: carry a map of flags instead of sentinel values in the measure column.
MEASUREMENT_FLAGGED = T.StructType(
    list(MEASUREMENT_MOBILE.fields)
    + [T.StructField("flags", T.MapType(T.StringType(), T.StringType()), True)]
)

# ---------------------------------------------------------------------------
# Station hierarchy (reference fetcher/lib/station.js:1-174):
# SensorNode -> SensorSystem[] -> Sensor[]
# ---------------------------------------------------------------------------

SENSOR = T.StructType(
    [
        T.StructField("sensor_id", T.StringType(), False),
        T.StructField("measurand_parameter", T.StringType(), True),
        T.StructField("measurand_unit", T.StringType(), True),
    ]
)

SENSOR_SYSTEM = T.StructType(
    [
        T.StructField("sensor_system_id", T.StringType(), False),
        T.StructField("sensor_system_manufacturer_name", T.StringType(), True),
        T.StructField("sensor_system_model_name", T.StringType(), True),
        T.StructField("sensors", T.ArrayType(SENSOR), True),
    ]
)

STATION = T.StructType(
    [
        T.StructField("sensor_node_id", T.StringType(), False),
        T.StructField("sensor_node_site_name", T.StringType(), True),
        T.StructField("sensor_node_source_name", T.StringType(), True),
        # [lon, lat] array — reference station.js:10, purpleair.js:52
        T.StructField("sensor_node_geometry", T.ArrayType(T.DoubleType()), True),
        T.StructField("sensor_node_ismobile", T.BooleanType(), True),
        T.StructField("sensor_node_timezone", T.StringType(), True),
        T.StructField("sensor_node_city", T.StringType(), True),
        T.StructField("sensor_node_country", T.StringType(), True),
        T.StructField("sensor_systems", T.ArrayType(SENSOR_SYSTEM), True),
    ]
)

# ---------------------------------------------------------------------------
# v0.1 JSON sink payload (reference fetcher/lib/providers.js:168-185,
# providers/clarity.js:177-190)
# ---------------------------------------------------------------------------

MEASURES_V01_META = T.StructType(
    [
        T.StructField("schema", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("matching_method", T.StringType(), False),
    ]
)

LOCATION_V01 = T.StructType(
    [
        T.StructField("location", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("ismobile", T.BooleanType(), True),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("lat", T.DoubleType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Measurand lookup dimension (reference fetcher/lib/measurand.js:3-36)
# ---------------------------------------------------------------------------

MEASURAND = T.StructType(
    [
        T.StructField("input_param", T.StringType(), False),
        T.StructField("parameter", T.StringType(), False),
        T.StructField("unit", T.StringType(), False),
        T.StructField("normalized_unit", T.StringType(), False),
        T.StructField("scale", T.DoubleType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Source config (reference schema/v1.json:1-43)
# ---------------------------------------------------------------------------

SOURCE_CONFIG = T.StructType(
    [
        T.StructField("schema", T.StringType(), False),
        T.StructField("provider", T.StringType(), False),
        T.StructField("frequency", T.StringType(), False),  # minute|hour|day
        T.StructField("secretKey", T.StringType(), True),
        T.StructField("active", T.BooleanType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

VALID_FREQUENCIES = ("minute", "hour", "day")

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md / FIXTURES.md §A) — explicit schemas so
# reads never depend on inference and column pruning is exact.
# ---------------------------------------------------------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

#: Multimodal document: opaque payload bytes + typed metadata
#: (north-star — see operators in functions/multimodal.py).
MULTIMODAL = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video|text
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
