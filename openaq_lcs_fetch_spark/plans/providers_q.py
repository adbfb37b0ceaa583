"""Provider-pipeline driver proof (SURVEY.md §2.10) — the wide-CSV
(CMU) shape run END-TO-END through the REAL ``providers.processor``
dispatch on a deterministic in-query fixture, hash-verified against a
DuckDB oracle that reproduces every transform in pure SQL.

Why this exists: the 16 provider configs are pinned by per-config
pytest fidelity tests, but §2.10 had no driver-replayed cross-engine
proof — the melt, the sentinel recode, the comma-grouped coercion, the
broadcast measurand join with unit scaling, the local-time parse with
tz + fixed shift (the cmu.js:183-220 semantics, including the DST
split: a June row lands EDT/UTC-4, a December row EST/UTC-5), and the
first-wins station registry were only asserted in Python. Here the
oracle recomputes the same 7 output rows from a VALUES table with
DuckDB's own regexes, CASE sentinel handling and icu timezone
conversion — two engines, two implementations, one answer.

The fixture is written to a throwaway CSV because that IS the shape's
ingest boundary (S4: the raw feed is stringly CSV); the result is
localCheckpoint()-ed so nothing lazy points at the deleted file.
Reference anchors: cmu.js:169-177 (melt), cmu.js:171 ('NaN' skip),
airqoon.js:93 (comma grouping), measurand.js:19-28 (ppb→ppm ÷1000),
cmu.js:183-220 (tz parse − 15 min), cmu.js:143-166 (station dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..localdf import local_df
from .registry import query

#: (station, site, local ts 'yyyy-MM-dd HH_mm', lat, lon, CO, NO2) —
#: covers: plain number, sentinel 'NaN'/'inv' (flag rows kept with
#: NULL measure), comma-grouped '1,234.5', an empty cell (NULL at the
#: CSV boundary — the row drops entirely), and an EDT + an EST local
#: time so the tz parse is proven on both DST phases.
_RAW_ROWS = (
    ("st1", "Site A", "2024-06-01 10_00", "40.1", "-75.2", "400", "NaN"),
    ("st1", "Site A", "2024-06-01 11_00", "40.1", "-75.2", "1,234.5", "12"),
    ("st2", "Site B", "2024-06-01 10_00", "41.0", "-76.0", "inv", "7"),
    ("st2", "Site B", "2024-12-01 09_30", "41.0", "-76.0", "8.25", ""),
)

_PROVIDER_FLOW_ORACLE = r"""
WITH raw(station, site, ts, lat, lon, co, no2) AS (
  VALUES
    ('st1', 'Site A', '2024-06-01 10_00', '40.1', '-75.2', '400', 'NaN'),
    ('st1', 'Site A', '2024-06-01 11_00', '40.1', '-75.2', '1,234.5', '12'),
    ('st2', 'Site B', '2024-06-01 10_00', '41.0', '-76.0', 'inv', '7'),
    ('st2', 'Site B', '2024-12-01 09_30', '41.0', '-76.0', '8.25', '')
),
long AS (
  SELECT station, ts, 'CO' AS input_param, co AS raw_value FROM raw
  UNION ALL
  SELECT station, ts, 'NO2', no2 FROM raw
),
dim(input_param, parameter, scale) AS (
  VALUES ('CO', 'co', 0.001), ('NO2', 'no2', 0.001)
),
cleaned AS (
  -- the CSV scan boundary reads an empty cell as NULL (Spark's
  -- nullValue default), so '' never reaches the sentinel check: a
  -- NULL raw value has neither measure nor flag and the row drops
  SELECT station, ts, input_param,
    CASE
      WHEN raw_value IN ('NaN', 'n/a', 'inv', 'null', 'undefined')
        THEN NULL
      WHEN regexp_matches(raw_value, '^[+-]?\d{1,3}(,\d{3})+(\.\d*)?$')
        THEN CAST(replace(raw_value, ',', '') AS DOUBLE)
      WHEN regexp_matches(raw_value,
                          '^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$')
        THEN CAST(raw_value AS DOUBLE)
      ELSE NULL
    END AS value,
    CASE
      WHEN raw_value IN ('NaN', 'n/a', 'inv', 'null', 'undefined')
        THEN raw_value
      ELSE NULL
    END AS sentinel
  FROM long
)
SELECT
  'cmu_fixture-' || c.station || '-' || d.parameter AS sensor_id,
  c.value * d.scale AS measure,
  strftime(
    timezone('UTC',
             timezone('America/New_York',
                      strptime(c.ts, '%Y-%m-%d %H_%M')))
      - INTERVAL 15 MINUTE,
    '%Y-%m-%dT%H:%M:%SZ'
  ) AS ts_iso,
  c.sentinel,
  CAST(2 AS BIGINT) AS n_stations
FROM cleaned c JOIN dim d USING (input_param)
WHERE c.value IS NOT NULL OR c.sentinel IS NOT NULL
"""


@query("provider_pipeline_flow", _PROVIDER_FLOW_ORACLE)
def provider_pipeline_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..providers import processor

    root = tempfile.mkdtemp(prefix="sgq_provider_flow_")
    try:
        path = os.path.join(root, "wide.csv")
        with open(path, "w") as fh:
            fh.write("Anon_Name,Site_Name,Timestamp,Lat,Lon,CO,NO2\n")
            for st, site, ts, lat, lon, co, no2 in _RAW_ROWS:
                co_q = f'"{co}"' if "," in co else co
                fh.write(f"{st},{site},{ts},{lat},{lon},{co_q},{no2}\n")
        config = {
            "schema": "v1",
            "provider": "wide_csv",
            "frequency": "hour",
            "active": True,
            "meta": {
                "path": path,
                "params": "CO,NO2",
                "lookup": [["CO", "co", "ppb"], ["NO2", "no2", "ppb"]],
                "source_name": "cmu_fixture",
            },
        }
        measures, stations = processor(spark, config)
        out = (
            measures.select(
                "sensor_id",
                "measure",
                F.date_format(
                    "timestamp", "yyyy-MM-dd'T'HH:mm:ss'Z'"
                ).alias("ts_iso"),
                F.col("flags")["qc/sentinel"].alias("sentinel"),
            )
            .crossJoin(
                F.broadcast(
                    stations.agg(
                        F.count(F.lit(1)).cast("long").alias("n_stations")
                    )
                )
            )
            .localCheckpoint()  # eager: frees the temp CSV below
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# provider_zip_arrays_flow — the parallel-arrays (purpleair) shape:
# {fields[], data[][]} zip-decoded into record maps (R4), melted over
# the lookup params with null skip (R1/F6), coerced (no sentinel step
# on this path — non-numeric simply drops), unit-scaled (µg/m³ ×1,
# pp100ml ×0.01, pa ×0.01, 'f' passthrough), unix-seconds timestamps
# (C5), stations first-wins on the station field. The oracle melts the
# same records from a VALUES table — a wrong zip (field/value
# misalignment) would scramble every value and fail the hash.
# Reference anchors: purpleair.js:127-143 (fields/data), :58-76 (per-
# measurand skip), :73 (unix seconds), measurand.js:19-28 (scales).
# ---------------------------------------------------------------------------

_ZIP_FLOW_ORACLE = r"""
WITH rec(station, ts_unix, lat, lon, pm25_raw, um_raw, press_raw, temp_raw) AS (
  VALUES
    ('pa1', 1717243200, '40.5', '-75.5', '12.5', '250', '101325', '72.5'),
    ('pa2', 1717246800, '41.0', '-76.0', '8.75', '100', '100000', '68'),
    ('pa1', 1717250400, '40.5', '-75.5', 'abc', NULL, '99900', '70')
),
long AS (
  SELECT station, ts_unix, lat, lon,
         'pm2.5_atm' AS input_param, pm25_raw AS raw_value FROM rec
  UNION ALL SELECT station, ts_unix, lat, lon, '0.3_um_count', um_raw FROM rec
  UNION ALL SELECT station, ts_unix, lat, lon, 'pressure', press_raw FROM rec
  UNION ALL SELECT station, ts_unix, lat, lon, 'temperature', temp_raw FROM rec
),
dim(input_param, parameter, scale) AS (
  VALUES ('pm2.5_atm', 'pm25', 1.0), ('0.3_um_count', 'um003', 0.01),
         ('pressure', 'pressure', 0.01), ('temperature', 'temperature', 1.0)
),
coerced AS (
  SELECT station, ts_unix, lat, lon, input_param,
    CASE
      WHEN regexp_matches(raw_value, '^[+-]?\d{1,3}(,\d{3})+(\.\d*)?$')
        THEN CAST(replace(raw_value, ',', '') AS DOUBLE)
      WHEN regexp_matches(raw_value,
                          '^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$')
        THEN CAST(raw_value AS DOUBLE)
      ELSE NULL
    END AS value
  FROM long WHERE raw_value IS NOT NULL
)
SELECT
  'zip_fixture-' || c.station || '-' || d.parameter AS sensor_id,
  c.value * d.scale AS measure,
  strftime(make_timestamp(CAST(c.ts_unix AS BIGINT) * 1000000),
           '%Y-%m-%dT%H:%M:%SZ') AS ts_iso,
  CAST(c.lon AS DOUBLE) AS longitude,
  CAST(c.lat AS DOUBLE) AS latitude,
  CAST(2 AS BIGINT) AS n_stations
FROM coerced c JOIN dim d USING (input_param)
WHERE c.value IS NOT NULL
"""


@query("provider_zip_arrays_flow", _ZIP_FLOW_ORACLE)
def provider_zip_arrays_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from ..providers import processor

    root = tempfile.mkdtemp(prefix="sgq_zipflow_")
    try:
        path = os.path.join(root, "feed.json")
        fields = [
            "sensor_index", "last_seen", "latitude", "longitude",
            "pm2.5_atm", "0.3_um_count", "pressure", "temperature",
        ]
        data = [
            ["pa1", "1717243200", "40.5", "-75.5", "12.5", "250", "101325", "72.5"],
            ["pa2", "1717246800", "41.0", "-76.0", "8.75", "100", "100000", "68"],
            ["pa1", "1717250400", "40.5", "-75.5", "abc", None, "99900", "70"],
        ]
        with open(path, "w") as fh:
            fh.write(_json.dumps({"fields": fields, "data": data}) + "\n")
        config = {
            "schema": "v1",
            "provider": "zip_arrays",
            "frequency": "hour",
            "active": True,
            "meta": {
                "path": path,
                "lookup": [
                    ["pm2.5_atm", "pm25", "µg/m³"],
                    ["0.3_um_count", "um003", "pp100ml"],
                    ["pressure", "pressure", "pa"],
                    ["temperature", "temperature", "f"],
                ],
                "source_name": "zip_fixture",
            },
        }
        measures, stations = processor(spark, config)
        out = (
            measures.select(
                "sensor_id",
                "measure",
                F.date_format(
                    "timestamp", "yyyy-MM-dd'T'HH:mm:ss'Z'"
                ).alias("ts_iso"),
                "longitude",
                "latitude",
            )
            .crossJoin(
                F.broadcast(
                    stations.agg(
                        F.count(F.lit(1)).cast("long").alias("n_stations")
                    )
                )
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# provider_keyed_map_flow — the keyed-map (smartsense/aernode/miri)
# shape with its bounded row-window policies: readings arrive as an
# object keyed by measurand (R2 map-entries melt), the newest —
# possibly incomplete — reading set is dropped and only the last
# ``last_sets`` survive (aernode.js:115-118 slice window, expressed as
# a per-device dense_rank), sentinels recode to NULL + flag (NOT -999,
# §2.11), and stations register from the device listing BEFORE any
# slicing — a device whose only set was dropped still registers
# (aernode.js:104-113). The oracle reproduces the dense_rank window in
# SQL, so both the slicing AND the station-before-slicing contract are
# cross-engine-proven. A NULL device id row (the miri.js:74 metadata
# element) is dropped everywhere.
# ---------------------------------------------------------------------------

_KEYED_FLOW_ORACLE = r"""
WITH raw(device_id, ts, input_param, raw_value) AS (
  VALUES
    ('dev1', '2024-06-01T10:00:00', 'pm25', '15.5'),
    ('dev1', '2024-06-01T11:00:00', 'pm25', '16.5'),
    ('dev1', '2024-06-01T11:00:00', 'co', '250'),
    ('dev1', '2024-06-01T11:00:00', 'temp', 'inv'),
    ('dev1', '2024-06-01T12:00:00', 'pm25', '17.5'),
    ('dev2', '2024-06-01T12:00:00', 'pm10', '30')
),
sets AS (
  SELECT device_id, ts,
         dense_rank() OVER (PARTITION BY device_id ORDER BY ts DESC) AS r
  FROM (SELECT DISTINCT device_id, ts FROM raw)
),
kept AS (  -- last_sets=2 keeps r<=2; drop_latest_reading drops r=1
  SELECT raw.* FROM raw
  JOIN sets USING (device_id, ts)
  WHERE sets.r <= 2 AND sets.r > 1
),
dim(input_param, parameter, scale) AS (
  VALUES ('pm25', 'pm25', 1.0), ('co', 'co', 0.001),
         ('temp', 'temperature', 1.0), ('pm10', 'pm10', 1.0)
),
cleaned AS (
  SELECT device_id, ts, input_param,
    CASE
      WHEN raw_value IN ('', 'NaN', 'n/a', 'inv', 'null', 'undefined')
        THEN NULL
      WHEN regexp_matches(raw_value, '^[+-]?\d{1,3}(,\d{3})+(\.\d*)?$')
        THEN CAST(replace(raw_value, ',', '') AS DOUBLE)
      WHEN regexp_matches(raw_value,
                          '^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$')
        THEN CAST(raw_value AS DOUBLE)
      ELSE NULL
    END AS value,
    CASE
      WHEN raw_value IN ('', 'NaN', 'n/a', 'inv', 'null', 'undefined')
        THEN raw_value
      ELSE NULL
    END AS sentinel
  FROM kept
)
SELECT
  'keyed_fixture-' || c.device_id || '-' || d.parameter AS sensor_id,
  c.value * d.scale AS measure,
  strftime(CAST(c.ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%SZ') AS ts_iso,
  c.sentinel,
  CAST(2 AS BIGINT) AS n_stations
FROM cleaned c JOIN dim d USING (input_param)
WHERE c.value IS NOT NULL OR c.sentinel IS NOT NULL
"""


@query("provider_keyed_map_flow", _KEYED_FLOW_ORACLE)
def provider_keyed_map_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from ..providers import processor

    rows = [
        {"device_id": "dev1", "ts": "2024-06-01T10:00:00", "lat": 40.0,
         "lon": -75.0, "readings": {"pm25": "15.5"}},
        {"device_id": "dev1", "ts": "2024-06-01T11:00:00", "lat": 40.0,
         "lon": -75.0,
         "readings": {"pm25": "16.5", "co": "250", "temp": "inv"}},
        {"device_id": "dev1", "ts": "2024-06-01T12:00:00", "lat": 40.0,
         "lon": -75.0, "readings": {"pm25": "17.5"}},
        {"device_id": "dev2", "ts": "2024-06-01T12:00:00", "lat": 41.0,
         "lon": -76.0, "readings": {"pm10": "30"}},
        # miri.js:74 — the listing's metadata element, not a device
        {"device_id": None, "ts": "2024-06-01T12:00:00", "lat": 0.0,
         "lon": 0.0, "readings": {"pm25": "99"}},
    ]
    root = tempfile.mkdtemp(prefix="sgq_keyedflow_")
    try:
        path = os.path.join(root, "devices.jsonl")
        with open(path, "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")
        config = {
            "schema": "v1",
            "provider": "keyed_map",
            "frequency": "hour",
            "active": True,
            "meta": {
                "path": path,
                "lookup": [
                    ["pm25", "pm25", "µg/m³"],
                    ["co", "co", "ppb"],
                    ["temp", "temperature", "c"],
                    ["pm10", "pm10", "µg/m³"],
                ],
                "last_sets": 2,
                "drop_latest_reading": True,
                "source_name": "keyed_fixture",
            },
        }
        measures, stations = processor(spark, config)
        out = (
            measures.select(
                "sensor_id",
                "measure",
                F.date_format(
                    "timestamp", "yyyy-MM-dd'T'HH:mm:ss'Z'"
                ).alias("ts_iso"),
                F.col("flags")["qc/sentinel"].alias("sentinel"),
            )
            .crossJoin(
                F.broadcast(
                    stations.agg(
                        F.count(F.lit(1)).cast("long").alias("n_stations")
                    )
                )
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# provider_enriched_flow — the enriched-measurements (clarity) shape,
# the reference's most involved pipeline: flat JSON rows enriched
# against a datasource dimension via broadcast left join with a
# DISTINCT miss side-output (J2, clarity.js:63-108 + :51-56 —
# emitted here as an output column, so the miss report itself is
# cross-engine-proven), QC codes riding as a flags map with the value
# untouched (clarity.js:163), measurand scaling, ingest-id sensor keys
# (J3). Unlisted characteristics drop at the measurand join; rows
# whose datasource misses drop from measures but count in the report.
# ---------------------------------------------------------------------------

_ENRICHED_FLOW_ORACLE = r"""
WITH raw(measurement_id, datasource_id, ts, lat, lon, characteristic,
         value, qc) AS (
  VALUES
    ('m1', 'ds1', '2024-06-01T10:00:00', 40.0, -75.0, 'pm2_5ConcMass',
     12.5, ''),
    ('m2', 'ds1', '2024-06-01T11:00:00', 40.0, -75.0, 'no2Conc',
     30.0, 'flagged'),
    ('m3', 'ds2', '2024-06-01T10:30:00', 41.0, -76.0, 'pm2_5ConcMass',
     9.0, NULL),
    ('m4', 'dsX', '2024-06-01T10:00:00', 42.0, -77.0, 'pm2_5ConcMass',
     1.0, NULL),
    ('m5', 'ds2', '2024-06-01T10:45:00', 41.0, -76.0, 'windSpeed',
     3.0, NULL)
),
ds(datasource_id, datasource_name) AS (
  VALUES ('ds1', 'Alpha Site'), ('ds2', 'Beta Site')
),
dim(input_param, parameter, scale) AS (
  VALUES ('pm2_5ConcMass', 'pm25', 1.0), ('no2Conc', 'no2', 0.001)
),
misses AS (
  SELECT COUNT(DISTINCT r.datasource_id) AS n
  FROM raw r LEFT JOIN ds USING (datasource_id)
  WHERE ds.datasource_name IS NULL
)
SELECT
  ds.datasource_name || '-' || r.datasource_id || '-' || d.parameter
    AS sensor_id,
  r.value * d.scale AS measure,
  strftime(CAST(r.ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%SZ') AS ts_iso,
  CASE WHEN r.qc IS NOT NULL AND r.qc <> '' THEN r.qc END AS qc,
  CAST(2 AS BIGINT) AS n_stations,
  (SELECT CAST(n AS BIGINT) FROM misses) AS n_misses
FROM raw r
JOIN ds USING (datasource_id)
JOIN dim d ON r.characteristic = d.input_param
"""


@query("provider_enriched_flow", _ENRICHED_FLOW_ORACLE)
def provider_enriched_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from ..providers.base import REGISTRY

    rows = [
        {"measurement_id": "m1", "datasource_id": "ds1",
         "ts": "2024-06-01T10:00:00", "lat": 40.0, "lon": -75.0,
         "characteristic": "pm2_5ConcMass", "value": 12.5, "qc": ""},
        {"measurement_id": "m2", "datasource_id": "ds1",
         "ts": "2024-06-01T11:00:00", "lat": 40.0, "lon": -75.0,
         "characteristic": "no2Conc", "value": 30.0, "qc": "flagged"},
        {"measurement_id": "m3", "datasource_id": "ds2",
         "ts": "2024-06-01T10:30:00", "lat": 41.0, "lon": -76.0,
         "characteristic": "pm2_5ConcMass", "value": 9.0, "qc": None},
        # dsX: no datasource row → dropped from measures, counted in
        # the miss report
        {"measurement_id": "m4", "datasource_id": "dsX",
         "ts": "2024-06-01T10:00:00", "lat": 42.0, "lon": -77.0,
         "characteristic": "pm2_5ConcMass", "value": 1.0, "qc": None},
        # windSpeed: unlisted characteristic → dropped at the
        # measurand join (clarity accepts a fixed characteristic set)
        {"measurement_id": "m5", "datasource_id": "ds2",
         "ts": "2024-06-01T10:45:00", "lat": 41.0, "lon": -76.0,
         "characteristic": "windSpeed", "value": 3.0, "qc": None},
    ]
    root = tempfile.mkdtemp(prefix="sgq_enrichedflow_")
    try:
        mpath = os.path.join(root, "measurements.jsonl")
        dpath = os.path.join(root, "datasources.jsonl")
        with open(mpath, "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")
        with open(dpath, "w") as fh:
            fh.write(_json.dumps(
                {"datasource_id": "ds1", "datasource_name": "Alpha Site"}
            ) + "\n")
            fh.write(_json.dumps(
                {"datasource_id": "ds2", "datasource_name": "Beta Site"}
            ) + "\n")
        config = {
            "schema": "v1",
            "provider": "enriched",
            "frequency": "hour",
            "active": True,
            "meta": {
                "path": mpath,
                "datasources_path": dpath,
                "lookup": [
                    ["pm2_5ConcMass", "pm25", "µg/m³"],
                    ["no2Conc", "no2", "ppb"],
                ],
                "source_name": "enriched_fixture",
            },
        }
        measures, stations, misses = REGISTRY["enriched"].process_with_misses(
            spark, config
        )
        out = (
            measures.select(
                "sensor_id",
                "measure",
                F.date_format(
                    "timestamp", "yyyy-MM-dd'T'HH:mm:ss'Z'"
                ).alias("ts_iso"),
                F.col("flags")["enriched/qc"].alias("qc"),
            )
            .crossJoin(
                F.broadcast(
                    stations.agg(
                        F.count(F.lit(1)).cast("long").alias("n_stations")
                    )
                )
            )
            .crossJoin(
                F.broadcast(
                    misses.agg(
                        F.count(F.lit(1)).cast("long").alias("n_misses")
                    )
                )
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# provider_mobile_flow — the mobile-measures (habitatmap) shape: the
# PAGINATED source with per-reading coordinates, read through the real
# read_paginated fetcher machinery (3 pages, 2-row overlap per page —
# the 2-minute sliding re-read duplicate pattern, habitatmap.js:
# 128-136), a time-range predicate with the no-future guard (F1,
# utils.js:180-209), (sensor, ts) dedup of the overlap duplicates
# (T4), and mobile stations from the bounded session listing. The
# oracle regenerates the offline fetcher's deterministic stream with
# range()/unnest and applies the same bounds — page-overlap duplicates
# collapse under DISTINCT seq exactly as dedup_events collapses them.
# ---------------------------------------------------------------------------

_MOBILE_FLOW_ORACLE = r"""
WITH seqs AS (
  SELECT DISTINCT CAST(s AS BIGINT) AS seq FROM (
    SELECT unnest(range(0, 8)) AS s
    UNION ALL SELECT unnest(range(6, 16))
    UNION ALL SELECT unnest(range(14, 24))
  )
),
rows AS (
  SELECT
    'sess-' || (seq % 3) AS session,
    make_timestamp((1700000000 + 30 * seq) * 1000000) AS ts,
    40.0 + (seq % 50) / 100.0 AS lat,
    -80.0 - (seq % 50) / 100.0 AS lon,
    CASE WHEN seq % 2 = 0 THEN 'pm25' ELSE 'rh' END AS param,
    ROUND(8.0 + (seq * 13 % 40) / 4.0, 2) AS value,
    seq
  FROM seqs
)
SELECT
  'mobile_fixture-' || session || '-' || param AS sensor_id,
  value AS measure,
  strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_iso,
  lon AS longitude,
  lat AS latitude,
  CAST(3 AS BIGINT) AS n_stations
FROM rows
WHERE seq BETWEEN 2 AND 21  -- start = seq-2 ts, no-future 'now' = seq-21 ts
"""


@query("provider_mobile_flow", _MOBILE_FLOW_ORACLE)
def provider_mobile_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..providers import processor

    config = {
        "schema": "v1",
        "provider": "mobile",
        "frequency": "minute",
        "active": True,
        "meta": {
            "pages": "3",
            "page_size": "8",
            # seq 2 → 1700000060 → 2023-11-14T22:14:20Z;
            # seq 21 → 1700000630 → 2023-11-14T22:23:50Z
            "start": "2023-11-14T22:14:20",
            "now": "2023-11-14T22:23:50",
            "source_name": "mobile_fixture",
        },
    }
    measures, stations = processor(spark, config)
    return (
        measures.select(
            "sensor_id",
            "measure",
            F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
                "ts_iso"
            ),
            "longitude",
            "latitude",
        )
        .crossJoin(
            F.broadcast(
                stations.agg(
                    F.count(F.lit(1)).cast("long").alias("n_stations")
                )
            )
        )
    )


# ---------------------------------------------------------------------------
# backfill_flow — the two-phase historical backfill (S3: token-
# paginated DESCENDING listing with the sorted early-exit bound, then
# executor-side per-file fetch) driven end-to-end through the REAL
# read_backfill machinery on the deterministic offline fetcher.
# Reference anchors: cmu.js:246-274 (listObjects token loop),
# cmu.js:260-264 (descending names → stop at the checkpoint),
# cmu.js:126-186 (processFile), cmu.js:90-91 (greatest name → next
# checkpoint). The oracle regenerates the fetcher's arithmetic with
# range(): 7 of 10 files survive the since bound (06-04 .. 06-10),
# 3 hourly rows each, value = 10 + hour + day — if the early-exit
# leaked extra files (30 rows) or the executor fetch dropped one, the
# counts and sums break. The greatest listing name rides along as the
# next-checkpoint column.
# ---------------------------------------------------------------------------

_BACKFILL_ORACLE = r"""
WITH g AS (
  SELECT d, h
  FROM (SELECT unnest(range(4, 11)) AS d)
  CROSS JOIN (SELECT unnest(range(0, 3)) AS h)
),
rows AS (
  SELECT d, h, 10.0 + h + d AS value,
         '2024-06-' || lpad(CAST(d AS VARCHAR), 2, '0') || 'T'
           || lpad(CAST(h AS VARCHAR), 2, '0') || ':00:00' AS ts
  FROM g
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(DISTINCT d) AS BIGINT) AS n_days,
  CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
  MIN(ts) AS first_ts,
  MAX(ts) AS last_ts,
  'readings-2024-06-10' AS greatest
FROM rows
"""


@query("backfill_flow", _BACKFILL_ORACLE)
def backfill_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.http import read_backfill

    df, greatest = read_backfill(
        spark,
        lister="openaq_lcs_fetch_spark.sources.fetchers:daily_file_listing",
        file_fetcher="openaq_lcs_fetch_spark.sources.fetchers:daily_file_rows",
        schema_ddl="station string, ts string, value double",
        since="readings-2024-06-04",  # checkpoint: days 01-03 done
        files_per_task=2,
        n_files="10",
        page_size="4",
        rows_per_file="3",
    )
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct(F.substring("ts", 1, 10)).cast("long").alias("n_days"),
        # cents are integers after the round — exact, order-independent
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("long")
        .alias("sum_cents"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    ).select(
        "n_rows", "n_days", "sum_cents", "first_ts", "last_ts",
        F.lit(greatest).alias("greatest"),
    )


# ---------------------------------------------------------------------------
# retry_backoff_flow — X2's per-call retry driven end-to-end as a
# driver proof (previously pytest-only: the flaky fetcher + the
# with_retries path through the PySpark DataSource). Every page's
# first TWO fetch calls raise a transient ConnectionError on the
# worker; with_retries (fetcher/lib/utils.js:14-16 maxRetries, our
# sources/retry.py) absorbs them with deterministic backoff and the
# scan still returns every row exactly once. The attempt counters are
# VERIFIED columns: each page's counter file must read exactly
# fail_times (the fault genuinely fired, then stopped), the row count
# proves no retry duplicated or dropped a page, and the pm25 checksum
# pins the payload. Oracle regenerates the synthetic fetcher's
# arithmetic with range() — 4 pages x 5 rows, station = seq % 7,
# pm25 = 5.0 + (seq*37 % 100)/10.
# ---------------------------------------------------------------------------

_RETRY_ORACLE = """
WITH seq AS (SELECT unnest(range(0, 20)) AS s)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(DISTINCT s % 7) AS BIGINT) AS n_stations,
  CAST(SUM(CAST(ROUND((5.0 + (s * 37 % 100) / 10.0) * 10, 0) AS BIGINT))
    AS BIGINT) AS pm25_decis,
  CAST(4 AS BIGINT) AS n_pages_faulted,
  CAST(8 AS BIGINT) AS transient_failures,
  TRUE AS all_recovered
FROM seq
"""


@query("retry_backoff_flow", _RETRY_ORACLE)
def retry_backoff_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import shutil
    import tempfile

    from ..sources.http import register as register_http

    register_http(spark)
    cdir = tempfile.mkdtemp(prefix="sgq_retry_")
    try:
        scan = (
            spark.read.format("paginated_http")
            .schema(
                "station string, unix_ts long, pm25 double, "
                "temperature double"
            )
            .option(
                "fetcher",
                "openaq_lcs_fetch_spark.sources.fetchers:flaky_readings",
            )
            .option("pages", "4")
            .option("page_size", "5")
            .option("fail_times", "2")
            .option("counter_dir", cdir)
            .load()
        )
        # one bounded collect (1 row) — the scan must EXECUTE before
        # the counters are read, and the counters are driver-side
        agg = scan.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("station").cast("long").alias("n_stations"),
            # one-decimal values: x10 + round is exact in both engines
            F.sum(F.round(F.col("pm25") * 10, 0).cast("long"))
            .cast("long")
            .alias("pm25_decis"),
        ).collect()[0]
        counters = sorted(glob.glob(f"{cdir}/page_*"))
        fails = [int(open(c).read()) for c in counters]
    finally:
        shutil.rmtree(cdir, ignore_errors=True)
    return local_df(spark, 
        [(
            agg["n_rows"],
            agg["n_stations"],
            agg["pm25_decis"],
            len(counters),
            sum(fails),
            all(f == 2 for f in fails) and len(counters) == 4,
        )],
        "n_rows long, n_stations long, pm25_decis long, "
        "n_pages_faulted long, transient_failures long, "
        "all_recovered boolean",
    )


# ---------------------------------------------------------------------------
# secrets_merge_flow — S6's out-of-band config merge as a fixture
# query (previously pytest-only). The reference fetches a
# SecretsManager document named by config.secretKey and spreads it
# into the source config before dispatch (fetchSecret
# fetcher/lib/utils.js:90-122; merge fetcher/lib/providers.js:42-45);
# locally the store is the environment (SECRET_{key} holds JSON).
# Three contract cases as rows: (1) merged — secret values WIN over
# config meta, config-only keys survive; (2) no_key — a config
# without secretKey passes through untouched; (3) missing_secret —
# a named-but-absent secret raises, surfaced as an error row. The
# KeyError is an intentional local hardening OVER the reference:
# its fetchSecret swallows the lookup error (.catch → {}) and
# dispatches without the secret, deferring failure to the auth'd
# fetch — here the missing secret fails loud by name at merge time.
# Pure driver-side fixture:
# the oracle is the expected merge output as VALUES.
# ---------------------------------------------------------------------------

_SECRETS_ORACLE = """
SELECT * FROM (VALUES
  ('merged', 'api_key', 'fixture-key-123'),
  ('merged', 'endpoint', 'https://sensors.example.test/v2'),
  ('merged', 'page_size', '50'),
  ('no_key', 'endpoint', 'https://sensors.example.test/v1'),
  ('no_key', 'page_size', '50'),
  ('missing_secret', 'error', 'KeyError')
) t(kase, key, value)
"""


@query("secrets_merge_flow", _SECRETS_ORACLE)
def secrets_merge_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os

    from ..sources.secrets import merge_secret

    base_meta = {
        "endpoint": "https://sensors.example.test/v1",
        "page_size": "50",
    }
    rows: list[tuple[str, str, str]] = []
    os.environ["SECRET_fixture_token"] = json.dumps(
        {"api_key": "fixture-key-123",
         "endpoint": "https://sensors.example.test/v2"}
    )
    try:
        merged = merge_secret(
            {"secretKey": "fixture_token", "meta": dict(base_meta)}
        )
        rows += [("merged", k, str(v)) for k, v in merged["meta"].items()]
        passthrough = merge_secret({"meta": dict(base_meta)})
        rows += [
            ("no_key", k, str(v)) for k, v in passthrough["meta"].items()
        ]
        try:
            merge_secret({"secretKey": "absent_fixture_xyz"})
            rows.append(("missing_secret", "error", "NONE"))
        except KeyError:
            rows.append(("missing_secret", "error", "KeyError"))
    finally:
        del os.environ["SECRET_fixture_token"]
    return local_df(spark, rows, "kase string, key string, value string")


# ---------------------------------------------------------------------------
# http_pushdown_audit — F2's source-side predicate pushdown through the
# Python DataSource made driver-visible (previously pytest-only,
# test_paginated_filter_pushdown). A pm25 > 10.0 range predicate on the
# paginated scan must (a) REACH the fetcher as a pushed filter — the
# recording fetcher writes the pushed_filters option it received per
# page, the Spark twin of purpleair translating predicates into URL
# query params (purpleair.js:120-125) — and (b) still produce exactly
# the filtered result even though the fixture fetcher IGNORES the push
# and returns full pages (the reader re-applies pushed predicates, so
# a fetcher that ignores them stays correct). filter_pushed verifies
# every page's audit file names the GreaterThan on pm25; the row
# counts/checksum hash-match the oracle's re-generation of the
# synthetic arithmetic (4 pages x 5 rows: station = seq % 7,
# pm25 = 5.0 + (seq*37 % 100)/10). The float boundary is parity-safe:
# equality with 10.0 happens only at seq*37 % 100 = 50, where both
# engines hold exactly 10.0.
# ---------------------------------------------------------------------------

_PUSHDOWN_ORACLE = """
WITH seq AS (SELECT unnest(range(0, 20)) AS s),
r AS (
  SELECT s, 5.0 + (s * 37 % 100) / 10.0 AS pm25 FROM seq
  WHERE 5.0 + (s * 37 % 100) / 10.0 > 10.0
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(DISTINCT s % 7) AS BIGINT) AS n_stations,
  CAST(SUM(CAST(ROUND(pm25 * 10, 0) AS BIGINT)) AS BIGINT) AS pm25_decis,
  CAST(4 AS BIGINT) AS pages_fetched,
  TRUE AS filter_pushed
FROM r
"""


@query("http_pushdown_audit", _PUSHDOWN_ORACLE)
def http_pushdown_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import shutil
    import tempfile

    from ..sources.http import register as register_http

    register_http(spark)
    adir = tempfile.mkdtemp(prefix="sgq_push_")
    try:
        scan = (
            spark.read.format("paginated_http")
            .schema(
                "station string, unix_ts long, pm25 double, "
                "temperature double"
            )
            .option(
                "fetcher",
                "openaq_lcs_fetch_spark.sources.fetchers:recording_readings",
            )
            .option("pages", "4")
            .option("page_size", "5")
            .option("audit_dir", adir)
            .load()
            .filter(F.col("pm25") > 10.0)
        )
        agg = scan.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("station").cast("long").alias("n_stations"),
            F.sum(F.round(F.col("pm25") * 10, 0).cast("long"))
            .cast("long")
            .alias("pm25_decis"),
        ).collect()[0]
        audits = sorted(glob.glob(f"{adir}/page_*"))
        seen = [open(a).read() for a in audits]
    finally:
        shutil.rmtree(adir, ignore_errors=True)
    pushed = len(audits) == 4 and all(
        "GreaterThan" in s and "pm25" in s for s in seen
    )
    return local_df(spark, 
        [(agg["n_rows"], agg["n_stations"], agg["pm25_decis"],
          len(audits), pushed)],
        "n_rows long, n_stations long, pm25_decis long, "
        "pages_fetched long, filter_pushed boolean",
    )


# ---------------------------------------------------------------------------
# rate_floor_flow — X2's request-rate floor driven end-to-end
# (previously pytest-only): min_call_interval_ms paces consecutive
# fetch calls WITHIN a task (the per-task rate half of X2; partitioning
# bounds the parallel half — the reference throttles with pLimit(10)
# cmu.js:74 and batch(..., 20) airgradient.js:101-110). Three pages in
# ONE task (pages_per_task=3) with a 120 ms floor; the paced fetcher
# records time.monotonic() per call, and the driver verifies every
# consecutive gap ≥ 0.12 s — one-sided and deterministic (sleep
# guarantees at least the interval; no upper-bound assert, so co-tenant
# load can't flake it). Payload columns hash-match the oracle's
# re-generation of the synthetic arithmetic (3 pages x 4 rows).
# ---------------------------------------------------------------------------

_RATE_ORACLE = """
WITH seq AS (SELECT unnest(range(0, 12)) AS s)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(DISTINCT s % 7) AS BIGINT) AS n_stations,
  CAST(SUM(CAST(ROUND((5.0 + (s * 37 % 100) / 10.0) * 10, 0) AS BIGINT))
    AS BIGINT) AS pm25_decis,
  CAST(3 AS BIGINT) AS n_calls,
  CAST(2 AS BIGINT) AS n_gaps,
  TRUE AS floor_held
FROM seq
"""


@query("rate_floor_flow", _RATE_ORACLE)
def rate_floor_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import shutil
    import tempfile

    from ..sources.http import register as register_http

    register_http(spark)
    tdir = tempfile.mkdtemp(prefix="sgq_rate_")
    try:
        scan = (
            spark.read.format("paginated_http")
            .schema(
                "station string, unix_ts long, pm25 double, "
                "temperature double"
            )
            .option(
                "fetcher",
                "openaq_lcs_fetch_spark.sources.fetchers:paced_readings",
            )
            .option("pages", "3")
            .option("page_size", "4")
            .option("pages_per_task", "3")  # one task → pacing applies
            .option("min_call_interval_ms", "120")
            .option("trace_dir", tdir)
            .load()
        )
        agg = scan.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("station").cast("long").alias("n_stations"),
            F.sum(F.round(F.col("pm25") * 10, 0).cast("long"))
            .cast("long")
            .alias("pm25_decis"),
        ).collect()[0]
        traces = sorted(
            glob.glob(f"{tdir}/page_*"),
            key=lambda p: int(p.rsplit("_", 1)[-1]),
        )
        stamps = [float(open(t).read()) for t in traces]
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    gaps = [b - a for a, b in zip(stamps, stamps[1:])]
    floor_held = len(stamps) == 3 and all(g >= 0.12 for g in gaps)
    return local_df(spark, 
        [(agg["n_rows"], agg["n_stations"], agg["pm25_decis"],
          len(stamps), len(gaps), floor_held)],
        "n_rows long, n_stations long, pm25_decis long, "
        "n_calls long, n_gaps long, floor_held boolean",
    )
