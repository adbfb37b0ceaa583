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
