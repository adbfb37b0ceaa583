"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

Reads are plain ``spark.read.parquet`` so Catalyst gets parquet column
pruning + predicate pushdown for free; callers select/filter and the
scan narrows (verify with ``df.explain`` → ``ReadSchema``/``PushedFilters``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Schema-driven timestamp normalization at the ingest boundary.

    The driver's testdata has shipped ``events.ts`` as TIMESTAMP(NANOS)
    (Spark reads it ``bigint`` under the nanosAsLong conf) in one round
    and ``timestamp[us]`` (Spark reads TIMESTAMP_NTZ) in the next. The
    reference normalizes every provider's timestamp chaos at ingest
    (e.g. cpcb.js:144-152, data354.js:108-110 mix unix-seconds, ISO and
    local strings); this is the same stance applied to our own input
    tables. Handles all three shapes, keyed off the ACTUAL dtype:

    * ``bigint``        — nanos-as-long; integer-divide to micros
      (sub-µs digits are zero in the generated data → lossless);
    * ``timestamp_ntz`` — naive UTC instants; cast to TIMESTAMP, exact
      under the UTC session timezone (session.RUNTIME_CONF);
    * ``timestamp``     — already the engine's canonical type; no-op.

    Works on batch and streaming DataFrames alike — both ingest paths
    (``load`` and ``streaming.pipeline.read_events_stream``) MUST route
    through this one function so the assumption lives in one place.
    """
    t = dict(df.dtypes).get(col)
    if t == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif t == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame; EVERY timestamp column is
    normalized to TimestampType whatever the file stores (see
    ``normalize_ts``) — the testdata's physical types have changed
    between rounds before, and only ever in the timestamp encoding."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz" or (name == "events" and col == "ts"):
            df = normalize_ts(df, col)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
