"""File scans with explicit schemas (SURVEY.md S4/S5/S8).

The reference streams CSV through a parser (cmu.js:283-298, GCS daily
files cpcb.js:112-141) and gunzips S3 objects (utils.js:28-42). Spark
reads these natively — codecs are automatic, partition-path layout
gives partition pruning (the Spark twin of cpcb's computed daily
filename, cpcb.js:56-78).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """S4: CSV scan. Schema is mandatory — the engine never infers
    (SURVEY.md §1.3). gzip etc. decode automatically (S8)."""
    reader = spark.read.option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.schema(schema).csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str, **options: str
) -> DataFrame:
    """S1-as-file: JSON lines scan with fixed schema."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.schema(schema).json(path)


def read_daily_partition(
    spark: SparkSession,
    base: str,
    date: str,
    pattern: str,
    schema: T.StructType | str,
    fmt: str = "csv",
    **options: str,
) -> DataFrame:
    """S5: computed daily-partition read (cpcb.js builds
    'cpcb-{date}.csv'); path computation ≙ partition pruning — only the
    named partition's bytes are scanned."""
    path = f"{base}/{pattern.format(date=date)}"
    if fmt == "csv":
        return read_csv(spark, path, schema, **options)
    return read_json(spark, path, schema, **options)
