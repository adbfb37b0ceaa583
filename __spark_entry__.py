"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``openaq_lcs_fetch_spark.plans`` — the engine's query
registry. Each registered query pairs a Spark DataFrame program with a
DuckDB oracle SQL string (same column names, deterministic values).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from openaq_lcs_fetch_spark.plans import QUERIES  # noqa: E402
from openaq_lcs_fetch_spark.session import tune  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary — scan → filter → partial/final
    hash agg) on /root/testdata/sf0.001; driver checks rows>0."""
    tune(spark)
    return QUERIES["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    genuinely non-SQL-expressible ops)."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
