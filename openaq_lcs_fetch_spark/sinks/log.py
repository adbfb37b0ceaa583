"""Run-log side output (SURVEY.md K5).

The reference publishes a per-run summary to SNS (providers.js:59-71,
called from fetcher/index.js:29-34 with 'fetcher/success' or
'fetcher/error'). Here: a structured log row appended to a parquet
status table — queryable, and a `foreachBatch` can emit the same row
per micro-batch in streaming mode.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession

LOG_SCHEMA = (
    "run_ts timestamp, source string, status string, n_measures long, "
    "from_ts timestamp, to_ts timestamp, message string"
)


def publish(
    spark: SparkSession,
    log_path: str,
    source: str,
    status: str,
    n_measures: int = 0,
    from_ts=None,
    to_ts=None,
    message: str = "",
) -> None:
    row = [
        (
            _dt.datetime.now(tz=_dt.timezone.utc).replace(tzinfo=None),
            source,
            status,
            n_measures,
            from_ts,
            to_ts,
            message,
        )
    ]
    spark.createDataFrame(row, LOG_SCHEMA).write.mode("append").parquet(log_path)


def summarize(measures: DataFrame, source: str) -> dict:
    """A3: the reference's summary() counters (clarity.js:192-208)."""
    from pyspark.sql import functions as F

    row = measures.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("timestamp").alias("from_ts"),
        F.max("timestamp").alias("to_ts"),
    ).collect()[0]
    return {
        "source": source,
        "n_measures": row["n"],
        "from_ts": row["from_ts"],
        "to_ts": row["to_ts"],
    }
