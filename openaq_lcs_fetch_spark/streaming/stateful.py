"""Stateful streaming station registry (SURVEY.md T5).

The reference upserts a station object per node and skips the write
when unchanged (providers.js:94-132) — across cron invocations that is
persistent keyed state. Spark-first realizations, strongest first:

1. ``changed_stations`` — ``applyInPandasWithState`` keyed by node id;
   state holds the last content hash; a batch emits a node only when
   its serialized content changed. State lives in the streaming state
   store (RocksDB/HDFS-backed on a cluster) → scales horizontally by
   key hash, exactly-once with checkpointing.
2. ``foreach_batch_upsert`` — per-micro-batch bridge into the batch
   diff-upsert sink (sinks/stations.py) for stores that want parquet.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType

#: state: last emitted content hash per station key
_STATE_SCHEMA = StructType([StructField("content_hash", StringType(), True)])


def _row_hash(row: dict[str, Any], key: str) -> str:
    payload = {k: v for k, v in sorted(row.items()) if k != key and v is not None}
    return hashlib.md5(json.dumps(payload, sort_keys=True, default=str).encode()).hexdigest()


def changed_stations(stations_stream: DataFrame, key: str) -> DataFrame:
    """Emit a station row only when its content differs from the last
    emitted version (cross-micro-batch, via keyed state)."""
    out_schema = StructType(
        [f for f in stations_stream.schema.fields]
        + [StructField("content_hash", StringType(), False)]
    )
    field_names = [f.name for f in stations_stream.schema.fields]

    def fn(
        key_tuple: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        prev = state.get[0] if state.exists else None
        emitted = []
        for pdf in pdfs:
            for rec in pdf.to_dict("records"):
                h = _row_hash(rec, key)
                if h != prev:
                    rec["content_hash"] = h
                    emitted.append(rec)
                    prev = h
        if prev is not None:
            state.update((prev,))
        if emitted:
            yield pd.DataFrame(emitted, columns=field_names + ["content_hash"])

    return stations_stream.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def foreach_batch_upsert(stations_stream: DataFrame, store_path: str, key: str):
    """writeStream.foreachBatch bridge into the batch diff-upsert sink —
    per-batch MERGE semantics on a plain-parquet store."""
    from ..sinks.stations import diff_upsert

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        diff_upsert(batch_df.sparkSession, batch_df, store_path, key)

    return stations_stream.writeStream.foreachBatch(handle)
