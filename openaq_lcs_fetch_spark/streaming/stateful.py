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
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

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


#: gap-detector state: last observed event-time (µs since epoch) per key
_GAP_STATE_SCHEMA = StructType([StructField("last_us", LongType(), True)])


def sensor_gaps(
    events_stream: DataFrame,
    key: str,
    ts_col: str = "ts",
    gap: str = "2 hours",
) -> DataFrame:
    """Cross-micro-batch gap detection (custom stateful operator): for
    each key, emit a row whenever the spacing between consecutive
    readings exceeds ``gap`` — the streaming twin of the reference's
    staleness concern (it re-fetches 3h back, airgradient.js:137-153,
    precisely because sensors go quiet). Keyed state holds only the
    last event-time (8 bytes/key), so millions of sensors fit one
    executor's state store. Ordering: rows are sorted per key WITHIN a
    batch; an event older than the key's state (out-of-order ACROSS
    micro-batches) is dropped, like any post-watermark late arrival —
    rewinding state on late data would emit phantom gaps and break
    monotonicity. Single-batch replays (availableNow over a bounded
    source) therefore match the batch lag-window oracle exactly."""
    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)
    out_schema = StructType(
        [
            StructField("key", StringType(), False),
            StructField("gap_start", LongType(), False),
            StructField("gap_end", LongType(), False),
            StructField("gap_us", LongType(), False),
        ]
    )

    def fn(
        key_tuple: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        rows = []
        stamps: list[int] = []
        for pdf in pdfs:
            stamps.extend(int(v.value) // 1000 for v in pd.to_datetime(pdf[ts_col]))
        stamps.sort()
        for us in stamps:
            if last is not None and us <= last:
                continue  # late vs state — drop, never rewind
            if last is not None and us - last > gap_us:
                rows.append((str(key_tuple[0]), last, us, us - last))
            last = us
        if last is not None:
            state.update((last,))
        if rows:
            yield pd.DataFrame(rows, columns=["key", "gap_start", "gap_end", "gap_us"])

    return events_stream.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_GAP_STATE_SCHEMA,
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


# ---------------------------------------------------------------------------
# running_max (transformWithState) — the same custom-stateful-operator
# contract as sensor_gaps, but on Spark 4's NEW arbitrary-state API
# (StatefulProcessor / transformWithStateInPandas, the successor to
# applyInPandasWithState): typed state handles, timers, and TTL managed
# by the engine. State is one double per key; rows sort per key within
# a batch and a row at-or-below the running max across batches emits
# nothing — so a bounded availableNow replay matches the batch
# prev-max-window oracle exactly (the exactly-once argument again).
# Requires the RocksDB state-store provider (transformWithState's
# backing store), set per-session in the caller, AND google.protobuf in
# the Python env (the TWS worker protocol) — absent from this container,
# so tests skip and the driver-visible query is the batch twin
# (plans/streaming_q.py:record_breaking_values, shared oracle).
# ---------------------------------------------------------------------------


def running_max(events_stream: DataFrame, key: str = "user_id") -> DataFrame:
    """Emit each key's record-breaking rows (value strictly above the
    running maximum), cross-micro-batch via a typed ValueState.

    Ordering contract (same stance as sensor_gaps): rows sort per key
    WITHIN a micro-batch; state never rewinds, so a row arriving in a
    LATER batch with an EARLIER event time is evaluated against the max
    of everything already seen — late data, not a replay. Equality with
    the batch prev-max oracle therefore holds when batches arrive
    event-time-ordered per key (a single-batch availableNow replay, or
    time-ordered source files); an out-of-order multi-file source can
    legitimately suppress a row the batch oracle emits.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("event_id", LongType(), False),
            StructField("ts_us", LongType(), False),
            StructField("value", DoubleType(), True),
        ]
    )

    class RunningMax(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._max = handle.getValueState("maxv", "v double")

        def handleInputRows(self, key_tuple, rows, timer_values):
            pdf = pd.concat(list(rows), ignore_index=True)
            pdf = pdf.sort_values(["ts", "event_id"])
            prev = self._max.get()
            cur = prev[0] if prev is not None else None
            out = []
            for rec in pdf.itertuples(index=False):
                v = float(rec.value)
                if cur is None or v > cur:
                    out.append(
                        (
                            int(key_tuple[0]),
                            int(rec.event_id),
                            int(rec.ts.value // 1_000),  # pandas ns → µs
                            v,
                        )
                    )
                    cur = v
            if cur is not None:
                self._max.update((cur,))
            if out:
                yield pd.DataFrame(
                    out, columns=["user_id", "event_id", "ts_us", "value"]
                )

        def close(self) -> None:
            pass

    return events_stream.groupBy(key).transformWithStateInPandas(
        statefulProcessor=RunningMax(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# user_final_state — TIMEOUT-driven emission (GroupStateTimeout.
# EventTimeTimeout): per-user running (n_events, last_seen) state that
# emits exactly once, when the event-time watermark proves the user has
# been idle past the horizon — the state-expiry pattern every
# production session store runs (emit-on-quiet, then state.remove()).
# Previously untestable in a bounded replay: timeouts only fire in a
# batch that runs AFTER the watermark passes them, and a plain
# availableNow replay ends watermark-short. The heartbeat stream
# (pipeline.read_events_stream_with_heartbeat) advances the watermark
# 30 days past the data and the final no-data micro-batch fires every
# real key's timeout — so the bounded replay emits each user's complete
# summary, verifiable against the plain batch GROUP BY oracle.
# ---------------------------------------------------------------------------

_FINAL_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), True),
        StructField("last_us", LongType(), True),
    ]
)


def user_final_state(
    events_stream: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    idle: str = "48 hours",
) -> DataFrame:
    """Emit (key, n_events, last_us) once per key, on event-time timeout
    after ``idle`` of silence. State: 16 bytes/key, removed at emission."""
    idle_ms = int(pd.Timedelta(idle).total_seconds() * 1000)
    out_schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("n_events", LongType(), False),
            StructField("last_us", LongType(), False),
        ]
    )

    def fn(
        key_tuple: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, last = state.get
            state.remove()
            yield pd.DataFrame(
                [(int(key_tuple[0]), int(n), int(last))],
                columns=["user_id", "n_events", "last_us"],
            )
            return
        n, last = (state.get if state.exists else (0, None))
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            stamps = [int(v.value) // 1000 for v in pd.to_datetime(pdf[ts_col])]
            n += len(stamps)
            mx = max(stamps)
            last = mx if last is None or mx > last else last
        if last is not None:
            state.update((n, last))
            state.setTimeoutTimestamp(last // 1000 + idle_ms)

    return events_stream.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_FINAL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
