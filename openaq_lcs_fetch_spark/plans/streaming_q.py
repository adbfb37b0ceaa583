"""Driver-visible streaming query: a real Structured Streaming job whose
bounded result is verifiable against a batch SQL oracle (tumbling-hour
windows align exactly with date_trunc('hour')).

Every windowed rollup here runs in APPEND mode over the heartbeat
stream (``read_events_stream_with_heartbeat``): the far-future
punctuation rows advance the event-time watermark past every real
window, so ``withWatermark`` genuinely EVICTS finalized window state
and the bounded replay's sink holds each window exactly once — the
shape whose state is bounded on an unbounded 100 TB/day stream.
(Complete mode, the previous bridge, retains and re-emits every
window's state forever; its ``withWatermark`` evicts nothing.) The
sentinel rows themselves land in far-future windows that the final
watermark — ``sentinel_max − delay`` — never passes, so they stay in
state and never reach the sink: no post-sink filtering is needed for
keyless rollups, and the oracle equality below is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timestamps import micros
from ..streaming.pipeline import (
    hourly_window_counts,
    read_events_stream,
    read_events_stream_with_heartbeat,
    run_available_now,
    stream_state_partitions,
)
from ..localdf import local_df
from .registry import query

_STREAMING_ORACLE = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


@query("streaming_hourly", _STREAMING_ORACLE)
def streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream_with_heartbeat(spark, sf_dir)
    windowed = hourly_window_counts(stream)
    out = run_available_now(windowed, output_mode="append", state_partitions=stream_state_partitions(spark, sf_dir))
    return out.select(
        F.col("w.start").alias("hour"), "event_type", "n"
    )


# ---------------------------------------------------------------------------
# streaming_gaps — the custom stateful operator (applyInPandasWithState)
# as a driver-visible query: per-user gaps > 24h detected by keyed state
# over the events stream, verified against a batch lag-window oracle.
# The state is 8 bytes per user; the batch twin is a single window
# function — equality between the two IS the exactly-once argument.
# ---------------------------------------------------------------------------

_GAPS_ORACLE = """
WITH o AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
)
SELECT CAST(user_id AS VARCHAR) AS key,
       epoch_us(prev) AS gap_start,
       epoch_us(ts) AS gap_end,
       epoch_us(ts) - epoch_us(prev) AS gap_us
FROM o
WHERE epoch_us(ts) - epoch_us(prev) > CAST(24 AS BIGINT) * 3600 * 1000000
"""


@query("streaming_gaps", _GAPS_ORACLE)
def streaming_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import sensor_gaps

    stream = read_events_stream(spark, sf_dir)
    gaps = sensor_gaps(stream, "user_id", gap="24 hours")
    return run_available_now(gaps, state_partitions=stream_state_partitions(spark, sf_dir))


# ---------------------------------------------------------------------------
# streaming_click_to_buy — STREAM-STREAM interval join: each click joins
# purchases by the same user within the following hour. Both sides carry
# watermarks; the time-bound predicate lets Spark expire join state (a
# click older than max(event time) - 1h can never match again). The
# batch oracle is the same range join in SQL — append-mode inner join
# emits exactly the matched pairs, so the two agree row-for-row.
# ---------------------------------------------------------------------------

_CLICK_BUY_ORACLE = """
SELECT c.user_id,
       epoch_us(c.ts) AS click_us,
       epoch_us(p.ts) AS buy_us,
       c.event_id AS click_id,
       p.event_id AS buy_id
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
"""


@query("streaming_click_to_buy", _CLICK_BUY_ORACLE)
def streaming_click_to_buy(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = read_events_stream(spark, sf_dir)
    clicks = (
        raw.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    buys = (
        raw.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("buy_id"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        buys,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    out = run_available_now(joined, state_partitions=stream_state_partitions(spark, sf_dir))
    return out.select(
        F.col("c_user").alias("user_id"),
        (micros(F.col("c_ts"))).alias("click_us"),
        (micros(F.col("p_ts"))).alias("buy_us"),
        "click_id",
        "buy_id",
    )


# ---------------------------------------------------------------------------
# streaming_dedup_hourly — CHAINED stateful operators in one streaming
# query (Spark >= 3.4): watermark → dropDuplicates (state #1) → tumbling
# window agg (state #2), the reference's real pipeline shape (sliding
# re-reads produce duplicates that must go BEFORE the rollup,
# habitatmap.js:128-136 + the hourly aggregation providers). The oracle
# is the batch equivalent: distinct rows, then hourly counts.
# ---------------------------------------------------------------------------

_DEDUP_HOURLY_ORACLE = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
FROM (SELECT DISTINCT event_id, ts, event_type FROM events)
GROUP BY 1, 2
"""


@query("streaming_dedup_hourly", _DEDUP_HOURLY_ORACLE)
def streaming_dedup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import dedup_then_hourly_counts

    stream = read_events_stream_with_heartbeat(spark, sf_dir)
    out = run_available_now(
        dedup_then_hourly_counts(stream), output_mode="append",
        state_partitions=stream_state_partitions(spark, sf_dir),
    )
    return out.select(F.col("w.start").alias("hour"), "event_type", "n")


# ---------------------------------------------------------------------------
# streaming_sessions — NATIVE session windows in Structured Streaming
# (merging event-time state per key). Shares its oracle VERBATIM with
# the batch twin session_window_stats (windows_q.py): bounded replay of
# the stream must produce byte-identical sessions to the batch plan —
# that equality is the engine's exactly-once/correctness argument for
# session state.
# ---------------------------------------------------------------------------


@query("streaming_sessions", None)
def streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .windows_q import _SESSION_WINDOW_ORACLE  # shared oracle; see below

    stream = read_events_stream_with_heartbeat(spark, sf_dir)
    sw = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # append mode: a session is emitted (and its merge state evicted)
    # once the watermark proves no event can extend it; the heartbeat
    # rows push the watermark past every real session. Sentinel sessions
    # (user_id < 0) are themselves never watermark-closed, but sessions
    # are keyed — filter defensively AFTER the sink materializes.
    out = run_available_now(sw, output_mode="append", state_partitions=stream_state_partitions(spark, sf_dir))
    return out.filter(F.col("user_id") >= 0).select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n",
    )


# register the shared oracle after the fact (import above is local to
# avoid a cycle at module-load time)
def _attach_sessions_oracle() -> None:
    from .registry import QUERIES, Query
    from .windows_q import _SESSION_WINDOW_ORACLE

    q = QUERIES["streaming_sessions"]
    QUERIES["streaming_sessions"] = Query(q.name, q.fn, _SESSION_WINDOW_ORACLE)


_attach_sessions_oracle()


# ---------------------------------------------------------------------------
# streaming_enriched_hourly — STREAM-STATIC broadcast enrichment (the
# reference's measurand-lookup shape on the streaming path: every
# incoming record joins a dimension table before aggregation). The
# static side is a 5-row category/weight dim → broadcast hash join per
# micro-batch, stateless (no join state store); only the downstream
# windowed aggregate keeps state, bounded by the watermark. The batch
# oracle replays the same join + hourly rollup in SQL.
# ---------------------------------------------------------------------------

_ENRICH_DIM: list[tuple[str, str, int]] = [
    ("click", "engagement", 1),
    ("view", "engagement", 1),
    ("purchase", "conversion", 3),
    ("signup", "conversion", 2),
    ("error", "ops", 0),
]


def _enriched_oracle() -> str:
    from .registry import sql_exact_sum

    values = ", ".join(f"('{t}', '{c}', {w})" for t, c, w in _ENRICH_DIM)
    return f"""
WITH dim(event_type, category, weight) AS (VALUES {values})
SELECT date_trunc('hour', ts) AS hour, category,
       COUNT(*) AS n,
       CAST(SUM(weight) AS BIGINT) AS weight_sum,
       {sql_exact_sum('value * weight')} AS weighted_value
FROM events JOIN dim USING (event_type)
GROUP BY 1, 2
"""


@query("streaming_enriched_hourly", _enriched_oracle())
def streaming_enriched_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import exact_sum

    stream = read_events_stream_with_heartbeat(spark, sf_dir)
    dim = local_df(spark, 
        _ENRICH_DIM, "event_type string, category string, weight int"
    )
    # the broadcast join is stateless and keeps the sentinel rows (their
    # types, click/purchase, are in the dim) so the watermark node
    # downstream still sees them; their NULL value only touches sentinel
    # windows, which the final watermark never closes.
    enriched = stream.join(F.broadcast(dim), "event_type")
    agg = (
        enriched.withWatermark("ts", "3 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "category")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("weight").cast("long").alias("weight_sum"),
            exact_sum(F.col("value") * F.col("weight"), alias="weighted_value"),
        )
    )
    out = run_available_now(agg, output_mode="append", state_partitions=stream_state_partitions(spark, sf_dir))
    return out.select(
        F.col("w.start").alias("hour"), "category", "n", "weight_sum", "weighted_value"
    )


# ---------------------------------------------------------------------------
# record_breaking_values — per-user record-breaking rows (value strictly
# above the running maximum), the BATCH twin of
# streaming.stateful.running_max — the Spark-4 arbitrary-state operator
# (transformWithStateInPandas / StatefulProcessor, typed ValueState).
# That API's Python worker needs google.protobuf, absent from this
# container, so the streaming twin is env-gated (tests skip without it,
# same stance as the multimodal codecs) and the driver-visible query is
# the batch plan: one prev-max window per user. The two share this
# oracle verbatim — when protobuf is present the bounded replay must
# match it row-for-row.
# ---------------------------------------------------------------------------

_RUNNING_MAX_ORACLE = """
WITH o AS (
  SELECT user_id, event_id, ts, value,
         MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM events
)
SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
FROM o WHERE prev_max IS NULL OR value > prev_max
"""


@query("record_breaking_values", _RUNNING_MAX_ORACLE)
def record_breaking_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .registry import t

    e = t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("value").over(w)
    return (
        e.withColumn("prev_max", prev_max)
        .filter(F.col("prev_max").isNull() | (F.col("value") > F.col("prev_max")))
        .select("user_id", "event_id", micros(F.col("ts")).alias("ts_us"), "value")
    )


# ---------------------------------------------------------------------------
# streaming_click_nobuy — STREAM-STREAM LEFT OUTER interval join: every
# click emits exactly once, matched clicks with their purchase(s) within
# the following hour, unmatched clicks null-padded. The outer rows are
# the hard part: Spark holds an unmatched click in the state store until
# the watermark proves no future purchase can land in its window, so a
# bounded availableNow replay ends with the tail of the data still held
# back. read_events_stream_with_heartbeat solves it the way production
# pipelines do — punctuation records at max(ts)+30d advance BOTH
# watermark branches, and the final no-data micro-batch evicts (and
# thereby emits) every real unmatched click. Heartbeat rows are dropped
# only AFTER the sink materializes: a pre-sink `click_id >= 0` filter is
# pushed below the watermark node by Catalyst and freezes the click-side
# watermark at the last real click (measured; see the helper docstring).
# The batch oracle is the plain left range-join — equality with it is
# precisely the claim that the streaming plan is complete, not a prefix.
# At 100 TB: join state is bounded by the watermark delay + 1h window
# (keys expire continuously), partitioned by user_id hash across the
# cluster's state stores.
# ---------------------------------------------------------------------------

_CLICK_NOBUY_ORACLE = """
SELECT c.user_id,
       epoch_us(c.ts) AS click_us,
       c.event_id AS click_id,
       p.event_id AS buy_id,
       epoch_us(p.ts) AS buy_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
"""


@query("streaming_click_nobuy", _CLICK_NOBUY_ORACLE)
def streaming_click_nobuy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import read_events_stream_with_heartbeat

    raw = read_events_stream_with_heartbeat(spark, sf_dir)
    clicks = (
        raw.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    buys = (
        raw.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("buy_id"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        buys,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    )
    out = run_available_now(joined, state_partitions=stream_state_partitions(spark, sf_dir))
    # heartbeat rows excluded batch-side, after the watermark did its job
    return out.filter(F.col("click_id") >= 0).select(
        F.col("c_user").alias("user_id"),
        micros(F.col("c_ts")).alias("click_us"),
        "click_id",
        "buy_id",
        micros(F.col("p_ts")).alias("buy_us"),
    )


# ---------------------------------------------------------------------------
# streaming_user_final_state — timeout-driven state expiry as a
# driver-visible query: every user's (count, last-seen) summary is
# emitted by GroupStateTimeout.EventTimeTimeout when the watermark
# proves them idle — NOT by seeing more data. The heartbeat stream
# advances the watermark past every real user, so the bounded replay
# fires every timeout and the output equals the batch GROUP BY — that
# equality is the exactly-once argument for emit-on-expiry state (the
# session-store pattern: accumulate, go quiet, flush once, remove).
# Heartbeat keys (user_id < 0) never time out inside the replay and are
# dropped after the sink materializes (same pushdown trap as
# streaming_click_nobuy — see read_events_stream_with_heartbeat).
# ---------------------------------------------------------------------------

_FINAL_STATE_ORACLE = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       epoch_us(MAX(ts)) AS last_us
FROM events GROUP BY user_id
"""


@query("streaming_user_final_state", _FINAL_STATE_ORACLE)
def streaming_user_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import read_events_stream_with_heartbeat
    from ..streaming.stateful import user_final_state

    raw = read_events_stream_with_heartbeat(spark, sf_dir)
    summaries = user_final_state(raw.withWatermark("ts", "2 hours"))
    out = run_available_now(summaries, state_partitions=stream_state_partitions(spark, sf_dir))
    return out.filter(F.col("user_id") >= 0)


# ---------------------------------------------------------------------------
# streaming_dedup_ww — dropDuplicatesWithinWatermark (Spark ≥3.5), the
# state-EVICTING dedup: unlike plain dropDuplicates (whose key state
# grows forever on an unbounded stream), within-watermark dedup drops a
# key's state once the watermark passes it — the only dedup shape whose
# state is bounded at 100 TB/day. Exercised against a genuinely
# duplicated input: the same source unioned with itself (every event
# arrives exactly twice in the replay), then deduped on event_id and
# rolled up hourly — chained stateful ops, state #1 evicting. The
# oracle is the plain hourly rollup: exact dedup of the doubled stream
# must reproduce it bit-for-bit.
#
# Why the oracle equality is robust even if a replay splits the two
# copies of an event across micro-batches (maxFilesPerTrigger etc.):
# the dedup delay (3h) is >= the window size (1h), so by the time the
# watermark evicts an event's dedup state (watermark > ts + 3h) its
# hour window (end <= ts + 1h) is already finalized — a late-arriving
# second copy is then dropped by the windowed aggregate as late data,
# never double-counted. A delay SHORTER than the window would reopen
# the double-count hazard; keep delay >= window when chaining
# within-watermark dedup into a windowed rollup.
# ---------------------------------------------------------------------------

_DEDUP_WW_ORACLE = """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


@query("streaming_dedup_ww", _DEDUP_WW_ORACLE)
def streaming_dedup_ww(spark: SparkSession, sf_dir: str) -> DataFrame:
    doubled = read_events_stream_with_heartbeat(spark, sf_dir).unionAll(
        read_events_stream_with_heartbeat(spark, sf_dir)
    )
    deduped = doubled.withWatermark("ts", "3 hours").dropDuplicatesWithinWatermark(
        ["event_id", "event_type"]
    )
    windowed = deduped.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    out = run_available_now(windowed, output_mode="append", state_partitions=stream_state_partitions(spark, sf_dir))
    return out.select(F.col("w.start").alias("hour"), "event_type", "n")


# ---------------------------------------------------------------------------
# streaming_value_histogram — distributional monitoring as a stream:
# tumbling-hour × fixed $5 value cell counts (the drift-detection
# input: compare each hour's histogram against a reference). Cells are
# FIXED-width integer buckets (floor(cents / 500)) — a streaming
# aggregate can't do data-dependent min/max bucketing, and fixed cells
# are what makes consecutive windows comparable anyway. State: one
# count per (window, type, cell), watermark-evicted for real (append
# mode over the heartbeat stream — finalized windows flush and leave
# the state store). Cell-id sign semantics: Spark `div` and DuckDB's
# integer `//` BOTH truncate toward zero (measured on this container's
# engines and pinned for negatives by
# tests/test_operators.py::test_integer_div_matches_duckdb_on_negatives),
# so the bucketing agrees for any cents sign — no non-negativity
# fixture dependency. (The actual cross-engine trap is `//` on DOUBLE
# operands, which DuckDB does not floor — see docs/ORACLE_NOTES.md.)
# ---------------------------------------------------------------------------

_STREAM_HIST_ORACLE = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       CAST(ROUND(value * 100, 0) AS BIGINT) // 500 AS cell,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2, 3
"""


@query("streaming_value_histogram", _STREAM_HIST_ORACLE)
def streaming_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream_with_heartbeat(spark, sf_dir)
    windowed = (
        stream.withColumn(
            "cell",
            F.expr("CAST(ROUND(value * 100, 0) AS BIGINT) div 500"),
        )
        .withWatermark("ts", "3 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_available_now(windowed, output_mode="append", state_partitions=stream_state_partitions(spark, sf_dir))
    return out.select(F.col("w.start").alias("hour"), "event_type", "cell", "n")


# ---------------------------------------------------------------------------
# streaming_sliding_counts — SLIDING windows in Structured Streaming
# (T6's second window kind after tumbling/session): 2-hour windows
# advancing every hour, so each event lands in exactly two overlapping
# windows — the over-sampled rollup behind smooth rate dashboards.
# Same watermark-evicting bridge as the rest of the family: heartbeat
# stream + append mode, finalized windows flush and leave the state
# store (state is two live windows per type at any watermark, bounded
# forever). The oracle materializes the two-window membership
# explicitly: each event contributes to the windows starting at its
# hour and the hour before.
# ---------------------------------------------------------------------------

_SLIDING_ORACLE = """
SELECT win_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT date_trunc('hour', ts) AS win_start, event_type FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type FROM events
)
GROUP BY 1, 2
"""


@query("streaming_sliding_counts", _SLIDING_ORACLE)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream_with_heartbeat(spark, sf_dir)
    windowed = (
        stream.withWatermark("ts", "3 hours")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_available_now(windowed, output_mode="append", state_partitions=stream_state_partitions(spark, sf_dir))
    return out.select(F.col("w.start").alias("win_start"), "event_type", "n")


# ---------------------------------------------------------------------------
# provider_stream_roundtrip — the reference's cron+checkpoint model run
# on the REAL streaming runner (streaming/provider_stream.py): two
# availableNow invocations of the keyed-map provider stream share one
# checkpointLocation and one parquet sink, exactly like two cron ticks
# of the fetcher Lambda. Invocation 1 drains file 1 (including an
# intra-batch duplicate reading the watermark dedup collapses);
# invocation 2 sees file 1 AGAIN plus file 2 — the FileStreamSource's
# checkpoint makes it process only the new file (exactly-once across
# restarts), and the dropDuplicates STATE restored from the checkpoint
# drops file 2's cross-invocation repeat (its event time is inside the
# 3 h lateness, so the key is still in state). The sink readback pins
# the final contents; r1_rows pins that invocation 1 alone wrote the
# file-1 distinct set. The batch twin in SQL: DISTINCT over the union,
# per-batch for r1. Reference anchors: scheduler/index.js:5-25 (cron
# tick), fetcher/lib/meta.js:22-41 (checkpoint), habitatmap.js:128-136
# (sliding re-read duplicates).
# ---------------------------------------------------------------------------

_PROVIDER_STREAM_ORACLE = r"""
WITH raw(batch, device_id, ts, input_param, raw_value) AS (
  VALUES
    (1, 'dev1', '2024-06-01T10:00:00', 'pm25', '15.5'),
    (1, 'dev1', '2024-06-01T10:00:00', 'co',   '250'),
    (1, 'dev1', '2024-06-01T11:00:00', 'pm25', '16.5'),
    (1, 'dev1', '2024-06-01T11:00:00', 'temp', 'inv'),
    (1, 'dev1', '2024-06-01T11:00:00', 'pm25', '16.5'),
    (2, 'dev1', '2024-06-01T11:00:00', 'pm25', '16.5'),
    (2, 'dev2', '2024-06-01T12:00:00', 'pm10', '30')
),
dim(input_param, parameter, scale) AS (
  VALUES ('pm25', 'pm25', 1.0), ('co', 'co', 0.001),
         ('temp', 'temperature', 1.0), ('pm10', 'pm10', 1.0)
),
cleaned AS (
  SELECT DISTINCT  -- the watermark dedup's batch twin
    MIN(batch) OVER (PARTITION BY device_id, ts, input_param) AS batch,
    device_id, ts, input_param,
    CASE WHEN raw_value IN ('', 'NaN', 'n/a', 'inv', 'null', 'undefined')
         THEN NULL ELSE CAST(raw_value AS DOUBLE) END AS value,
    CASE WHEN raw_value IN ('', 'NaN', 'n/a', 'inv', 'null', 'undefined')
         THEN raw_value END AS sentinel
  FROM raw
),
m AS (
  SELECT c.batch, c.value * d.scale AS measure, c.sentinel,
         CAST(c.ts AS TIMESTAMP) AS ts,
         'stream_fixture-' || c.device_id || '-' || d.parameter AS sid
  FROM cleaned c JOIN dim d USING (input_param)
  WHERE c.value IS NOT NULL OR c.sentinel IS NOT NULL
)
SELECT
  CAST(SUM(CASE WHEN batch = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r1_rows,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(DISTINCT sid) AS BIGINT) AS n_sensors,
  CAST(SUM(CASE WHEN sentinel IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_flagged,
  CAST(SUM(CAST(ROUND(measure * 1000000, 0) AS BIGINT)) AS BIGINT)
    AS sum_micro,
  strftime(MAX(ts), '%Y-%m-%dT%H:%M:%SZ') AS last_iso
FROM m
"""


@query("provider_stream_roundtrip", _PROVIDER_STREAM_ORACLE)
def provider_stream_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from ..streaming.provider_stream import keyed_map_stream, start_to_parquet

    file1 = [
        {"device_id": "dev1", "ts": "2024-06-01T10:00:00", "lat": 40.0,
         "lon": -75.0, "readings": {"pm25": "15.5", "co": "250"}},
        {"device_id": "dev1", "ts": "2024-06-01T11:00:00", "lat": 40.0,
         "lon": -75.0, "readings": {"pm25": "16.5", "temp": "inv"}},
        # intra-batch duplicate of (dev1-pm25, 11:00)
        {"device_id": "dev1", "ts": "2024-06-01T11:00:00", "lat": 40.0,
         "lon": -75.0, "readings": {"pm25": "16.5"}},
    ]
    file2 = [
        # cross-invocation repeat, inside the 3 h lateness of file 1's
        # max — the restored dedup state must drop it
        {"device_id": "dev1", "ts": "2024-06-01T11:00:00", "lat": 40.0,
         "lon": -75.0, "readings": {"pm25": "16.5"}},
        {"device_id": "dev2", "ts": "2024-06-01T12:00:00", "lat": 41.0,
         "lon": -76.0, "readings": {"pm10": "30"}},
    ]
    config = {
        "schema": "v1",
        "provider": "keyed_map",
        "frequency": "hour",
        "active": True,
        "meta": {
            "lookup": [
                ["pm25", "pm25", "µg/m³"],
                ["co", "co", "ppb"],
                ["temp", "temperature", "c"],
                ["pm10", "pm10", "µg/m³"],
            ],
            "lateness": "3 hours",
            "source_name": "stream_fixture",
            # rows-scale control feed: a handful of state partitions,
            # not one per session core (see start_to_parquet)
            "state_partitions": 4,
        },
    }
    root = tempfile.mkdtemp(prefix="sgq_pstream_")
    try:
        src = os.path.join(root, "src")
        out_path = os.path.join(root, "out")
        ckpt = os.path.join(root, "ckpt")
        os.makedirs(src)
        config["meta"]["path"] = src

        def _tick(rows: list[dict], name: str) -> None:
            with open(os.path.join(src, name), "w") as fh:
                for r in rows:
                    fh.write(_json.dumps(r) + "\n")
            q = start_to_parquet(
                keyed_map_stream(spark, config),
                out_path, ckpt,
                frequency="hour", available_now=True,
                state_partitions=config["meta"].get("state_partitions"),
            )
            q.awaitTermination()

        _tick(file1, "f1.jsonl")  # cron tick 1
        r1_rows = spark.read.parquet(out_path).count()
        _tick(file2, "f2.jsonl")  # cron tick 2: restart from checkpoint
        out = (
            spark.read.parquet(out_path)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.countDistinct("sensor_id").cast("long").alias("n_sensors"),
                F.sum(
                    F.when(F.col("flags").isNotNull(), 1).otherwise(0)
                )
                .cast("long")
                .alias("n_flagged"),
                # micro-units are integers after the round — exact,
                # order-independent (NULL measures skip the sum)
                F.sum(F.round(F.col("measure") * 1000000, 0).cast("long"))
                .cast("long")
                .alias("sum_micro"),
                F.date_format(
                    F.max("timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
                ).alias("last_iso"),
            )
            .select(
                F.lit(r1_rows).cast("long").alias("r1_rows"),
                "n_rows",
                "n_sensors",
                "n_flagged",
                "sum_micro",
                "last_iso",
            )
            .localCheckpoint()  # eager: frees the temp dirs below
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out
