"""Temporal join queries: as-of and range joins (operators Spark's
DataFrame API lacks — composed per the brief's custom-operator ladder,
verified against DuckDB's *native* ASOF JOIN / range predicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join_broadcast
from ..localdf import local_df
from .registry import query, t

# ---------------------------------------------------------------------------
# asof_calibration — every event picks up the latest calibration factor
# at or before its timestamp (per event_type). The calibration table is
# generated deterministically (6-hourly marks) in both engines.
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH types AS (SELECT unnest(['click','view','purchase','signup','error']) AS event_type),
marks AS (
  SELECT t.event_type,
         unnest(generate_series(TIMESTAMP '2024-01-01 03:00:00',
                                TIMESTAMP '2024-01-31 00:00:00',
                                INTERVAL 6 HOUR)) AS calib_ts
  FROM types t
),
calib AS (
  SELECT event_type, calib_ts,
         CAST((epoch(calib_ts) / 3600) % 7 AS DOUBLE) / 10.0 AS factor
  FROM marks
)
SELECT e.event_id, e.event_type, e.ts,
       c.calib_ts AS asof_ts, c.factor AS asof_factor
FROM events e
ASOF LEFT JOIN calib c
  ON e.event_type = c.event_type AND e.ts >= c.calib_ts
"""


def _calib(spark: SparkSession) -> DataFrame:
    types = local_df(spark, 
        [("click",), ("view",), ("purchase",), ("signup",), ("error",)],
        "event_type string",
    )
    marks = types.select(
        "event_type",
        F.explode(
            F.sequence(
                F.lit("2024-01-01 03:00:00").cast("timestamp"),
                F.lit("2024-01-31 00:00:00").cast("timestamp"),
                F.expr("INTERVAL 6 HOURS"),
            )
        ).alias("calib_ts"),
    )
    factor = ((F.unix_timestamp("calib_ts") / 3600) % 7).cast("double") / F.lit(10.0)
    return marks.withColumn("factor", factor)


@query("asof_calibration", _ASOF_ORACLE)
def asof_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the broadcast as-of array probe is scan-rooted per-row
    # CPU (r14 interleaved best-of-4: 1.56 -> 1.33 s, 4/4 wins;
    # tables._spread_scan for the scale gate)
    e = t(spark, sf_dir, "events", spread=True).select(
        "event_id", "event_type", "ts"
    )
    calib = _calib(spark).withColumnRenamed("calib_ts", "ts")
    # calibration marks are dimension-sized (5 types x 6-hourly) → the
    # broadcast as-of plan: the events fact table is never shuffled or
    # sorted, the match resolves in a codegen array projection. The
    # windowed skew-free plan (asof_join) stays the fact-vs-fact tool.
    joined = asof_join_broadcast(
        e, calib, key="event_type", ts="ts", value_cols=["factor"],
        bucket_seconds=86_400,
    )
    return joined.select(
        "event_id",
        "event_type",
        "ts",
        F.col("asof_ts"),
        F.col("asof_factor"),
    )


# ---------------------------------------------------------------------------
# range_window_counts — range join: events within ±10 min of each marker
# (the first 20 signups). Markers are dimension-sized → broadcast
# nested-loop with a range predicate; never a full cartesian.
# ---------------------------------------------------------------------------

_RANGE_ORACLE = """
WITH markers AS (
  SELECT event_id AS marker_id, ts AS marker_ts
  FROM events WHERE event_type = 'signup'
  ORDER BY ts ASC, event_id ASC LIMIT 20
)
SELECT m.marker_id, COUNT(*) AS n_nearby
FROM markers m JOIN events e
  ON e.ts >= m.marker_ts - INTERVAL 10 MINUTE
 AND e.ts <= m.marker_ts + INTERVAL 10 MINUTE
GROUP BY m.marker_id
"""


@query("range_window_counts", _RANGE_ORACLE)
def range_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    markers = (
        e.filter(F.col("event_type") == "signup")
        .select(F.col("event_id").alias("marker_id"), F.col("ts").alias("marker_ts"))
        .orderBy(F.col("marker_ts").asc(), F.col("marker_id").asc())
        .limit(20)
    )
    lo = F.col("marker_ts") - F.expr("INTERVAL 10 MINUTES")
    hi = F.col("marker_ts") + F.expr("INTERVAL 10 MINUTES")
    joined = e.join(F.broadcast(markers), (F.col("ts") >= lo) & (F.col("ts") <= hi))
    return joined.groupBy("marker_id").agg(F.count(F.lit(1)).alias("n_nearby"))


# ---------------------------------------------------------------------------
# value_interpolate — linear gap interpolation per sensor stream: masked
# readings (a deterministic md5-chosen ~10% simulating sensor dropout —
# the testdata carries no real NULLs) are reconstructed from the nearest
# valid neighbour on each side: v = v_prev + (v_next - v_prev)·(t -
# t_prev)/(t_next - t_prev) on the microsecond axis. The neighbour
# lookups are IGNORE-NULLS running first/last over the per-user
# window — one shuffle on user_id, no self-join; the same composition
# the backward+forward as-of pair would give, fused into one window
# pass. Interior masked rows (both neighbours exist) are emitted.
# ---------------------------------------------------------------------------

_INTERP_ORACLE = """
WITH m AS (
  SELECT event_id, user_id, ts, value,
         (('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':vi'), 1, 15))::BIGINT
          % 10) = 0 AS masked
  FROM events
),
nbr AS (
  SELECT event_id, user_id, ts, value, masked,
         last_value(CASE WHEN NOT masked THEN value END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
         last_value(CASE WHEN NOT masked THEN epoch_us(ts) END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_t,
         first_value(CASE WHEN NOT masked THEN value END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v,
         first_value(CASE WHEN NOT masked THEN epoch_us(ts) END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_t
  FROM m
)
SELECT event_id, user_id,
       ROUND(prev_v + (next_v - prev_v)
             * (CAST(epoch_us(ts) - prev_t AS DOUBLE) / (next_t - prev_t)),
             6) AS interp_value
FROM nbr
WHERE masked AND prev_v IS NOT NULL AND next_v IS NOT NULL
"""


@query("value_interpolate", _INTERP_ORACLE)
def value_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.timestamps import micros

    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":vi"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    m = e.withColumn("masked", (h % 10) == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wp = w.rowsBetween(Window.unboundedPreceding, -1)
    wn = w.rowsBetween(1, Window.unboundedFollowing)
    valid_v = F.when(~F.col("masked"), F.col("value"))
    valid_t = F.when(~F.col("masked"), micros(F.col("ts")))
    nbr = m.select(
        "event_id",
        "user_id",
        "ts",
        "masked",
        F.last(valid_v, ignorenulls=True).over(wp).alias("prev_v"),
        F.last(valid_t, ignorenulls=True).over(wp).alias("prev_t"),
        F.first(valid_v, ignorenulls=True).over(wn).alias("next_v"),
        F.first(valid_t, ignorenulls=True).over(wn).alias("next_t"),
    )
    # try_divide: duplicate neighbor timestamps (prev_t == next_t) make
    # the interpolation weight 0/0 — NULL on both engines, not an ANSI
    # DIVIDE_BY_ZERO (the DuckDB twin already yields NULL there)
    interp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * F.try_divide(
        (micros(F.col("ts")) - F.col("prev_t")).cast("double"),
        F.col("next_t") - F.col("prev_t"),
    )
    return (
        nbr.filter(
            F.col("masked") & F.col("prev_v").isNotNull() & F.col("next_v").isNotNull()
        )
        .select("event_id", "user_id", F.round(interp, 6).alias("interp_value"))
    )


# ---------------------------------------------------------------------------
# hourly_completeness — expected-vs-actual slot audit (the reference
# scheduler's core question: which provider-hours are MISSING?). A full
# (day × hour × event_type) spine generates from the observed date span
# — sequence + explode, no driver enumeration — then a left anti join
# against observed hours lists the gaps, rolled up per (day, type).
# Scale: the spine is days×24×types rows (tiny vs the fact table), the
# anti join shuffles on the compact (day, hour, type) key.
# ---------------------------------------------------------------------------

_COMPLETENESS_ORACLE = """
WITH span AS (
  SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS d0,
         CAST(date_trunc('day', MAX(ts)) AS DATE) AS d1
  FROM events
),
types AS (SELECT DISTINCT event_type FROM events),
spine AS (
  SELECT CAST(d AS TIMESTAMP) + h * INTERVAL 1 HOUR AS slot, event_type
  FROM (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d FROM span),
       (SELECT unnest(generate_series(0, 23)) AS h),
       types
),
observed AS (
  SELECT DISTINCT date_trunc('hour', ts) AS slot, event_type FROM events
)
SELECT date_trunc('day', s.slot) AS day, s.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_missing_hours,
       MIN(s.slot) AS first_missing
FROM spine s LEFT JOIN observed o USING (slot, event_type)
WHERE o.slot IS NULL
GROUP BY 1, 2
"""


@query("hourly_completeness", _COMPLETENESS_ORACLE)
def hourly_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("ts", "event_type")
    span = e.agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("d0"),
        F.to_date(F.date_trunc("day", F.max("ts"))).alias("d1"),
    )
    types = e.select("event_type").distinct()
    days = span.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d")
    )
    spine = (
        days.crossJoin(
            F.broadcast(
                days.sparkSession.range(24).select(F.col("id").alias("h"))
            )
        )
        .select(
            (
                F.col("d").cast("timestamp")
                + F.col("h") * F.expr("INTERVAL 1 HOUR")
            ).alias("slot")
        )
        .crossJoin(F.broadcast(types))
    )
    observed = e.select(
        F.date_trunc("hour", "ts").alias("slot"), "event_type"
    ).distinct()
    return (
        spine.join(observed, ["slot", "event_type"], "left_anti")
        .groupBy(F.date_trunc("day", "slot").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_missing_hours"),
            F.min("slot").alias("first_missing"),
        )
    )


# ---------------------------------------------------------------------------
# scd2_intervals — SCD Type-2 dimension build (gaps-and-islands → validity
# intervals): each user's event_type run-lengths become (valid_from,
# valid_to) rows, the last one open-ended (is_current). The reference's
# station diff-upsert sink (fetcher/lib/station.js) answers "what is the
# current record"; SCD2 is the warehouse-grade extension that also keeps
# history. Shape: one window pass (change flag + running island id) and
# one aggregation, both partitioned by user_id — two shuffles on the same
# key; at 100 TB the island id never leaves its key's partition.
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
              ) IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
  FROM events
),
i AS (
  SELECT user_id, ts, event_type,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM o
),
g AS (
  SELECT user_id, island, MIN(event_type) AS event_type,
         MIN(ts) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM i GROUP BY 1, 2
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY island) AS valid_to,
       n_events,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY island) IS NULL
         AS is_current
FROM g
"""


@query("scd2_intervals", _SCD2_ORACLE)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0)
    )
    islands = e.withColumn("chg", chg).withColumn(
        "island", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    g = islands.groupBy("user_id", "island").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wi = Window.partitionBy("user_id").orderBy("island")
    valid_to = F.lead("valid_from").over(wi)
    return g.select(
        "user_id",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        "n_events",
        valid_to.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# locf_fill — last-observation-carried-forward gap fill onto an hourly
# spine (the step-function twin of value_interpolate's linear fill; the
# reference backfills provider gaps the same "repeat last reading" way).
# No as-of join: spine markers union with readings, one IGNORE-NULLS
# running last per user resolves every marker — a single shuffle on
# user_id regardless of gap length. Markers order AFTER a same-instant
# reading (ord 0 vs 1) so an exactly-on-the-hour value is carried into
# its own slot; event_id (-1 for markers) makes the total order unique
# in both engines — never rely on NULL-ordering defaults, Spark and
# DuckDB disagree (NULLS FIRST vs LAST).
# ---------------------------------------------------------------------------

_LOCF_ORACLE = """
WITH span AS (
  SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
         date_trunc('hour', MAX(ts)) AS h1
  FROM events GROUP BY 1
),
spine AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS ts
  FROM span
),
u AS (
  SELECT user_id, ts, value, 0 AS ord, event_id FROM events
  UNION ALL
  SELECT user_id, ts, NULL, 1, CAST(-1 AS BIGINT) FROM spine
),
f AS (
  SELECT user_id, ts, ord,
         last_value(value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, ord, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
  FROM u
)
SELECT user_id, ts AS slot, locf_value
FROM f WHERE ord = 1 AND locf_value IS NOT NULL
"""


@query("locf_fill", _LOCF_ORACLE)
def locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").select("user_id", "ts", "value", "event_id")
    spine = (
        e.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("h0"),
            F.date_trunc("hour", F.max("ts")).alias("h1"),
        )
        .select(
            "user_id",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("ts"),
        )
    )
    u = e.select(
        "user_id", "ts", "value", F.lit(0).alias("ord"), "event_id"
    ).unionByName(
        spine.select(
            "user_id",
            "ts",
            F.lit(None).cast("double").alias("value"),
            F.lit(1).alias("ord"),
            F.lit(-1).cast("long").alias("event_id"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "ord", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    f = u.withColumn("locf_value", F.last("value", ignorenulls=True).over(w))
    return (
        f.filter((F.col("ord") == 1) & F.col("locf_value").isNotNull())
        .select("user_id", F.col("ts").alias("slot"), "locf_value")
    )


# ---------------------------------------------------------------------------
# trailing_1h_stats — event-time RANGE frame: every event carries the
# count and exact sum of its user's events in the trailing hour
# (inclusive). This is the window-frame shape the rest of the registry
# lacks: not a fixed row count (ROWS) and not a bucketed tumble
# (F.window) but a per-row sliding interval — Spark's rangeBetween over
# a monotone numeric (microseconds) keeps it one shuffle + one sort per
# user, state bounded by the hour span. Ties at identical micros are
# frame-PEERS in both engines, so no tiebreaker column is needed for
# the frame itself. The sum accumulates in DECIMAL (order-independent)
# per the registry parity rules.
# ---------------------------------------------------------------------------

_TRAILING_ORACLE = """
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


@query("trailing_1h_stats", _TRAILING_ORACLE)
def trailing_1h_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.timestamps import micros

    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy(micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(27,6)"))
        .over(w)
        .cast("double")
        .alias("sum_1h"),
    )


# ---------------------------------------------------------------------------
# user_value_trend — distributed least-squares trend per key WITHOUT any
# UDF or iteration: OLS slope/intercept derive in closed form from five
# sufficient statistics (n, Σx, Σy, Σx², Σxy), which are ONE map-side-
# combined aggregation — the textbook "learn a model per key at 100 TB"
# shape (each statistic is associative; the shuffle carries 5 scalars
# per user). Exactness scheme: x = micros since 2024-01-01 (long),
# y quantizes to micro-units (×1e6, the registry idiom); products
# accumulate in DECIMAL(38,0) on the Spark side and HUGEINT in DuckDB —
# both exact integers — and the closed-form solution then evaluates in
# scalar double math written identically in both engines.
# ---------------------------------------------------------------------------

_TREND_ORACLE = """
WITH b AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS x,
         CAST(round(value * 1000000.0, 0) AS BIGINT) AS q
  FROM events
),
s AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
         CAST(SUM(CAST(q AS HUGEINT)) AS DOUBLE) AS sq,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x AS HUGEINT) * q) AS DOUBLE) AS sxq
  FROM b GROUP BY user_id
),
d AS (
  SELECT user_id, n, sx, sq, sxx, sxq,
         CAST(n AS DOUBLE) * sxq - sx * sq AS num,
         CAST(n AS DOUBLE) * sxx - sx * sx AS den
  FROM s
)
SELECT user_id, n,
       ROUND(num / den * 3600.0, 6) AS slope_per_hour,
       ROUND((sq - num / den * sx) / CAST(n AS DOUBLE) / 1000000.0, 6)
         AS intercept
FROM d
WHERE n >= 2 AND den <> 0
"""


@query("user_value_trend", _TREND_ORACLE)
def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("user_id", "ts", "value")
    from ..functions.timestamps import micros

    x = micros(F.col("ts")) - micros(F.lit("2024-01-01").cast("timestamp"))
    q = F.round(F.col("value") * 1_000_000.0, 0).cast("long")
    b = e.select("user_id", x.alias("x"), q.alias("q"))
    xd = F.col("x").cast("decimal(20,0)")
    qd = F.col("q").cast("decimal(20,0)")
    s = b.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(qd).cast("double").alias("sq"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(xd * qd).cast("double").alias("sxq"),
    )
    n_d = F.col("n").cast("double")
    num = n_d * F.col("sxq") - F.col("sx") * F.col("sq")
    den = n_d * F.col("sxx") - F.col("sx") * F.col("sx")
    d = s.select("user_id", "n", "sx", "sq", num.alias("num"), den.alias("den"))
    return (
        d.filter((F.col("n") >= 2) & (F.col("den") != 0))
        .select(
            "user_id",
            "n",
            F.round(F.col("num") / F.col("den") * 3600.0, 6).alias(
                "slope_per_hour"
            ),
            F.round(
                (F.col("sq") - F.col("num") / F.col("den") * F.col("sx"))
                / F.col("n").cast("double")
                / 1_000_000.0,
                6,
            ).alias("intercept"),
        )
    )


# ---------------------------------------------------------------------------
# time_weighted_avg — the hypertable signature aggregate: per (user, day)
# the PIECEWISE-CONSTANT time-weighted mean of `value` (each reading
# holds until the next one; the final reading holds until midnight — the
# LOCF integral, à la TimescaleDB's time_weight('LOCF')). A plain AVG
# over-weights bursts; the time-weighted form is what sensor rollups
# actually need. Exactness: weights are exact micros (lead() within the
# day), values quantize ×1e6, and Σq·w accumulates in DECIMAL(38) /
# HUGEINT — order-independent — before ONE double division at the end.
# Shape: one window (lead) and one aggregate, both on the same
# (user, day) partitioning.
# ---------------------------------------------------------------------------

_TWA_ORACLE = """
WITH b AS (
  SELECT user_id, date_trunc('day', ts) AS day, ts,
         CAST(round(value * 1000000.0, 0) AS BIGINT) AS q,
         lead(ts) OVER (PARTITION BY user_id, date_trunc('day', ts)
                        ORDER BY ts, event_id) AS next_ts
  FROM events
),
w AS (
  SELECT user_id, day, q,
         epoch_us(COALESCE(next_ts, day + INTERVAL 1 DAY))
           - epoch_us(ts) AS w_us
  FROM b
)
SELECT user_id, day,
       ROUND(CAST(SUM(CAST(q AS HUGEINT) * w_us) AS DOUBLE)
             / CAST(SUM(CAST(w_us AS HUGEINT)) AS DOUBLE) / 1000000.0,
             6) AS twa
FROM w GROUP BY user_id, day
"""


@query("time_weighted_avg", _TWA_ORACLE)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.timestamps import micros

    e = t(spark, sf_dir, "events").select("user_id", "ts", "value", "event_id")
    day = F.date_trunc("day", "ts")
    b = e.select(
        "user_id",
        day.alias("day"),
        "ts",
        F.round(F.col("value") * 1_000_000.0, 0).cast("long").alias("q"),
        "event_id",
    )
    wspec = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(wspec)
    day_end = F.col("day") + F.expr("INTERVAL 1 DAY")
    w_us = micros(F.coalesce(nxt, day_end)) - micros(F.col("ts"))
    weighted = b.withColumn("w_us", w_us)
    num = F.sum(
        F.col("q").cast("decimal(18,0)") * F.col("w_us").cast("decimal(20,0)")
    ).cast("double")
    den = F.sum(F.col("w_us").cast("decimal(20,0)")).cast("double")
    return weighted.groupBy("user_id", "day").agg(
        F.round(num / den / 1_000_000.0, 6).alias("twa")
    )


# ---------------------------------------------------------------------------
# cdc_apply — CDC / MERGE-INTO apply (the lakehouse upsert-with-deletes
# fold): the event stream is read as a change log — each row is an
# operation on its user key ('error' = DELETE, anything else = UPSERT
# carrying value), ordered by the total sequence (ts, event_id) — and
# the query produces the final table state: last-writer-wins per key,
# keys whose LAST operation is a delete are absent. This is what Delta/
# Hudi/Iceberg MERGE INTO computes before writing; expressed as ONE
# per-key window pass (rank + count share the same partitioning, so one
# shuffle total) rather than a join of base vs changes. At 100 TB the
# window partitions by key hash; no key's history crosses executors.
# ---------------------------------------------------------------------------

_CDC_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type, value, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_changes
  FROM events
)
SELECT user_id,
       value AS last_value,
       epoch_us(ts) AS last_us,
       CAST(n_changes AS BIGINT) AS n_changes
FROM ranked
WHERE rn = 1 AND event_type <> 'error'
"""


@query("cdc_apply", _CDC_ORACLE)
def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.timestamps import micros

    e = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("user_id")
    ranked = e.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_changes", F.count(F.lit(1)).over(wc)
    )
    return ranked.filter(
        (F.col("rn") == 1) & (F.col("event_type") != "error")
    ).select(
        "user_id",
        F.col("value").alias("last_value"),
        micros(F.col("ts")).alias("last_us"),
        F.col("n_changes").cast("long").alias("n_changes"),
    )


# ---------------------------------------------------------------------------
# ohlc_bars — time-series downsampling to OHLC bars (the hypertable
# continuous-aggregate staple: open/high/low/close per 6-hour bucket
# and series). High/low are plain min/max; open/close are the values at
# the bar's FIRST/LAST instant, made deterministic by ranking on the
# total order (ts, event_id) — min_by/arg_min alone tie-break
# arbitrarily and won't cross-verify. Shape: both row_number windows
# and the final aggregate share one (event_type, bar) partitioning →
# a single shuffle; bar ids are exact integer micros division.
# ---------------------------------------------------------------------------

_BAR_US = 6 * 3_600_000_000

_OHLC_ORACLE = f"""
WITH based AS (
  SELECT event_type, value, ts, event_id,
         epoch_us(ts) // {_BAR_US} AS bar
  FROM events
),
ranked AS (
  SELECT event_type, bar, value,
         row_number() OVER (PARTITION BY event_type, bar
                            ORDER BY ts ASC, event_id ASC) AS rn_a,
         row_number() OVER (PARTITION BY event_type, bar
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM based
)
SELECT event_type, CAST(bar AS BIGINT) AS bar,
       MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ranked GROUP BY event_type, bar
"""


@query("ohlc_bars", _OHLC_ORACLE)
def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.timestamps import micros

    e = t(spark, sf_dir, "events").select(
        "event_type", "value", "ts", "event_id",
        micros(F.col("ts")).alias("_us"),
    )
    e = e.withColumn("bar", F.expr(f"_us div {_BAR_US}")).drop("_us")
    wa = Window.partitionBy("event_type", "bar").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wd = Window.partitionBy("event_type", "bar").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = e.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return ranked.groupBy("event_type", "bar").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# isotonic_fit — WEIGHTED isotonic regression (pool-adjacent-
# violators) of the hourly value series per type: the monotone-fit/
# calibration operator (Zadrozny-Elkan isotonic calibration, trend
# extraction under a monotonicity constraint). Real calibration
# pipelines fit on aggregated bins, and that is also what makes the
# operator scale: the series PAV sees is the HOURLY rollup
# (h, sum_cents, n) — calendar-bounded, not data-bounded — so the one
# genuine ``applyInPandas`` group here holds #hours rows regardless of
# event volume (a year of hours is 8,760 rows; the raw-series variant
# this replaced held N/5 events per task and was the round-4 verdict's
# unbounded-group flag). A belt-and-braces in-UDF guard still refuses
# groups past a hard cap rather than silently OOM-ing. Exactness: the
# event-volume pass is a map-side-combined groupBy producing exact
# BIGINT (sum, count) per hour; weighted PAV pools merge those by
# integer cross-multiplication; the ONLY float op is the final
# sum/count division. The oracle is the O(H²) weighted MINIMAX
# IDENTITY fit[i] = max_{j≤i} min_{k≥i} wavg(y[j..k]) — equality holds
# bit-for-bit because every candidate average divides the same exact
# integers, and it doubles as an independent proof that the stack
# algorithm computes the true weighted isotonic solution.
# ---------------------------------------------------------------------------

_ISO_ORACLE = """
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, h, s, n,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS i
  FROM hourly
),
ps AS (
  SELECT event_type, h, i, s, n,
         SUM(s) OVER (PARTITION BY event_type ORDER BY i
                      ROWS UNBOUNDED PRECEDING) AS cs,
         SUM(n) OVER (PARTITION BY event_type ORDER BY i
                      ROWS UNBOUNDED PRECEDING) AS cn
  FROM idx
),
spans AS (
  SELECT j.event_type, j.i AS j, k.i AS k,
         CAST(k.cs - j.cs + j.s AS DOUBLE) / (k.cn - j.cn + j.n) AS avg_v
  FROM ps j JOIN ps k ON k.event_type = j.event_type AND k.i >= j.i
),
tmin AS (
  SELECT event_type, j, k,
         MIN(avg_v) OVER (PARTITION BY event_type, j ORDER BY k DESC
                          ROWS UNBOUNDED PRECEDING) AS suffix_min
  FROM spans
),
fit AS (
  SELECT p.event_type, p.h, MAX(t.suffix_min) AS fitted_raw
  FROM ps p JOIN tmin t ON t.event_type = p.event_type AND t.j <= p.i AND t.k = p.i
  GROUP BY p.event_type, p.h
)
SELECT event_type, h, ROUND(fitted_raw / 100.0, 6) AS fitted
FROM fit
"""


_ISO_MAX_GROUP = 2_000_000  # far past any calendar; refuse, don't OOM


@query("isotonic_fit", _ISO_ORACLE)
def isotonic_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..functions.timestamps import micros

    e = t(spark, sf_dir, "events").select(
        "event_type",
        micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    hourly = (
        e.select("event_type", F.expr("us div 3600000000").alias("h"), "cents")
        .groupBy("event_type", "h")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    out_schema = StructType(
        [
            StructField("event_type", StringType(), False),
            StructField("h", LongType(), False),
            StructField("fitted", DoubleType(), False),
        ]
    )

    def pav(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > _ISO_MAX_GROUP:
            raise ValueError(
                f"isotonic_fit: series of {len(pdf)} blocks exceeds the "
                f"{_ISO_MAX_GROUP}-row group cap — widen the grid"
            )
        pdf = pdf.sort_values("h")
        hs = pdf["h"].tolist()
        # weighted pools: [sum, count]; merge while left.avg >= right.avg,
        # compared exactly via integer cross-multiplication
        pools: list[list[int]] = []
        for s, n in zip(pdf["s"], pdf["n"]):
            pools.append([int(s), int(n), 1])
            while (
                len(pools) > 1
                and pools[-2][0] * pools[-1][1] >= pools[-1][0] * pools[-2][1]
            ):
                s2, c2, b2 = pools.pop()
                pools[-1][0] += s2
                pools[-1][1] += c2
                pools[-1][2] += b2
        import math

        fitted = []
        for s, c, nblocks in pools:
            v = (s / c) / 100.0
            # SQL ROUND semantics (half AWAY from zero) — Python's
            # built-in round is half-even and would diverge on ties
            r = math.floor(abs(v) * 1e6 + 0.5) / 1e6
            fitted.extend([r if v >= 0 else -r] * nblocks)
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"].iloc[0],
                "h": hs,
                "fitted": fitted,
            }
        )

    return hourly.groupBy("event_type").applyInPandas(pav, schema=out_schema)


# ---------------------------------------------------------------------------
# cusum_changepoint — CUSUM change-point detection per series (the
# monitoring staple: where did the level shift?): the point maximizing
# |S_i| where S_i = Σ_{j≤i}(v_j − mean). Exactness: multiply through by
# N so the deviation is the INTEGER d_i = N·cents_i − total_cents
# (mean never materializes as a float); S_i is then an exact BIGINT
# running sum and the argmax is a plain integer comparison.
# Distributed shape (NOT a per-type window over raw events — that caps
# parallelism at the 5 event types): the sequence_pack bucketed prefix
# sum. Hour buckets partition the (ts, event_id) ORDER within a type —
# every row in hour h sorts before every row in hour h+1 — so a
# per-(type, hour) cumsum window (thousands of parallel partitions)
# plus a broadcast per-bucket offset (prefix sum over the HOURLY
# rollup, rollup-sized) reconstructs the exact global S_i. The argmax
# is then a map-side-combinable MAX_BY over struct(|S|, -us, -id) — no
# rank window over event-volume rows anywhere in the plan.
# Magnitude: |d| ≤ N·max_cents → S ≤ N²·max_cents ≈ 5e9·N at sf-scale
# values; int64-safe through sf10 (≈2e6 rows/type → 2e16).
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH c AS (
  SELECT event_type, event_id, ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS total
  FROM c GROUP BY event_type
),
dev AS (
  SELECT c.event_type, c.event_id, c.ts,
         c.cents * t.n - t.total AS d
  FROM c JOIN tot t USING (event_type)
),
cs AS (
  SELECT event_type, event_id, ts,
         SUM(d) OVER (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS s
  FROM dev
),
ranked AS (
  SELECT event_type, event_id, ts, s,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ABS(s) DESC, ts ASC, event_id ASC) AS rn
  FROM cs
)
SELECT event_type, event_id AS change_event, epoch_us(ts) AS change_us,
       CAST(s AS BIGINT) AS s_scaled
FROM ranked WHERE rn = 1
"""


@query("cusum_changepoint", _CUSUM_ORACLE)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.timestamps import micros

    c = t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    tot = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total")
    )
    dev = (
        c.join(F.broadcast(tot), "event_type")
        .withColumn("d", F.col("cents") * F.col("n") - F.col("total"))
        .withColumn("h", F.expr("us div 3600000000"))
        .select("event_type", "event_id", "us", "h", "d")
    )
    # per-(type, hour) cumsum — hour buckets partition the (us, id)
    # order, so bucket-local cumsum + bucket offset == global cumsum
    w_in = (
        Window.partitionBy("event_type", "h")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offsets = (
        dev.groupBy("event_type", "h")
        .agg(F.sum("d").alias("hd"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("hd").over(
                    Window.partitionBy("event_type")
                    .orderBy("h")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("event_type", "h", "offset")
    )
    cs = (
        dev.withColumn("cum_in", F.sum("d").over(w_in))
        .join(offsets, ["event_type", "h"])
        .withColumn("s", F.col("offset") + F.col("cum_in"))
    )
    best = cs.groupBy("event_type").agg(
        F.max(
            F.struct(
                F.abs(F.col("s")).alias("abs_s"),
                (-F.col("us")).alias("neg_us"),
                (-F.col("event_id")).alias("neg_id"),
                F.col("s").alias("s"),
            )
        ).alias("m")
    )
    return best.select(
        "event_type",
        (-F.col("m.neg_id")).alias("change_event"),
        (-F.col("m.neg_us")).alias("change_us"),
        F.col("m.s").cast("long").alias("s_scaled"),
    )


# ---------------------------------------------------------------------------
# max_drawdown — maximum peak-to-trough decline of the value series per
# type (the risk/monitoring staple: largest drop from a running high).
# Exactness: integer cents; drawdown_i = runmax_{<=i} - cents_i is an
# exact BIGINT; the argmax is integer struct comparison. Distributed
# shape (the cusum_changepoint bucketed-prefix pattern, for MAX instead
# of SUM — running max is just as decomposable): per-(type, hour) local
# running-max windows in parallel, an EXCLUSIVE prefix max over the
# hourly-max rollup broadcast back, global runmax = greatest(local,
# hour-prefix), and the final argmax is a map-side-combinable
# max(struct) — no 5-key window over raw events.
# ---------------------------------------------------------------------------

_DRAWDOWN_ORACLE = """
WITH c AS (
  SELECT event_type, event_id, epoch_us(ts) AS us,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT event_type, event_id, us, cents,
         MAX(cents) OVER (PARTITION BY event_type ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS runmax
  FROM c
),
ranked AS (
  SELECT event_type, event_id, us, runmax - cents AS dd,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY runmax - cents DESC, us ASC,
                                     event_id ASC) AS rn
  FROM r
)
SELECT event_type, CAST(dd AS BIGINT) AS drawdown_cents,
       event_id AS trough_event, us AS trough_us
FROM ranked WHERE rn = 1
"""


@query("max_drawdown", _DRAWDOWN_ORACLE)
def max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.timestamps import micros

    c = t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    ).withColumn("h", F.expr("us div 3600000000"))
    w_in = (
        Window.partitionBy("event_type", "h")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # exclusive prefix max over the hourly-max rollup (rollup-sized)
    hour_prefix = (
        c.groupBy("event_type", "h")
        .agg(F.max("cents").alias("hmax"))
        .withColumn(
            "prevmax",
            F.max("hmax").over(
                Window.partitionBy("event_type")
                .orderBy("h")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .select("event_type", "h", "prevmax")
    )
    dd = (
        c.withColumn("local_max", F.max("cents").over(w_in))
        .join(hour_prefix, ["event_type", "h"])
        .withColumn(
            "runmax",
            F.greatest(F.col("local_max"), F.coalesce("prevmax", F.col("local_max"))),
        )
        .withColumn("dd", F.col("runmax") - F.col("cents"))
    )
    best = dd.groupBy("event_type").agg(
        F.max(
            F.struct(
                F.col("dd").alias("dd"),
                (-F.col("us")).alias("neg_us"),
                (-F.col("event_id")).alias("neg_id"),
            )
        ).alias("m")
    )
    return best.select(
        "event_type",
        F.col("m.dd").cast("long").alias("drawdown_cents"),
        (-F.col("m.neg_id")).alias("trough_event"),
        (-F.col("m.neg_us")).alias("trough_us"),
    )


# ---------------------------------------------------------------------------
# theil_sen_daily_slope — robust trend estimate per type: the Theil-Sen
# estimator (median of pairwise slopes) over the DAILY average-value
# series. Scale: slopes come from a self-join of the daily rollup —
# C(days, 2) pairs is calendar-bounded (a decade is ~6.6M pairs per
# type), never event-volume; the median is picked off the pair table
# with one rollup-level window. Exactness: daily sums/counts are exact
# BIGINTs; each slope is two correctly-rounded IEEE divisions and one
# subtraction — bit-identical across engines — and the LOWER median is
# a selection (no averaging), so ties in slope cannot change the picked
# value.
# ---------------------------------------------------------------------------

_THEILSEN_ORACLE = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
slopes AS (
  SELECT a.event_type,
         (CAST(b.s AS DOUBLE) / b.n - CAST(a.s AS DOUBLE) / a.n)
           / (b.d - a.d) AS slope
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND b.d > a.d
),
ranked AS (
  SELECT event_type, slope,
         row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS np
  FROM slopes
)
SELECT event_type, CAST(MAX(np) AS BIGINT) AS n_pairs,
       MIN(CASE WHEN 2 * rn >= np + 1 THEN slope END) / 100.0
         AS slope_per_day
FROM ranked GROUP BY event_type
"""


@query("theil_sen_daily_slope", _THEILSEN_ORACLE)
def theil_sen_daily_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.timestamps import micros

    daily = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            micros(F.col("ts")).alias("us"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .withColumn("d", F.expr("us div 86400000000"))
        .groupBy("event_type", "d")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    a = daily.select("event_type", F.col("d").alias("d1"), F.col("s").alias("s1"), F.col("n").alias("n1"))
    b = daily.select("event_type", F.col("d").alias("d2"), F.col("s").alias("s2"), F.col("n").alias("n2"))
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("d2") > F.col("d1"))
        .withColumn(
            "slope",
            (
                F.col("s2").cast("double") / F.col("n2")
                - F.col("s1").cast("double") / F.col("n1")
            )
            / (F.col("d2") - F.col("d1")),
        )
        .select("event_type", "slope")
    )
    wv = Window.partitionBy("event_type").orderBy("slope")
    wt = Window.partitionBy("event_type")
    ranked = slopes.withColumn("rn", F.row_number().over(wv)).withColumn(
        "np", F.count(F.lit(1)).over(wt)
    )
    return ranked.groupBy("event_type").agg(
        F.max("np").cast("long").alias("n_pairs"),
        (
            F.min(F.when(2 * F.col("rn") >= F.col("np") + 1, F.col("slope")))
            / F.lit(100.0)
        ).alias("slope_per_day"),
    )


# ---------------------------------------------------------------------------
# kaplan_meier — survival analysis over user lifetimes (the churn
# staple: what fraction of users "survive" to activity-span t?).
# Lifetime = last-minus-first event in whole days; a user is an
# observed churn (event) if their last event is >= 7 days before the
# dataset's end, else right-CENSORED (still active when observation
# stopped) — the distinction Kaplan-Meier exists for. The estimator
#   S(t) = prod_{t_i <= t} (1 - d_i / n_i)
# is a sequential product, kept EXACT cross-engine in integer
# parts-per-trillion: S_0 = 1e12; S_t = (S_{t-1} * (n_t - d_t)) div n_t
# — arbitrary-precision ints in the Python fold, HUGEINT in the DuckDB
# recursive CTE, truncating division both sides (operands are
# non-negative, where Python // == truncation). Distributed shape: the
# event volume is reduced map-side to per-user spans, then to the
# DAY-LEVEL life table (<= #distinct lifetimes rows); only that tiny
# table enters the single-group applyInPandas fold, with a loud group
# cap like isotonic_fit's. n_at_risk derives from the life table
# itself (N - running prior exits), so the fold needs no side input.
# ---------------------------------------------------------------------------

_KM_CENSOR_DAYS = 7
_KM_MAX_DAYS = 100_000  # life-table rows the driver-side fold will accept

_KM_ORACLE = f"""
WITH RECURSIVE spans AS (
  SELECT user_id, MIN(epoch_us(ts)) AS f, MAX(epoch_us(ts)) AS l
  FROM events GROUP BY user_id
),
obs AS (SELECT MAX(l) AS endus FROM spans),
marked AS (
  SELECT (l - f) // 86400000000 AS dur,
         CASE WHEN o.endus - l >= {_KM_CENSOR_DAYS}::BIGINT * 86400000000
              THEN 1 ELSE 0 END AS ev
  FROM spans CROSS JOIN obs o
),
life AS (
  SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
         CAST(SUM(1 - ev) AS BIGINT) AS c
  FROM marked GROUP BY dur
),
days AS (
  SELECT dur, d, c,
         (SELECT COUNT(*) FROM marked)
           - COALESCE(SUM(d + c) OVER (ORDER BY dur
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk,
         row_number() OVER (ORDER BY dur) AS rn
  FROM life
),
fold AS (
  SELECT rn, dur, d, c, n_risk,
         (1000000000000::HUGEINT * (n_risk - d)) // n_risk AS s
  FROM days WHERE rn = 1
  UNION ALL
  SELECT dy.rn, dy.dur, dy.d, dy.c, dy.n_risk,
         (f.s * (dy.n_risk - dy.d)) // dy.n_risk
  FROM fold f JOIN days dy ON dy.rn = f.rn + 1
)
SELECT dur AS t_days, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
       c AS n_censored, CAST(s AS BIGINT) AS surv_ppt
FROM fold
"""


@query("kaplan_meier", _KM_ORACLE)
def kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    from ..functions.timestamps import micros

    spans = (
        t(spark, sf_dir, "events")
        .select("user_id", micros(F.col("ts")).alias("us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("f"), F.max("us").alias("l"))
    )
    obs = spans.agg(F.max("l").alias("endus"))
    marked = spans.crossJoin(F.broadcast(obs)).select(
        F.expr("(l - f) div 86400000000").alias("dur"),
        F.when(
            F.col("endus") - F.col("l")
            >= F.lit(_KM_CENSOR_DAYS) * 86400000000,
            1,
        )
        .otherwise(0)
        .alias("ev"),
    )
    life = marked.groupBy("dur").agg(
        F.sum("ev").cast("long").alias("d"),
        F.sum(F.lit(1) - F.col("ev")).cast("long").alias("c"),
    )
    out_schema = StructType(
        [
            StructField("t_days", LongType(), False),
            StructField("n_risk", LongType(), False),
            StructField("n_events", LongType(), False),
            StructField("n_censored", LongType(), False),
            StructField("surv_ppt", LongType(), False),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > _KM_MAX_DAYS:
            raise ValueError(
                f"kaplan_meier: life table of {len(pdf)} rows exceeds the "
                f"{_KM_MAX_DAYS}-row fold cap — coarsen the duration unit"
            )
        pdf = pdf.sort_values("dur")
        total = int((pdf["d"] + pdf["c"]).sum())
        s = 1_000_000_000_000
        exited = 0
        rows = []
        for dur, d, c in zip(pdf["dur"], pdf["d"], pdf["c"]):
            n_risk = total - exited
            s = s * (n_risk - int(d)) // n_risk
            rows.append((int(dur), n_risk, int(d), int(c), s))
            exited += int(d) + int(c)
        return pd.DataFrame(
            rows, columns=["t_days", "n_risk", "n_events", "n_censored", "surv_ppt"]
        )

    return (
        life.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda key, pdf: fold(pdf), schema=out_schema)
    )


# ---------------------------------------------------------------------------
# hourly_type_correlation — cross-series Pearson correlation between
# event types' hourly volumes (the co-movement matrix behind alert
# grouping and capacity planning). The series live on a SHARED hourly
# spine (distinct hours x distinct types, zeros filled) so absence
# counts as 0 instead of silently dropping rows. All five moments
# (Sx, Sy, Sxy, Sxx, Syy) accumulate as exact integers in
# DECIMAL(38,0)/HUGEINT; r is then a fixed sequence of IEEE ops on
# identical inputs (two sqrt — correctly rounded by spec — one
# multiply, one divide), zero-variance pairs explicitly NULL. Shape:
# event volume collapses map-side to the (hour, type) rollup; the
# spine densify and the pair join run on rollup-sized data (hours x 5
# types), and the pair count is C(5,2)=10 — nothing downstream of the
# first aggregate scales with raw rows.
# ---------------------------------------------------------------------------

_HOURLY_CORR_ORACLE = """
WITH counts AS (
  SELECT epoch_us(ts) // 3600000000 AS h, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
spine AS (SELECT DISTINCT h FROM counts),
types AS (SELECT DISTINCT event_type FROM counts),
dense AS (
  SELECT s.h, ty.event_type, COALESCE(c.n, 0) AS n
  FROM spine s CROSS JOIN types ty
  LEFT JOIN counts c ON c.h = s.h AND c.event_type = ty.event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(a.n AS HUGEINT)) AS sx,
         SUM(CAST(b.n AS HUGEINT)) AS sy,
         SUM(CAST(a.n AS HUGEINT) * b.n) AS sxy,
         SUM(CAST(a.n AS HUGEINT) * a.n) AS sxx,
         SUM(CAST(b.n AS HUGEINT) * b.n) AS syy
  FROM dense a JOIN dense b
    ON a.h = b.h AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, CAST(n AS BIGINT) AS n_hours,
       CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
            END AS pearson_r
FROM pairs
"""


@query("hourly_type_correlation", _HOURLY_CORR_ORACLE)
def hourly_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timestamps import micros

    d38 = "decimal(38,0)"
    e = t(spark, sf_dir, "events").select(
        (micros(F.col("ts"))).alias("us"), "event_type"
    )
    counts = (
        e.select(F.expr("us div 3600000000").alias("h"), "event_type")
        .groupBy("h", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        # rollup roots the spine/types/dense diamond (hours × 5 rows):
        # checkpoint so the events scan happens once, not per branch
        .localCheckpoint()
    )
    spine = counts.select("h").distinct()
    types = counts.select("event_type").distinct()
    dense = (
        spine.crossJoin(F.broadcast(types))
        .join(counts, ["h", "event_type"], "left")
        .select("h", "event_type", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
    )
    a = dense.select("h", F.col("event_type").alias("type_a"), F.col("n").alias("xa"))
    b = dense.select("h", F.col("event_type").alias("type_b"), F.col("n").alias("xb"))
    pairs = (
        a.join(b, "h")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast(d38).alias("n"),
            F.sum(F.col("xa").cast(d38)).alias("sx"),
            F.sum(F.col("xb").cast(d38)).alias("sy"),
            F.sum(F.col("xa").cast(d38) * F.col("xb")).alias("sxy"),
            F.sum(F.col("xa").cast(d38) * F.col("xa")).alias("sxx"),
            F.sum(F.col("xb").cast(d38) * F.col("xb")).alias("syy"),
        )
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return pairs.select(
        "type_a",
        "type_b",
        F.col("n").cast("long").alias("n_hours"),
        num.cast("long").alias("cov_num"),
        F.when(
            (vx > 0) & (vy > 0),
            num.cast("double")
            / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
        ).alias("pearson_r"),
    )


# ---------------------------------------------------------------------------
# ma_crossover — moving-average crossover signals on daily revenue
# (the momentum/trend primitive): days where the 7-day calendar
# average crosses the 28-day calendar average, with direction. The
# comparison is EXACT: averages are never materialized — s7/c7 >
# s28/c28 is cross-multiplied to the integer test s7*c28 > s28*c7
# (counts positive, cents sums int64 through very large scales). The
# windows are calendar-true RANGE frames over the integer day index,
# so missing days shrink the window instead of stretching it. Shape:
# orders collapse map-side to the daily rollup; the only window runs
# over that rollup-sized series (one row per calendar day with
# orders) — a deliberately unpartitioned window over a tiny table,
# same stance as global_rank's cell table.
# ---------------------------------------------------------------------------

_MA_CROSSOVER_ORACLE = """
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_idx,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
ma AS (
  SELECT day_idx, cents,
         SUM(cents) OVER w7 AS s7, COUNT(*) OVER w7 AS c7,
         SUM(cents) OVER w28 AS s28, COUNT(*) OVER w28 AS c28
  FROM daily
  WINDOW w7 AS (ORDER BY day_idx RANGE BETWEEN 6 PRECEDING AND CURRENT ROW),
         w28 AS (ORDER BY day_idx RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
),
sig AS (
  SELECT day_idx, s7, c7, s28, c28,
         CASE WHEN s7 * c28 > s28 * c7 THEN 1 ELSE 0 END AS above,
         LAG(CASE WHEN s7 * c28 > s28 * c7 THEN 1 ELSE 0 END)
           OVER (ORDER BY day_idx) AS prev_above
  FROM ma
)
SELECT day_idx,
       CASE WHEN above = 1 THEN 'golden' ELSE 'death' END AS direction,
       CAST(s7 AS BIGINT) AS s7_cents, CAST(c7 AS BIGINT) AS c7,
       CAST(s28 AS BIGINT) AS s28_cents, CAST(c28 AS BIGINT) AS c28
FROM sig WHERE prev_above IS NOT NULL AND above <> prev_above
"""


@query("ma_crossover", _MA_CROSSOVER_ORACLE)
def ma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = (
        t(spark, sf_dir, "orders")
        .select(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
            .cast("long")
            .alias("day_idx"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("day_idx")
        .agg(F.sum("c").alias("cents"))
    )
    w7 = Window.orderBy("day_idx").rangeBetween(-6, 0)
    w28 = Window.orderBy("day_idx").rangeBetween(-27, 0)
    ma = daily.select(
        "day_idx",
        F.sum("cents").over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("c7"),
        F.sum("cents").over(w28).alias("s28"),
        F.count(F.lit(1)).over(w28).alias("c28"),
    )
    above = F.when(
        F.col("s7") * F.col("c28") > F.col("s28") * F.col("c7"), 1
    ).otherwise(0)
    sig = ma.withColumn("above", above).withColumn(
        "prev_above", F.lag("above").over(Window.orderBy("day_idx"))
    )
    return sig.filter(
        F.col("prev_above").isNotNull() & (F.col("above") != F.col("prev_above"))
    ).select(
        "day_idx",
        F.when(F.col("above") == 1, "golden").otherwise("death").alias("direction"),
        F.col("s7").alias("s7_cents"),
        "c7",
        F.col("s28").alias("s28_cents"),
        "c28",
    )


# ---------------------------------------------------------------------------
# new_vs_returning — growth accounting (the activation dashboard):
# per day, how many active users are brand-new vs returning, plus the
# cumulative registered-user curve. Shape: events collapse to distinct
# (day, user) map-side; first-seen days are a per-user MIN; both roll
# up to DAY-level tables and the cumulative sum is a window over that
# tiny series (one row per day) — nothing post-rollup scales with
# events. All counts exact BIGINTs.
# ---------------------------------------------------------------------------

_NEW_RETURNING_ORACLE = """
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events
),
firsts AS (
  SELECT user_id, MIN(day) AS fday FROM du GROUP BY 1
),
newu AS (
  SELECT fday AS day, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM firsts GROUP BY 1
),
act AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS active_users FROM du GROUP BY 1
)
SELECT a.day, a.active_users,
       COALESCE(n.new_users, 0) AS new_users,
       a.active_users - COALESCE(n.new_users, 0) AS returning_users,
       CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY a.day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
FROM act a LEFT JOIN newu n ON n.day = a.day
"""


@query("new_vs_returning", _NEW_RETURNING_ORACLE)
def new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.timestamps import micros

    du = (
        t(spark, sf_dir, "events")
        .select(micros(F.col("ts")).alias("us"), "user_id")
        .select(F.expr("us div 86400000000").alias("day"), "user_id")
        .distinct()
    )
    firsts = du.groupBy("user_id").agg(F.min("day").alias("fday"))
    newu = firsts.groupBy(F.col("fday").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    act = du.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("active_users")
    )
    joined = act.join(newu, "day", "left").select(
        "day",
        "active_users",
        F.coalesce(F.col("new_users"), F.lit(0)).alias("new_users"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "day",
        "active_users",
        "new_users",
        (F.col("active_users") - F.col("new_users")).alias("returning_users"),
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


# ---------------------------------------------------------------------------
# hourly_value_emd — distribution drift as 1-D earth-mover distance:
# for every hour, the EMD between that hour's value histogram and the
# whole dataset's, on the same fixed $5 cells as the streaming
# histogram (comparable across windows by construction). In 1-D the
# EMD is the area between CDFs; on an integer cell axis that is
#   Σ_segments |cumH·N − cumG·N_h| · segment_width
# with denominators cleared — every term an exact integer in
# DECIMAL(38,0)/HUGEINT (cum·N ≈ 1e24 at 1e12-row scale, inside
# DECIMAL(38)), and the reported emd_cells is ONE division by N·N_h.
# Segment widths come from the global distinct-cell spine (gaps where
# neither distribution moves still carry the flat |ΔCDF| — dropping
# them is the classic sparse-EMD bug). Shape: events collapse map-side
# to the (hour, cell) rollup; the dense spine, both CDF windows and
# the final rollup are all rollup-sized (hours × occupied cells).
# ---------------------------------------------------------------------------

# shared CTE scaffold: per-(hour, cell) CDFs of the hourly and global
# value histograms on the fixed $5 cells, densified over the global
# distinct-cell spine — consumed by both hourly_value_emd (width-
# weighted sum of |ΔCDF|) and hourly_ks_drift (sup of |ΔCDF|)
_HOUR_CELL_CDF_SQL = """
WITH c AS (
  SELECT epoch_us(ts) // 3600000000 AS h,
         CAST(ROUND(value * 100, 0) AS BIGINT) // 500 AS cell
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
hc AS (
  SELECT h, cell, CAST(COUNT(*) AS HUGEINT) AS n FROM c GROUP BY 1, 2
),
spine AS (
  SELECT cell,
         COALESCE(LEAD(cell) OVER (ORDER BY cell) - cell, 1) AS width
  FROM (SELECT DISTINCT cell FROM hc)
),
hours AS (SELECT h, SUM(n) AS nh FROM hc GROUP BY 1),
tot AS (SELECT SUM(n) AS n FROM hc),
gcum AS (
  SELECT cell, SUM(gn) OVER (ORDER BY cell ROWS UNBOUNDED PRECEDING) AS cumg
  FROM (SELECT cell, SUM(n) AS gn FROM hc GROUP BY 1)
),
dense AS (
  SELECT hr.h, sp.cell, sp.width, hr.nh, COALESCE(x.n, 0) AS n
  FROM hours hr CROSS JOIN spine sp
  LEFT JOIN hc x ON x.h = hr.h AND x.cell = sp.cell
),
hcum AS (
  SELECT h, cell, width, nh,
         SUM(n) OVER (PARTITION BY h ORDER BY cell ROWS UNBOUNDED PRECEDING)
           AS cumh
  FROM dense
)
"""

_EMD_ORACLE = _HOUR_CELL_CDF_SQL + """
SELECT hc2.h,
       CAST(MIN(hc2.nh) AS BIGINT) AS n,
       CAST(SUM(ABS(hc2.cumh * t.n - g.cumg * hc2.nh) * hc2.width) AS BIGINT)
         AS emd_num,
       CAST(SUM(ABS(hc2.cumh * t.n - g.cumg * hc2.nh) * hc2.width) AS DOUBLE)
         / CAST(MIN(hc2.nh) * t.n AS DOUBLE) AS emd_cells
FROM hcum hc2 JOIN gcum g USING (cell) CROSS JOIN tot t
GROUP BY hc2.h, t.n
"""


def _hour_cell_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _HOUR_CELL_CDF_SQL: one frame per (hour, spine
    cell) carrying both CDFs with denominators cleared — columns
    (h, cell, width, nh, cumh, cumg, n_tot), all DECIMAL(38,0) exact.
    Events collapse map-side to the (h, cell) rollup first; the spine,
    the global CDF and the crossing joins are all rollup-sized."""
    from pyspark.sql import Window

    from ..functions.timestamps import micros

    d38 = "decimal(38,0)"
    c = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .select(
            micros(F.col("ts")).alias("us"),
            F.expr("CAST(ROUND(value * 100, 0) AS BIGINT) div 500").alias("cell"),
        )
        .select(F.expr("us div 3600000000").alias("h"), "cell")
    )
    # the rollup roots a 5-way diamond (spine/hours/tot/gcum/dense);
    # without materialization Catalyst re-scans the corpus once per
    # branch — localCheckpoint pins the (hour, cell) rollup (≤ hours ×
    # 4096 rows at ANY corpus size) so the events scan happens ONCE
    hc = (
        c.groupBy("h", "cell")
        .agg(F.count(F.lit(1)).cast(d38).alias("n"))
        .localCheckpoint()
    )
    spine = (
        hc.select("cell")
        .distinct()
        .withColumn(
            "width",
            F.coalesce(
                F.lead("cell").over(Window.orderBy("cell")) - F.col("cell"),
                F.lit(1),
            ),
        )
    )
    hours = hc.groupBy("h").agg(F.sum("n").alias("nh"))
    tot = hc.agg(F.sum("n").alias("n_tot"))
    gcum = (
        hc.groupBy("cell")
        .agg(F.sum("n").alias("gn"))
        .withColumn(
            "cumg",
            F.sum("gn").over(
                Window.orderBy("cell").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select("cell", "cumg")
    )
    dense = (
        hours.crossJoin(F.broadcast(spine))
        .join(hc, ["h", "cell"], "left")
        .select(
            "h", "cell", "width", "nh", F.coalesce(F.col("n"), F.lit(0)).alias("n")
        )
    )
    hcum = dense.withColumn(
        "cumh",
        F.sum("n").over(
            Window.partitionBy("h")
            .orderBy("cell")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return hcum.join(F.broadcast(gcum), "cell").crossJoin(F.broadcast(tot))


@query("hourly_value_emd", _EMD_ORACLE)
def hourly_value_emd(spark: SparkSession, sf_dir: str) -> DataFrame:
    cdf = _hour_cell_cdf(spark, sf_dir)
    term = (
        F.abs(F.col("cumh") * F.col("n_tot") - F.col("cumg") * F.col("nh"))
        * F.col("width")
    )
    return (
        cdf.groupBy("h", "n_tot")
        .agg(
            F.min("nh").cast("long").alias("n"),
            F.sum(term).cast("long").alias("emd_num"),
            (
                F.sum(term).cast("double")
                / (F.min("nh") * F.col("n_tot")).cast("double")
            ).alias("emd_cells"),
        )
        .drop("n_tot")
    )


# ---------------------------------------------------------------------------
# hourly_ks_drift — the two-sample Kolmogorov–Smirnov statistic per
# hour vs the global value distribution: D = sup|F_hour − F_global|,
# the standard drift TEST statistic (EMD above is the drift DISTANCE;
# monitoring stacks want both — KS is scale-free and has the classic
# significance tables). On the discrete cell axis both CDFs change
# only at occupied cells, and every hour's occupied cells are a subset
# of the global spine, so evaluating |ΔCDF| at the spine rows IS the
# sup — no widths needed. Shares the exact-integer CDF scaffold with
# hourly_value_emd (_hour_cell_cdf): the numerator max is over exact
# DECIMAL(38) terms with denominators cleared; ks is ONE division by
# nh·N at the end.
# ---------------------------------------------------------------------------

_KS_ORACLE = _HOUR_CELL_CDF_SQL + """
SELECT hc2.h,
       CAST(MIN(hc2.nh) AS BIGINT) AS n,
       CAST(MAX(ABS(hc2.cumh * t.n - g.cumg * hc2.nh)) AS BIGINT) AS ks_num,
       CAST(MAX(ABS(hc2.cumh * t.n - g.cumg * hc2.nh)) AS DOUBLE)
         / CAST(MIN(hc2.nh) * t.n AS DOUBLE) AS ks
FROM hcum hc2 JOIN gcum g USING (cell) CROSS JOIN tot t
GROUP BY hc2.h, t.n
"""


@query("hourly_ks_drift", _KS_ORACLE)
def hourly_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    cdf = _hour_cell_cdf(spark, sf_dir)
    term = F.abs(F.col("cumh") * F.col("n_tot") - F.col("cumg") * F.col("nh"))
    return (
        cdf.groupBy("h", "n_tot")
        .agg(
            F.min("nh").cast("long").alias("n"),
            F.max(term).cast("long").alias("ks_num"),
            (
                F.max(term).cast("double")
                / (F.min("nh") * F.col("n_tot")).cast("double")
            ).alias("ks"),
        )
        .drop("n_tot")
    )


# ---------------------------------------------------------------------------
# ols_hourly_trend — classic least-squares trend per type (the
# regr_slope/regr_intercept/regr_r2 family), the parametric twin of
# theil_sen_daily_slope: regress value-cents on the hour index at the
# EVENT level. The whole regression is five integer moments
# (n, Σx, Σy, Σxy, Σx²[, Σy²]) accumulated in DECIMAL(38,0)/HUGEINT —
# one map-side partial agg, no window, no self-join; engine-native
# regr_* can't be oracled (float accumulation order differs), exact
# moments can. The hour axis is SHIFTED to each type's min hour before
# the moments (slope is shift-invariant): x ≤ ~10³ instead of ~5·10⁵,
# so n·Σx² ≈ 1e12·1e9 = 1e21 at 1e12-row scale — deep inside
# DECIMAL(38) where raw-epoch moments (n·Σx² ≈ 2·10³⁵) would sit one
# digit from overflow. The only floating point is the final
# slope/intercept/r² ratios of exact integers (portable per
# ORACLE_NOTES: same exact operands → same IEEE result).
# ---------------------------------------------------------------------------

_OLS_ORACLE = """
WITH e AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS y
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
),
shifted AS (
  SELECT event_type, h - MIN(h) OVER (PARTITION BY event_type) AS x, y,
         MIN(h) OVER (PARTITION BY event_type) AS h_min
  FROM e
),
m AS (
  SELECT event_type, MIN(h_min) AS h_min,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM shifted GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n, CAST(h_min AS BIGINT) AS h_min,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 AS slope_per_hour,
       CAST(sy * sxx - sx * sxy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 AS intercept_at_min,
       (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
         / (CAST(n * sxx - sx * sx AS DOUBLE)
            * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
FROM m
"""


@query("ols_hourly_trend", _OLS_ORACLE)
def ols_hourly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timestamps import micros

    d38 = "decimal(38,0)"
    e = (
        t(spark, sf_dir, "events")
        # grid-quantile NaN contract: NaN casts to 0 on Spark but
        # errors DuckDB's BIGINT cast — unusable measurements are out
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .select(
            "event_type",
            F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("y"),
            micros(F.col("ts")).alias("us"),
        )
        .withColumn("h", F.expr("us div 3600000000"))
    )
    hmin = e.groupBy("event_type").agg(F.min("h").alias("h_min"))
    s = (
        e.join(F.broadcast(hmin), "event_type")
        .select(
            "event_type",
            "h_min",
            (F.col("h") - F.col("h_min")).cast(d38).alias("x"),
            F.col("y").cast(d38).alias("y"),
        )
    )
    m = s.groupBy("event_type").agg(
        F.min("h_min").alias("h_min"),
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    den_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    inum = (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast("double")
    # try_divide, not `/`: den = n·Sxx−Sx² is 0 for a type whose events
    # all fall in one hour, den_y for a constant-value series — legal
    # degenerate inputs where the statistic is undefined. ANSI Spark
    # ERRORS on double x/0 while DuckDB yields NULL (ORACLE_NOTES);
    # NULL-on-zero is the portable "undefined" on both engines.
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("h_min").cast("long").alias("h_min"),
        (F.try_divide(num, den) / F.lit(100.0)).alias("slope_per_hour"),
        (F.try_divide(inum, den) / F.lit(100.0)).alias("intercept_at_min"),
        F.try_divide(num * num, den * den_y).alias("r2"),
    )


# ---------------------------------------------------------------------------
# transition_dwell_times — dwell-time profile of the user event
# sequence: for every (from_type → to_type) transition, how long users
# sit on the FROM state before moving (windows_q.event_transitions
# owns the adjacency counts/probabilities; this is its timing
# complement — think time-between-page-views features). One
# user_id-partitioned lead() window (millions of keys — parallelizes
# on its own; never a global ORDER BY), then a 25-row rollup: nothing
# else. Gap mass accumulates as exact integer microseconds (BIGINT-
# safe: 1e12 events × 3e9 µs/day-scale gaps needs the DECIMAL(38)
# accumulator used here); the mean is one final double ratio of exact
# integers. Within-user order is (ts, event_id) — total and
# deterministic, so simultaneous events can't flip pairs between
# engines.
# ---------------------------------------------------------------------------

_DWELL_ORACLE = """
WITH s AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER w AS to_type,
         lead(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(gap_us AS HUGEINT)) AS BIGINT) AS sum_gap_us,
       CAST(SUM(CAST(gap_us AS HUGEINT)) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) / 1000000.0 AS mean_gap_s
FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2
"""


@query("transition_dwell_times", _DWELL_ORACLE)
def transition_dwell_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.timestamps import micros

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    s = (
        t(spark, sf_dir, "events")
        .select(
            "user_id", "ts", "event_id", F.col("event_type").alias("from_type")
        )
        .withColumn("us", micros(F.col("ts")))
        .select(
            "from_type",
            F.lead("from_type").over(w).alias("to_type"),
            (F.lead("us").over(w) - F.col("us")).alias("gap_us"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    return s.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("gap_us").cast("decimal(38,0)")).cast("long").alias(
            "sum_gap_us"
        ),
        (
            F.sum(F.col("gap_us").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1000000.0)
        ).alias("mean_gap_s"),
    )


# ---------------------------------------------------------------------------
# mase_naive_eval — forecast-model evaluation at scale: the Mean
# Absolute Scaled Error of the naive-1 forecast (last hour) scaled by
# the seasonal-naive-24 baseline, per event type. The MASE convention:
# a model beating "same hour yesterday" scores < 1. Errors are exact:
# events collapse map-side to the (type, hour) cents rollup (720 rows
# per type at a month of data — everything after the first shuffle is
# rollup-sized), and both error masses are BIGINT sums of |Δcents|.
# Missing hours are handled by EQUI-JOINS on the hour index (h-1 /
# h-24), never LAG over rows — a gap would silently misalign a
# row-offset lag. The final mase is one double ratio of four exact
# integers: (mae1_num/n1) / (mae24_num/n24).
# ---------------------------------------------------------------------------

_MASE_ORACLE = """
WITH r AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS s
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2
),
e1 AS (
  SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS n1,
         CAST(SUM(ABS(a.s - b.s)) AS BIGINT) AS mae1_num
  FROM r a JOIN r b ON b.event_type = a.event_type AND b.h = a.h - 1
  GROUP BY 1
),
e24 AS (
  SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS n24,
         CAST(SUM(ABS(a.s - b.s)) AS BIGINT) AS mae24_num
  FROM r a JOIN r b ON b.event_type = a.event_type AND b.h = a.h - 24
  GROUP BY 1
)
SELECT e1.event_type, n1, mae1_num, n24, mae24_num,
       (CAST(mae1_num AS DOUBLE) / CAST(n1 AS DOUBLE))
         / (CAST(mae24_num AS DOUBLE) / CAST(n24 AS DOUBLE)) AS mase
FROM e1 JOIN e24 USING (event_type)
"""


@query("mase_naive_eval", _MASE_ORACLE)
def mase_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timestamps import micros

    r = (
        t(spark, sf_dir, "events")
        # grid-quantile NaN contract: NaN casts to 0 on Spark but
        # errors DuckDB's BIGINT cast — unusable measurements are out
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .select(
            "event_type",
            micros(F.col("ts")).alias("us"),
            F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("cents"),
        )
        .withColumn("h", F.expr("us div 3600000000"))
        .groupBy("event_type", "h")
        .agg(F.sum("cents").alias("s"))
        # r feeds four join branches (a/b sides × two lags); checkpoint
        # the (type, hour) rollup so the corpus is scanned once
        .localCheckpoint()
    )

    def err(lag: int, n_name: str, num_name: str) -> DataFrame:
        b = r.select(
            "event_type",
            (F.col("h") + lag).alias("h"),
            F.col("s").alias("s_prev"),
        )
        return (
            r.join(b, ["event_type", "h"])
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias(n_name),
                F.sum(F.abs(F.col("s") - F.col("s_prev")))
                .cast("long")
                .alias(num_name),
            )
        )

    e1 = err(1, "n1", "mae1_num")
    e24 = err(24, "n24", "mae24_num")
    return e1.join(e24, "event_type").select(
        "event_type",
        "n1",
        "mae1_num",
        "n24",
        "mae24_num",
        # try_divide: a constant day-lagged series makes mae24 = 0 —
        # MASE undefined → NULL on both engines (ANSI Spark would
        # error on the raw double division; DuckDB yields NULL)
        F.try_divide(
            F.col("mae1_num").cast("double") / F.col("n1").cast("double"),
            F.col("mae24_num").cast("double") / F.col("n24").cast("double"),
        ).alias("mase"),
    )


# ---------------------------------------------------------------------------
# seasonal_decompose_24 — classical additive decomposition of the
# hourly value series per type (the moving-average method of
# STL-family pipelines): trend = centered 2×MA-24 (the even-period
# centered average: half weight at the ±12 ends), seasonal = hour-of-
# day mean of the detrended series, residual = the rest. Everything
# until the final three divisions is exact integer arithmetic: the
# trend numerator is y_{h-12} + 2·Σ_{-11..+11} y + y_{h+12} over a
# DENSE per-type hour spine (sequence(min..max) — gaps must make the
# trend UNDEFINED, not silently shift a row-offset frame), with
# denominators 48 and 48·n_k cleared into BIGINT sums. The windows run
# over the (type, hour) rollup (≤ thousands of rows per type at any
# SF — the raw events collapse map-side first), so a 100 TB corpus
# costs one scan + one rollup shuffle; the 25-row ROWS frame never
# sees event rows. Trend is defined only where all 25 neighbors exist
# (COUNT over the frame = 25) — the honest boundary/gap semantics.
# ---------------------------------------------------------------------------

_SEASONAL_ORACLE = """
WITH r AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS y
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1, 2
),
bounds AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM r GROUP BY 1),
spine AS (
  SELECT b.event_type, g.h
  FROM bounds b, unnest(generate_series(b.h0, b.h1)) AS g(h)
),
d AS (
  SELECT s.event_type, s.h, r.y
  FROM spine s LEFT JOIN r ON r.event_type = s.event_type AND r.h = s.h
),
tr AS (
  SELECT event_type, h, y,
         CASE WHEN COUNT(y) OVER w = 25
              THEN FIRST_VALUE(y) OVER w + LAST_VALUE(y) OVER w
                   + 2 * (SUM(y) OVER w
                          - FIRST_VALUE(y) OVER w - LAST_VALUE(y) OVER w)
         END AS t_num
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
),
sea AS (
  SELECT event_type, h % 24 AS k,
         CAST(SUM(48 * y - t_num) AS BIGINT) AS s_num,
         CAST(COUNT(*) AS BIGINT) AS n_k
  FROM tr WHERE t_num IS NOT NULL GROUP BY 1, 2
)
SELECT t.event_type, t.h, CAST(t.y AS BIGINT) AS y,
       CAST(t.t_num AS DOUBLE) / 48.0 AS trend,
       CAST(s.s_num AS DOUBLE) / (48.0 * CAST(s.n_k AS DOUBLE)) AS seasonal,
       CAST(t.y AS DOUBLE) - CAST(t.t_num AS DOUBLE) / 48.0
         - CAST(s.s_num AS DOUBLE) / (48.0 * CAST(s.n_k AS DOUBLE))
         AS residual
FROM tr t JOIN sea s ON s.event_type = t.event_type AND s.k = t.h % 24
WHERE t.t_num IS NOT NULL
"""


@query("seasonal_decompose_24", _SEASONAL_ORACLE)
def seasonal_decompose_24(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.timestamps import micros

    r = (
        t(spark, sf_dir, "events")
        # grid-quantile NaN contract: NaN casts to 0 on Spark but
        # errors DuckDB's BIGINT cast — unusable measurements are out
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .select(
            "event_type",
            micros(F.col("ts")).alias("us"),
            F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("cents"),
        )
        .withColumn("h", F.expr("us div 3600000000"))
        .groupBy("event_type", "h")
        .agg(F.sum("cents").alias("y"))
        # rollup roots the spine-bounds + join diamond: scan once
        .localCheckpoint()
    )
    spine = (
        r.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h"),
        )
    )
    d = spine.join(r, ["event_type", "h"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-12, 12)
    )
    ends = F.first("y").over(w) + F.last("y").over(w)
    t_num = F.when(
        F.count("y").over(w) == 25,
        ends + F.lit(2) * (F.sum("y").over(w) - ends),
    )
    # tr feeds both the seasonal rollup and the final join — checkpoint
    # the (≤ hours-per-type)-row windowed table so the MA window runs
    # once, not once per consumer
    tr = (
        d.select("event_type", "h", "y", t_num.alias("t_num"))
        .filter(F.col("t_num").isNotNull())
        .localCheckpoint()
    )
    sea = (
        tr.withColumn("k", F.col("h") % 24)
        .groupBy("event_type", "k")
        .agg(
            F.sum(F.lit(48) * F.col("y") - F.col("t_num"))
            .cast("long")
            .alias("s_num"),
            F.count(F.lit(1)).cast("long").alias("n_k"),
        )
    )
    trend = F.col("t_num").cast("double") / F.lit(48.0)
    seasonal = F.col("s_num").cast("double") / (
        F.lit(48.0) * F.col("n_k").cast("double")
    )
    return (
        tr.withColumn("k", F.col("h") % 24)
        .join(F.broadcast(sea), ["event_type", "k"])
        .select(
            "event_type",
            "h",
            F.col("y").cast("long").alias("y"),
            trend.alias("trend"),
            seasonal.alias("seasonal"),
            (F.col("y").cast("double") - trend - seasonal).alias("residual"),
        )
    )


# ---------------------------------------------------------------------------
# last_touch_attribution — marketing attribution, the batch companion to
# streaming_click_to_buy's pair join: every purchase is attributed to
# the LAST click by the same user at or before it (ties on ts broken by
# event_id — the same total within-user order every sequence query here
# uses), then rolled up by attribution age: <1h, 1h-24h, 1d-7d, older
# ("stale"), or no prior click at all ("organic"). Shape: ONE
# user-partitioned running last_value(click_ts IGNORE NULLS) window —
# millions of user keys parallelize it on their own, never a global
# order — then a 5-row rollup. Purchase cents monetize NULL *and NaN*
# as 0 without dropping the row (the churn_features guard: Spark casts
# NaN to 0 silently, DuckDB errors — the CASE keeps both engines on
# one spec); gap mass accumulates as exact integer µs in
# DECIMAL(38,0)/HUGEINT.
# ---------------------------------------------------------------------------

_ATTR_ORACLE = """
WITH e AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         CASE WHEN value IS NOT NULL AND NOT isnan(value)
              THEN CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END AS cents
  FROM events
),
touched AS (
  SELECT user_id, event_type, us, cents,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_us
  FROM e
),
p AS (
  SELECT us - click_us AS gap_us, cents
  FROM touched WHERE event_type = 'purchase'
),
b AS (
  SELECT CASE
           WHEN gap_us IS NULL THEN 'organic'
           WHEN gap_us <= 3600000000 THEN 'lt_1h'
           WHEN gap_us <= 86400000000 THEN '1h_24h'
           WHEN gap_us <= 7 * 86400000000 THEN '1d_7d'
           ELSE 'stale'
         END AS bucket,
         cents, COALESCE(gap_us, 0) AS gap_us
  FROM p
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(cents AS HUGEINT)) AS BIGINT) AS total_cents,
       CAST(SUM(CAST(gap_us AS HUGEINT)) AS BIGINT) AS sum_gap_us
FROM b GROUP BY bucket
"""


@query("last_touch_attribution", _ATTR_ORACLE)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.timestamps import micros

    d38 = "decimal(38,0)"
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        micros(F.col("ts")).alias("us"),
        F.when(
            F.col("value").isNotNull() & ~F.isnan("value"),
            F.round(F.col("value") * 100, 0).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touched = e.withColumn(
        "click_us",
        F.last(
            F.when(F.col("event_type") == "click", F.col("us")), ignorenulls=True
        ).over(w),
    )
    p = touched.filter(F.col("event_type") == "purchase").select(
        (F.col("us") - F.col("click_us")).alias("gap_us"), "cents"
    )
    bucket = (
        F.when(F.col("gap_us").isNull(), "organic")
        .when(F.col("gap_us") <= 3_600_000_000, "lt_1h")
        .when(F.col("gap_us") <= 86_400_000_000, "1h_24h")
        .when(F.col("gap_us") <= 7 * 86_400_000_000, "1d_7d")
        .otherwise("stale")
    )
    return (
        p.select(
            bucket.alias("bucket"),
            "cents",
            F.coalesce(F.col("gap_us"), F.lit(0)).alias("gap_us"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("cents").cast(d38)).cast("long").alias("total_cents"),
            F.sum(F.col("gap_us").cast(d38)).cast("long").alias("sum_gap_us"),
        )
    )


# ---------------------------------------------------------------------------
# seasonal_hour_outliers — seasonally-conditioned volume anomaly flags
# (the pager alert a global 3-sigma band gets wrong twice a day): each
# hour's event COUNT is judged against the profile of its own
# hour-of-day slot, on the DENSE hour spine so silent gaps are
# anomalies (count 0), not missing rows. The 3-sigma test uses the
# cleared-denominator integer identity from value_outliers_3sigma —
# flag iff (n·x − S)² > 9·(n·SS − S²), every term an exact
# DECIMAL(38)/HUGEINT — so there is no float variance to diverge by an
# ulp at the boundary. Shape: events collapse map-side to the hourly
# rollup; the spine explode is calendar-bounded; the 24-row profile
# broadcasts back onto the spine — one scan, one rollup shuffle,
# nothing downstream scales with raw rows.
# ---------------------------------------------------------------------------

_SHO_ORACLE = """
WITH r AS (
  SELECT epoch_us(ts) // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM r),
spine AS (
  SELECT g.h FROM bounds b, unnest(generate_series(b.h0, b.h1)) AS g(h)
),
d AS (
  SELECT s.h, s.h % 24 AS hod, COALESCE(r.x, 0) AS x
  FROM spine s LEFT JOIN r ON r.h = s.h
),
prof AS (
  SELECT hod, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(x AS HUGEINT)) AS s,
         SUM(CAST(x AS HUGEINT) * x) AS ss
  FROM d GROUP BY 1
)
SELECT d.h, d.hod, d.x AS n_events,
       CAST(p.s AS DOUBLE) / CAST(p.n AS DOUBLE) AS hod_mean,
       d.x * p.n > p.s AS is_high
FROM d JOIN prof p ON p.hod = d.hod
WHERE (p.n * d.x - p.s) * (p.n * d.x - p.s)
      > 9 * (p.n * p.ss - p.s * p.s)
"""


@query("seasonal_hour_outliers", _SHO_ORACLE)
def seasonal_hour_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timestamps import micros

    d38 = "decimal(38,0)"
    r = (
        t(spark, sf_dir, "events")
        .select(micros(F.col("ts")).alias("us"))
        .withColumn("h", F.expr("us div 3600000000"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("x"))
        # rollup roots the bounds + spine-join diamond: scan once
        .localCheckpoint()
    )
    spine = r.agg(F.min("h").alias("h0"), F.max("h").alias("h1")).select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    )
    d = (
        spine.join(r, "h", "left")
        .select(
            "h",
            (F.col("h") % 24).alias("hod"),
            F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        )
    )
    prof = d.groupBy("hod").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("x").cast(d38)).alias("s"),
        F.sum(F.col("x").cast(d38) * F.col("x")).alias("ss"),
    )
    j = d.join(F.broadcast(prof), "hod")
    dev = F.col("n") * F.col("x") - F.col("s")
    var_num = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return j.filter(dev * dev > 9 * var_num).select(
        "h",
        "hod",
        F.col("x").alias("n_events"),
        (F.col("s").cast("double") / F.col("n").cast("double")).alias("hod_mean"),
        (F.col("x") * F.col("n") > F.col("s")).alias("is_high"),
    )
