"""ETL-semantics queries over the ``events`` stream table.

``events`` plays the measures stream (ts + value + entity key + typed
param — FIXTURES.md role mapping); each query re-expresses one family
from SURVEY.md §2 with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ids import sensor_id
from ..operators.aggregates import distinct_count, watermark_bounds
from ..operators.dedup import dedup_events, first_per_key
from ..operators.joins import enrich_with_miss_report, semi_filter, union_all
from ..operators.quantiles import sql_range_bucket
from ..operators.topk import top_k_per_key
from ..localdf import local_df
from .registry import query, sql_exact_sum, t

# ---------------------------------------------------------------------------
# measurand_normalize — the reference's central dataflow step: broadcast
# lookup join (J1, measurand.js:89-95) + unit scale (C1, measurand.js:19-28)
# + whitelist drop-on-miss. event_type plays input_param.
# ---------------------------------------------------------------------------

_MEASURAND_ROWS = (
    ("click", "clicks", "count", "count", 1.0),
    ("view", "views", "count", "count", 1.0),
    ("purchase", "revenue", "cents", "dollars", 0.01),
    ("signup", "signups", "count", "count", 1.0),
    # 'error' intentionally unsupported → dropped by the inner join
)

_MEASURAND_VALUES_SQL = ", ".join(
    f"('{ip}', '{p}', '{u}', '{nu}', {s})" for ip, p, u, nu, s in _MEASURAND_ROWS
)

_NORMALIZE_ORACLE = f"""
WITH measurands(input_param, parameter, unit, normalized_unit, scale) AS (
  VALUES {_MEASURAND_VALUES_SQL}
)
SELECT
  e.event_id,
  'events-' || CAST(e.user_id AS VARCHAR) || '-' || m.parameter AS sensor_id,
  m.parameter,
  m.normalized_unit AS unit,
  CAST(CAST(e.value AS DECIMAL(18,2)) * CAST(m.scale AS DECIMAL(18,6)) AS DOUBLE) AS measure,
  e.ts
FROM events e JOIN measurands m ON e.event_type = m.input_param
"""


@query("measurand_normalize", _NORMALIZE_ORACLE)
def measurand_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    dim = local_df(spark, 
        list(_MEASURAND_ROWS),
        "input_param string, parameter string, unit string, normalized_unit string, scale double",
    )
    joined = e.join(
        F.broadcast(dim), e["event_type"] == dim["input_param"], "inner"
    )
    return joined.select(
        F.col("event_id"),
        sensor_id(F.lit("events"), F.col("user_id").cast("string"), F.col("parameter")).alias(
            "sensor_id"
        ),
        F.col("parameter"),
        F.col("normalized_unit").alias("unit"),
        (F.col("value").cast("decimal(18,2)") * F.col("scale").cast("decimal(18,6)"))
        .cast("double")
        .alias("measure"),
        F.col("ts"),
    )


# ---------------------------------------------------------------------------
# time_range_filter — F1 (checkResponseData utils.js:180-209): bounded
# window + no-future rule. Pure pushed-down predicates.
# ---------------------------------------------------------------------------

_TIME_RANGE_ORACLE = """
SELECT event_id, ts, user_id, event_type
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <= TIMESTAMP '2024-01-20 00:00:00'
"""


@query("time_range_filter", _TIME_RANGE_ORACLE)
def time_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.filter(
        (F.col("ts") >= "2024-01-10 00:00:00") & (F.col("ts") <= "2024-01-20 00:00:00")
    ).select("event_id", "ts", "user_id", "event_type")


# ---------------------------------------------------------------------------
# sentinel_clean — F6+C2: providers emit 'NaN'/'n/a'/'inv'/'' placeholders
# (cmu.js:171, smartsense.js:110-118, iqair.js:188). We synthesize the raw
# string column deterministically from value, then clean: sentinel → NULL
# (never -999 — SURVEY.md §2.11), numeric strings coerced with comma strip.
# ---------------------------------------------------------------------------

_SENTINEL_ORACLE = """
WITH raw AS (
  SELECT event_id,
         CASE
           WHEN value > 480 THEN 'inv'
           WHEN value > 460 THEN 'NaN'
           WHEN value > 440 THEN 'n/a'
           WHEN value > 420 THEN ''
           WHEN value > 400 THEN '1,' || CAST(value AS VARCHAR)
           ELSE CAST(value AS VARCHAR)
         END AS raw_value
  FROM events
)
SELECT event_id, raw_value,
       CASE WHEN raw_value IN ('', 'NaN', 'n/a', 'inv', 'null', 'undefined') THEN NULL
            WHEN regexp_matches(raw_value, '^[+-]?\\d{1,3}(,\\d{3})+(\\.\\d*)?$')
              THEN CAST(replace(raw_value, ',', '') AS DOUBLE)
            WHEN regexp_matches(raw_value, '^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$')
              THEN CAST(raw_value AS DOUBLE)
            ELSE NULL END AS measure
FROM raw
"""


@query("sentinel_clean", _SENTINEL_ORACLE)
def sentinel_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.cleaning import clean_measure

    e = t(spark, sf_dir, "events")
    raw = (
        F.when(F.col("value") > 480, F.lit("inv"))
        .when(F.col("value") > 460, F.lit("NaN"))
        .when(F.col("value") > 440, F.lit("n/a"))
        .when(F.col("value") > 420, F.lit(""))
        .when(F.col("value") > 400, F.concat(F.lit("1,"), F.col("value").cast("string")))
        .otherwise(F.col("value").cast("string"))
    )
    return e.select(
        "event_id",
        raw.alias("raw_value"),
        clean_measure(raw).alias("measure"),
    )


# ---------------------------------------------------------------------------
# whitelist_semi — F7: supported-parameter whitelist as broadcast semi join
# (measurand.js:54-59).
# ---------------------------------------------------------------------------

_WHITELIST_ORACLE = """
SELECT event_type, COUNT(*) AS n
FROM events
WHERE event_type IN ('click', 'view', 'purchase')
GROUP BY event_type
"""


@query("whitelist_semi", _WHITELIST_ORACLE)
def whitelist_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    allowed = local_df(spark, 
        [("click",), ("view",), ("purchase",)], "event_type string"
    )
    return (
        semi_filter(e, allowed, "event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# latest_3_per_user — A5 (slice(-3) per device, lovemyair.js:127) with an
# explicit total order.
# ---------------------------------------------------------------------------

_LATEST3_ORACLE = """
SELECT user_id, event_id, ts
FROM (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn <= 3
"""


@query("latest_3_per_user", _LATEST3_ORACLE)
def latest_3_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return top_k_per_key(e, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()], 3)


# ---------------------------------------------------------------------------
# first_event_per_user — A7 first-wins dedup (cmu.js:143-166 upsert map).
# ---------------------------------------------------------------------------

_FIRST_ORACLE = """
SELECT user_id, event_id, ts
FROM (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
  FROM events
) WHERE rn = 1
"""


@query("first_event_per_user", _FIRST_ORACLE)
def first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return first_per_key(e, ["user_id"], [F.col("ts").asc(), F.col("event_id").asc()])


# ---------------------------------------------------------------------------
# dedup_overlapping — T4: overlapping micro-batch dedup on (entity, ts)
# (habitatmap's 2-min sliding re-read, habitatmap.js:128-136). We union the
# events table with a shifted re-read of itself to create real duplicates,
# then dedup keeping min event_id.
# ---------------------------------------------------------------------------

_DEDUP_ORACLE = """
WITH doubled AS (
  SELECT user_id, ts, event_id FROM events
  UNION ALL
  SELECT user_id, ts, event_id + 1000000 AS event_id FROM events WHERE ts >= TIMESTAMP '2024-01-25'
)
SELECT user_id, ts, event_id
FROM (
  SELECT user_id, ts, event_id,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id ASC) AS rn
  FROM doubled
) WHERE rn = 1
"""


@query("dedup_overlapping", _DEDUP_ORACLE)
def dedup_overlapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    replay = e.filter(F.col("ts") >= "2024-01-25").withColumn(
        "event_id", F.col("event_id") + F.lit(1000000)
    )
    doubled = union_all([e, replay])
    return dedup_events(doubled, ["user_id", "ts"], "event_id")


# ---------------------------------------------------------------------------
# watermark_summary — A1/A3: per-source run log (from/to/counts,
# clarity.js:192-208; Measures.push min/max, measure.js:20-28).
# ---------------------------------------------------------------------------

_WATERMARK_ORACLE = f"""
SELECT event_type, MIN(ts) AS from_ts, MAX(ts) AS to_ts, COUNT(*) AS n
FROM events
GROUP BY event_type
"""


@query("watermark_summary", _WATERMARK_ORACLE)
def watermark_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return watermark_bounds(e, "ts", ["event_type"]).select(
        "event_type", "from_ts", "to_ts", "n"
    )


# ---------------------------------------------------------------------------
# distinct_users — A4 (Set().size, aernode.js:115). Exact here; HLL at scale.
# ---------------------------------------------------------------------------

_DISTINCT_ORACLE = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_user_id
FROM events GROUP BY event_type
"""


@query("distinct_users", _DISTINCT_ORACLE)
def distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_count(t(spark, sf_dir, "events"), ["event_type"], "user_id")


# ---------------------------------------------------------------------------
# hourly_rollup — A6/T6 tumbling-hour agg; hour_ending_rollup adds the C7
# hour-ending relabel (+1h; data354.js:108-110).
# ---------------------------------------------------------------------------

_HOURLY_ORACLE = f"""
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n,
       {sql_exact_sum('value', 2)} / CAST(COUNT(*) AS DOUBLE) AS avg_value,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY 1, 2
"""


@query("hourly_rollup", _HOURLY_ORACLE)
def hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import hourly_rollup as hourly_op

    return hourly_op(
        t(spark, sf_dir, "events"), "ts", ["event_type"], "value"
    )


_HOUR_ENDING_ORACLE = """
SELECT date_trunc('hour', ts) + INTERVAL 1 HOUR AS hour_ending, COUNT(*) AS n
FROM events GROUP BY 1
"""


@query("hour_ending_rollup", _HOUR_ENDING_ORACLE)
def hour_ending_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timestamps import hour_ending

    e = t(spark, sf_dir, "events")
    return e.groupBy(hour_ending(F.col("ts")).alias("hour_ending")).agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# cohort_union — J4 fan-in (airqo.js:58-75): two cohort selections unioned
# then aggregated per day.
# ---------------------------------------------------------------------------

_UNION_ORACLE = """
WITH cohorts AS (
  SELECT ts, 'heavy' AS cohort FROM events WHERE value >= 250
  UNION ALL
  SELECT ts, 'light' AS cohort FROM events WHERE value < 250
)
SELECT date_trunc('day', ts) AS day, cohort, COUNT(*) AS n
FROM cohorts GROUP BY 1, 2
"""


@query("cohort_union", _UNION_ORACLE)
def cohort_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    heavy = e.filter(F.col("value") >= 250).select("ts", F.lit("heavy").alias("cohort"))
    light = e.filter(F.col("value") < 250).select("ts", F.lit("light").alias("cohort"))
    return (
        union_all([heavy, light])
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"), "cohort")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# enrich_misses — J2: broadcast left-join enrich + side-output of unmatched
# keys (clarity.js:63-108 missing_datasources). Dim restricted to custkey<50
# so misses exist.
# ---------------------------------------------------------------------------

_MISSES_ORACLE = """
SELECT DISTINCT user_id
FROM events
WHERE user_id NOT IN (SELECT c_custkey FROM customer WHERE c_custkey < 50)
"""


@query("enrich_misses", _MISSES_ORACLE)
def enrich_misses(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    dim = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 50)
        .select(F.col("c_custkey").alias("user_id"), "c_name")
    )
    _enriched, misses = enrich_with_miss_report(e, dim, "user_id")
    return misses


# ---------------------------------------------------------------------------
# tz_daily — C6 timezone conversion: UTC → America/New_York wall clock,
# then daily counts (cmu.js:183-220 / cpcb.js:144-152 tz handling).
# ---------------------------------------------------------------------------

_TZ_ORACLE = """
SELECT date_trunc('day', timezone('America/New_York', timezone('UTC', ts))) AS ny_day,
       COUNT(*) AS n
FROM events GROUP BY 1
"""


@query("tz_daily", _TZ_ORACLE)
def tz_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    local = F.from_utc_timestamp(F.col("ts"), "America/New_York")
    return e.groupBy(F.date_trunc("day", local).alias("ny_day")).agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# props_extract — C11 JSON field extraction (JSON.parse, iqair.js:101),
# regexp-based so both engines share exact semantics, then grouped stats.
# ---------------------------------------------------------------------------

_PROPS_ORACLE = f"""
WITH parsed AS (
  SELECT event_type,
         CAST(NULLIF(regexp_extract(props, '"k":\\s*(\\d+)', 1), '') AS BIGINT) AS k
  FROM events
)
SELECT event_type, COUNT(k) AS n_k, {sql_exact_sum('k', 0)} AS sum_k
FROM parsed GROUP BY event_type
"""


@query("props_extract", _PROPS_ORACLE)
def props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    k = F.nullif(
        F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1), F.lit("")
    ).cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_k"),
            F.sum(F.col("k").cast("decimal(27,0)")).cast("double").alias("sum_k"),
        )
    )


# ---------------------------------------------------------------------------
# recent_orders — O1/O2: descending sort + limit compiles to
# TakeOrderedAndProject (the Spark twin of cmu's 'orderBy name desc' +
# early-exit scan, cmu.js:246-274) — no global sort materializes.
# ---------------------------------------------------------------------------

_RECENT_ORACLE = """
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders
ORDER BY o_orderdate DESC, o_orderkey ASC
LIMIT 20
"""


@query("recent_orders", _RECENT_ORACLE)
def recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# latest_complete_hour — A6/F9: the hour-aligned late-data window
# [now-3h, now-1h) (airgradient.js:137-172) with hour-ending labels.
# 'now' is pinned for determinism (the provider passes wall clock).
# ---------------------------------------------------------------------------

_LATEST_HOUR_ORACLE = """
SELECT date_trunc('hour', ts) + INTERVAL 1 HOUR AS hour_ending,
       event_type, COUNT(*) AS n
FROM events
WHERE ts >= TIMESTAMP '2024-01-30 21:00:00'
  AND ts <  TIMESTAMP '2024-01-30 23:00:00'
GROUP BY 1, 2
"""


@query("latest_complete_hour", _LATEST_HOUR_ORACLE)
def latest_complete_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timestamps import hour_ending
    from ..operators.filters import late_window

    e = t(spark, sf_dir, "events")
    windowed = e.filter(
        late_window(F.col("ts"), "2024-01-31 00:00:00", lag_hours=1, span_hours=2)
    )
    return windowed.groupBy(
        hour_ending(F.col("ts")).alias("hour_ending"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# order_calendar — C8 calendar math: month-range enumeration incl. year
# crossover (the reference's one unit-tested function, cmu getMonthQuery,
# test/cmu.test.js:8-39) left-joined to per-month order counts so empty
# months surface as zero.
# ---------------------------------------------------------------------------

_CALENDAR_ORACLE = """
WITH months AS (
  SELECT unnest(generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '2001-08-01',
                                INTERVAL 1 MONTH)) AS month_start
),
c AS (
  SELECT date_trunc('month', o_orderdate) AS month_start, COUNT(*) AS n
  FROM orders GROUP BY 1
)
SELECT m.month_start, COALESCE(c.n, 0) AS n_orders
FROM months m LEFT JOIN c USING (month_start)
"""


@query("order_calendar", _CALENDAR_ORACLE)
def order_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timestamps import month_sequence

    months = spark.range(1).select(
        F.explode(
            month_sequence(
                F.lit("1995-01-01").cast("timestamp"),
                F.lit("2001-08-01").cast("timestamp"),
            )
        ).alias("m")
    ).select(F.col("m").cast("timestamp").alias("month_start"))
    counts = (
        t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month_start"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return months.join(counts, "month_start", "left").select(
        "month_start", F.coalesce(F.col("n"), F.lit(0)).alias("n_orders")
    )


# ---------------------------------------------------------------------------
# distinct_pairs — A8 set-semantics dedup on append (clarity.js:51-56
# includes() guard → distinct on the key columns).
# ---------------------------------------------------------------------------

_PAIRS_ORACLE = """
SELECT DISTINCT user_id, event_type FROM events
"""


@query("distinct_pairs", _PAIRS_ORACLE)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import dedup_on_append

    return dedup_on_append(t(spark, sf_dir, "events"), ["user_id", "event_type"])


# ---------------------------------------------------------------------------
# ingest_id_join — J3: station and measure sides independently derive the
# same surrogate ingest id ('{source}-{station}-{parameter}', the
# matching_method 'ingest-id' contract, clarity.js:181-185) and meet on
# an equi-join.
# ---------------------------------------------------------------------------

_INGEST_JOIN_ORACLE = """
WITH params AS (SELECT unnest(['clicks', 'views', 'revenue', 'signups']) AS parameter),
stations AS (
  SELECT 'events-' || CAST(c_custkey AS VARCHAR) || '-' || parameter AS sensor_id, c_name
  FROM customer, params
  WHERE c_custkey < 150
),
measures AS (
  SELECT 'events-' || CAST(user_id AS VARCHAR) || '-' ||
         CASE event_type WHEN 'click' THEN 'clicks' WHEN 'view' THEN 'views'
                         WHEN 'purchase' THEN 'revenue' WHEN 'signup' THEN 'signups' END AS sensor_id
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase', 'signup')
)
SELECT s.c_name, COUNT(*) AS n_measures
FROM measures m JOIN stations s ON m.sensor_id = s.sensor_id
GROUP BY s.c_name
"""


@query("ingest_id_join", _INGEST_JOIN_ORACLE)
def ingest_id_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    params = local_df(spark, 
        [("clicks",), ("views",), ("revenue",), ("signups",)], "parameter string"
    )
    stations = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 150)
        .crossJoin(params)
        .select(
            sensor_id(
                F.lit("events"), F.col("c_custkey").cast("string"), F.col("parameter")
            ).alias("sensor_id"),
            "c_name",
        )
    )
    param_map = (
        F.when(F.col("event_type") == "click", "clicks")
        .when(F.col("event_type") == "view", "views")
        .when(F.col("event_type") == "purchase", "revenue")
        .when(F.col("event_type") == "signup", "signups")
    )
    measures = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view", "purchase", "signup"))
        .select(
            sensor_id(
                F.lit("events"), F.col("user_id").cast("string"), param_map
            ).alias("sensor_id")
        )
    )
    return (
        measures.join(F.broadcast(stations), "sensor_id")
        .groupBy("c_name")
        .agg(F.count(F.lit(1)).alias("n_measures"))
    )


# ---------------------------------------------------------------------------
# value_percentiles — exact interpolated percentiles per key (the
# analytics-layer summary the reference's run logs approximate with
# min/max; Spark percentile == DuckDB quantile_cont bit-for-bit).
# At 100 TB swap percentile → approx_percentile (t-digest) — same plan
# shape, sketch-mergeable.
# ---------------------------------------------------------------------------

_PERCENTILES_ORACLE = """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.95) AS p95,
       quantile_cont(value, 0.99) AS p99
FROM events GROUP BY event_type
"""


@query("value_percentiles", _PERCENTILES_ORACLE)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )


# ---------------------------------------------------------------------------
# daily_from_hourly — the hypertable-rollup cascade: the DAILY result is
# computed by re-aggregating the HOURLY rollup (raw scanned once); the
# oracle computes daily straight from raw — hash-matching proves the
# merge is lossless.
# ---------------------------------------------------------------------------

_CASCADE_ORACLE = """
SELECT date_trunc('day', ts) AS bucket, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value,
       MIN(value) AS min_value, MAX(value) AS max_value,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS avg_value
FROM events GROUP BY 1, 2
"""


@query("daily_from_hourly", _CASCADE_ORACLE)
def daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rollup_cascade import coarsen, finalize, rollup_from_raw

    e = t(spark, sf_dir, "events")
    hourly = rollup_from_raw(e, "ts", ["event_type"], "value", "hour")
    daily = coarsen(hourly, ["event_type"], "day")
    return finalize(daily)


# ---------------------------------------------------------------------------
# quarantine_summary — dead-letter accounting: every sentinel-nulled
# reading is attributable by reason (the flags map the engine carries
# instead of magic numbers); pipelines alert on these counts.
# ---------------------------------------------------------------------------

_QUARANTINE_ORACLE = """
WITH raw AS (
  SELECT CASE
           WHEN value > 480 THEN 'inv'
           WHEN value > 460 THEN 'NaN'
           WHEN value > 440 THEN 'n/a'
           WHEN value > 420 THEN ''
           ELSE CAST(value AS VARCHAR)
         END AS raw_value
  FROM events
)
SELECT raw_value AS reason, COUNT(*) AS n
FROM raw
WHERE raw_value IN ('', 'NaN', 'n/a', 'inv', 'null', 'undefined')
GROUP BY raw_value
"""


@query("quarantine_summary", _QUARANTINE_ORACLE)
def quarantine_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.filters import SENTINEL_TOKENS

    e = t(spark, sf_dir, "events")
    raw = (
        F.when(F.col("value") > 480, F.lit("inv"))
        .when(F.col("value") > 460, F.lit("NaN"))
        .when(F.col("value") > 440, F.lit("n/a"))
        .when(F.col("value") > 420, F.lit(""))
        .otherwise(F.col("value").cast("string"))
    )
    return (
        e.select(raw.alias("reason"))
        .filter(F.col("reason").isin(list(SENTINEL_TOKENS)))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# profile_numerics — column profiler over lineitem's numeric columns
# (null %, distinct, exact min/max/sum): the data-quality sweep a
# pipeline runs before training. Unpivot → one grouped pass.
# ---------------------------------------------------------------------------

_PROFILE_ORACLE = f"""
WITH long AS (
  SELECT 'l_quantity' AS column_name, l_quantity AS v FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
SELECT column_name,
       COUNT(*) AS n_rows,
       COUNT(v) AS n_present,
       COUNT(DISTINCT v) AS n_distinct,
       MIN(v) AS min_v, MAX(v) AS max_v,
       {sql_exact_sum('v', 2)} AS sum_v
FROM long GROUP BY column_name
"""


@query("profile_numerics", _PROFILE_ORACLE)
def profile_numerics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.reshape import melt

    l = t(spark, sf_dir, "lineitem")
    long = melt(
        l,
        id_vars=["l_orderkey"],
        value_vars=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        var_name="column_name",
        value_name="v",
        drop_null=False,
    )
    return long.groupBy("column_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_present"),
        F.countDistinct("v").alias("n_distinct"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.sum(F.col("v").cast("decimal(27,2)")).cast("double").alias("sum_v"),
    )


# ---------------------------------------------------------------------------
# table_manifest — pipeline observability: per-table row counts for the
# whole warehouse in one result (the run-log summary A3 generalized to
# every table). Each count is an independent scan-agg job; the union is
# rows, not data.
# ---------------------------------------------------------------------------

_MANIFEST_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

_MANIFEST_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{n}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM {n}"
    for n in _MANIFEST_TABLES
)


@query("table_manifest", _MANIFEST_ORACLE)
def table_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    counts = [
        t(spark, sf_dir, n).agg(
            F.lit(n).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
        )
        for n in _MANIFEST_TABLES
    ]
    return reduce(lambda a, b: a.unionByName(b), counts)


# ---------------------------------------------------------------------------
# weighted_median_value — exact WEIGHTED median per event type (robust
# weighted aggregation: each reading weighted by its payload's k field,
# the shape of sample-weighted percentiles in survey/telemetry data).
# Definition (lower weighted median): the first value, in (value,
# event_id) order, whose running weight doubles to >= the total.
# Distributed shape (NOT a per-type window over raw events — that caps
# parallelism at the 5 event types): a quantized-value GRID prefix sum,
# the feature_auc / sequence_pack machinery. (1) one rollup gets per-
# type (min, max, total weight); (2) events map onto a 4096-cell value
# grid (monotone affine bucketing, so bucket order == value order) and
# a map-side-combined groupBy sums weight per (type, cell); (3) the
# crossing cell — first cell whose cumulative weight doubles past the
# total — falls out of a window over the TINY grid table (<=4096 rows
# per type); (4) only rows landing in that one broadcast-selected cell
# are re-read, collapsed to distinct values (same-value rows are
# adjacent in the order, so the lower median is the first distinct
# value whose through-cum crosses), and the final window runs over the
# in-cell distinct values. Every event-volume pass is a scan + map-side
# agg; no window ever sees raw-event cardinality. Pathological value
# skew (all mass in one cell) degrades to distinct-values-in-cell rows
# through step 4 — a second grid level would recurse, not needed here.
# Zero-weight rows participate with weight 0 and can never be picked
# unless everything is zero-weight (then W=0 and the smallest value
# wins — the grid picks the first populated cell the same way).
# ---------------------------------------------------------------------------

_WMEDIAN_ORACLE = """
WITH weighted AS (
  SELECT event_type, value, event_id,
         COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS w
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
cum AS (
  SELECT event_type, value, event_id, w,
         SUM(w) OVER (PARTITION BY event_type ORDER BY value, event_id
                      ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(w) OVER (PARTITION BY event_type) AS tw
  FROM weighted
),
picked AS (
  SELECT event_type, value, cw, tw,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn
  FROM cum WHERE 2 * cw >= tw
)
SELECT event_type, value AS wmedian, CAST(tw AS BIGINT) AS total_weight
FROM picked WHERE rn = 1
"""


@query("weighted_median_value", _WMEDIAN_ORACLE)
def weighted_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import grid_quantiles

    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .select(
            "event_type",
            "value",
            F.coalesce(
                F.get_json_object(F.col("props"), "$.k").cast("long"), F.lit(0)
            ).alias("w"),
        )
    )
    q = grid_quantiles(e, "event_type", "value", weight=F.col("w"))
    return q.select(
        "event_type",
        F.col("qvalue").alias("wmedian"),
        F.col("total_weight").cast("long").alias("total_weight"),
    )


# ---------------------------------------------------------------------------
# seasonal_naive_error — forecast BACKTEST as a query: predict each
# hour's event count per type with the seasonal-naive rule (same hour,
# previous day) and score MAE — the baseline every real forecasting
# pipeline must beat, and the evaluation harness shape (join truth to
# lagged prediction, aggregate the error). Exactness: hour indices and
# counts are integers; |err| sums as BIGINT; MAE is one division.
# The lag is a self-join of the HOURLY ROLLUP on (type, h-24) — rollup
# rows, never events; only hours with a prior-day observation score.
# ---------------------------------------------------------------------------

_SNAIVE_ORACLE = """
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT t.event_type, t.n AS actual, p.n AS predicted,
         ABS(t.n - p.n) AS abs_err
  FROM hourly t JOIN hourly p
    ON p.event_type = t.event_type AND p.h = t.h - 24
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(SUM(abs_err) AS BIGINT) AS sum_abs_err,
       CAST(SUM(abs_err) AS DOUBLE) / COUNT(*) AS mae
FROM scored GROUP BY event_type
"""


@query("seasonal_naive_error", _SNAIVE_ORACLE)
def seasonal_naive_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timestamps import micros

    e = t(spark, sf_dir, "events").select(
        "event_type", micros(F.col("ts")).alias("us")
    )
    hourly = (
        e.select("event_type", F.expr("us div 3600000000").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    truth = hourly.select("event_type", "h", F.col("n").alias("actual"))
    pred = hourly.select(
        "event_type", (F.col("h") + 24).alias("h"), F.col("n").alias("predicted")
    )
    scored = truth.join(pred, ["event_type", "h"]).withColumn(
        "abs_err", F.abs(F.col("actual") - F.col("predicted"))
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum("abs_err").cast("long").alias("sum_abs_err"),
        (F.sum("abs_err").cast("double") / F.count(F.lit(1))).alias("mae"),
    )


# ---------------------------------------------------------------------------
# hourly_autocorr24 — lag-24h Pearson autocorrelation of the hourly
# event-count series per type (the seasonality-strength read-out that
# decides whether seasonal_naive_error's baseline is even sensible).
# Exactness: counts are integers, so every moment (Σx, Σy, Σxy, Σx²,
# Σy²) is exact in DECIMAL(38,0)/HUGEINT; the correlation assembles
# num = mΣxy − ΣxΣy and den factors as exact integers first, and the
# ONLY floats are one division and one sqrt of exactly-agreed integers
# — bit-identical across engines. Shape: hourly rollup (map-side),
# rollup self-join on (type, h+24), one scalar-row aggregate per type.
# ---------------------------------------------------------------------------

_AUTOCORR_ORACLE = """
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type, a.n AS x, b.n AS y
  FROM hourly a JOIN hourly b
    ON b.event_type = a.event_type AND b.h = a.h + 24
),
mom AS (
  SELECT event_type,
         CAST(COUNT(*) AS HUGEINT) AS m,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM pairs GROUP BY event_type
)
SELECT event_type, CAST(m AS BIGINT) AS n_pairs,
       CAST(m * sxy - sx * sy AS DOUBLE)
         / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                * CAST(m * syy - sy * sy AS DOUBLE)) AS autocorr24
FROM mom
"""


@query("hourly_autocorr24", _AUTOCORR_ORACLE)
def hourly_autocorr24(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timestamps import micros

    e = t(spark, sf_dir, "events").select(
        "event_type", micros(F.col("ts")).alias("us")
    )
    hourly = (
        e.select("event_type", F.expr("us div 3600000000").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = hourly.select("event_type", "h", F.col("n").alias("x"))
    b = hourly.select(
        "event_type", (F.col("h") - 24).alias("h"), F.col("n").alias("y")
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    pairs = a.join(b, ["event_type", "h"]).select(
        "event_type", d38("x").alias("x"), d38("y").alias("y")
    )
    mom = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("m"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    # try_divide: a zero-variance series (den = 0) must yield NULL like
    # DuckDB's double /0 does, not an ANSI DIVIDE_BY_ZERO error
    return mom.select(
        "event_type",
        F.col("m").cast("long").alias("n_pairs"),
        F.try_divide(num, den).alias("autocorr24"),
    )


# ---------------------------------------------------------------------------
# geo_tz_counts — the C9 geo path as a driver-verified query (it was
# pytest-only before round 5): events get deterministic synthetic
# coordinates (md5-derived integer degrees — the testdata carries no
# geo columns; same portable-hash trick as value_interpolate's mask),
# then resolve a timezone via the broadcast bounding-box dimension
# (functions/geo.py:tz_lookup_join) and count per zone. The box dim is
# dimension-sized → broadcast nested-loop range join; the fact side
# never shuffles except for the final 6-row rollup. Box membership is
# integer comparison — no float hazard.
# ---------------------------------------------------------------------------

_GEO_TZ_ORACLE = """
WITH pts AS (
  SELECT event_id,
         -60 + (('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':lat'), 1, 15))::BIGINT
                % 120) AS lat,
         -180 + (('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':lon'), 1, 15))::BIGINT
                 % 360) AS lon
  FROM events
),
boxes(lon_min, lon_max, lat_min, lat_max, tz) AS (
  VALUES (-130.0, -100.0, 25.0, 50.0, 'America/Denver'),
         (-100.0, -75.0, 25.0, 50.0, 'America/New_York'),
         (-15.0, 20.0, 35.0, 60.0, 'Europe/Paris'),
         (65.0, 90.0, 5.0, 35.0, 'Asia/Kolkata'),
         (100.0, 125.0, 20.0, 45.0, 'Asia/Shanghai')
)
SELECT COALESCE(b.tz, 'UTC') AS timezone, CAST(COUNT(*) AS BIGINT) AS n
FROM pts p
LEFT JOIN boxes b
  ON p.lon >= b.lon_min AND p.lon < b.lon_max
 AND p.lat >= b.lat_min AND p.lat < b.lat_max
GROUP BY 1
"""


@query("geo_tz_counts", _GEO_TZ_ORACLE)
def geo_tz_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.geo import tz_dim, tz_lookup_join
    from ..functions.text import h60

    def hmod(salt: str, m: int):
        return h60(F.concat(F.col("event_id").cast("string"), F.lit(salt))) % m

    pts = t(spark, sf_dir, "events").select(
        "event_id",
        (F.lit(-60) + hmod(":lat", 120)).alias("lat"),
        (F.lit(-180) + hmod(":lon", 360)).alias("lon"),
    )
    resolved = tz_lookup_join(pts, "lat", "lon", tz_dim(spark))
    return resolved.groupBy("timezone").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# hour_of_day_profile — diurnal seasonality profile per type (the
# companion read-out to hourly_autocorr24 / seasonal_naive_error): for
# each (type, hour-of-day) the event count, the share of the type's
# volume, and the mean value — one map-side rollup over integer hour
# buckets; shares/means are single divisions of exact BIGINTs.
# ---------------------------------------------------------------------------

_HOD_ORACLE = """
WITH c AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hod,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
rolled AS (
  SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s
  FROM c GROUP BY 1, 2
)
SELECT event_type, hod, n,
       CAST(n AS DOUBLE)
         / SUM(n) OVER (PARTITION BY event_type) AS share,
       CAST(s AS DOUBLE) / (100.0 * n) AS mean_value
FROM rolled
"""


@query("hour_of_day_profile", _HOD_ORACLE)
def hour_of_day_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.timestamps import micros

    c = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            micros(F.col("ts")).alias("us"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .withColumn("hod", F.expr("(us div 3600000000) % 24"))
    )
    rolled = c.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    # 24-row-per-type rollup → the type-share window is rollup-sized
    wt = Window.partitionBy("event_type")
    return rolled.select(
        "event_type",
        "hod",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wt)).alias("share"),
        (F.col("s").cast("double") / (F.lit(100.0) * F.col("n"))).alias(
            "mean_value"
        ),
    )


# ---------------------------------------------------------------------------
# user_type_impurity — behavioral-diversity segmentation: the Gini
# IMPURITY of each user's event-type mix (0 = single-type specialist,
# →0.8 = uniform over 5 types), rolled up by activity decile. Impurity
# 1 − Σ(c_i/n)² is rational, so it stays integer-exact as parts-per-
# million: ppm = (1e6·(n² − Σc²)) div n², evaluated in DECIMAL(38,0)
# (n² ≤ 1e12 at 1e6 events/user — headroom to spare) with truncating
# div on both engines. The activity decile uses the integer
# range_bucket (the reliability_bins float-division lesson), and the
# per-decile average is one division of an exact ppm sum. Shape: two
# map-side rollups (user×type, then user) and a 10-row output — no
# window, no skew exposure (the rollup key is user, naturally spread).
# ---------------------------------------------------------------------------

_IMPURITY_ORACLE = f"""
WITH ut AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
u AS (
  SELECT user_id, SUM(c) AS n, SUM(c * c) AS ssq FROM ut GROUP BY 1
),
scored AS (
  SELECT user_id, n,
         (1000000 * (CAST(n AS HUGEINT) * n - ssq)) // (CAST(n AS HUGEINT) * n)
           AS ppm
  FROM u
),
bounds AS (SELECT MIN(n) AS lo, MAX(n) AS hi FROM scored)
SELECT CAST({sql_range_bucket('s.n', 'b.lo', 'b.hi', 10)} AS BIGINT)
         AS activity_decile,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(s.ppm) AS BIGINT) AS sum_impurity_ppm,
       CAST(SUM(s.ppm) AS DOUBLE) / COUNT(*) AS avg_impurity_ppm
FROM scored s CROSS JOIN bounds b
GROUP BY 1
"""


@query("user_type_impurity", _IMPURITY_ORACLE)
def user_type_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import range_bucket

    ut = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    u = ut.groupBy("user_id").agg(
        F.sum("c").alias("n"), F.sum(F.col("c") * F.col("c")).alias("ssq")
    )
    d38 = "decimal(38,0)"
    scored = u.select(
        "n",
        F.expr(
            "(1000000 * (CAST(n AS DECIMAL(38,0)) * n - ssq))"
            " div (CAST(n AS DECIMAL(38,0)) * n)"
        ).alias("ppm"),
    )
    bounds = scored.agg(F.min("n").alias("lo"), F.max("n").alias("hi"))
    return (
        scored.crossJoin(F.broadcast(bounds))
        .groupBy(range_bucket("n", "lo", "hi", 10).alias("activity_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("ppm").cast("long").alias("sum_impurity_ppm"),
            (F.sum("ppm").cast("double") / F.count(F.lit(1))).alias(
                "avg_impurity_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# nearest_poi — broadcast K-nearest-neighbor assignment (the spatial
# "closest store/station/depot" join): every customer point snaps to
# its nearest point-of-interest. The POI set is DIMENSION-sized, so
# the scalable plan is exactly this one: broadcast the K POIs, compute
# the K distances per row map-side, and take the argmin as a
# map-side-combinable min(struct(d2, poi_id)) — the fact side never
# shuffles except for the final POI-sized rollup. Distances are EXACT
# integer squared-euclidean in micro-degrees (|dlon| ≤ 3.6e8 → d2 ≤
# 1.5e17, comfortably int64); coordinates derive from md5 like
# geo_tz_counts so the query is oracle-checkable, and ties break on
# poi_id identically in both engines. (True great-circle distance
# needs trig — engine-divergent floats — and changes no nearest
# assignment at city scales; the integer metric IS the contract.)
# ---------------------------------------------------------------------------

#: deterministic POI grid: Knuth-hash scatter, fixed constants shared
#: verbatim by the Spark plan and the SQL oracle.
_POIS = [
    (
        i,
        -60_000_000 + (i * 2654435761) % 120_000_000,
        -180_000_000 + (i * 40503) % 360_000_000,
    )
    for i in range(40)
]


def _poi_values() -> str:
    return ", ".join(f"({i}, {la}, {lo})" for i, la, lo in _POIS)


_NEAREST_POI_ORACLE = f"""
WITH pois(poi_id, plat, plon) AS (VALUES {_poi_values()}),
pts AS (
  SELECT c_custkey,
         -60000000 + (('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':lat'), 1, 15))::BIGINT
                      % 120000000) AS lat,
         -180000000 + (('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':lon'), 1, 15))::BIGINT
                       % 360000000) AS lon
  FROM customer
),
scored AS (
  SELECT p.c_custkey, q.poi_id,
         (p.lat - q.plat) * (p.lat - q.plat)
           + (p.lon - q.plon) * (p.lon - q.plon) AS d2,
         row_number() OVER (PARTITION BY p.c_custkey
                            ORDER BY (p.lat - q.plat) * (p.lat - q.plat)
                                   + (p.lon - q.plon) * (p.lon - q.plon),
                                     q.poi_id) AS rn
  FROM pts p CROSS JOIN pois q
)
SELECT poi_id, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(MIN(d2) AS BIGINT) AS min_d2, CAST(MAX(d2) AS BIGINT) AS max_d2
FROM scored WHERE rn = 1
GROUP BY poi_id
"""


@query("nearest_poi", _NEAREST_POI_ORACLE)
def nearest_poi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import h60

    def hmod(salt: str, m: int):
        return h60(F.concat(F.col("c_custkey").cast("string"), F.lit(salt))) % m

    # spread: the 20-POI broadcast cross-join + struct-min fold is
    # scan-rooted CPU (r14 interleaved: 1.62 -> 0.75 s best)
    pts = t(spark, sf_dir, "customer", spread=True).select(
        "c_custkey",
        (F.lit(-60_000_000) + hmod(":lat", 120_000_000)).alias("lat"),
        (F.lit(-180_000_000) + hmod(":lon", 360_000_000)).alias("lon"),
    )
    pois = local_df(spark, _POIS, "poi_id long, plat long, plon long")
    d2 = (F.col("lat") - F.col("plat")) * (F.col("lat") - F.col("plat")) + (
        F.col("lon") - F.col("plon")
    ) * (F.col("lon") - F.col("plon"))
    nearest = (
        pts.crossJoin(F.broadcast(pois))
        .select("c_custkey", F.struct(d2.alias("d2"), F.col("poi_id")).alias("sc"))
        .groupBy("c_custkey")
        .agg(F.min("sc").alias("best"))
    )
    return nearest.groupBy(F.col("best.poi_id").alias("poi_id")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("best.d2").alias("min_d2"),
        F.max("best.d2").alias("max_d2"),
    )


# ---------------------------------------------------------------------------
# fk_integrity_audit — referential-integrity audit across the whole
# star schema in ONE pass per table (the pre-load DQ gate every
# warehouse runs; the reference's analogue is the station diff-upsert's
# "known sensor?" check, fetcher/lib/station.js). This is the
# SCALE-SUPERIOR superset of relational_adv.fk_violation_audit: that
# one LEFT-JOINs every child ROW against its parent (4 relations,
# row-level join cost), this one rolls child keys up first so the
# anti-join touches each DISTINCT key once, melts all of a table's FKs
# into one scan, and extends coverage to the nation FKs plus a
# deliberately-dirty cross-domain relation. For each FK relation,
# how many child rows, NULL keys, distinct keys, orphan keys and
# orphan rows. Scale shape: every child table is scanned ONCE — its FK
# columns melt to (relation, key) rows map-side — then one
# (relation, key) rollup (map-side combined; the key space is the
# union of dimension keys), one tagged union of parent key sets, and
# ONE left-anti join for all seven relations together. Never a
# per-relation rescan, never a row-level anti-join (the rollup means
# the join touches each DISTINCT key once). events.user_id →
# customer.c_custkey is the deliberately-dirty cross-domain relation:
# synthetic user ids need not be customers, so orphan counts exercise
# the non-zero path at every SF.
# ---------------------------------------------------------------------------

_FK_RELS = [
    # (relation tag, child table, child key col, parent table, parent key col)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
]


def _fk_oracle() -> str:
    parts = []
    for rel, child, ck, parent, pk in _FK_RELS:
        parts.append(f"""
SELECT '{rel}' AS relation,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}) AS child_rows,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {child} WHERE {ck} IS NULL)
         AS null_rows,
       CAST(COUNT(*) AS BIGINT) AS distinct_keys,
       CAST(COUNT(*) FILTER (WHERE NOT ok) AS BIGINT) AS orphan_keys,
       CAST(COALESCE(SUM(cnt) FILTER (WHERE NOT ok), 0) AS BIGINT)
         AS orphan_rows
FROM (
  SELECT c.{ck} AS k, CAST(COUNT(*) AS BIGINT) AS cnt,
         EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck}) AS ok
  FROM {child} c WHERE c.{ck} IS NOT NULL GROUP BY 1
)""")
    return "\nUNION ALL\n".join(parts)


@query("fk_integrity_audit", _fk_oracle())
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # melt each child table's FK columns in one scan: (relation, key)
    by_child: dict[str, list[tuple[str, str]]] = {}
    for rel, child, ck, _parent, _pk in _FK_RELS:
        by_child.setdefault(child, []).append((rel, ck))
    melted = None
    totals = None
    for child, rels in by_child.items():
        tbl = t(spark, sf_dir, child).select(*[ck for _, ck in rels])
        pairs = tbl.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(rel).alias("relation"),
                            F.col(ck).cast("long").alias("k"),
                        )
                        for rel, ck in rels
                    ]
                )
            ).alias("x")
        ).select("x.relation", "x.k")
        melted = pairs if melted is None else melted.unionAll(pairs)
        # child_rows / null_rows per relation ride the same scan via the
        # melted frame (a NULL key melts to a NULL k row, still counted)
    # ONE corpus-level rollup consumes the melt (NULL keys kept as
    # their own bucket); every downstream branch reads this distinct-
    # key-sized frame. Without the checkpoint the counts/per_rel/orph
    # diamond re-planned the melt per consumer — 50 parquet scans in
    # the physical plan (measured round 7); with it, one scan per
    # child table.
    keyed = (
        melted.groupBy("relation", "k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # lazy (r15): materializes inside the final action's first
        # consumer instead of a standalone up-front job — one fewer
        # dispatch round, same single melt evaluation
        .localCheckpoint(eager=False)
    )
    counts = keyed.groupBy("relation").agg(
        F.sum("cnt").alias("child_rows"),
        F.coalesce(
            F.sum(F.when(F.col("k").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("null_rows"),
    )
    keyed = keyed.filter(F.col("k").isNotNull())
    # tagged union of parent key sets — each parent scanned once even
    # when it backs two relations (nation, customer): the distinct key
    # set is computed once and exploded across its relation tags
    by_parent: dict[tuple[str, str], list[str]] = {}
    for rel, _child, _ck, parent, pk in _FK_RELS:
        by_parent.setdefault((parent, pk), []).append(rel)
    pkeys = None
    for (parent, pk), rels_p in by_parent.items():
        p = (
            t(spark, sf_dir, parent)
            .select(F.col(pk).cast("long").alias("k"))
            .distinct()
            .select(
                F.explode(
                    F.array(*[F.lit(r) for r in rels_p])
                ).alias("relation"),
                "k",
            )
        )
        pkeys = p if pkeys is None else pkeys.unionAll(p)
    orphans = keyed.join(pkeys, ["relation", "k"], "left_anti")
    per_rel = keyed.groupBy("relation").agg(
        F.count(F.lit(1)).alias("distinct_keys")
    )
    orph = orphans.groupBy("relation").agg(
        F.count(F.lit(1)).alias("orphan_keys"),
        F.sum("cnt").alias("orphan_rows"),
    )
    return (
        counts.join(per_rel, "relation", "left")
        .join(orph, "relation", "left")
        .select(
            "relation",
            "child_rows",
            "null_rows",
            F.coalesce(F.col("distinct_keys"), F.lit(0)).alias("distinct_keys"),
            F.coalesce(F.col("orphan_keys"), F.lit(0)).alias("orphan_keys"),
            F.coalesce(F.col("orphan_rows"), F.lit(0)).alias("orphan_rows"),
        )
    )


# ---------------------------------------------------------------------------
# ship_latency_percentiles — the operations SLA rollup: order→ship
# latency in whole days, exact p50/p90/p99 + max per order month. The
# percentile machinery is the skew_audit stance: collapse to a
# (month, latency) count table first — the cumulative window then runs
# per month over DISTINCT latency values (calendar-bounded: a latency
# axis has hundreds of distinct days, never row counts), so there is no
# global sort and no approx_percentile nondeterminism. Latency is an
# exact integer day difference in epoch µs (date arithmetic across
# engines is the trap; integer div is not). The orderkey join is the
# schema's canonical 1:N — shuffle-partitioned on the key both sides,
# AQE-eligible.
# ---------------------------------------------------------------------------

_SHIPLAT_ORACLE = """
WITH lat AS (
  SELECT date_trunc('month', o.o_orderdate) AS month,
         (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000
           AS lat_days
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
cnt AS (
  SELECT month, lat_days, CAST(COUNT(*) AS BIGINT) AS n
  FROM lat GROUP BY 1, 2
),
cum AS (
  SELECT month, lat_days, n,
         SUM(n) OVER (PARTITION BY month ORDER BY lat_days) AS c,
         SUM(n) OVER (PARTITION BY month) AS tot
  FROM cnt
)
SELECT month, CAST(MAX(tot) AS BIGINT) AS n_lines,
       MIN(CASE WHEN 2 * c >= tot THEN lat_days END) AS p50_days,
       MIN(CASE WHEN 10 * c >= 9 * tot THEN lat_days END) AS p90_days,
       MIN(CASE WHEN 100 * c >= 99 * tot THEN lat_days END) AS p99_days,
       MAX(lat_days) AS max_days
FROM cum GROUP BY month
"""


@query("ship_latency_percentiles", _SHIPLAT_ORACLE)
def ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.timestamps import micros
    from .registry import t as _t

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", micros(F.col("l_shipdate")).alias("ship_us")
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.date_trunc("month", "o_orderdate").alias("month"),
        micros(F.col("o_orderdate")).alias("order_us"),
    )
    cnt = (
        li.join(o, "l_orderkey")
        .select(
            "month",
            F.expr("(ship_us - order_us) div 86400000000").alias("lat_days"),
        )
        .groupBy("month", "lat_days")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wc = Window.partitionBy("month").orderBy("lat_days")
    wt = Window.partitionBy("month")
    cum = cnt.select(
        "month",
        "lat_days",
        F.sum("n").over(wc).alias("c"),
        F.sum("n").over(wt).alias("tot"),
    )
    return cum.groupBy("month").agg(
        F.max("tot").cast("long").alias("n_lines"),
        F.min(F.when(2 * F.col("c") >= F.col("tot"), F.col("lat_days"))).alias(
            "p50_days"
        ),
        F.min(
            F.when(10 * F.col("c") >= 9 * F.col("tot"), F.col("lat_days"))
        ).alias("p90_days"),
        F.min(
            F.when(100 * F.col("c") >= 99 * F.col("tot"), F.col("lat_days"))
        ).alias("p99_days"),
        F.max("lat_days").alias("max_days"),
    )
