"""Windowing + multi-level aggregation queries (SURVEY.md T6 'absent in
reference — we add them' + §2.5 note on grouping sets).

These extend the engine beyond the reference's surface: rollup grouping
sets, gap-based session windows, and sliding windows — each still
oracle-verified (DuckDB shares the semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.timestamps import micros
from ..operators.quantiles import sql_range_bucket as _sql_range_bucket
from ..localdf import local_df
from .registry import query, sql_exact_sum, t

# ---------------------------------------------------------------------------
# pricing_rollup — ROLLUP grouping sets (partial + grand totals). Spark
# rollup == DuckDB ROLLUP: grouping columns are NULL on total rows.
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       {sql_exact_sum('l_quantity', 2)} AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("pricing_rollup", _ROLLUP_ORACLE)
def pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(27,2)")).cast("double").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# user_sessions — gap-based sessionization (30-min inactivity gap) via
# lag + running sum. The batch twin of a streaming session window; the
# per-user window partitions hash-distribute, no global sort.
# ---------------------------------------------------------------------------

_SESSIONS_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
  SELECT user_id, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM gaps
)
SELECT user_id, session_no, COUNT(*) AS n,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess GROUP BY user_id, session_no
"""


@query("user_sessions", _SESSIONS_ORACLE)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # microsecond precision on BOTH sides (oracle uses epoch_us): a
    # whole-second cast would flip sub-second gaps across the boundary
    gap = micros(F.col("ts")) - micros(F.lag(F.col("ts")).over(w))
    new_sess = F.when(gap > 1_800_000_000, 1).when(
        F.lag("ts").over(w).isNull(), 1
    ).otherwise(0)
    sess = e.select(
        "user_id",
        "ts",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "session_no"
        ),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# session_window_stats — Spark's NATIVE session_window (gap-merged
# event-time windows) in batch mode, the engine-level twin of the
# lag+running-sum sessionization above. Semantics pinned by the oracle:
# each event opens [ts, ts+gap); overlapping windows merge, so a gap of
# EXACTLY 30 min starts a new session (>=, where user_sessions' manual
# formulation uses >) — the two queries together document the boundary
# difference. Scale: one shuffle on (user_id), merge is per-key local.
# ---------------------------------------------------------------------------

_SESSION_WINDOW_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                   OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM gaps
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n
FROM sess GROUP BY user_id, session_no
"""


@query("session_window_stats", _SESSION_WINDOW_ORACLE)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# sliding_3h_counts — sliding window (width 3h, slide 1h) via Spark's
# native F.window; oracle enumerates the 3 member windows per row.
# ---------------------------------------------------------------------------

_SLIDING_ORACLE = """
SELECT window_start, COUNT(*) AS n
FROM (
  SELECT date_trunc('hour', ts) - o * INTERVAL 1 HOUR AS window_start
  FROM events, (SELECT unnest([0, 1, 2]) AS o)
)
GROUP BY window_start
"""


@query("sliding_3h_counts", _SLIDING_ORACLE)
def sliding_3h_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "3 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


# ---------------------------------------------------------------------------
# embedding_near_dups — the embedding-cosine near-dup path: LSH-bucket
# candidates (equi-join, never all-pairs) + exact cosine verify + threshold.
# ---------------------------------------------------------------------------


def _near_dup_oracle() -> str:
    from .simsearch import _ann_oracle

    return f"""
WITH buckets AS ({_ann_oracle().strip()}),
cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
ve AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT c.id_a, c.id_b,
       ROUND(list_cosine_similarity(va.v, vb.v), 6) AS cos_sim
FROM cand c JOIN ve va ON va.vec_id = c.id_a JOIN ve vb ON vb.vec_id = c.id_b
WHERE ROUND(list_cosine_similarity(va.v, vb.v), 6) >= 0.8
"""


@query("embedding_near_dups", _near_dup_oracle())
def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.similarity import dot, norm
    from .simsearch import _bucket_expr, _quantized

    e = t(spark, sf_dir, "embeddings")
    df = e.select("vec_id", "embedding", _quantized(F.col("embedding")).alias("q"))
    # the eager checkpoint below computes the bucket/norm projection —
    # spread a narrow scan (single small parquet file → 1 partition)
    # across the executors first, or the materialization runs serially.
    # A wide input at real scale already has the parallelism and skips
    # the shuffle entirely.
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    # per-VECTOR norms at checkpoint time: the verify step then does one
    # array fold per candidate pair (the dot) instead of three — norms
    # are O(N·dim) once, never O(candidates·dim) per pair. Same float
    # op order as cosine(), so DuckDB parity is bit-identical.
    b = df.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        _bucket_expr(F.col("q")).alias("bucket"),  # shared LSH definition
        norm(F.col("embedding").cast("array<double>")).alias("nrm"),
    ).localCheckpoint(eager=True)
    a, c = b.alias("a"), b.alias("b")
    cand = a.join(c, on="bucket").filter(F.col("a.vec_id") < F.col("b.vec_id"))
    scored = cand.select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        F.round(
            dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")), 6
        ).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= 0.8)


# ---------------------------------------------------------------------------
# orders_cube — CUBE grouping sets (all 4 combinations of status x
# priority); Spark cube() == DuckDB CUBE with NULLs on rolled-up rows.
# ---------------------------------------------------------------------------

_CUBE_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       {sql_exact_sum('o_totalprice', 2)} AS sum_total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("orders_cube", _CUBE_ORACLE)
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(27,2)")).cast("double").alias("sum_total"),
    )


# ---------------------------------------------------------------------------
# value_changes — lead/lag change detection: per-user consecutive value
# deltas (ordered by ts with event_id tiebreaker — every per-key window
# needs a total order), top-20 by absolute delta. One shuffle on
# user_id; double subtraction is exact (no accumulation).
# ---------------------------------------------------------------------------

_VALUE_CHANGES_ORACLE = """
SELECT user_id, event_id, delta FROM (
  SELECT user_id, event_id,
         value - lag(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS delta
  FROM events
) WHERE delta IS NOT NULL
ORDER BY abs(delta) DESC, user_id ASC, event_id ASC
LIMIT 20
"""


@query("value_changes", _VALUE_CHANGES_ORACLE)
def value_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            (F.col("value") - F.lag("value").over(w)).alias("delta"),
        )
        .filter(F.col("delta").isNotNull())
        .orderBy(F.abs(F.col("delta")).desc(), F.col("user_id").asc(), F.col("event_id").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# customer_deciles — ntile decile stats over account balance (global
# order with custkey tiebreaker). A single-partition window at this
# output is fine: ntile is over the *customer* dim (small vs facts); at
# true scale the same stats come from approx quantile cuts instead.
# ---------------------------------------------------------------------------

_DECILES_ORACLE = """
SELECT decile, COUNT(*) AS n,
       MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
FROM (
  SELECT c_acctbal,
         ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
  FROM customer
)
GROUP BY decile
ORDER BY decile
"""


@query("customer_deciles", _DECILES_ORACLE)
def customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return (
        c.select("c_acctbal", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# cumulative_monthly_revenue — running total over an ordered frame
# (rows unbounded preceding): monthly integer-cents revenue, then the
# cumulative sum per month. Cents stay BIGINT through the window (exact,
# order-independent given the unique month key); DuckDB's windowed
# SUM(BIGINT) yields HUGEINT → cast back.
# ---------------------------------------------------------------------------

_CUMREV_ORACLE = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
)
SELECT month,
       CAST(cents AS DOUBLE) / 100.0 AS revenue,
       CAST(CAST(SUM(cents) OVER (ORDER BY month) AS BIGINT) AS DOUBLE) / 100.0
         AS cumulative_revenue
FROM monthly
ORDER BY month
"""


@query("cumulative_monthly_revenue", _CUMREV_ORACLE)
def cumulative_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents")
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "month",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        (F.sum("cents").over(w).cast("double") / 100.0).alias("cumulative_revenue"),
    ).orderBy("month")


# ---------------------------------------------------------------------------
# event_type_pivot — long→wide pivot with a FIXED value list (never
# inferred: an inferred pivot needs an extra distinct scan and breaks
# schema stability). Compiles to one hash agg with conditional counts —
# exactly the oracle's FILTER form; single shuffle on user_id.
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_ORACLE = f"""
SELECT user_id,
  {", ".join(f"CAST(COUNT(*) FILTER (event_type = '{et}') AS BIGINT) AS {et}" for et in _EVENT_TYPES)}
FROM events GROUP BY user_id
"""


@query("event_type_pivot", _PIVOT_ORACLE)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
    )
    # pivot leaves NULL where a (user, type) pair never occurred; the
    # FILTER oracle counts 0 — align
    return out.select(
        "user_id", *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in _EVENT_TYPES]
    )


# ---------------------------------------------------------------------------
# stratified_sample — deterministic per-stratum sampling: ~30% of docs
# per language via the portable md5 hash of doc_id (NOT Bernoulli rng —
# engines would never agree, and reruns must be reproducible for
# train/eval splits). Narrow map, no shuffle; the rate check is
# hash(doc_id) mod 100 < 30 so membership is stable under corpus growth.
# ---------------------------------------------------------------------------

_STRAT_ORACLE = """
SELECT lang, COUNT(*) AS n_sampled,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM documents
WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100) < 30
GROUP BY lang
ORDER BY lang
"""


@query("stratified_sample", _STRAT_ORACLE)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    return (
        d.filter((h % 100) < 30)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.min("doc_id").alias("first_doc"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# approx_event_stats — the sketch path for 100 TB: HyperLogLog++ distinct
# users and approximate percentiles per event type, registered as a
# CHECKABLE CONTRACT rather than raw estimates. Sketch estimates are
# engine-specific by construction (DuckDB's approx algorithms produce
# different, equally valid values), so the query emits the EXACT
# aggregates plus booleans asserting each sketch landed inside its
# documented error bound — HLL++ rsd=0.01 checked at a 4-sigma ±4%
# relative margin, percentile_approx accuracy=10000 (rank error 1e-4)
# checked against exact quantiles ±0.01 (a 100x margin). The oracle
# reproduces the exact columns and literal TRUEs: a sketch that breaks
# its contract flips a boolean and the driver hash goes red. The pure
# production shape at scale is the first three aggregates alone
# (map-side-mergeable fixed-memory sketches); the exact twins here are
# the verification harness, same split as `distinct_users` /
# `value_percentiles`.
# ---------------------------------------------------------------------------

_APPROX_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS users_ok, TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
FROM events GROUP BY event_type ORDER BY event_type
"""


@query("approx_event_stats", _APPROX_ORACLE)
def approx_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    # ONE percentile_approx sketch for all three quantiles (a single
    # KLL-style pass over the data), then scalar columns — the driver's
    # canonicalizer sorts output columns, and an array column is
    # unsortable/unhashable there (round-2 err).
    pcts = F.percentile_approx("value", [0.5, 0.95, 0.99], 10000)
    exact_pcts = F.percentile("value", [0.49, 0.51, 0.94, 0.96, 0.98, 1.0])
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        pcts.alias("_s"),
        exact_pcts.alias("_e"),
        F.count(F.lit(1)).alias("n"),
    )
    users_rel_err = (
        F.col("approx_users") - F.col("exact_users")
    ).cast("double") / F.col("exact_users")

    def within(s: Column, lo: Column, hi: Column) -> Column:
        return (s >= lo) & (s <= hi)

    return agg.select(
        "event_type",
        "n",
        "exact_users",
        (F.abs(users_rel_err) <= 0.04).alias("users_ok"),
        within(F.col("_s")[0], F.col("_e")[0], F.col("_e")[1]).alias("p50_ok"),
        within(F.col("_s")[1], F.col("_e")[2], F.col("_e")[3]).alias("p95_ok"),
        within(F.col("_s")[2], F.col("_e")[4], F.col("_e")[5]).alias("p99_ok"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# salted_type_stats — the skew-mitigation path as a driver-graded query:
# event_type has only 5 values (extreme key skew — every row lands on 5
# reducers), so aggregate in two phases via operators.skew.salted_agg:
# partial on (type, salt16) spreads each hot key over 16 reducers, final
# on type. Counts/sums are re-aggregable → identical result to the
# direct form, which is exactly what the oracle checks.
# ---------------------------------------------------------------------------

_SALTED_ORACLE = """
SELECT event_type,
       CAST(COUNT(event_id) AS BIGINT) AS count_event_id,
       CAST(MIN(user_id) AS BIGINT) AS min_user_id
FROM events GROUP BY event_type
"""


@query("salted_type_stats", _SALTED_ORACLE)
def salted_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_agg

    e = t(spark, sf_dir, "events")
    return salted_agg(
        e,
        ["event_type"],
        {"event_id": "count", "user_id": "min"},
        salt_buckets=16,
    )


# ---------------------------------------------------------------------------
# brand_weighted_price — weighted average (sum of price·qty / sum qty)
# per brand: both numerator and denominator are exact integer
# accumulations (cents × quantity-hundredths), one IEEE divide at the
# end. Single fact shuffle on p_brand after the part join.
# ---------------------------------------------------------------------------

_WEIGHTED_ORACLE = """
SELECT p_brand,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                * CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
         / CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
         AS weighted_price,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


@query("brand_weighted_price", _WEIGHTED_ORACLE)
def brand_weighted_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    qh = F.round(F.col("l_quantity") * 100, 0).cast("long")
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            (
                F.sum(cents * qh).cast("double")
                / F.sum(qh).cast("double")
                / F.lit(100.0)
            ).alias("weighted_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# purchase_streaks — gaps-and-islands: longest run of CONSECUTIVE days
# with ≥1 purchase per user. The classic trick: day - row_number() is
# constant within a consecutive run, so grouping by that difference
# finds islands with two aggregations and one window — no iteration,
# no self-join. All integer arithmetic.
# ---------------------------------------------------------------------------

_STREAKS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events WHERE event_type = 'purchase'
),
runs AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp
  FROM days
),
islands AS (
  SELECT user_id, COUNT(*) AS len FROM runs GROUP BY user_id, grp
)
SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak
FROM islands GROUP BY user_id
ORDER BY longest_streak DESC, user_id ASC
LIMIT 25
"""


@query("purchase_streaks", _STREAKS_ORACLE)
def purchase_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    days = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    runs = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("grp"),
    )
    islands = runs.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return (
        islands.groupBy("user_id")
        .agg(F.max("len").alias("longest_streak"))
        .orderBy(F.col("longest_streak").desc(), F.col("user_id").asc())
        .limit(25)
    )


# ---------------------------------------------------------------------------
# funnel_conversion — ordered-sequence funnel (view → click → purchase):
# each stage's timestamp must STRICTLY follow the previous stage's, the
# product-analytics query every event pipeline runs. Expressed as three
# chained conditional aggregates (min-ts per user, each filtered by the
# prior stage's time) — joins on user_id reuse one partitioning; no
# UDF, no per-row state.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after
"""


@query("funnel_conversion", _FUNNEL_ORACLE)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # stage rollups feed the next join AND their own count: checkpoint
    # so events is scanned once per stage (see timed_funnel)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .localCheckpoint()
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint()
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after")))
    )


# ---------------------------------------------------------------------------
# retention_cohorts — weekly retention triangle: users grouped by their
# FIRST-event week (cohort), activity counted per whole weeks since.
# weeks_since is an exact integer floor of the day difference — never a
# calendar week-boundary count, which differs between engines. Two
# shuffles: the per-user first-event aggregate and the cohort rollup.
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH first_ts AS (
  SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id
)
SELECT date_trunc('day', f.t0) AS cohort_day,
       CAST(date_diff('day', CAST(f.t0 AS DATE), CAST(e.ts AS DATE)) // 7
            AS INT) AS weeks_since,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
FROM events e JOIN first_ts f USING (user_id)
GROUP BY 1, 2
"""


@query("retention_cohorts", _RETENTION_ORACLE)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("user_id", "ts")
    first_ts = e.groupBy("user_id").agg(F.min("ts").alias("t0"))
    return (
        e.join(first_ts, "user_id")
        .select(
            "user_id",
            F.date_trunc("day", "t0").alias("cohort_day"),
            F.floor(
                F.datediff(F.to_date("ts"), F.to_date("t0")) / 7
            ).cast("int").alias("weeks_since"),
        )
        .groupBy("cohort_day", "weeks_since")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# ewma_user_value — exponentially decayed per-user value (half-life
# decay, a = 0.5): S = sum over events of value * 0.5^(events after it).
# Parity-exact BY CONSTRUCTION: 0.5^k is a power of two, so each term
# is one exact double multiply; terms quantize to integer micro-units
# before the per-user sum (order-independent). A generic alpha would
# ride libm pow(), which differs in ulps across engines — the one
# design point where choosing the constant IS the correctness fix.
# One shuffle (user window), top-50 by decayed value.
# ---------------------------------------------------------------------------

_EWMA_ORACLE = """
WITH r AS (
  SELECT user_id, value,
         COUNT(*) OVER (PARTITION BY user_id) -
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS k
  FROM events
),
q AS (
  SELECT user_id,
         CAST(ROUND(value * pow(0.5, k) * 1000000.0, 0) AS BIGINT) AS sq
  FROM r
)
SELECT user_id,
       CAST(SUM(sq) AS DOUBLE) / 1000000.0 AS decayed_value
FROM q GROUP BY user_id
ORDER BY SUM(sq) DESC, user_id ASC
LIMIT 50
"""


@query("ewma_user_value", _EWMA_ORACLE)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wk = Window.partitionBy("user_id")
    r = e.select(
        "user_id",
        "value",
        (F.count(F.lit(1)).over(wk) - F.row_number().over(w)).alias("k"),
    )
    sq = F.round(
        F.col("value") * F.pow(F.lit(0.5), F.col("k")) * 1_000_000.0, 0
    ).cast("long")
    return (
        r.select("user_id", sq.alias("sq"))
        .groupBy("user_id")
        .agg(F.sum("sq").alias("_s"))
        .orderBy(F.col("_s").desc(), F.col("user_id").asc())
        .limit(50)
        .select(
            "user_id", (F.col("_s").cast("double") / 1_000_000.0).alias("decayed_value")
        )
    )


# ---------------------------------------------------------------------------
# event_type_affinity — market-basket association over per-user event
# sets: for every event-type pair, support / confidence / lift from
# exact user counts. The self-join runs on DISTINCT (user, type) rows —
# at most |types| per user, so fan-out per key is bounded by the type
# vocabulary (25 pairs/user here), never by event volume; the per-type
# totals are a 5-row broadcast. All three measures derive from exact
# BIGINTs in mirrored double math.
# ---------------------------------------------------------------------------

_AFFINITY_ORACLE = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n_t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut GROUP BY 1),
total AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM ut a JOIN ut b USING (user_id)
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_ab,
       ROUND(CAST(p.n_ab AS DOUBLE) / t.n_users, 6) AS support,
       ROUND(CAST(p.n_ab AS DOUBLE) / na.n, 6) AS confidence,
       ROUND(CAST(p.n_ab AS DOUBLE) * t.n_users / (na.n * nb.n), 6) AS lift
FROM pairs p
JOIN n_t na ON na.event_type = p.type_a
JOIN n_t nb ON nb.event_type = p.type_b
CROSS JOIN total t
"""


@query("event_type_affinity", _AFFINITY_ORACLE)
def event_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("user_id", "event_type")
    ut = e.distinct()
    n_t = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    total = e.agg(F.countDistinct("user_id").alias("n_users"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    na = n_t.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    nb = n_t.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    ab = F.col("n_ab").cast("double")
    return (
        pairs.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .crossJoin(F.broadcast(total))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(ab / F.col("n_users"), 6).alias("support"),
            F.round(ab / F.col("n_a"), 6).alias("confidence"),
            F.round(
                ab * F.col("n_users") / (F.col("n_a") * F.col("n_b")), 6
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# event_transitions — first-order Markov transition matrix over each
# user's event sequence: (type → next type) adjacency counts and row-
# normalized probabilities. The ORDERED complement of
# event_type_affinity's set co-occurrence: one lag/lead window on the
# user_id Exchange, then a 25-key rollup; the per-source totals join
# back as a 5-row broadcast. Probabilities derive from exact BIGINTs.
# ---------------------------------------------------------------------------

_TRANSITIONS_ORACLE = """
WITH s AS (
  SELECT user_id, event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
),
p AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2
),
rt AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total FROM p GROUP BY 1)
SELECT p.from_type, p.to_type, p.n,
       ROUND(CAST(p.n AS DOUBLE) / rt.row_total, 6) AS prob
FROM p JOIN rt USING (from_type)
"""


@query("event_transitions", _TRANSITIONS_ORACLE)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    p = (
        s.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rt = p.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return (
        p.join(F.broadcast(rt), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("row_total"), 6).alias(
                "prob"
            ),
        )
    )


# ---------------------------------------------------------------------------
# value_histogram — EXACT equal-width histogram (20 bins over the
# observed value range): bin edges derive from integer-quantized min/max
# and the bin id is integral division — no float boundary ambiguity, so
# the histogram is identical under any partitioning and in any engine
# (DuckDB's native histogram()/width_bucket have float-edge semantics
# that are NOT portable). Shape: a 1-row extent broadcast, then one
# 20-key rollup.
# ---------------------------------------------------------------------------

_HISTOGRAM_ORACLE = """
WITH q AS (
  SELECT CAST(round(value * 1000000.0, 0) AS BIGINT) AS q, value FROM events
),
ext AS (SELECT MIN(q) AS qmin, MAX(q) AS qmax FROM q)
SELECT CAST(((q - qmin) * 20) // (qmax - qmin + 1) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS lo_value, MAX(value) AS hi_value
FROM q, ext
GROUP BY 1
"""


@query("value_histogram", _HISTOGRAM_ORACLE)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("value")
    q = e.select(
        F.round(F.col("value") * 1_000_000.0, 0).cast("long").alias("q"), "value"
    )
    ext = q.agg(F.min("q").alias("qmin"), F.max("q").alias("qmax"))
    binned = q.crossJoin(F.broadcast(ext)).select(
        F.expr("CAST(((q - qmin) * 20) DIV (qmax - qmin + 1) AS BIGINT)").alias(
            "bin"
        ),
        "value",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo_value"),
        F.max("value").alias("hi_value"),
    )


# ---------------------------------------------------------------------------
# incremental_hourly_merge — the lambda-architecture identity, checked:
# a materialized rollup of the FIRST half of the month merges with a
# fresh rollup of the second half by RE-AGGREGATION (sum of sums,
# DECIMAL-exact), and the oracle computes the whole month in one pass —
# equality IS the proof that the aggregate state is mergeable, the
# property incremental view maintenance and multi-level rollup trees
# (operators/rollup_cascade.py) depend on. Both halves prune on the ts
# predicate at the parquet scan.
# ---------------------------------------------------------------------------


def _inc_merge_oracle() -> str:
    from .registry import sql_exact_sum

    return f"""
SELECT date_trunc('hour', ts) AS hour, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       {sql_exact_sum('value')} AS val_sum
FROM events GROUP BY 1, 2
"""


@query("incremental_hourly_merge", _inc_merge_oracle())
def incremental_hourly_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("ts", "event_type", "value")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(27,6)")).alias("val_dec"),
        )

    old = rollup(e.filter(F.col("ts") < cut))  # "yesterday's materialization"
    delta = rollup(e.filter(F.col("ts") >= cut))  # the fresh increment
    return (
        old.unionByName(delta)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("val_dec").cast("double").alias("val_sum"),
        )
    )


# ---------------------------------------------------------------------------
# type_day_chisq — independence test scaffold: the (event_type × ISO
# weekday) contingency table with expected counts and per-cell χ²
# contributions. The total χ² is deliberately NOT summed: a global sum
# of 35 arbitrary doubles is partition-order-dependent — the per-cell
# contributions are each a deterministic function of exact integers, so
# the result hash-matches; the reader (or a 35-row follow-up agg) sums
# them. Marginals are 5- and 7-row broadcasts.
# ---------------------------------------------------------------------------

_CHISQ_ORACLE = """
WITH o AS (
  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS obs
  FROM events GROUP BY 1, 2
),
rowm AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS row_n FROM o GROUP BY 1),
colm AS (SELECT dow, CAST(SUM(obs) AS BIGINT) AS col_n FROM o GROUP BY 1),
tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM o),
dense AS (
  SELECT r.event_type, c.dow, r.row_n, c.col_n,
         COALESCE(o.obs, 0) AS obs
  FROM rowm r CROSS JOIN colm c
  LEFT JOIN o ON o.event_type = r.event_type AND o.dow = c.dow
)
SELECT d.event_type, d.dow, d.obs,
       ROUND(CAST(d.row_n AS DOUBLE) * d.col_n / t.n, 6) AS expected,
       ROUND((d.obs - CAST(d.row_n AS DOUBLE) * d.col_n / t.n)
             * (d.obs - CAST(d.row_n AS DOUBLE) * d.col_n / t.n)
             / (CAST(d.row_n AS DOUBLE) * d.col_n / t.n), 6) AS chisq_term
FROM dense d CROSS JOIN tot t
"""


@query("type_day_chisq", _CHISQ_ORACLE)
def type_day_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("event_type", "ts")
    # ISO weekday: Spark weekday() is 0=Mon..6=Sun; isodow is 1..7
    o = e.groupBy(
        "event_type", (F.expr("weekday(ts)") + 1).cast("long").alias("dow")
    ).agg(F.count(F.lit(1)).alias("obs"))
    rowm = o.groupBy("event_type").agg(F.sum("obs").alias("row_n"))
    colm = o.groupBy("dow").agg(F.sum("obs").alias("col_n"))
    tot = o.agg(F.sum("obs").alias("n"))
    expected = F.col("row_n").cast("double") * F.col("col_n") / F.col("n")
    # densify over the marginal spine: an EMPTY contingency cell is a
    # real χ² row (obs 0, term = expected) — omitting it understates
    # the total a reader sums (the cramers_v fixture's bug, here in
    # per-cell form)
    dense = (
        rowm.crossJoin(F.broadcast(colm))
        .join(o, ["event_type", "dow"], "left")
        .select(
            "event_type", "dow", "row_n", "col_n",
            F.coalesce(F.col("obs"), F.lit(0).cast("long")).alias("obs"),
        )
    )
    return (
        dense.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "dow",
            "obs",
            F.round(expected, 6).alias("expected"),
            # (o-e)*(o-e), not pow(,2): Math.pow and C pow may differ
            # by 1 ulp; multiplication is correctly rounded in both
            F.round(
                (F.col("obs") - expected) * (F.col("obs") - expected)
                / expected,
                6,
            ).alias("chisq_term"),
        )
    )


# ---------------------------------------------------------------------------
# week_over_week_reconcile — FULL OUTER reconciliation (the one join
# type the registry lacked): per (ISO weekday, hour, type) activity of
# week Jan 8-14 vs week Jan 15-21, slots present in either side kept,
# absences coalesced to 0 and classified added/removed/changed/same.
# This is the ops-facing diff report the reference's run log feeds; at
# scale both sides are already aggregated (compact slot keys), so the
# full outer join shuffles rollup rows, never events.
# ---------------------------------------------------------------------------

_WOW_ORACLE = """
WITH w1 AS (
  SELECT CAST(isodow(ts) AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hr, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
  GROUP BY 1, 2, 3
),
w2 AS (
  SELECT CAST(isodow(ts) AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hr, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-22'
  GROUP BY 1, 2, 3
)
SELECT COALESCE(w1.dow, w2.dow) AS dow,
       COALESCE(w1.hr, w2.hr) AS hr,
       COALESCE(w1.event_type, w2.event_type) AS event_type,
       COALESCE(w1.n, 0) AS n_w1,
       COALESCE(w2.n, 0) AS n_w2,
       COALESCE(w2.n, 0) - COALESCE(w1.n, 0) AS delta,
       CASE WHEN w1.n IS NULL THEN 'added'
            WHEN w2.n IS NULL THEN 'removed'
            WHEN w1.n = w2.n THEN 'same'
            ELSE 'changed' END AS status
FROM w1 FULL OUTER JOIN w2
  ON w1.dow = w2.dow AND w1.hr = w2.hr AND w1.event_type = w2.event_type
"""


@query("week_over_week_reconcile", _WOW_ORACLE)
def week_over_week_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("ts", "event_type")

    def week(lo: str, hi: str) -> DataFrame:
        return (
            e.filter(
                (F.col("ts") >= F.lit(lo).cast("timestamp"))
                & (F.col("ts") < F.lit(hi).cast("timestamp"))
            )
            .groupBy(
                (F.expr("weekday(ts)") + 1).cast("long").alias("dow"),
                F.hour("ts").cast("long").alias("hr"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )

    w1 = week("2024-01-08", "2024-01-15")
    w2 = week("2024-01-15", "2024-01-22").withColumnRenamed("n", "n2")
    j = w1.join(w2, ["dow", "hr", "event_type"], "full_outer")
    return j.select(
        "dow",
        "hr",
        "event_type",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_w1"),
        F.coalesce(F.col("n2"), F.lit(0)).alias("n_w2"),
        (F.coalesce(F.col("n2"), F.lit(0)) - F.coalesce(F.col("n"), F.lit(0))).alias(
            "delta"
        ),
        F.when(F.col("n").isNull(), "added")
        .when(F.col("n2").isNull(), "removed")
        .when(F.col("n") == F.col("n2"), "same")
        .otherwise("changed")
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# event_motifs — sequential pattern mining (lite): the top-20 per-user
# event-type TRIGRAMS corpus-wide (behavioral motifs — "view→click→
# purchase" style paths). Two lead() windows per user build the
# consecutive triple (consecutive by the total order (ts, event_id)),
# then one map-side-combined agg on the 125-value motif key; ties at
# the cut break (n DESC, motif) — a total order. The window shuffle is
# the only event-volume exchange; the motif agg is vocabulary-bounded.
# ---------------------------------------------------------------------------

_MOTIF_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
  FROM events
)
SELECT event_type || '>' || e2 || '>' || e3 AS motif,
       CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, motif ASC LIMIT 20
"""


@query("event_motifs", _MOTIF_ORACLE)
def event_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("motif")
        )
        .groupBy("motif")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("motif"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# interval_union_length — covered-time per user: each event opens a
# 30-minute activity interval; overlaps must not double-count, so the
# answer is the LENGTH OF THE UNION of intervals (the sibling of
# session_peak_concurrency's sweep-line, and of session windows — but
# here the exact union length in µs, the billing/SLA number). Islands
# form where an interval starts past the running max end (exclusive
# frame); per-island length = max(end) − min(start); one user-keyed
# window + one island rollup, both on the same partitioning.
# ---------------------------------------------------------------------------

_IVL_US = 30 * 60 * 1_000_000

_UNION_ORACLE = f"""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {_IVL_US} AS e
  FROM events
),
marked AS (
  SELECT user_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              -9223372036854775808)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM marked
)
SELECT user_id,
       CAST(COUNT(DISTINCT island) AS BIGINT) AS n_islands,
       CAST(SUM(len) AS BIGINT) AS covered_us
FROM (
  SELECT user_id, island, MAX(e) - MIN(s) AS len
  FROM islands GROUP BY user_id, island
) GROUP BY user_id
"""


@query("interval_union_length", _UNION_ORACLE)
def interval_union_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.timestamps import micros

    e = t(spark, sf_dir, "events").select(
        "user_id",
        micros(F.col("ts")).alias("s"),
        (micros(F.col("ts")) + _IVL_US).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_end = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = e.withColumn(
        "new_island",
        F.when(
            F.col("s") > F.coalesce(prev_max_end, F.lit(-(2**63))), 1
        ).otherwise(0),
    )
    islands = marked.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_island = islands.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("len")
    )
    return per_island.groupBy("user_id").agg(
        F.countDistinct("island").alias("n_islands"),
        F.sum("len").alias("covered_us"),
    )


# ---------------------------------------------------------------------------
# ab_test_zstat — experimentation analytics: a deterministic A/B split
# (user_id parity — in production, the hash-rank assignment of
# corpus_split), conversion = "user ever purchased", and the
# two-proportion z-statistic. All counts are exact integers from two
# shuffles (per-user any-purchase flag, then per-variant totals → 2
# rows); the statistic itself is a single scalar expression over four
# exact BIGINTs — the only doubles are the final divisions and one
# sqrt, identical IEEE in both engines. The experiment read-out a
# product analytics pipeline computes at any scale.
# ---------------------------------------------------------------------------

_AB_ORACLE = """
WITH per_user AS (
  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 3
              THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
v AS (
  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(converted) AS BIGINT) AS conv
  FROM per_user GROUP BY variant
),
w AS (
  SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
         MAX(CASE WHEN variant = 0 THEN conv END) AS c0,
         MAX(CASE WHEN variant = 1 THEN n END) AS n1,
         MAX(CASE WHEN variant = 1 THEN conv END) AS c1
  FROM v
)
SELECT n0, c0, n1, c1,
       CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN NULL
            ELSE ROUND((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
                 / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 6) END AS z
FROM w
"""


@query("ab_test_zstat", _AB_ORACLE)
def ab_test_zstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("user_id", "event_type")
    per_user = e.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) >= 3
        ).cast("int").alias("converted")
    ).withColumn("variant", (F.col("user_id") % 2).cast("long"))
    v = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").cast("long").alias("conv")
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    z = (p0 - p1) / F.sqrt(
        pp * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    degenerate = (F.col("c0") + F.col("c1") == 0) | (
        F.col("c0") + F.col("c1") == F.col("n0") + F.col("n1")
    )
    return w.select(
        "n0", "c0", "n1", "c1",
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(z, 6))
        .alias("z"),
    )


# ---------------------------------------------------------------------------
# feature_auc — exact AUC (Mann-Whitney, tie-corrected) of `value` as a
# discriminator for purchase events: the model-eval staple, computed
# the DISTRIBUTED way — never rank 10^11 rows globally. Histogram
# method: quantize scores to an integer grid (round(value·100) — exact
# cents), aggregate (n_pos, n_neg) per distinct score (one shuffle,
# map-side combined), then the pairwise statistic folds over the score
# groups: 2·U = Σ_s [2·n_pos(s)·N_neg(<s) + n_pos(s)·n_neg(s)] — ties
# contribute the exact ½ in doubled units, so U is an exact BIGINT and
# AUC is one division by P·N. The prefix sum runs over the score-group
# table, bounded by the GRID cardinality, not the event count (the
# same reason histogram-AUC is how large-scale eval actually computes
# it); a wider grid would take the bucketed-prefix treatment of
# sequence_pack. Oracle mirrors every step.
# ---------------------------------------------------------------------------

_AUC_ORACLE = """
WITH scored AS (
  SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS q,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events WHERE value IS NOT NULL
),
grp AS (
  SELECT q, CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(1 - pos) AS BIGINT) AS n_neg
  FROM scored GROUP BY q
),
pre AS (
  SELECT q, n_pos, n_neg,
         COALESCE(SUM(n_neg) OVER (ORDER BY q
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
  FROM grp
),
tot AS (
  SELECT CAST(SUM(n_pos) AS BIGINT) AS p, CAST(SUM(n_neg) AS BIGINT) AS n,
         CAST(SUM(2 * n_pos * neg_below + n_pos * n_neg) AS BIGINT) AS u2
  FROM pre
)
SELECT p, n, u2,
       ROUND(CAST(u2 AS DOUBLE) / (2.0 * p * n), 6) AS auc
FROM tot
"""


@query("feature_auc", _AUC_ORACLE)
def feature_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    scored = e.select(
        F.round(F.col("value") * 100, 0).cast("long").alias("q"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    grp = scored.groupBy("q").agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(1 - F.col("pos")).cast("long").alias("n_neg"),
    )
    w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    pre = grp.withColumn(
        "neg_below", F.coalesce(F.sum("n_neg").over(w), F.lit(0))
    )
    tot = pre.agg(
        F.sum("n_pos").cast("long").alias("p"),
        F.sum("n_neg").cast("long").alias("n"),
        F.sum(
            2 * F.col("n_pos") * F.col("neg_below")
            + F.col("n_pos") * F.col("n_neg")
        ).cast("long").alias("u2"),
    )
    # try_divide: a single-class window (no positives or no negatives)
    # makes AUC undefined — NULL on both engines, not an ANSI
    # DIVIDE_BY_ZERO (DuckDB double /0 is already NULL; ORACLE_NOTES)
    auc = F.round(
        F.try_divide(F.col("u2").cast("double"), 2.0 * F.col("p") * F.col("n")),
        6,
    )
    return tot.select("p", "n", "u2", auc.alias("auc"))


# ---------------------------------------------------------------------------
# salted_join_stats — the skew-salted JOIN as a driver-graded query
# (sibling of salted_type_stats' salted aggregation): events join the
# 5-value category dimension on the Zipfian event_type key with the
# dimension pre-replicated 16× and the fact side content-salted, so
# each hot type spreads over 16 reducers. The oracle is the PLAIN join
# + rollup — equality certifies salting is a pure execution-strategy
# change, invisible in the result. (With a 5-row dim you'd broadcast in
# practice; the query pins the salted plan's correctness for the case
# where the dim is fact-adjacent in size. The join is forced non-
# broadcast via hint so the salted shuffle path actually executes.)
# ---------------------------------------------------------------------------


#: same 5-row category dim as streaming_q._ENRICH_DIM (defined locally:
#: streaming_q imports after windows_q, so importing it here would cycle)
_SALT_DIM: list[tuple[str, str, int]] = [
    ("click", "engagement", 1),
    ("view", "engagement", 1),
    ("purchase", "conversion", 3),
    ("signup", "conversion", 2),
    ("error", "ops", 0),
]


def _salted_join_oracle() -> str:
    from .registry import sql_exact_sum

    values = ", ".join(f"('{t}', '{c}', {w})" for t, c, w in _SALT_DIM)
    return f"""
WITH dim(event_type, category, weight) AS (VALUES {values})
SELECT category,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(weight) AS BIGINT) AS weight_sum,
       {sql_exact_sum('value * weight')} AS weighted_value
FROM events JOIN dim USING (event_type)
GROUP BY category
"""


@query("salted_join_stats", _salted_join_oracle())
def salted_join_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join
    from .registry import exact_sum

    e = t(spark, sf_dir, "events").select("event_type", "value")
    dim = local_df(spark, 
        _SALT_DIM, "event_type string, category string, weight int"
    ).hint("shuffle_hash")  # defeat auto-broadcast: exercise the salted shuffle
    joined = salted_join(e, dim, "event_type", salt_buckets=16)
    return joined.groupBy("category").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("weight").cast("long").alias("weight_sum"),
        exact_sum(F.col("value") * F.col("weight"), alias="weighted_value"),
    )


# ---------------------------------------------------------------------------
# longest_streak — longest run of CONSECUTIVE active days per user (the
# engagement-streak metric): distinct activity days, then the classic
# difference trick — day_index − row_number() is constant exactly
# within a consecutive run — then the max run length. Every quantity is
# an exact integer (days since epoch from micros division), and all
# three steps share the single user_id partitioning: distinct, the
# rank window, and both rollups — one event-volume shuffle total.
# ---------------------------------------------------------------------------

_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events
),
runs AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS run_id
  FROM days
),
lens AS (
  SELECT user_id, run_id, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM runs GROUP BY user_id, run_id
)
SELECT user_id,
       CAST(MAX(run_len) AS BIGINT) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_runs
FROM lens GROUP BY user_id
"""


@query("longest_streak", _STREAK_ORACLE)
def longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.timestamps import micros

    e = t(spark, sf_dir, "events").select(
        "user_id", micros(F.col("ts")).alias("us")
    )
    days = e.select(
        "user_id", F.expr("us div 86400000000").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    runs = days.withColumn("run_id", F.col("day") - F.row_number().over(w))
    lens = runs.groupBy("user_id", "run_id").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return lens.groupBy("user_id").agg(
        F.max("run_len").cast("long").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_runs"),
    )


# ---------------------------------------------------------------------------
# dau_wau_stickiness — DAU / trailing-7-day WAU per day (the product
# stickiness ratio): EXACT distincts over a sliding window, which no
# window function gives (distinct doesn't decompose) — the scale-right
# shape dedups to (day, user) pairs FIRST (event volume collapses to
# at most days × actives), then fans each pair out to the ≤7 spine
# days it supports via a bounded equi-join on day, and counts distinct
# per spine day. All integers; the ratio is one division.
# ---------------------------------------------------------------------------

_DAU_WAU_ORACLE = """
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events
),
spine AS (SELECT DISTINCT day FROM du),
wau AS (
  SELECT s.day, CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS wau
  FROM spine s JOIN du d ON d.day BETWEEN s.day - 6 AND s.day
  GROUP BY s.day
),
dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day
)
SELECT d.day, d.dau, w.wau,
       CAST(d.dau AS DOUBLE) / w.wau AS stickiness
FROM dau d JOIN wau w USING (day)
"""


@query("dau_wau_stickiness", _DAU_WAU_ORACLE)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timestamps import micros

    e = t(spark, sf_dir, "events").select(
        micros(F.col("ts")).alias("us"), "user_id"
    )
    du = e.select(F.expr("us div 86400000000").alias("day"), "user_id").distinct()
    spine = du.select("day").distinct()
    # fan each (day, user) out to the <=7 spine days it supports — a
    # bounded explode + EQUI semi-join on the tiny spine, never a
    # nested-loop range join of pairs x spine
    fanned = du.select(
        F.explode(
            F.sequence(F.col("day"), F.col("day") + 6)
        ).alias("day"),
        "user_id",
    ).join(F.broadcast(spine), "day", "left_semi")
    wau = fanned.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# equi_depth_quantiles — EXACT lower quartiles (p25/p50/p75) of value
# per event type, by the quantized-value GRID prefix sum (the
# weighted_median_value machinery generalized to a quantile VECTOR):
# one per-type (min, max, n) rollup; one map-side-combined (type, cell)
# count grid; ONE window over the <=4096-row grid crossed with the
# 3-row quantile spec finds each quantile's crossing cell; only rows in
# the broadcast-selected cells are re-read and resolved over in-cell
# DISTINCT values. Exactness: lower quantile = value at row
# ceil(q·n) of the (value, event_id) order — for q = k/4 that is the
# integer predicate 4·cum >= k·n, so the answer is an actual data
# value (no interpolation) and ties collapse harmlessly (same-value
# rows are adjacent). No window ever sees event-volume cardinality.
# ---------------------------------------------------------------------------

_EQD_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       MIN(CASE WHEN 4 * rn >= n THEN value END) AS p25,
       MIN(CASE WHEN 2 * rn >= n THEN value END) AS p50,
       MIN(CASE WHEN 4 * rn >= 3 * n THEN value END) AS p75
FROM ranked GROUP BY event_type
"""

@query("equi_depth_quantiles", _EQD_ORACLE)
def equi_depth_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import grid_quantiles

    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .select("event_type", "value")
    )
    q = grid_quantiles(
        e, "event_type", "value", fractions=[(1, 4), (2, 4), (3, 4)]
    )
    return q.groupBy("event_type").agg(
        F.max("total_weight").cast("long").alias("n"),
        F.min(F.when(F.col("num") == 1, F.col("qvalue"))).alias("p25"),
        F.min(F.when(F.col("num") == 2, F.col("qvalue"))).alias("p50"),
        F.min(F.when(F.col("num") == 3, F.col("qvalue"))).alias("p75"),
    )


# ---------------------------------------------------------------------------
# value_mad — median absolute deviation per type (the robust scale
# estimate paired with the median, immune to the outliers that wreck a
# stddev): mad = median(|x − median(x)|). Two passes of the SAME grid
# order-statistics operator (operators/quantiles.py): the 5-row median
# table broadcasts into the deviation scan, whose median resolves on a
# fresh grid. |x − m| is one IEEE subtraction of an exactly-agreed
# median — bit-identical across engines — and both medians are
# selections, never interpolations.
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
med AS (
  SELECT event_type, MAX(n) AS n,
         MIN(CASE WHEN 2 * rn >= n THEN value END) AS med
  FROM ranked GROUP BY event_type
),
dev AS (
  SELECT e.event_type, ABS(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
  WHERE e.value IS NOT NULL AND NOT isnan(e.value)
),
ranked2 AS (
  SELECT event_type, adev,
         row_number() OVER (PARTITION BY event_type ORDER BY adev) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
)
SELECT d.event_type, MAX(m.med) AS med,
       MIN(CASE WHEN 2 * d.rn >= d.n THEN d.adev END) AS mad,
       CAST(MAX(d.n) AS BIGINT) AS n
FROM ranked2 d JOIN med m USING (event_type)
GROUP BY d.event_type
"""


@query("value_mad", _MAD_ORACLE)
def value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import grid_quantiles, grid_stats

    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .select("event_type", "value")
    )
    # med (one row per type) parameterizes every branch of the second
    # grid pass; without materialization each of those branches
    # replays the ENTIRE first pass — the multiplicative blowup that
    # planned 35 corpus scans for this query
    st = grid_stats(e, "event_type", "value")
    med = (
        grid_quantiles(e, "event_type", "value", stats=st)
        .select("event_type", F.col("qvalue").alias("med"))
        .localCheckpoint()
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("adev"), "med"
    )
    # r15 (guide §1.2; r14 verdict task #1 — fold the second pass's
    # redundant work into the first's): the deviation pass's stats are
    # DERIVED from the first pass's instead of re-scanning events —
    # adev = |v − med| lies in [0, max(vmax − med, med − vmin)] exactly
    # (med and the extremes are actual data values), and its row count
    # per key IS the first pass's (_tw, weight 1 both passes; the med
    # join is inner on a key set med fully covers). Bounds-vs-exact-stats
    # cannot change the answer (see grid_quantiles' stats contract:
    # the result is a data-value selection) — one fewer corpus scan
    # and one fewer checkpoint job per run.
    dst = st.join(
        med.select(F.col("event_type").alias("_k"), "med"), "_k"
    ).select(
        "_k",
        F.lit(0.0).alias("_vmin"),
        F.greatest(
            F.col("_vmax") - F.col("med"), F.col("med") - F.col("_vmin")
        ).alias("_vmax"),
        "_tw",
    )
    mad = grid_quantiles(dev, "event_type", "adev", stats=dst).select(
        "event_type",
        F.col("qvalue").alias("mad"),
        F.col("total_weight").cast("long").alias("n"),
    )
    return med.join(mad, "event_type").select("event_type", "med", "mad", "n")


# ---------------------------------------------------------------------------
# value_outliers_3sigma — DECIMAL-exact 3-sigma outlier counts per
# type: flag x when (x − mean)² > 9·var without EVER materializing
# mean or var as floats. Multiply through by n²:
#   (n·x − S)² > 9·(n·Q − S²),   S = Σ cents, Q = Σ cents²
# — all terms exact integers, evaluated in DECIMAL(38,0) on the Spark
# side and HUGEINT (int128) in DuckDB, so the flag is a pure integer
# comparison with no cross-engine float hazard. Shape: one map-side
# (n, S, Q) rollup broadcast back into a second scan; the flag and
# count are map-side too — two scans, zero windows, zero joins wider
# than 5 rows. DECIMAL(38) headroom: |n·x − S| <= n·max_cents ≈ 2e13
# at 2e9 rows/type → squared 4e26 << 1e38.
# ---------------------------------------------------------------------------

_OUTLIER_ORACLE = """
WITH c AS (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
tot AS (
  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(cents) AS HUGEINT) AS s,
         CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS q
  FROM c GROUP BY event_type
)
SELECT c.event_type,
       CAST(MAX(t.n) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN (t.n * c.cents - t.s) * (t.n * c.cents - t.s)
                          > 9 * (t.n * t.q - t.s * t.s)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM c JOIN tot t USING (event_type)
GROUP BY c.event_type
"""


@query("value_outliers_3sigma", _OUTLIER_ORACLE)
def value_outliers_3sigma(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0)
        .cast("long")
        .cast("decimal(38,0)")
        .alias("cents"),
    )
    tot = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("cents").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("decimal(38,0)").alias("q"),
    )
    dev = F.col("n") * F.col("cents") - F.col("s")
    is_out = (dev * dev) > (
        F.lit(9).cast("decimal(38,0)")
        * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    )
    return (
        c.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# lag_features — training-feature extraction: each event carries its
# user's previous three values (the lag-feature matrix every
# sequential-model pipeline materializes before training). One window
# shuffle partitioned by user_id — key cardinality scales WITH the
# data, so this is the scale-safe window shape (unlike a 5-key type
# partitioning); lags are pure frame offsets, no joins, no UDFs.
# ---------------------------------------------------------------------------

_LAG_ORACLE = """
SELECT event_id, user_id, value,
       lag(value, 1) OVER w AS lag1,
       lag(value, 2) OVER w AS lag2,
       lag(value, 3) OVER w AS lag3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("lag_features", _LAG_ORACLE)
def lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 1).over(w).alias("lag1"),
        F.lag("value", 2).over(w).alias("lag2"),
        F.lag("value", 3).over(w).alias("lag3"),
    )


# ---------------------------------------------------------------------------
# reliability_bins — calibration curve (reliability diagram) for the
# same value-as-score / purchase-as-label setup feature_auc evaluates:
# bin the score into deciles of its RANGE, report observed positive
# rate per bin — the diagram isotonic_fit's calibrator would be judged
# against. One global (min, max) scalar broadcast, one map-side
# (bin → n, n_pos, Σscore) aggregate; bin assignment is pure integer
# arithmetic (never float: ((c-lo)·10) div (hi-lo+1)) and rates are
# ratios of exact BIGINTs (score sums in integer cents), bit-identical
# across engines. ≤10 output rows regardless of data volume.
# ---------------------------------------------------------------------------

_RELIABILITY_ORACLE = """
WITH scored AS (
  SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events WHERE value IS NOT NULL
),
bounds AS (
  SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM scored
),
binned AS (
  SELECT {bucket} AS bin,
         pos, cents
  FROM scored, bounds
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(pos) AS BIGINT) AS n_pos,
       CAST(SUM(pos) AS DOUBLE) / COUNT(*) AS pos_rate,
       CAST(SUM(cents) AS DOUBLE) / (100.0 * COUNT(*)) AS mean_score
FROM binned GROUP BY bin
""".format(bucket=_sql_range_bucket("cents", "lo", "hi", 10))


@query("reliability_bins", _RELIABILITY_ORACLE)
def reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    scored = e.select(
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    bounds = scored.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    # integer bin arithmetic (never float): ((c-lo)*10) div (hi-lo+1)
    from ..operators.quantiles import range_bucket

    binned = scored.crossJoin(F.broadcast(bounds)).select(
        range_bucket("cents", "lo", "hi", 10).alias("bin"),
        "pos",
        "cents",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        (F.sum("pos").cast("double") / F.count(F.lit(1))).alias("pos_rate"),
        (F.sum("cents").cast("double") / (F.lit(100.0) * F.count(F.lit(1)))).alias(
            "mean_score"
        ),
    )


# ---------------------------------------------------------------------------
# iqr_fences_outliers — Tukey fences per type (the box-plot outlier
# rule: beyond quartile ± 1.5·IQR), the FOURTH query surface of the
# shared grid order-statistics operator (operators/quantiles.py —
# weighted median, equi-depth, MAD, now fences): one grid pass
# resolves both quartiles, the 5-row fence table broadcasts back into
# a counting scan. Quartiles are actual data values (lower quantiles),
# and the fences are the same short IEEE sequence on both engines
# (one subtract, one multiply by 1.5, one add/subtract) over identical
# bits — so the per-row comparisons agree exactly. NULL/NaN values are
# excluded on BOTH sides per the grid operator's contract.
# ---------------------------------------------------------------------------

_IQR_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
q AS (
  SELECT event_type,
         MIN(CASE WHEN 4 * rn >= n THEN value END) AS p25,
         MIN(CASE WHEN 4 * rn >= 3 * n THEN value END) AS p75
  FROM ranked GROUP BY event_type
),
fences AS (
  SELECT event_type, p25, p75,
         p25 - 1.5 * (p75 - p25) AS lo,
         p75 + 1.5 * (p75 - p25) AS hi
  FROM q
)
SELECT e.event_type, MIN(f.p25) AS p25, MIN(f.p75) AS p75,
       CAST(SUM(CASE WHEN e.value < f.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low,
       CAST(SUM(CASE WHEN e.value > f.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events e JOIN fences f USING (event_type)
WHERE e.value IS NOT NULL AND NOT isnan(e.value)
GROUP BY e.event_type
"""


@query("iqr_fences_outliers", _IQR_ORACLE)
def iqr_fences_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import grid_quantiles

    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .select("event_type", "value")
    )
    q = (
        grid_quantiles(e, "event_type", "value", fractions=[(1, 4), (3, 4)])
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("num") == 1, F.col("qvalue"))).alias("p25"),
            F.min(F.when(F.col("num") == 3, F.col("qvalue"))).alias("p75"),
        )
    )
    fences = q.select(
        "event_type",
        "p25",
        "p75",
        (F.col("p25") - F.lit(1.5) * (F.col("p75") - F.col("p25"))).alias("lo"),
        (F.col("p75") + F.lit(1.5) * (F.col("p75") - F.col("p25"))).alias("hi"),
    )
    return (
        e.join(F.broadcast(fences), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("p25").alias("p25"),
            F.min("p75").alias("p75"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_low"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_high"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# weekday_anova — one-way ANOVA F-statistic: does event value differ by
# weekday? (The seasonality hypothesis test behind staffing/capacity
# decisions.) Groups are the 7 integer weekdays derived from pure
# epoch-day arithmetic ((day+3) % 7, 0 = Monday — engine calendar
# functions never run). All sufficient statistics are exact integers:
# per-group (n, Σcents, Σcents²) in DECIMAL(38,0)/HUGEINT; the
# between/within sums of squares are defined in micro-units with
# truncating division (term_g = (S_g²·1e6) // n_g — a FIXED spec both
# engines compute bit-identically). The quotient is kept in DECIMAL
# space via functions/numeric.exact_div — NEVER Spark `div`, whose
# BIGINT result silently wraps at 2^63 (≈1e6-1e7 rows per weekday at
# these value magnitudes; ADVICE r6). The ceiling is now the loud
# ANSI-checked DECIMAL(38) overflow of the numerator S_g²·1e6, i.e.
# ~1e12-row groups at 1e4-cent values. The F statistic is ONE double
# division of two exact integer products.
# Shape: one map-side 7-group rollup, then a 1-row recombination.
# ---------------------------------------------------------------------------

_ANOVA_ORACLE = """
WITH c AS (
  SELECT ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
g AS (
  SELECT dow, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(cents AS HUGEINT)) AS s,
         SUM(CAST(cents AS HUGEINT) * cents) AS q
  FROM c GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         SUM(n) AS nn, SUM(s) AS ss, SUM(q) AS qq,
         SUM((s * s * 1000000) // n) AS sterm
  FROM g
)
SELECT k AS n_groups, CAST(nn AS BIGINT) AS n,
       CAST(sterm - (ss * ss * 1000000) // nn AS BIGINT) AS ssb_micro,
       CAST(qq * 1000000 - sterm AS BIGINT) AS ssw_micro,
       CASE WHEN qq * 1000000 - sterm > 0 AND k > 1
            THEN CAST((sterm - (ss * ss * 1000000) // nn) * (nn - k) AS DOUBLE)
                 / CAST((qq * 1000000 - sterm) * (k - 1) AS DOUBLE)
            END AS f_stat
FROM tot
"""


@query("weekday_anova", _ANOVA_ORACLE)
def weekday_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timestamps import micros

    d38 = "decimal(38,0)"
    c = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .select(
            micros(F.col("ts")).alias("us"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .select(
            F.expr("((us div 86400000000) + 3) % 7").alias("dow"), "cents"
        )
    )
    g = c.groupBy("dow").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("cents").cast(d38)).alias("s"),
        F.sum(F.col("cents").cast(d38) * F.col("cents")).alias("q"),
    )
    from ..functions.numeric import exact_div

    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        F.sum(
            exact_div(F.col("s") * F.col("s") * F.lit(1000000), F.col("n"))
        ).alias("sterm"),
    )
    ssb = F.col("sterm") - exact_div(
        F.col("ss") * F.col("ss") * F.lit(1000000), F.col("nn")
    )
    ssw = F.col("qq") * 1000000 - F.col("sterm")
    return tot.select(
        F.col("k").alias("n_groups"),
        F.col("nn").cast("long").alias("n"),
        ssb.cast("long").alias("ssb_micro"),
        ssw.cast("long").alias("ssw_micro"),
        F.when(
            (ssw > 0) & (F.col("k") > 1),
            (ssb * (F.col("nn") - F.col("k"))).cast("double")
            / (ssw * (F.col("k") - 1)).cast("double"),
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# cramers_v — effect size for the type × weekday association (the
# companion number to type_day_chisq's per-cell scaffold: one scalar
# answering "HOW MUCH does behavior depend on weekday?"). The global
# chi-square — a float-sum trap across 35 rational cells — is made
# summable by quantizing each cell to micro-units with truncating
# division: term = ((o·N − rs·cs)²·1e6) div (N·rs·cs), all in
# DECIMAL(38,0)/HUGEINT (exact while (o·N)²·1e6 fits DECIMAL(38) —
# up to ~1e9 rows per partition-of-analysis; chunk by day beyond
# that). V = sqrt of ONE division of exact integers. Shape: map-side
# 35-cell rollup; marginals and the final scalar are cell-table-sized.
# ---------------------------------------------------------------------------

_CRAMER_ORACLE = """
WITH c AS (
  SELECT event_type, ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow
  FROM events
),
cells AS (
  SELECT event_type, dow, CAST(COUNT(*) AS HUGEINT) AS o
  FROM c GROUP BY 1, 2
),
rs AS (SELECT event_type, SUM(o) AS r FROM cells GROUP BY 1),
cs AS (SELECT dow, SUM(o) AS s FROM cells GROUP BY 1),
tot AS (SELECT SUM(o) AS n,
               CAST(COUNT(DISTINCT event_type) AS HUGEINT) AS nr,
               CAST(COUNT(DISTINCT dow) AS HUGEINT) AS nc
        FROM cells),
dense AS (
  SELECT r.event_type, s.dow, r.r, s.s, COALESCE(ce.o, 0) AS o
  FROM rs r CROSS JOIN cs s
  LEFT JOIN cells ce ON ce.event_type = r.event_type AND ce.dow = s.dow
),
terms AS (
  SELECT SUM(((d.o * t.n - d.r * d.s) * (d.o * t.n - d.r * d.s) * 1000000)
             // (t.n * d.r * d.s)) AS chi2_micro
  FROM dense d
  CROSS JOIN tot t
)
SELECT CAST(t.n AS BIGINT) AS n,
       CAST(te.chi2_micro AS BIGINT) AS chi2_micro,
       sqrt(CAST(te.chi2_micro AS DOUBLE)
            / CAST(1000000 * t.n * (LEAST(t.nr, t.nc) - 1) AS DOUBLE))
         AS cramers_v
FROM terms te CROSS JOIN tot t
"""


@query("cramers_v", _CRAMER_ORACLE)
def cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timestamps import micros

    d38 = "decimal(38,0)"
    c = t(spark, sf_dir, "events").select(
        "event_type", micros(F.col("ts")).alias("us")
    ).select(
        "event_type", F.expr("((us div 86400000000) + 3) % 7").alias("dow")
    )
    cells = (
        c.groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).cast(d38).alias("o"))
        # the 35-row contingency table roots the rs/cs/tot/terms
        # diamond: checkpoint so the events scan happens once
        .localCheckpoint()
    )
    rs = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    cs = cells.groupBy("dow").agg(F.sum("o").alias("s"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("event_type").cast(d38).alias("nr"),
        F.countDistinct("dow").cast(d38).alias("nc"),
    )
    from ..functions.numeric import exact_div

    # exact_div, not Spark `div`: chi2_micro ≤ ~6e6·N would silently
    # wrap `div`'s BIGINT result at N ≈ 1.5e12 rows. The DECIMAL(38)
    # numerator ceiling (~1e9 rows, header) binds first today, but the
    # quotient path shouldn't be the NEXT silent ceiling once cells
    # are chunked by day.
    # densify over the rs × cs marginal spine (≤ nr·nc rows): an EMPTY
    # cell still contributes (r·s)²/(n·r·s) = r·s/n to chi² — summing
    # only occupied cells silently understates V on sparse contingency
    # tables (both engines shared the omission, so oracle parity could
    # not see it; the 2×2 perfect-association fixture pins V = 1.0)
    dense = (
        rs.crossJoin(F.broadcast(cs))
        .join(cells, ["event_type", "dow"], "left")
        .select("event_type", "dow", "r", "s", F.coalesce(F.col("o"), F.lit(0).cast(d38)).alias("o"))
    )
    dev = F.expr("o * n - r * s")
    terms = (
        dense.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                exact_div(dev * dev * F.lit(1000000), F.expr("n * r * s"))
            ).alias("chi2_micro")
        )
    )
    return terms.crossJoin(F.broadcast(tot)).select(
        F.col("n").cast("long").alias("n"),
        F.col("chi2_micro").cast("long").alias("chi2_micro"),
        # try_divide: a single-category table (nr=1 or nc=1) zeroes the
        # denominator — V undefined → NULL both engines (ANSI Spark
        # errors on raw double x/0, DuckDB yields NULL; ORACLE_NOTES)
        F.sqrt(
            F.try_divide(
                F.col("chi2_micro").cast("double"),
                (
                    F.lit(1000000).cast(d38)
                    * F.col("n")
                    * (F.least(F.col("nr"), F.col("nc")) - 1)
                ).cast("double"),
            )
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# churn_features — the feature-store assembly query: one wide
# training-matrix row per user (recency, tenure, frequency, monetary,
# active days, type diversity) plus the churn label the features would
# predict (no activity in the final 7 days). Everything is exact
# integer arithmetic off ONE user-keyed aggregate (multi-distinct via
# Expand — the events_profile shape); the observation end is a 1-row
# broadcast scalar. The user key scales WITH the data — the
# embarrassingly-parallel rollup shape by construction.
# ---------------------------------------------------------------------------

_CHURN_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us,
         epoch_us(ts) // 86400000000 AS day,
         event_type,
         CASE WHEN value IS NOT NULL AND NOT isnan(value)
              THEN CAST(ROUND(value * 100, 0) AS BIGINT) ELSE 0 END AS cents
  FROM events
),
obs AS (SELECT MAX(us) AS endus FROM e),
u AS (
  SELECT user_id,
         MIN(us) AS f, MAX(us) AS l,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(cents) AS BIGINT) AS total_cents,
         CAST(COUNT(DISTINCT day) AS BIGINT) AS active_days,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
  FROM e GROUP BY 1
)
SELECT u.user_id,
       (o.endus - u.l) // 86400000000 AS recency_days,
       (u.l - u.f) // 86400000000 AS tenure_days,
       u.n_events, u.total_cents, u.active_days, u.n_types,
       CASE WHEN o.endus - u.l >= 7 * CAST(86400000000 AS BIGINT)
            THEN 1 ELSE 0 END AS churned
FROM u CROSS JOIN obs o
"""


@query("churn_features", _CHURN_ORACLE)
def churn_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timestamps import micros

    e = t(spark, sf_dir, "events").select(
        "user_id",
        micros(F.col("ts")).alias("us"),
        "event_type",
        # NULL *and NaN* monetize as 0 (a NaN would silently cast to 0
        # on Spark but error DuckDB's BIGINT cast); the row itself
        # still counts — recency/frequency don't need a usable value
        F.when(
            F.col("value").isNotNull() & ~F.isnan("value"),
            F.round(F.col("value") * 100, 0).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("cents"),
    ).withColumn("day", F.expr("us div 86400000000"))
    obs = e.agg(F.max("us").alias("endus"))
    u = e.groupBy("user_id").agg(
        F.min("us").alias("f"),
        F.max("us").alias("l"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("total_cents"),
        F.countDistinct("day").alias("active_days"),
        F.countDistinct("event_type").alias("n_types"),
    )
    return u.crossJoin(F.broadcast(obs)).select(
        "user_id",
        F.expr("(endus - l) div 86400000000").alias("recency_days"),
        F.expr("(l - f) div 86400000000").alias("tenure_days"),
        "n_events",
        "total_cents",
        "active_days",
        "n_types",
        F.when(
            F.col("endus") - F.col("l") >= F.lit(7) * 86400000000, 1
        )
        .otherwise(0)
        .alias("churned"),
    )


# ---------------------------------------------------------------------------
# wilson_proportion_ci — statistical inference at scale: the Wilson
# score 95% interval for each type's high-value-event proportion
# (value > $50). The Wilson interval (not Wald) stays inside [0,1]
# and behaves at small/extreme counts — the standard choice for
# monitoring dashboards. Counts k, n come from one map-side rollup;
# the interval itself is pure scalar arithmetic on (k, n). Cross-
# engine determinism: the formula uses only +,-,*,/ and sqrt — all
# correctly-rounded IEEE-754 ops (unlike ln/exp, whose libm last-ulp
# behavior differs between engines — the same reason the impurity
# queries use Gini, not entropy) — and BOTH sides evaluate the
# IDENTICAL expression tree, so every intermediate double is
# bit-equal.
# ---------------------------------------------------------------------------

_WILSON_EXPR = (
    "(p + 1.9208/nn {sign} 1.96 * sqrt(p*(1.0-p)/nn + 0.9604/(nn*nn)))"
    " / (1.0 + 3.8416/nn)"
)

_WILSON_ORACLE = f"""
WITH c AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE CAST(ROUND(value * 100, 0) AS BIGINT)
                               > 5000) AS BIGINT) AS k
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY 1
),
p AS (
  SELECT event_type, n, k,
         CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
         CAST(n AS DOUBLE) AS nn
  FROM c
)
SELECT event_type, n, k, p AS phat,
       {_WILSON_EXPR.format(sign='-')} AS ci_lo,
       {_WILSON_EXPR.format(sign='+')} AS ci_hi
FROM p
"""


@query("wilson_proportion_ci", _WILSON_ORACLE)
def wilson_proportion_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        t(spark, sf_dir, "events")
        # the grid-quantile NaN contract (operators/quantiles.py): a
        # NaN would cast to 0 on Spark but error DuckDB's BIGINT cast —
        # rows without a usable measurement are out of the analysis
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_if(
                F.expr("CAST(ROUND(value * 100, 0) AS BIGINT) > 5000")
            )
            .cast("long")
            .alias("k"),
        )
        .withColumn("p", F.col("k").cast("double") / F.col("n").cast("double"))
        .withColumn("nn", F.col("n").cast("double"))
    )
    return c.select(
        "event_type",
        "n",
        "k",
        F.col("p").alias("phat"),
        F.expr(_WILSON_EXPR.format(sign="-")).alias("ci_lo"),
        F.expr(_WILSON_EXPR.format(sign="+")).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# timed_funnel — the funnel_conversion shape with the constraint real
# product analytics always adds: each stage must land within ONE HOUR
# of the previous stage (a purchase three weeks after the click is a
# different journey, not a conversion). Same chained conditional
# min-ts plan — three per-user rollups reusing one hash partitioning,
# no window over raw events, no UDF — with the stage gap tested in
# exact integer microseconds on BOTH engines (interval arithmetic is a
# cross-engine trap near DST/precision edges; epoch math is not).
# Semantics: stage anchor = the user's FIRST view; click = first click
# strictly after it but within 1h; purchase = first purchase strictly
# after that click but within 1h of it.
# ---------------------------------------------------------------------------

_TFUNNEL_US = 3_600_000_000

_TFUNNEL_ORACLE = f"""
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1
    AND epoch_us(e.ts) - epoch_us(v.t1) <= {_TFUNNEL_US}
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
    AND epoch_us(e.ts) - epoch_us(c.t2) <= {_TFUNNEL_US}
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_1h,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_1h
"""


@query("timed_funnel", _TFUNNEL_ORACLE)
def timed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", micros(F.col("ts")).alias("us")
    )
    # each stage rollup feeds BOTH the next stage's join and its own
    # count — checkpoint the per-user frames so the events fact is
    # scanned once per stage (3 scans), not once per consumer (6)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"), F.min("us").alias("us1"))
        .localCheckpoint()
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("us") - F.col("us1") <= _TFUNNEL_US)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("us").alias("us2"))
        .localCheckpoint()
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("us") - F.col("us2") <= _TFUNNEL_US)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_1h")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_1h")))
    )


# ---------------------------------------------------------------------------
# session_entry_conversion — "which landing behavior converts": sessions
# rebuilt with the exact user_sessions gap rule (>30 min inactivity),
# each session keyed by its ENTRY event type (first event by ts,
# event_id) and flagged converted if it contains a purchase; rolled up
# per entry type with an exact ppm rate. The session-scoped complement
# to funnel_conversion's user-scoped ordering. Shape: ONE per-user
# window pass (hash-distributed, no global sort) feeds a per-session
# rollup (min_by entry + purchase flag), then a ~types-sized rollup;
# the rate is exact integer ppm, the cosmetic double one division.
# ---------------------------------------------------------------------------

_ENTRY_CONV_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                   OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_no
  FROM gaps
),
ranked AS (
  SELECT user_id, session_no, event_type,
         row_number() OVER (PARTITION BY user_id, session_no
                            ORDER BY ts ASC, event_id ASC) AS rn
  FROM sess
),
per_sess AS (
  SELECT s.user_id, s.session_no, r.event_type AS entry_type,
         MAX(CASE WHEN s.event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM sess s
  JOIN ranked r ON r.user_id = s.user_id AND r.session_no = s.session_no
              AND r.rn = 1
  GROUP BY 1, 2, 3
)
SELECT entry_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(conv) AS BIGINT) AS n_converted,
       CAST((SUM(conv) * 1000000) // COUNT(*) AS BIGINT) AS conv_ppm
FROM per_sess GROUP BY entry_type
"""


@query("session_entry_conversion", _ENTRY_CONV_ORACLE)
def session_entry_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import exact_div

    e = t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap = F.col("us") - F.lag("us").over(w)
    new_sess = (
        F.when(gap > 1_800_000_000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0)
    )
    sess = e.select(
        "user_id",
        "us",
        "event_id",
        "event_type",
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_no"),
    )
    per_sess = sess.groupBy("user_id", "session_no").agg(
        F.min_by("event_type", F.struct("us", "event_id")).alias("entry_type"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    return per_sess.groupBy("entry_type").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("conv").cast("long").alias("n_converted"),
        exact_div(
            F.sum("conv").cast("decimal(38,0)") * F.lit(1000000),
            F.count(F.lit(1)).cast("decimal(38,0)"),
        )
        .cast("long")
        .alias("conv_ppm"),
    )
