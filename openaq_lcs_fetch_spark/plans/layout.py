"""Physical-layout queries: z-order clustering math, mergeable sketches.

These demonstrate the 100 TB layout/sketch layer as driver-checkable
queries: the z-order key itself is deterministic integer arithmetic
(oracle-able bit-for-bit), and the KMV / CMS sketches are built from
md5 — portable across engines, so even the *estimates* hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import h60
from ..storage import sql_zorder, zorder_column
from ..localdf import local_df
from .registry import query, t

# ---------------------------------------------------------------------------
# zorder_locality — the data-skipping argument as a query: events key on
# (user_id, hour-index), z-order the pair, split the z-range into 32
# contiguous buckets (= the files write_zordered would emit) and report
# each bucket's envelope in BOTH dimensions. A time-sorted layout gives
# every file the full user span; the z-order buckets keep both spans
# bounded — that bound is what parquet min/max stats prune on. Shape:
# the z key is codegen bit math; zmin/zmax is a 1-row broadcast; one
# shuffle on the 32-value bucket id.
# ---------------------------------------------------------------------------

_HOUR_US = 3_600_000_000


def _zorder_oracle() -> str:
    z = sql_zorder(["((user_id * 5) & 65535)", "(h & 65535)"], 16)
    return f"""
WITH b AS (
  SELECT user_id,
         (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) // {_HOUR_US} AS h
  FROM events
),
zed AS (SELECT user_id, h, {z} AS z FROM b),
ext AS (SELECT MIN(z) AS zmin, MAX(z) AS zmax FROM zed),
bucketed AS (
  SELECT user_id, h,
         CAST(((z - zmin) * 32) // (zmax - zmin + 1) AS BIGINT) AS bucket
  FROM zed, ext
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(user_id) - MIN(user_id) AS BIGINT) AS user_span,
       CAST(MAX(h) - MIN(h) AS BIGINT) AS hour_span
FROM bucketed GROUP BY bucket
"""


@query("zorder_locality", _zorder_oracle())
def zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timestamps import micros

    e = t(spark, sf_dir, "events").select("user_id", "ts")
    h = (
        (micros(F.col("ts")) - micros(F.lit("2024-01-01").cast("timestamp")))
        / F.lit(_HOUR_US)
    ).cast("long")  # both operands positive → trunc == floor == DuckDB //
    b = e.select("user_id", h.alias("h"))
    # user_id scales ×5 (~150 → ~750) to match the hour index's range —
    # see zorder_column's docstring on balancing dimensions
    z = zorder_column(
        [
            (F.col("user_id") * 5).bitwiseAND(F.lit(65535)),
            F.col("h").bitwiseAND(F.lit(65535)),
        ],
        bits=16,
    )
    zed = b.withColumn("z", z)
    ext = zed.agg(F.min("z").alias("zmin"), F.max("z").alias("zmax"))
    # DIV = exact integral division, mirroring DuckDB's `//` — a double
    # `/` + cast could round across the bucket boundary
    bucketed = zed.crossJoin(F.broadcast(ext)).select(
        "user_id",
        "h",
        F.expr("CAST(((z - zmin) * 32) DIV (zmax - zmin + 1) AS BIGINT)").alias(
            "bucket"
        ),
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("user_id") - F.min("user_id")).alias("user_span"),
        (F.max("h") - F.min("h")).alias("hour_span"),
    )


# ---------------------------------------------------------------------------
# kmv_daily_merge — MERGEABLE distinct sketch: a k-minimum-values sketch
# of distinct users builds PER DAY (the partial), then the 30 partials
# merge into one global sketch — the aggregation-tree shape a 1000-node
# cluster needs (each executor sketches its slice; the driver-side merge
# is k rows per partial, never raw data). md5 hashing makes the sketch —
# and therefore the ESTIMATE — identical across engines, so the oracle
# checks the estimate itself, not just bounds. Output: exact distinct,
# KMV estimate from merged sketch, relative error.
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_SPACE = float(1 << 60)

_KMV_MERGE_ORACLE = f"""
WITH hashed AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':kmv'), 1, 15))::BIGINT AS hv
  FROM events
),
daily AS (
  SELECT day, hv,
         row_number() OVER (PARTITION BY day ORDER BY hv ASC) AS rk
  FROM hashed
),
partials AS (SELECT day, hv FROM daily WHERE rk <= {_KMV_K}),
merged AS (
  SELECT hv, row_number() OVER (ORDER BY hv ASC) AS rk
  FROM (SELECT DISTINCT hv FROM partials)
),
kth AS (SELECT hv AS kth_hv FROM merged WHERE rk = {_KMV_K}),
exact AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users FROM events)
SELECT exact_users,
       ROUND(({_KMV_K} - 1) / (CAST(kth_hv AS DOUBLE) / {_KMV_SPACE!r}), 6)
         AS kmv_estimate,
       ROUND(ABS(({_KMV_K} - 1) / (CAST(kth_hv AS DOUBLE) / {_KMV_SPACE!r})
                 - exact_users) / exact_users, 6) AS rel_err
FROM exact, kth
"""


@query("kmv_daily_merge", _KMV_MERGE_ORACLE)
def kmv_daily_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").select("user_id", "ts")
    hv = h60(F.concat(F.col("user_id").cast("string"), F.lit(":kmv")))
    hashed = e.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), hv.alias("hv")
    ).distinct()
    wd = Window.partitionBy("day").orderBy(F.col("hv").asc())
    partials = hashed.withColumn("rk", F.row_number().over(wd)).filter(
        F.col("rk") <= _KMV_K
    )
    # merge: distinct union of the per-day k-minima, then the global k-th
    # minimum — row_number over a GLOBAL order is fine here because the
    # merged sketch is ≤ k·days rows (sketch-sized, never data-sized);
    # rk == k (not max-of-limit) so "fewer than k hashes" yields an
    # empty result in BOTH engines
    merged = partials.select("hv").distinct()
    wg = Window.orderBy(F.col("hv").asc())
    kth = (
        merged.withColumn("rk", F.row_number().over(wg))
        .filter(F.col("rk") == _KMV_K)
        .select(F.col("hv").alias("kth_hv"))
    )
    exact = e.agg(F.countDistinct("user_id").alias("exact_users"))
    est = (_KMV_K - 1) / (F.col("kth_hv").cast("double") / F.lit(_KMV_SPACE))
    return (
        exact.crossJoin(F.broadcast(kth))
        .select(
            "exact_users",
            F.round(est, 6).alias("kmv_estimate"),
            F.round(
                F.abs(est - F.col("exact_users")) / F.col("exact_users"), 6
            ).alias("rel_err"),
        )
    )


# ---------------------------------------------------------------------------
# cms_user_counts — count-min sketch (d=4 rows × w=256 buckets) over the
# event stream, evaluated against exact counts for the top-10 users: the
# point-query estimate min_d(counts[d][h_d(key)]) always OVERcounts
# (collisions only add), and with md5-derived bucket hashes the whole
# table — and every estimate — is engine-portable. Shape: the sketch is
# ONE groupBy over (d, bucket) (4·N map-side rows → d·w=1024 cells);
# the probe side broadcasts 10 keys against the 1024-cell table.
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 256


def _cms_oracle() -> str:
    return f"""
WITH fanned AS (
  SELECT user_id, d.d,
         ('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':' ||
                             CAST(user_id AS VARCHAR) || ':cms'), 1, 15))::BIGINT
           % {_CMS_W} AS bucket
  FROM events, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS d) d
),
cells AS (
  SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM fanned GROUP BY d, bucket
),
topu AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM events GROUP BY user_id
  ORDER BY exact_n DESC, user_id ASC LIMIT 10
),
probes AS (
  SELECT t.user_id, t.exact_n, d.d,
         ('0x' || substr(md5(CAST(d.d AS VARCHAR) || ':' ||
                             CAST(t.user_id AS VARCHAR) || ':cms'), 1, 15))::BIGINT
           % {_CMS_W} AS bucket
  FROM topu t, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS d) d
)
SELECT p.user_id, p.exact_n,
       CAST(MIN(c.cnt) AS BIGINT) AS cms_estimate,
       CAST(MIN(c.cnt) - p.exact_n AS BIGINT) AS overcount
FROM probes p JOIN cells c ON c.d = p.d AND c.bucket = p.bucket
GROUP BY p.user_id, p.exact_n
"""


def _cms_bucket(d_col, key_col):
    raw = h60(
        F.concat(
            d_col.cast("string"), F.lit(":"), key_col.cast("string"), F.lit(":cms")
        )
    )
    return raw % _CMS_W


@query("cms_user_counts", _cms_oracle())
def cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("user_id")
    fanned = e.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("d"),
    ).select("d", _cms_bucket(F.col("d"), F.col("user_id")).alias("bucket"))
    cells = fanned.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    topu = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("user_id").asc())
        .limit(10)
    )
    probes = topu.select(
        "user_id",
        "exact_n",
        F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("d"),
    ).select(
        "user_id",
        "exact_n",
        "d",
        _cms_bucket(F.col("d"), F.col("user_id")).alias("bucket"),
    )
    return (
        F.broadcast(probes)
        .join(cells, ["d", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(
            F.min("cnt").alias("cms_estimate"),
            (F.min("cnt") - F.col("exact_n")).alias("overcount"),
        )
    )


# ---------------------------------------------------------------------------
# bloom_membership — Bloom filter as a distributed aggregate (the third
# classic sketch next to KMV and CMS): m=4096 bits, k=5 md5-derived
# probe positions per key. Members = distinct purchasing users; probes =
# every distinct user. A user is estimated-member iff ALL k positions
# are set — false negatives are impossible by construction (the n_fn
# row the oracle checks is structurally zero), false positives are the
# sketch's documented trade. Shape: the bit table is a DISTINCT over at
# most m integers (≤4096 rows) → broadcast to the probe side; probe =
# k-way fan-out + broadcast left join + per-user AND — the exact plan a
# 100 TB pre-join membership prune uses (Spark's own runtime bloom
# pruning is this, JVM-side; here the sketch itself is portable so
# DuckDB reproduces every bit).
# ---------------------------------------------------------------------------

_BLOOM_M = 4096
_BLOOM_K = 5


def _bloom_pos(j, user) -> "F.Column":
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", j.cast("string"), user.cast("string"), F.lit("bloom")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _BLOOM_M
    )


def _bloom_oracle() -> str:
    pos = (
        "('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || "
        "CAST(user_id AS VARCHAR) || ':bloom'), 1, 15))::BIGINT % {m}"
    ).format(m=_BLOOM_M)
    return f"""
WITH members AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
),
ks AS (SELECT unnest(generate_series(0, {_BLOOM_K - 1})) AS j),
bits AS (SELECT DISTINCT {pos} AS pos FROM members, ks),
probes AS (SELECT DISTINCT user_id FROM events),
probe_pos AS (SELECT p.user_id, {pos} AS pos FROM probes p, ks),
probed AS (
  SELECT pp.user_id,
         MIN(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) AS all_hit
  FROM probe_pos pp LEFT JOIN bits b ON b.pos = pp.pos
  GROUP BY pp.user_id
)
SELECT (m.user_id IS NOT NULL) AS is_member,
       (probed.all_hit = 1) AS est_member,
       CAST(COUNT(*) AS BIGINT) AS n
FROM probed LEFT JOIN members m ON probed.user_id = m.user_id
GROUP BY 1, 2
"""


@query("bloom_membership", _bloom_oracle())
def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("user_id", "event_type")
    members = (
        e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    ks = F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("j")
    bits = (
        members.select("user_id", ks)
        .select(_bloom_pos(F.col("j"), F.col("user_id")).alias("pos"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    probes = e.select("user_id").distinct()
    probed = (
        probes.select("user_id", ks)
        .withColumn("pos", _bloom_pos(F.col("j"), F.col("user_id")))
        .join(F.broadcast(bits), "pos", "left")
        .groupBy("user_id")
        .agg(F.min(F.coalesce(F.col("hit"), F.lit(0))).alias("all_hit"))
    )
    flagged = probed.join(
        members.withColumn("is_m", F.lit(True)), "user_id", "left"
    )
    return flagged.groupBy(
        F.coalesce(F.col("is_m"), F.lit(False)).alias("is_member"),
        (F.col("all_hit") == 1).alias("est_member"),
    ).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# hll_distinct_events — a REAL HyperLogLog built from md5-portable
# primitives, so (unlike engine-native approx_count_distinct, whose
# estimates are engine-specific — see approx_event_stats' bound-flag
# contract) the ESTIMATE ITSELF hash-matches the oracle bit-for-bit:
# m=512 registers (sized so the oracle SF's per-type event
# cardinality ~2000 clears the 2.5m=1280 small-range switch),
# register = low 9 bits of h60, rank = leading-zero
# count of the remaining 51-bit payload via length(bin(w)) — identical
# integer semantics on both engines (w=0 maps to rank PAYLOAD-1 by the shared
# bin('0') convention; p=2⁻⁵⁰, consistent either way). The harmonic
# mean is kept EXACT: Σ2^(62−M_j) accumulates integer powers of two in
# DECIMAL(38,0)/HUGEINT (never a float pow), and the estimate is the
# fixed literal alpha·m²·2⁶² over that sum — one identical double
# expression both sides. No small-range correction (it needs ln();
# the sketched key is event_id, whose per-type cardinality sits far
# above the 2.5m switch at the oracle SF. user_id would NOT clear it —
# its measured per-type cardinality at sf0.01 is 150 ≪ 2.5·m, the
# regime where uncorrected HLL overestimates ~5× — which is WHY this
# sketch counts events, and the within_3sigma flag is the regime
# contract: it goes honestly false below the switch). The error-bound
# flag against the exact count rides along like approx_event_stats';
# its threshold is DERIVED from m (_HLL_3SIGMA = 3·1.04/√m: at m=512,
# rsd ≈ 4.6%, 3σ ≈ 13.8%, rounded to the 0.14 both engines compare
# against), never a free-standing literal. Shape: one map-side
# (type, register) MAX rollup — registers are fixed-memory and
# mergeable, which is the whole point at 100 TB. NOTE the exact
# countDistinct branch exists ONLY to compute the within_3sigma audit
# flag; at 100 TB that branch dominates (a full distinct shuffle vs
# the fixed 512-register rollup). The production form is
# hll_distinct_fast below — the register rollup alone.
# ---------------------------------------------------------------------------

_HLL_M = 512
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)  # 0.71978...
_HLL_PAYLOAD = 60 - (_HLL_M.bit_length() - 1)  # 51 payload bits at m=512
# 3σ relative-error bound, derived from m (rsd = 1.04/√m; ≈ 0.14 at
# m=512), rounded so the literal baked into the oracle SQL string and
# the Spark expression is identical and short.
_HLL_3SIGMA = round(3 * 1.04 / _HLL_M**0.5, 2)

_HLL_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM events
),
rho AS (
  SELECT event_type, hv % {_HLL_M} AS reg,
         {_HLL_PAYLOAD + 1} - length(bin(hv // {_HLL_M})) AS rank
  FROM h
),
regs AS (
  SELECT event_type, reg, MAX(rank) AS m FROM rho GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM events),
spine AS (
  SELECT t.event_type, g.range AS reg
  FROM types t CROSS JOIN range({_HLL_M}) g
),
filled AS (
  SELECT s.event_type, COALESCE(r.m, 0) AS m
  FROM spine s LEFT JOIN regs r
    ON r.event_type = s.event_type AND r.reg = s.reg
),
est AS (
  SELECT event_type,
         SUM(CAST(1::BIGINT << (62 - m) AS HUGEINT)) AS s2
  FROM filled GROUP BY 1
),
exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_events
  FROM events GROUP BY 1
)
SELECT e.event_type, x.exact_events,
       CAST({_HLL_ALPHA!r} AS DOUBLE) * CAST({_HLL_M} AS DOUBLE)
         * CAST({_HLL_M} AS DOUBLE) * CAST(4611686018427387904 AS DOUBLE)
         / CAST(e.s2 AS DOUBLE) AS hll_events,
       ABS(CAST({_HLL_ALPHA!r} AS DOUBLE) * CAST({_HLL_M} AS DOUBLE)
           * CAST({_HLL_M} AS DOUBLE) * CAST(4611686018427387904 AS DOUBLE)
           / CAST(e.s2 AS DOUBLE) - x.exact_events)
         <= {_HLL_3SIGMA!r} * x.exact_events AS within_3sigma
FROM est e JOIN exact x USING (event_type)
"""


def _hll_s2(e: DataFrame, spark: SparkSession) -> DataFrame:
    """(event_type, s2) harmonic-mean denominators from the raw
    (event_type, event_id) frame — the shared sketch pipeline of both
    HLL queries. No distinct anywhere: register = MAX(rank) is
    idempotent under duplicate ids, so the ONLY shuffle is the
    map-side-combinable (type, register) MAX rollup (≤ 5·512 rows)."""
    h = e.select(
        "event_type", h60(F.col("event_id").cast("string")).alias("hv")
    )
    rho = h.select(
        "event_type",
        (F.col("hv") % _HLL_M).alias("reg"),
        (F.lit(_HLL_PAYLOAD + 1) - F.length(F.bin(F.expr(f"hv div {_HLL_M}")))).alias("rank"),
    )
    # register rollup is the diamond root (the spine AND the fill join
    # both read it): localCheckpoint the ≤ types·512-row frame so the
    # corpus is scanned exactly once (without it the plan re-scanned
    # events per consumer — measured round 7)
    regs = (
        rho.groupBy("event_type", "reg")
        .agg(F.max("rank").alias("m"))
        .localCheckpoint()
    )
    # the type spine derives from the register ROLLUP, not the events
    # table — deriving it from `e` re-scanned the corpus a third time
    # for a 5-row distinct (regs covers every type present in e)
    types = regs.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(spark.range(_HLL_M).select(F.col("id").alias("reg"))))
    filled = spine.join(regs, ["event_type", "reg"], "left").select(
        "event_type", F.coalesce(F.col("m"), F.lit(0)).alias("m")
    )
    return filled.groupBy("event_type").agg(
        F.sum(
            F.expr("CAST(shiftleft(1L, CAST(62 - m AS INT)) AS DECIMAL(38,0))")
        ).alias("s2")
    )


def _hll_est_col():
    # built lazily: Column construction needs an active SparkContext
    return (
        F.lit(_HLL_ALPHA)
        * F.lit(float(_HLL_M))
        * F.lit(float(_HLL_M))
        * F.lit(4611686018427387904.0)
        / F.col("s2").cast("double")
    )


@query("hll_distinct_events", _HLL_ORACLE)
def hll_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("event_type", "event_id")
    est = _hll_s2(e, spark)
    exact = e.groupBy("event_type").agg(
        F.countDistinct("event_id").alias("exact_events")
    )
    hll = _hll_est_col()
    return est.join(exact, "event_type").select(
        "event_type",
        "exact_events",
        hll.alias("hll_events"),
        (
            F.abs(hll - F.col("exact_events"))
            <= F.lit(_HLL_3SIGMA) * F.col("exact_events")
        ).alias("within_3sigma"),
    )


# ---------------------------------------------------------------------------
# hll_distinct_fast — the PRODUCTION form of hll_distinct_events: the
# register rollup alone, no exact countDistinct audit branch. This is
# the query you actually run at 100 TB — one corpus scan, one
# map-side-combinable (type, register) MAX rollup (fixed 512-register
# state per type, mergeable across any partitioning), and a
# register-table-sized estimate; the exact-distinct shuffle that
# dominates the audit twin simply does not exist here. The estimate is
# bit-portable for the same reason as the twin (md5-derived h60,
# exact integer Σ2^(62−M_j), one identical double division), so the
# oracle hash-checks the ESTIMATE itself, not a tolerance.
# Reference scope: the fetcher dedupes/counts by synthetic ingest id
# (fetcher/lib/measurement.js) — this is that audit at sketch cost.
# ---------------------------------------------------------------------------

_HLL_FAST_ORACLE = f"""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM events
),
rho AS (
  SELECT event_type, hv % {_HLL_M} AS reg,
         {_HLL_PAYLOAD + 1} - length(bin(hv // {_HLL_M})) AS rank
  FROM h
),
regs AS (
  SELECT event_type, reg, MAX(rank) AS m FROM rho GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM regs),
spine AS (
  SELECT t.event_type, g.range AS reg
  FROM types t CROSS JOIN range({_HLL_M}) g
),
filled AS (
  SELECT s.event_type, COALESCE(r.m, 0) AS m
  FROM spine s LEFT JOIN regs r
    ON r.event_type = s.event_type AND r.reg = s.reg
),
est AS (
  SELECT event_type,
         SUM(CAST(1::BIGINT << (62 - m) AS HUGEINT)) AS s2
  FROM filled GROUP BY 1
)
SELECT event_type,
       CAST({_HLL_ALPHA!r} AS DOUBLE) * CAST({_HLL_M} AS DOUBLE)
         * CAST({_HLL_M} AS DOUBLE) * CAST(4611686018427387904 AS DOUBLE)
         / CAST(s2 AS DOUBLE) AS hll_events
FROM est
"""


@query("hll_distinct_fast", _HLL_FAST_ORACLE)
def hll_distinct_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("event_type", "event_id")
    return _hll_s2(e, spark).select(
        "event_type", _hll_est_col().alias("hll_events")
    )


# ---------------------------------------------------------------------------
# skew_audit — the shuffle-planning audit this engine's own join
# strategy notes keep appealing to, as a first-class query: profile a
# join key's per-key row distribution (orders.o_custkey — the key the
# customer-side joins shuffle on) and emit the numbers a planner needs
# to pick a strategy: top-1 key share (is there a hub key?), exact
# p50/p90/p99 of rows-per-key (how heavy is the tail?), and the salt
# factor that would flatten the hottest key to the average
# (ceil(max/avg) — the `repartition`-salt multiplier). Scale shape:
# one map-side-combined (key, cnt) rollup, then everything runs on the
# COUNT-OF-COUNTS table: the set of distinct per-key counts has at
# most O(√N) rows (k distinct counts need ≥ 1+2+…+k = k(k+1)/2 source
# rows), so the cumulative window that extracts exact percentiles is
# bounded by construction — never a window over keys, let alone rows.
# All stats are exact integers; the ppm/salt numerators (max_cnt·1e6,
# max_cnt·n_keys) run in DECIMAL(38,0)/HUGEINT via exact_div — they
# cross 2^63 near 1e13 rows, where Spark `div` would wrap silently
# (the weekday_anova trap); the quotients themselves stay small.
# ---------------------------------------------------------------------------

_SKEW_ORACLE = """
WITH per_key AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1
),
coc AS (
  SELECT cnt, CAST(COUNT(*) AS BIGINT) AS n_keys FROM per_key GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(cnt * n_keys) AS BIGINT) AS n_rows,
         CAST(SUM(n_keys) AS BIGINT) AS n_keys,
         CAST(MAX(cnt) AS BIGINT) AS max_cnt
  FROM coc
),
cum AS (
  SELECT cnt, SUM(n_keys) OVER (ORDER BY cnt) AS cum_keys FROM coc
),
pct AS (
  SELECT
    (SELECT MIN(cnt) FROM cum, tot WHERE 2 * cum_keys >= tot.n_keys) AS p50,
    (SELECT MIN(cnt) FROM cum, tot WHERE 10 * cum_keys >= 9 * tot.n_keys) AS p90,
    (SELECT MIN(cnt) FROM cum, tot WHERE 100 * cum_keys >= 99 * tot.n_keys) AS p99
)
SELECT t.n_rows, t.n_keys, t.max_cnt,
       CAST((CAST(t.max_cnt AS HUGEINT) * 1000000) // t.n_rows AS BIGINT)
         AS top1_share_ppm,
       p.p50 AS p50_rows_per_key, p.p90 AS p90_rows_per_key,
       p.p99 AS p99_rows_per_key,
       CAST((CAST(t.max_cnt AS HUGEINT) * t.n_keys + t.n_rows - 1)
            // t.n_rows AS BIGINT) AS salt_factor
FROM tot t CROSS JOIN pct p
"""


@query("skew_audit", _SKEW_ORACLE)
def skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    per_key = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    coc = per_key.groupBy("cnt").agg(F.count(F.lit(1)).alias("n_keys"))
    # count-of-counts is O(√N) rows — the single-partition cumulative
    # window below is bounded by construction (header), and the frame
    # roots a three-branch diamond (tot / percentiles / output): one
    # rollup-sized checkpoint keeps the orders scan single-pass
    coc = coc.localCheckpoint()
    tot = coc.agg(
        F.sum(F.col("cnt") * F.col("n_keys")).alias("n_rows"),
        F.sum("n_keys").alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    cum = coc.withColumn(
        "cum_keys", F.sum("n_keys").over(Window.orderBy("cnt"))
    )
    c = cum.crossJoin(
        F.broadcast(tot.select(F.col("n_keys").alias("tot_keys")))
    )
    pct = c.agg(
        F.min(F.when(2 * F.col("cum_keys") >= F.col("tot_keys"), F.col("cnt"))).alias("p50"),
        F.min(F.when(10 * F.col("cum_keys") >= 9 * F.col("tot_keys"), F.col("cnt"))).alias("p90"),
        F.min(F.when(100 * F.col("cum_keys") >= 99 * F.col("tot_keys"), F.col("cnt"))).alias("p99"),
    )
    from ..functions.numeric import exact_div

    # numerators in DECIMAL(38,0)/HUGEINT: max_cnt·1e6 crosses 2^63 at
    # ~9e12 rows for the hub key, and max_cnt·n_keys far earlier —
    # never Spark `div` (silent BIGINT quotient wrap); the ppm/salt
    # quotients themselves are small
    return tot.crossJoin(F.broadcast(pct)).select(
        "n_rows",
        "n_keys",
        "max_cnt",
        exact_div(F.col("max_cnt") * F.lit(1000000), F.col("n_rows"))
        .cast("long")
        .alias("top1_share_ppm"),
        F.col("p50").alias("p50_rows_per_key"),
        F.col("p90").alias("p90_rows_per_key"),
        F.col("p99").alias("p99_rows_per_key"),
        exact_div(
            F.col("max_cnt").cast("decimal(38,0)") * F.col("n_keys")
            + F.col("n_rows")
            - 1,
            F.col("n_rows"),
        )
        .cast("long")
        .alias("salt_factor"),
    )


# ---------------------------------------------------------------------------
# compaction_bins — the small-files compaction planner (the OPTIMIZE /
# bin-packing primitive every lakehouse table needs): treat each event
# day as one "file" (its row count = file size), pack days IN TIME
# ORDER into bins of target size ceil(total/8), and emit per-bin what
# the rewrite job needs — file count, row count, day envelope, and the
# fill ratio in ppm. Sequential (not first-fit-decreasing) packing is
# deliberate: it preserves time locality, so compacted files keep
# their min/max-ts pruning power (the zorder_locality concern, as an
# actionable plan). Scale shape: one map-side-combined (day, count)
# rollup, then ALL planning runs on the day-spine — the cumulative
# window is calendar-bounded by construction (days, never rows), the
# target is a broadcast scalar, and the rollup is checkpointed because
# it roots a two-branch diamond (total + cumulative packing). All
# arithmetic is exact integers (truncating div on non-negative values
# — identical in both engines).
# ---------------------------------------------------------------------------

_COMPACT_BINS = 8

_COMPACT_ORACLE = f"""
WITH per_day AS (
  SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
tgt AS (
  SELECT CAST((SUM(n) + {_COMPACT_BINS - 1}) // {_COMPACT_BINS} AS BIGINT)
    AS target
  FROM per_day
),
cum AS (
  SELECT d, n, CAST(SUM(n) OVER (ORDER BY d) - n AS BIGINT) AS cum0
  FROM per_day
),
binned AS (
  SELECT d, n, CAST(c.cum0 // t.target AS BIGINT) AS bin_id
  FROM cum c CROSS JOIN tgt t
)
SELECT b.bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(b.n) AS BIGINT) AS n_rows,
       MIN(b.d) AS first_day,
       MAX(b.d) AS last_day,
       CAST((SUM(CAST(b.n AS HUGEINT)) * 1000000) // t.target AS BIGINT)
         AS fill_ppm
FROM binned b CROSS JOIN tgt t
GROUP BY b.bin_id, t.target
"""


@query("compaction_bins", _COMPACT_ORACLE)
def compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    per_day = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # day spine roots the diamond (target scalar + cumulative packing):
    # checkpoint the calendar-sized frame so events is scanned once
    per_day = per_day.localCheckpoint()
    tgt = per_day.agg(
        F.expr(f"(sum(n) + {_COMPACT_BINS - 1}) div {_COMPACT_BINS}").alias(
            "target"
        )
    )
    cum = per_day.withColumn(
        "cum0", F.sum("n").over(Window.orderBy("d")) - F.col("n")
    )
    binned = cum.crossJoin(F.broadcast(tgt)).select(
        "d", "n", "target", F.expr("cum0 div target").alias("bin_id")
    )
    from ..functions.numeric import exact_div

    # fill numerator in DECIMAL(38,0)/HUGEINT: Σn·1e6 crosses 2^63 at
    # ~9e12 rows per bin — never Spark `div`, whose BIGINT quotient
    # wraps silently (the weekday_anova trap); the ppm quotient itself
    # is tiny
    return binned.groupBy("bin_id", "target").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n").alias("n_rows"),
        F.min("d").alias("first_day"),
        F.max("d").alias("last_day"),
        exact_div(F.sum("n") * F.lit(1000000), F.first("target"))
        .cast("long")
        .alias("fill_ppm"),
    ).drop("target")


# ---------------------------------------------------------------------------
# histogram_selectivity_audit — the CBO's own math as a driver-checkable
# query: build the 20-bucket equi-width histogram on order price (the
# statistic ANALYZE TABLE collects), estimate the selectivity of five
# range predicates by uniform-within-bucket interpolation (exactly the
# Catalyst/CBO model), and score the estimator against the true counts.
# This is the audit a 100 TB deployment runs before trusting stats-based
# join ordering on a new table: err_ppm tells you whether the histogram
# resolution survives your predicate shapes. All boundary math is
# integer-exact: bucket b of width-W domain covers offsets
# [ceil(bW/20), ceil((b+1)W/20)-1] (the range_bucket inverse), the
# per-bucket covered fraction accumulates in micro-rows via exact_div
# (DECIMAL(38) — counts*span*1e6 crosses 2^63 long before 100 TB), and
# the thresholds derive from the data's own [lo, hi] envelope — no
# wall-clock, no floats until nothing is left to diverge. Shape: TWO
# fact scans total (bounds, then one map-side-combined pass producing
# the histogram AND the five exact predicate counts as conditional
# sums); everything downstream runs on 20-row/5-row broadcast frames.
# ---------------------------------------------------------------------------

_HSEL_B = 20
_HSEL_QS = (25, 50, 75, 90, 99)


def _hsel_oracle() -> str:
    qs = ", ".join(str(q) for q in _HSEL_QS)
    return f"""
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS x FROM orders
),
par AS (
  SELECT MIN(x) AS lo, MAX(x) - MIN(x) + 1 AS w, COUNT(*) AS n FROM c
),
hist AS (
  SELECT LEAST({_HSEL_B - 1}, ((x - lo) * {_HSEL_B}) // w) AS bucket,
         CAST(COUNT(*) AS HUGEINT) AS cnt
  FROM c, par GROUP BY 1
),
qs AS (SELECT unnest([{qs}]) AS pct),
bb AS (
  SELECT h.bucket, h.cnt, q.pct,
         (p.w * q.pct) // 100 AS off,
         (h.bucket * p.w + {_HSEL_B - 1}) // {_HSEL_B} AS lob,
         CASE WHEN h.bucket = {_HSEL_B - 1} THEN p.w - 1
              ELSE ((h.bucket + 1) * p.w + {_HSEL_B - 1}) // {_HSEL_B} - 1
         END AS upb
  FROM hist h, par p, qs q
),
est AS (
  SELECT pct,
         SUM((cnt * GREATEST(0, upb - GREATEST(lob, off) + 1) * 1000000)
             // (upb - lob + 1)) AS est_micro
  FROM bb GROUP BY pct
),
act AS (
  SELECT q.pct,
         CAST(SUM(CASE WHEN c.x - p.lo >= (p.w * q.pct) // 100
                       THEN 1 ELSE 0 END) AS BIGINT) AS actual_rows
  FROM c, par p, qs q GROUP BY 1
)
SELECT e.pct,
       CAST(p.lo + (p.w * e.pct) // 100 AS BIGINT) AS threshold_cents,
       a.actual_rows,
       CAST(e.est_micro // 1000000 AS BIGINT) AS est_rows,
       CAST(abs(e.est_micro - a.actual_rows * CAST(1000000 AS HUGEINT)) // p.n
            AS BIGINT) AS err_ppm
FROM est e JOIN act a ON a.pct = e.pct CROSS JOIN par p
"""


@query("histogram_selectivity_audit", _hsel_oracle())
def histogram_selectivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import exact_div
    from ..operators.quantiles import range_bucket

    d38 = "decimal(38,0)"
    c = t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("x")
    )
    # 1-row bounds frame feeds the fact pass AND two downstream
    # broadcasts — checkpoint so the bounds scan runs once
    par = c.agg(
        F.min("x").alias("lo"),
        (F.max("x") - F.min("x") + 1).alias("w"),
        F.count(F.lit(1)).alias("n"),
    ).localCheckpoint()
    qs = local_df(spark, [(q,) for q in _HSEL_QS], "pct int")
    # ONE combined fact pass: bucket counts for the histogram plus the
    # five exact predicate counts as conditional sums (no second scan
    # per predicate)
    e = c.crossJoin(F.broadcast(par)).withColumn(
        "bucket", range_bucket("x", "lo", "lo + w - 1", _HSEL_B)
    )
    acts = [
        F.sum(
            F.when(F.col("x") - F.col("lo") >= F.expr(f"(w * {q}) div 100"), 1)
            .otherwise(0)
        ).alias(f"act_{q}")
        for q in _HSEL_QS
    ]
    # the 20-row histogram roots a two-branch diamond (actuals melt +
    # interpolation) — checkpoint so the fact pass runs ONCE, keeping
    # the two-scans-total claim true in the physical plan
    hist = e.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt"), *acts
    ).localCheckpoint()
    # melt the per-bucket conditional sums into (pct, actual_rows)
    act_stack = ", ".join(f"{q}, act_{q}" for q in _HSEL_QS)
    act = (
        hist.select(
            F.expr(f"stack({len(_HSEL_QS)}, {act_stack}) as (pct, a)")
        )
        .groupBy("pct")
        .agg(F.sum("a").cast("long").alias("actual_rows"))
    )
    bb = (
        hist.select("bucket", F.col("cnt").cast(d38).alias("cnt"))
        .crossJoin(F.broadcast(par))
        .crossJoin(F.broadcast(qs))
        .select(
            "pct",
            "n",
            "lo",
            "w",
            F.expr(f"(w * pct) div 100").alias("off"),
            F.expr(f"(bucket * w + {_HSEL_B - 1}) div {_HSEL_B}").alias("lob"),
            F.when(
                F.col("bucket") == _HSEL_B - 1, F.col("w") - 1
            ).otherwise(
                F.expr(f"((bucket + 1) * w + {_HSEL_B - 1}) div {_HSEL_B} - 1")
            ).alias("upb"),
            "cnt",
        )
    )
    est = (
        bb.withColumn(
            "covered",
            F.greatest(
                F.lit(0), F.col("upb") - F.greatest(F.col("lob"), F.col("off")) + 1
            ),
        )
        .withColumn(
            "est_part",
            exact_div(
                F.col("cnt") * F.col("covered").cast(d38) * F.lit(1000000),
                (F.col("upb") - F.col("lob") + 1).cast(d38),
            ),
        )
        .groupBy("pct")
        .agg(
            F.sum("est_part").alias("est_micro"),
            F.first("lo").alias("lo"),
            F.first("w").alias("w"),
            F.first("n").alias("n"),
        )
    )
    return est.join(act, "pct").select(
        "pct",
        (F.col("lo") + F.expr(f"(w * pct) div 100")).cast("long").alias(
            "threshold_cents"
        ),
        "actual_rows",
        exact_div(F.col("est_micro"), F.lit(1000000).cast(d38))
        .cast("long")
        .alias("est_rows"),
        exact_div(
            F.abs(
                F.col("est_micro")
                - F.col("actual_rows").cast(d38) * F.lit(1000000)
            ),
            F.col("n").cast(d38),
        )
        .cast("long")
        .alias("err_ppm"),
    )


# ---------------------------------------------------------------------------
# encoding_cost_audit — the sort-order-vs-compression question every
# columnar layout decision hinges on, as an exact query: under the
# write order (event_type, ts, event_id), how many RLE runs and how
# many dictionary entries does each column need? Runs are what
# run-length encoding pays for, ceil(log2(NDV)) is the dict index
# width — together they decide whether re-sorting before write is
# worth it (the compact_by_time / zorder_locality companion from the
# encoding side). Exactness: a "run boundary" is a null-safe
# inequality against the previous row (IS DISTINCT FROM ↔ ~(<=>)),
# value-cents NaN-guarded to NULL on both engines; the dict width is
# length(bin(NDV-1)) — integer bit math, no float log2. Scale shape:
# the GLOBAL row order never materializes on one executor — changes
# are counted inside each event_type partition (window partitioned by
# the sort order's leading column), and the cross-partition seams are
# reconstructed from a per-type first/last rollup (#types rows) — the
# same decomposition an actual distributed writer uses, one shuffle +
# one tiny frame. The oracle runs the naive single global window —
# same answer, only affordable because DuckDB's input is sf-small.
# ---------------------------------------------------------------------------

_ENC_ORACLE = """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS us, event_id, user_id,
         CASE WHEN isnan(value) THEN NULL
              ELSE CAST(ROUND(value * 100, 0) AS BIGINT) END AS cents
  FROM events
),
lagd AS (
  SELECT event_type, user_id, cents,
         lag(event_type) OVER w AS p_type,
         lag(user_id) OVER w AS p_user,
         lag(cents) OVER w AS p_cents,
         row_number() OVER w AS rn
  FROM e WINDOW w AS (ORDER BY event_type NULLS LAST, us, event_id)
),
runs AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN rn > 1 AND event_type IS DISTINCT FROM p_type
             THEN 1 ELSE 0 END) + 1 AS BIGINT) AS type_runs,
    CAST(SUM(CASE WHEN rn > 1 AND user_id IS DISTINCT FROM p_user
             THEN 1 ELSE 0 END) + 1 AS BIGINT) AS user_runs,
    CAST(SUM(CASE WHEN rn > 1 AND cents IS DISTINCT FROM p_cents
             THEN 1 ELSE 0 END) + 1 AS BIGINT) AS cents_runs
  FROM lagd
),
ndv AS (
  SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS type_ndv,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS user_ndv,
         CAST(COUNT(DISTINCT cents) AS BIGINT) AS cents_ndv
  FROM e
)
SELECT col AS column_name, n AS n_rows, n_runs, n_distinct,
       CAST((n_runs * 1000000) // n AS BIGINT) AS runs_ppm,
       CAST(length(bin(GREATEST(n_distinct - 1, 0))) AS BIGINT)
         AS dict_index_bits
FROM (
  SELECT r.n, u.col, u.n_runs, u.n_distinct
  FROM runs r, ndv d,
       LATERAL (
         SELECT * FROM (VALUES
           ('event_type', r.type_runs, d.type_ndv),
           ('user_id',    r.user_runs, d.user_ndv),
           ('value_cents', r.cents_runs, d.cents_ndv)
         ) t(col, n_runs, n_distinct)
       ) u
)
"""


@query("encoding_cost_audit", _ENC_ORACLE)
def encoding_cost_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.numeric import exact_div
    from ..functions.timestamps import micros

    e = t(spark, sf_dir, "events").select(
        "event_type",
        micros(F.col("ts")).alias("us"),
        "event_id",
        "user_id",
        F.when(F.isnan("value"), F.lit(None)).otherwise(
            F.round(F.col("value") * 100, 0).cast("long")
        ).alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    lagd = e.select(
        "event_type",
        "user_id",
        "cents",
        F.lag("user_id").over(w).alias("p_user"),
        F.lag("cents").over(w).alias("p_cents"),
        F.row_number().over(w).alias("rn"),
    )
    # within-partition run boundaries (one shuffle, the sort order's
    # leading column is the partition key)
    within = lagd.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when((F.col("rn") > 1) & ~(F.col("user_id").eqNullSafe(F.col("p_user"))), 1)
            .otherwise(0)
        ).alias("user_chg"),
        F.sum(
            F.when((F.col("rn") > 1) & ~(F.col("cents").eqNullSafe(F.col("p_cents"))), 1)
            .otherwise(0)
        ).alias("cents_chg"),
    )
    # cross-partition seams: per-type first/last values (#types rows),
    # stitched in type order — the distributed writer's merge step
    per_type = e.groupBy("event_type").agg(
        F.min_by("user_id", F.struct("us", "event_id")).alias("first_user"),
        F.max_by("user_id", F.struct("us", "event_id")).alias("last_user"),
        F.min_by("cents", F.struct("us", "event_id")).alias("first_cents"),
        F.max_by("cents", F.struct("us", "event_id")).alias("last_cents"),
    )
    # explicit NULLS LAST: Spark defaults nulls-first, DuckDB nulls-
    # last — a NULL event_type would otherwise stitch the seam chain
    # in a different type order per engine (latent; pinned explicit)
    tw = Window.orderBy(F.col("event_type").asc_nulls_last())
    seams = per_type.select(
        "event_type",
        "first_user",
        "first_cents",
        F.lag("last_user").over(tw).alias("prev_user"),
        F.lag("last_cents").over(tw).alias("prev_cents"),
        F.row_number().over(tw).alias("trn"),
    ).agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum(
            F.when(
                (F.col("trn") > 1)
                & ~(F.col("first_user").eqNullSafe(F.col("prev_user"))),
                1,
            ).otherwise(0)
        ).alias("user_seam"),
        F.sum(
            F.when(
                (F.col("trn") > 1)
                & ~(F.col("first_cents").eqNullSafe(F.col("prev_cents"))),
                1,
            ).otherwise(0)
        ).alias("cents_seam"),
    )
    ndv = e.agg(
        F.countDistinct("event_type").alias("type_ndv"),
        F.countDistinct("user_id").alias("user_ndv"),
        F.countDistinct("cents").alias("cents_ndv"),
    )
    combined = within.crossJoin(F.broadcast(seams)).crossJoin(F.broadcast(ndv))
    melted = combined.select(
        F.expr(
            "stack(3,"
            " 'event_type', n_types, type_ndv,"
            " 'user_id', user_chg + user_seam + 1, user_ndv,"
            " 'value_cents', cents_chg + cents_seam + 1, cents_ndv"
            ") as (column_name, n_runs, n_distinct)"
        ),
        F.col("n").alias("n_rows"),
    )
    return melted.select(
        "column_name",
        "n_rows",
        F.col("n_runs").cast("long").alias("n_runs"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        exact_div(
            F.col("n_runs").cast("decimal(38,0)") * F.lit(1000000), F.col("n_rows")
        )
        .cast("long")
        .alias("runs_ppm"),
        F.length(F.bin(F.greatest(F.col("n_distinct") - 1, F.lit(0))))
        .cast("long")
        .alias("dict_index_bits"),
    )


# ---------------------------------------------------------------------------
# heavy_hitters_twophase — the distributed top-k pattern every shuffle-
# shy engine uses (per-shard candidates, then a certified merge), as an
# exact, driver-checkable query: shard items by key hash (key % 8 — a
# DETERMINISTIC stand-in for physical partitioning, so both engines
# see identical shards), take each shard's top-m=4 keys as candidates,
# merge to the global top-k=10, and emit the soundness certificate:
# any non-candidate's count is bounded by its shard's m-th count, so
# the merge is provably the TRUE top-k iff the k-th merged count
# strictly beats the largest per-shard bound (strict — an equal count
# could displace on the key tiebreak). At 100 TB this is the shape
# that replaces a full global count sort: the per-key rollup combines
# map-side, the per-shard window runs at shard parallelism, and the
# merge sees m·shards = 32 rows. certified=false is the audit telling
# you to raise m, not a wrong answer — the output is exactly the
# top-k OF THE CANDIDATES on both engines either way.
# ---------------------------------------------------------------------------

_HH_SHARDS = 8
_HH_M = 4
_HH_K = 10

_HH_ORACLE = f"""
WITH counts AS (
  SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
),
sharded AS (
  SELECT key, cnt, key % {_HH_SHARDS} AS shard,
         row_number() OVER (PARTITION BY key % {_HH_SHARDS}
                            ORDER BY cnt DESC, key ASC) AS rn
  FROM counts
),
cand AS (SELECT key, cnt, shard, rn FROM sharded WHERE rn <= {_HH_M}),
bound AS (
  SELECT MAX(CASE WHEN rn = {_HH_M} THEN cnt ELSE 0 END) AS max_bound
  FROM cand
),
merged AS (
  SELECT key, cnt,
         row_number() OVER (ORDER BY cnt DESC, key ASC) AS rank
  FROM cand
)
SELECT m.rank, m.key AS l_partkey, m.cnt,
       (SELECT MIN(cnt) FROM merged WHERE rank <= {_HH_K}) > b.max_bound
         AS certified
FROM merged m CROSS JOIN bound b
WHERE m.rank <= {_HH_K}
"""


@query("heavy_hitters_twophase", _HH_ORACLE)
def heavy_hitters_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    counts = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sharded = counts.withColumn("shard", F.col("key") % _HH_SHARDS).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("shard").orderBy(
                F.col("cnt").desc(), F.col("key").asc()
            )
        ),
    )
    # cand roots the bound + merge diamond (32 rows): checkpoint so the
    # corpus rollup + shard window run once
    cand = sharded.filter(F.col("rn") <= _HH_M).localCheckpoint()
    bound = cand.agg(
        F.max(F.when(F.col("rn") == _HH_M, F.col("cnt")).otherwise(0)).alias(
            "max_bound"
        )
    )
    merged = cand.select(
        "key",
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), F.col("key").asc()))
        .alias("rank"),
    ).filter(F.col("rank") <= _HH_K)
    kth = merged.agg(F.min("cnt").alias("kth_cnt"))
    return (
        merged.crossJoin(F.broadcast(bound))
        .crossJoin(F.broadcast(kth))
        .select(
            "rank",
            F.col("key").alias("l_partkey"),
            "cnt",
            (F.col("kth_cnt") > F.col("max_bound")).alias("certified"),
        )
    )


# ---------------------------------------------------------------------------
# join_explosion_audit — the pre-flight cardinality check a planner (or
# an on-call engineer) runs before shipping a join at 100 TB: the EXACT
# output size of a join is Σ_k cnt_left(k)·cnt_right(k), computable
# from two per-key rollups WITHOUT executing the join. Audits the two
# canonical shapes on this schema: orders⋈lineitem on orderkey (1:N,
# benign) and lineitem⋈lineitem on partkey (the self-join square that
# melts clusters). Shape: per-key counts collapse map-side; the
# rollup-level equi-join + DECIMAL(38) product-sum touch distinct keys,
# never rows; amplification is the output-vs-larger-input ratio in
# exact ppm. A plan that joins first and counts later scans the
# explosion to measure it — this one never materializes a single
# joined row.
# ---------------------------------------------------------------------------

_JX_ORACLE = """
WITH ol AS (
  SELECT o.n_left, l.n_right, j.join_rows FROM
    (SELECT CAST(COUNT(*) AS BIGINT) AS n_left FROM orders) o,
    (SELECT CAST(COUNT(*) AS BIGINT) AS n_right FROM lineitem) l,
    (SELECT CAST(SUM(CAST(a.c AS HUGEINT) * b.c) AS BIGINT) AS join_rows
     FROM (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1) a
     JOIN (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1) b
       ON a.k = b.k) j
),
ll AS (
  SELECT l.n_left, l.n_left AS n_right, j.join_rows FROM
    (SELECT CAST(COUNT(*) AS BIGINT) AS n_left FROM lineitem) l,
    (SELECT CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS join_rows
     FROM (SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY 1)) j
)
SELECT 'orders_lineitem_orderkey' AS join_name, n_left, n_right, join_rows,
       CAST((CAST(join_rows AS HUGEINT) * 1000000)
            // GREATEST(n_left, n_right) AS BIGINT) AS amplification_ppm
FROM ol
UNION ALL
SELECT 'lineitem_self_partkey', n_left, n_right, join_rows,
       CAST((CAST(join_rows AS HUGEINT) * 1000000)
            // GREATEST(n_left, n_right) AS BIGINT)
FROM ll
"""


@query("join_explosion_audit", _JX_ORACLE)
def join_explosion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import exact_div

    d38 = "decimal(38,0)"
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")

    def audit(name: str, left_keys: DataFrame, right_keys: DataFrame,
              n_left: DataFrame, n_right: DataFrame) -> DataFrame:
        a = left_keys.groupBy("k").agg(F.count(F.lit(1)).alias("ca"))
        b = right_keys.groupBy("k").agg(F.count(F.lit(1)).alias("cb"))
        jr = a.join(b, "k").agg(
            F.sum(F.col("ca").cast(d38) * F.col("cb")).cast("long").alias("join_rows")
        )
        return (
            n_left.crossJoin(n_right)
            .crossJoin(F.broadcast(jr))
            .select(
                F.lit(name).alias("join_name"),
                "n_left",
                "n_right",
                "join_rows",
                exact_div(
                    F.col("join_rows").cast(d38) * F.lit(1000000),
                    F.greatest(F.col("n_left"), F.col("n_right")).cast(d38),
                )
                .cast("long")
                .alias("amplification_ppm"),
            )
        )

    li_keys = lineitem.select(F.col("l_orderkey").alias("k"))
    li_parts = lineitem.select(F.col("l_partkey").alias("k"))
    ol = audit(
        "orders_lineitem_orderkey",
        orders.select(F.col("o_orderkey").alias("k")),
        li_keys,
        orders.agg(F.count(F.lit(1)).alias("n_left")),
        lineitem.agg(F.count(F.lit(1)).alias("n_right")),
    )
    ll = audit(
        "lineitem_self_partkey",
        li_parts,
        li_parts,
        lineitem.agg(F.count(F.lit(1)).alias("n_left")),
        lineitem.agg(F.count(F.lit(1)).alias("n_right")),
    )
    return ol.unionAll(ll)


# ---------------------------------------------------------------------------
# column_correlation_audit — the second statistic a CBO needs after
# histograms: do two columns vary INDEPENDENTLY? Under independence
# NDV(a,b) ≈ min(NDV(a)·NDV(b), N); the measured ratio (ppm) is the
# correction factor for multi-predicate selectivity and GROUP BY
# cardinality estimates (1e6 = independent; far below = correlated, the
# estimate that makes planners pick hash aggregates 100× too small).
# Audits (status, priority) and (status, order-month) on orders. Shape:
# per pair, one distinct-rollup on the pair key (map-side combinable) +
# two single-column NDVs from the SAME rollup (re-aggregation, not a
# rescan); the fact table is scanned once per pair, everything
# downstream is rollup-sized.
# ---------------------------------------------------------------------------

_CCA_ORACLE = """
WITH sp AS (
  SELECT o_orderstatus AS a, o_orderpriority AS b, COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2
),
sp_stats AS (
  SELECT 'status_priority' AS col_pair,
         CAST(COUNT(DISTINCT a) AS BIGINT) AS ndv_a,
         CAST(COUNT(DISTINCT b) AS BIGINT) AS ndv_b,
         CAST(COUNT(*) AS BIGINT) AS ndv_pair,
         CAST(SUM(cnt) AS BIGINT) AS n_rows
  FROM sp
),
sm AS (
  SELECT o_orderstatus AS a, date_trunc('month', o_orderdate) AS b,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2
),
sm_stats AS (
  SELECT 'status_month' AS col_pair,
         CAST(COUNT(DISTINCT a) AS BIGINT) AS ndv_a,
         CAST(COUNT(DISTINCT b) AS BIGINT) AS ndv_b,
         CAST(COUNT(*) AS BIGINT) AS ndv_pair,
         CAST(SUM(cnt) AS BIGINT) AS n_rows
  FROM sm
),
u AS (SELECT * FROM sp_stats UNION ALL SELECT * FROM sm_stats)
SELECT col_pair, ndv_a, ndv_b, ndv_pair,
       LEAST(ndv_a * ndv_b, n_rows) AS indep_ndv,
       CAST((ndv_pair * 1000000) // LEAST(ndv_a * ndv_b, n_rows) AS BIGINT)
         AS correlation_ppm
FROM u
"""


@query("column_correlation_audit", _CCA_ORACLE)
def column_correlation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import exact_div

    orders = t(spark, sf_dir, "orders")

    def stats(name: str, a, b) -> DataFrame:
        rollup = orders.groupBy(a.alias("a"), b.alias("b")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        return rollup.agg(
            F.countDistinct("a").alias("ndv_a"),
            F.countDistinct("b").alias("ndv_b"),
            F.count(F.lit(1)).alias("ndv_pair"),
            F.sum("cnt").alias("n_rows"),
        ).select(
            F.lit(name).alias("col_pair"),
            F.col("ndv_a").cast("long").alias("ndv_a"),
            F.col("ndv_b").cast("long").alias("ndv_b"),
            F.col("ndv_pair").cast("long").alias("ndv_pair"),
            F.least(
                F.col("ndv_a") * F.col("ndv_b"), F.col("n_rows")
            ).cast("long").alias("indep_ndv"),
            exact_div(
                F.col("ndv_pair").cast("decimal(38,0)") * F.lit(1000000),
                F.least(F.col("ndv_a") * F.col("ndv_b"), F.col("n_rows")).cast(
                    "decimal(38,0)"
                ),
            )
            .cast("long")
            .alias("correlation_ppm"),
        )

    return stats(
        "status_priority", F.col("o_orderstatus"), F.col("o_orderpriority")
    ).unionAll(
        stats(
            "status_month",
            F.col("o_orderstatus"),
            F.date_trunc("month", "o_orderdate"),
        )
    )


# ---------------------------------------------------------------------------
# stats_join_strategy — the ANALYZE consumer, driver-verified: collect
# real table stats (stats.collect_table_stats, ONE agg pass per table),
# let choose_join_strategy pick broadcast-vs-shuffle from the EXACT
# statistics (n_rows / null counts / avg_len — the approximate NDV is
# deliberately not consulted, so the decision is deterministic), run
# the join both ways through stats_aware_join, and pin (a) the decision
# strings, (b) the physical plan shapes the hints produce, and (c) that
# both strategies return the same row count. The doctored-stats side
# scales BOTH tables 10^7× so the decision flips to a pinned shuffle —
# the flip a 100 TB planner must make when the dimension outgrows the
# broadcast threshold. Companion to the plan-flip pytest over
# storage.stats_aware_path_join (sidecar-driven variant).
# ---------------------------------------------------------------------------

_STATS_JOIN_ORACLE = """
SELECT
  'broadcast_right' AS dim_strategy,
  'shuffle' AS big_strategy,
  TRUE AS dim_plan_broadcast,
  FALSE AS big_plan_broadcast,
  TRUE AS big_plan_shuffle,
  CAST((SELECT COUNT(*) FROM customer c JOIN nation n
        ON c.c_nationkey = n.n_nationkey) AS BIGINT) AS n_rows_broadcast,
  CAST((SELECT COUNT(*) FROM customer c JOIN nation n
        ON c.c_nationkey = n.n_nationkey) AS BIGINT) AS n_rows_shuffle
"""


@query("stats_join_strategy", _STATS_JOIN_ORACLE)
def stats_join_strategy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..stats import (
        choose_join_strategy, collect_table_stats, stats_aware_join,
    )
    from ..storage import plan_has_exchange

    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    st_c = collect_table_stats(cust)
    st_n = collect_table_stats(nat)

    dim_strategy = choose_join_strategy(st_c, st_n)
    j_dim = stats_aware_join(cust, nat, "c_nationkey", st_c, st_n)

    # the same tables with planner-visible sizes scaled 10^7×: at that
    # size NEITHER side fits under the broadcast line
    big_c = {**st_c, "n_rows": st_c["n_rows"] * 10_000_000}
    big_n = {**st_n, "n_rows": st_n["n_rows"] * 10_000_000}
    big_strategy = choose_join_strategy(big_c, big_n)
    j_big = stats_aware_join(cust, nat, "c_nationkey", big_c, big_n)

    def _plan(df: DataFrame) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    return (
        j_dim.agg(F.count(F.lit(1)).cast("long").alias("n_rows_broadcast"))
        .crossJoin(
            j_big.agg(F.count(F.lit(1)).cast("long").alias("n_rows_shuffle"))
        )
        .select(
            F.lit(dim_strategy).alias("dim_strategy"),
            F.lit(big_strategy).alias("big_strategy"),
            F.lit("BroadcastHashJoin" in _plan(j_dim)).alias(
                "dim_plan_broadcast"
            ),
            F.lit("BroadcastHashJoin" in _plan(j_big)).alias(
                "big_plan_broadcast"
            ),
            F.lit(plan_has_exchange(j_big)).alias("big_plan_shuffle"),
            "n_rows_broadcast",
            "n_rows_shuffle",
        )
    )


# ---------------------------------------------------------------------------
# range_read_roundtrip — the manifest-pruned range reader, driver-
# verified the same way the sinks were (round-9 pattern): rewrite
# events through the REAL compact_by_time executor (time-sorted,
# NON-time-partitioned _bin= layout — the case where Spark's catalog
# has nothing to prune on), read a mid-span window back through
# storage.read_time_range's O(files) footer-span manifest, verify the
# windowed aggregate against an oracle computing straight from the
# source table, and emit the pruning evidence (n_selected < n_total)
# as an output column. The window is integer-exact on both engines:
# [lo + 2*(hi-lo)//5, lo + (hi-lo)//2] in epoch microseconds (floor
# division both sides — no float boundary). ~10% of a 30-day span
# overlaps at most 2-3 of the 8 row-balanced bins, so pruned=TRUE is a
# structural property of the layout, not luck.
# ---------------------------------------------------------------------------

_RANGE_RT_BINS = 8

_RANGE_RT_ORACLE = """
WITH b AS (
  SELECT epoch_us(MIN(ts)) AS lo, epoch_us(MAX(ts)) AS hi FROM events
), w AS (
  SELECT lo + (hi - lo) // 5 * 2 AS w_lo, lo + (hi - lo) // 2 AS w_hi FROM b
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
  TRUE AS pruned
FROM events, w
WHERE epoch_us(ts) >= w_lo AND epoch_us(ts) <= w_hi AND NOT isnan(value)
"""


@query("range_read_roundtrip", _RANGE_RT_ORACLE)
def range_read_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..functions.timestamps import micros
    from ..storage import compact_by_time, read_time_range

    e = t(spark, sf_dir, "events")
    b = e.agg(
        F.min(micros(F.col("ts"))).alias("lo"),
        F.max(micros(F.col("ts"))).alias("hi"),
    ).collect()[0]  # two scalars — the documented bounded boundary
    if b["lo"] is None:  # empty source: the oracle's zero-row aggregate
        return local_df(spark, 
            [(0, None, True)], "n_rows long, sum_cents long, pruned boolean"
        )
    lo, hi = int(b["lo"]), int(b["hi"])
    w_lo = lo + (hi - lo) // 5 * 2
    w_hi = lo + (hi - lo) // 2

    root = tempfile.mkdtemp(prefix="sgq_range_rt_")
    try:
        path = f"{root}/events_compacted"
        compact_by_time(e, "ts", path, n_bins=_RANGE_RT_BINS)
        windowed, plan = read_time_range(spark, path, w_lo, w_hi, "ts")
        out = (
            windowed.filter(~F.isnan("value"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                # cents are integers after the round: exact + order-free
                F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                .cast("long")
                .alias("sum_cents"),
            )
            .select(
                "n_rows",
                "sum_cents",
                F.lit(plan["n_selected"] < plan["n_total"]).alias("pruned"),
            )
            .localCheckpoint()  # eager: frees the temp dir below
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# stats_accuracy_audit — the ANALYZE document itself audited against
# exact answers (the approx_event_stats stance applied to the stats
# collector): every EXACT field of the collected document (row count,
# null count, min/max — timestamps formatted engine-side, TZ-stable —
# and the string avg_len, whose double is exact because integer
# lengths sum under 2^53 on both engines) is emitted as an output
# column the oracle recomputes from the source table, and the
# approximate NDVs are pinned to a documented 3·rsd envelope against
# in-plan exact countDistinct — if HLL++ ever drifts past its bound,
# this query goes red rather than silently shipping bad statistics to
# the join planner (stats_join_strategy consumes exactly these
# numbers). Registered after slot 50 by design: heads the round-11
# window.
# ---------------------------------------------------------------------------

_STATS_ACC_ORACLE = """
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS nulls_custkey,
  CAST(MIN(o_custkey) AS VARCHAR) AS lo_custkey,
  CAST(MAX(o_custkey) AS VARCHAR) AS hi_custkey,
  strftime(MIN(o_orderdate), '%Y-%m-%dT%H:%M:%S') AS lo_date,
  strftime(MAX(o_orderdate), '%Y-%m-%dT%H:%M:%S') AS hi_date,
  CAST(SUM(LENGTH(o_orderpriority)) AS DOUBLE) / COUNT(o_orderpriority)
    AS avg_len_priority,
  TRUE AS ndv_custkey_ok,
  TRUE AS ndv_priority_ok
FROM orders
"""


@query("stats_accuracy_audit", _STATS_ACC_ORACLE)
def stats_accuracy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..stats import collect_table_stats

    o = t(spark, sf_dir, "orders")
    st = collect_table_stats(
        o, columns=["o_custkey", "o_orderpriority", "o_orderdate"]
    )
    ck, pr, od = (
        st["columns"]["o_custkey"],
        st["columns"]["o_orderpriority"],
        st["columns"]["o_orderdate"],
    )
    return o.agg(
        F.countDistinct("o_custkey").alias("_x_ck"),
        F.countDistinct("o_orderpriority").alias("_x_pr"),
    ).select(
        F.lit(st["n_rows"]).cast("long").alias("n_rows"),
        F.lit(ck["n_nulls"]).cast("long").alias("nulls_custkey"),
        F.lit(str(ck["min"])).alias("lo_custkey"),
        F.lit(str(ck["max"])).alias("hi_custkey"),
        F.lit(od["min"]).alias("lo_date"),
        F.lit(od["max"]).alias("hi_date"),
        F.lit(float(pr["avg_len"])).alias("avg_len_priority"),
        (
            F.abs(F.lit(ck["ndv"]) - F.col("_x_ck"))
            <= 3 * 0.05 * F.col("_x_ck")
        ).alias("ndv_custkey_ok"),
        (
            F.abs(F.lit(pr["ndv"]) - F.col("_x_pr"))
            <= 3 * 0.05 * F.col("_x_pr")
        ).alias("ndv_priority_ok"),
    )


# ---------------------------------------------------------------------------
# vacuum_roundtrip — the retention vacuum driver-verified (the last
# storage primitive that was pytest-only): compact events into the
# 8-bin time-sorted layout, run the REAL vacuum_by_retention
# (keep_days=10 against a 30-day span — several whole bins fall), read
# the surviving files back and verify the aggregate against an oracle
# that REPRODUCES the vacuum's file-granular semantics in SQL: the
# compaction_bins packing (same day spine, same cumulative-target
# floor-divisions) assigns each day a bin = a file, each bin's max ts is
# its footer span, and a bin survives iff its span max >= dataset max
# - 10 days — straddling bins kept whole, exactly the documented
# contract. n_deleted/n_kept and the sidecar invalidation flag ride
# along as columns. Registered after slot 50: heads the round-11
# window with stats_accuracy_audit.
# ---------------------------------------------------------------------------

_VACUUM_RT_BINS = 8
_VACUUM_RT_KEEP_DAYS = 10

_VACUUM_RT_ORACLE = f"""
WITH per_day AS (
  SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
tgt AS (
  SELECT CAST((SUM(n) + {_VACUUM_RT_BINS - 1}) // {_VACUUM_RT_BINS} AS BIGINT)
    AS target
  FROM per_day
),
cum AS (
  SELECT d, n, CAST(SUM(n) OVER (ORDER BY d) - n AS BIGINT) AS cum0
  FROM per_day
),
binned AS (
  SELECT d, CAST(c.cum0 // t.target AS BIGINT) AS bin_id
  FROM cum c CROSS JOIN tgt t
),
binmax AS (
  SELECT b.bin_id, MAX(e.ts) AS bmax
  FROM events e JOIN binned b ON date_trunc('day', e.ts) = b.d
  GROUP BY b.bin_id
),
cutoff AS (
  SELECT epoch_us(MAX(ts)) - {_VACUUM_RT_KEEP_DAYS} * 86400000000 AS c
  FROM events
),
keep_days AS (
  SELECT b.d
  FROM binned b JOIN binmax m ON b.bin_id = m.bin_id CROSS JOIN cutoff
  WHERE epoch_us(m.bmax) >= c
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN isnan(e.value) THEN 0
           ELSE CAST(ROUND(e.value * 100, 0) AS BIGINT) END) AS BIGINT)
    AS sum_cents,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM binmax CROSS JOIN cutoff
   WHERE epoch_us(bmax) < c) AS n_deleted,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM binmax CROSS JOIN cutoff
   WHERE epoch_us(bmax) >= c) AS n_kept,
  TRUE AS vacuumed
FROM events e JOIN keep_days k ON date_trunc('day', e.ts) = k.d
"""


@query("vacuum_roundtrip", _VACUUM_RT_ORACLE)
def vacuum_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..storage import compact_by_time, vacuum_by_retention

    e = t(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="sgq_vacuum_rt_")
    try:
        path = f"{root}/events_compacted"
        compact_by_time(e, "ts", path, n_bins=_VACUUM_RT_BINS)
        res = vacuum_by_retention(
            path, "ts", keep_days=_VACUUM_RT_KEEP_DAYS
        )
        out = (
            spark.read.parquet(path)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(
                    F.when(F.isnan("value"), F.lit(0)).otherwise(
                        F.round(F.col("value") * 100, 0).cast("long")
                    )
                )
                .cast("long")
                .alias("sum_cents"),
            )
            .select(
                "n_rows",
                "sum_cents",
                F.lit(res["n_deleted"]).cast("long").alias("n_deleted"),
                F.lit(res["n_kept"]).cast("long").alias("n_kept"),
                F.lit(res["n_deleted"] > 0).alias("vacuumed"),
            )
            .localCheckpoint()  # eager: frees the temp dir below
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# join_preflight_audit — the Selinger estimate consulted as a DECISION
# (stats.join_preflight, the second consumer of the ANALYZE collector
# after stats_join_strategy): collect real sidecar-shape statistics for
# the two canonical join shapes join_explosion_audit measures exactly —
# orders⋈lineitem on orderkey (1:N FK, blow-up ≈ 1) and
# lineitem⋈lineitem on partkey (the self-join square, blow-up ≈
# rows-per-part ≈ 30) — and emit each shape's pre-flight verdict. The
# oracle recomputes the same verdicts from EXACT counts and NDVs; the
# engine side uses the HLL++ NDVs a production sidecar carries, so a
# hash match also pins that the 5%-rsd sketch cannot flip a decision
# with real margins (1.0 vs 4.0 vs ~30 — stats_accuracy_audit bounds
# the drift). Floor division on both sides — no float boundary in the
# estimate itself; only the boolean ships.
# ---------------------------------------------------------------------------

_JPF_ORACLE = """
WITH o AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS ndv
  FROM orders
), l AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ndv_ok,
         CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS ndv_pk
  FROM lineitem
)
SELECT 'orders_lineitem_orderkey' AS join_name,
       o.n AS n_left, l.n AS n_right,
       ((CAST(o.n AS HUGEINT) * l.n // GREATEST(o.ndv, l.ndv_ok))
          > 4.0 * GREATEST(o.n, l.n)) AS exploding
FROM o, l
UNION ALL
SELECT 'lineitem_self_partkey', l.n, l.n,
       ((CAST(l.n AS HUGEINT) * l.n // l.ndv_pk) > 4.0 * l.n)
FROM l
"""


@query("join_preflight_audit", _JPF_ORACLE)
def join_preflight_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..stats import collect_table_stats, join_preflight

    # key-column-only profiles: join_preflight documents that PARTIAL
    # docs are usable (it needs the key stats, not the row width)
    st_o = collect_table_stats(t(spark, sf_dir, "orders"), ["o_orderkey"])
    st_l = collect_table_stats(
        t(spark, sf_dir, "lineitem"), ["l_orderkey", "l_partkey"]
    )
    rows = [
        (
            "orders_lineitem_orderkey",
            st_o["n_rows"],
            st_l["n_rows"],
            join_preflight(st_o, st_l, "o_orderkey", "l_orderkey")["exploding"],
        ),
        (
            "lineitem_self_partkey",
            st_l["n_rows"],
            st_l["n_rows"],
            join_preflight(st_l, st_l, "l_partkey", "l_partkey")["exploding"],
        ),
    ]
    return local_df(spark, 
        rows,
        "join_name string, n_left long, n_right long, exploding boolean",
    )


# ---------------------------------------------------------------------------
# zorder_range_read — write_zordered's payoff composed end-to-end with
# the manifest primitives (the read-side twin of zorder_locality, which
# only MEASURES the clustering): rewrite lineitem z-ordered on
# (l_partkey, l_suppkey) via the REAL write_zordered (suppkey scaled up
# to a comparable bit range, per zorder_column's contract), then answer
# a 2-D box predicate (partkey ≤ max//8 AND suppkey ≤ max//8, ~1/64 of
# the key plane) through storage.read_int_box: footer-envelope file
# selection on BOTH dimensions + native integer PushedFilters inside
# the selected files. The oracle computes the same box aggregate
# straight from the source; pruned=TRUE rides along — a z-contiguous
# file covers a bounded rectangle in every clustered dimension, so a
# 1/64 box overlapping most of 16 files would mean the layout (or the
# envelope math) is broken, not that the data moved. Box bounds are
# floor-division integers — no float boundary on either engine.
# ---------------------------------------------------------------------------

_ZRR_FILES = 16

_ZRR_ORACLE = """
WITH m AS (
  SELECT MAX(l_partkey) // 8 AS pk_hi, MAX(l_suppkey) // 8 AS sk_hi
  FROM lineitem
)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
    AS qty_cents,
  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
  TRUE AS pruned
FROM lineitem, m
WHERE l_partkey BETWEEN 1 AND m.pk_hi
  AND l_suppkey BETWEEN 1 AND m.sk_hi
"""


@query("zorder_range_read", _ZRR_ORACLE)
def zorder_range_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..storage import read_int_box, write_zordered, zorder_column

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    b = li.agg(
        F.max("l_partkey").alias("pk"), F.max("l_suppkey").alias("sk")
    ).collect()[0]  # two scalars — the documented bounded boundary
    if b["pk"] is None:  # empty source: the oracle's zero-row aggregate
        return local_df(spark, 
            [(0, None, 0, True)],
            "n_rows long, qty_cents long, n_parts long, pruned boolean",
        )
    pk_hi, sk_hi = int(b["pk"]) // 8, int(b["sk"]) // 8
    # scale the narrow dimension into the wide one's bit range so both
    # actually cluster (zorder_column's documented contract)
    mult = max(1, int(b["pk"]) // max(int(b["sk"]), 1))
    # mask/bits derived from the OBSERVED max scaled key (next power of
    # two), not a fixed 16-bit mask: at sf ≥ ~0.33 l_partkey exceeds
    # 65535 and a fixed mask would wrap the key, so z-files stop
    # bounding the raw column and pruned=TRUE can flip FALSE
    bits = max(int(b["pk"]), int(b["sk"]) * mult).bit_length()
    mask = (1 << bits) - 1
    z = zorder_column(
        [
            F.col("l_partkey").bitwiseAND(F.lit(mask)),
            (F.col("l_suppkey") * F.lit(mult)).bitwiseAND(F.lit(mask)),
        ],
        bits=bits,
    )
    root = tempfile.mkdtemp(prefix="sgq_zrr_")
    try:
        path = f"{root}/lineitem_z"
        write_zordered(li, path, z, n_files=_ZRR_FILES)
        boxed, plan = read_int_box(
            spark, path, {"l_partkey": (1, pk_hi), "l_suppkey": (1, sk_hi)}
        )
        out = (
            boxed.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                # quantity cents are integers after the round: exact,
                # order-independent
                F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long"))
                .cast("long")
                .alias("qty_cents"),
                F.countDistinct("l_partkey").cast("long").alias("n_parts"),
            )
            .select(
                "n_rows",
                "qty_cents",
                "n_parts",
                F.lit(plan["n_selected"] < plan["n_total"]).alias("pruned"),
            )
            .localCheckpoint()  # eager: frees the temp dir below
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# preflight_salted_join — the join pre-flight escalated from warning to
# MITIGATION, driven end-to-end (VERDICT r11 task 4): events (Zipfian
# event_type, top value owns >= 20% of rows by pigeonhole over 5 types)
# join a deliberately m:n 25-row dim (5 variants per type), so the
# Selinger estimate says 5x the fact side — past JOIN_BLOWUP_FACTOR.
# The fact-side stats carry the opt-in hot_keys top-values evidence,
# the dim is pinned non-broadcast (threshold_bytes=1: the query tests
# the mitigation, not the broadcast threshold), and stats_aware_join
# must therefore ROUTE through operators.skew.salted_join: each hot
# type spreads over 16 reducers instead of one straggler. The oracle is
# the PLAIN join + rollup — equality certifies the routed plan is a
# pure execution-strategy change; `mitigated` (captured from the
# routed-warning) and `salted_plan` (the physical join key includes
# _salt) ride along as driver-visible columns.
# ---------------------------------------------------------------------------

_PSJ_ORACLE = """
WITH dim AS (
  SELECT DISTINCT e.event_type, v.variant
  FROM events e, (VALUES (1), (2), (3), (4), (5)) v(variant)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(variant) AS BIGINT) AS variant_sum,
       TRUE AS mitigated,
       TRUE AS salted_plan
FROM events JOIN dim USING (event_type)
GROUP BY event_type
"""


@query("preflight_salted_join", _PSJ_ORACLE)
def preflight_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import warnings as _w

    from ..stats import collect_table_stats, stats_aware_join

    e = t(spark, sf_dir, "events").select("event_type")
    dim = (
        e.distinct()
        .crossJoin(
            spark.range(1, 6).select(F.col("id").cast("int").alias("variant"))
        )
        .localCheckpoint()  # dim must be a stable 25-row table, not a plan
    )
    st_e = collect_table_stats(e, hot_keys=["event_type"])
    st_d = collect_table_stats(dim)
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        joined = stats_aware_join(e, dim, "event_type", st_e, st_d,
                                  threshold_bytes=1)
    mitigated = any("routed through salted_join" in str(c.message)
                    for c in caught)
    salted_plan = "_salt" in (
        joined._jdf.queryExecution().executedPlan().toString()
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("variant").cast("long").alias("variant_sum"),
    ).select(
        "event_type", "n", "variant_sum",
        F.lit(mitigated).alias("mitigated"),
        F.lit(salted_plan).alias("salted_plan"),
    )


# ---------------------------------------------------------------------------
# zorder_float_guard — the z-order read path's NEGATIVE proof: the
# truncation guard in storage.file_int_spans (integer physical AND
# logical types only, storage.py) made driver-visible. A box bound on
# a DOUBLE column (l_quantity) must select ALL files — int(st.min) of
# a float envelope truncates (5.9 -> 5), and a truncated file-max
# below the box lower bound would wrongly EXCLUDE a file holding
# in-box rows; the guard refuses the envelope, unknown means scan.
# The same read on the INT column (l_partkey) of the same range-
# clustered layout DOES prune — proving the full scan on the float
# dimension is the guard working, not pruning being broken. Results
# on both dimensions hash-match the straight source-table oracle;
# scanned_all rides along (TRUE for the float dim, FALSE for the int
# dim) as the structural column.
# ---------------------------------------------------------------------------

_ZFG_FILES = 8

_ZFG_ORACLE = """
WITH m AS (SELECT MAX(l_partkey) // 8 AS pk_hi FROM lineitem)
SELECT 'float_dim' AS dim_kind,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
         AS qty_cents,
       TRUE AS scanned_all
FROM lineitem WHERE l_quantity BETWEEN 10 AND 20
UNION ALL
SELECT 'int_dim',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT),
       FALSE
FROM lineitem, m WHERE l_partkey BETWEEN 1 AND m.pk_hi
"""


@query("zorder_float_guard", _ZFG_ORACLE)
def zorder_float_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..storage import read_int_box, write_zordered

    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    b = li.agg(F.max("l_partkey").alias("pk")).collect()[0]
    if b["pk"] is None:  # empty source: both oracle branches aggregate 0
        return local_df(spark, 
            [("float_dim", 0, None, True), ("int_dim", 0, None, False)],
            "dim_kind string, n_rows long, qty_cents long, "
            "scanned_all boolean",
        )
    pk_hi = int(b["pk"]) // 8
    root = tempfile.mkdtemp(prefix="sgq_zfg_")
    try:
        path = f"{root}/lineitem_rc"
        # 1-D range clustering is enough: the proof is about which
        # column types may prune, not about multi-dimension envelopes
        write_zordered(li, path, F.col("l_partkey"), n_files=_ZFG_FILES)

        def agg_box(bounds, kind, expect_all):
            boxed, plan = read_int_box(spark, path, bounds)
            scanned_all = plan["n_selected"] == plan["n_total"]
            assert scanned_all == expect_all, (kind, plan)
            return boxed.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long"))
                .cast("long")
                .alias("qty_cents"),
            ).select(
                F.lit(kind).alias("dim_kind"),
                "n_rows",
                "qty_cents",
                F.lit(scanned_all).alias("scanned_all"),
            )

        out = (
            agg_box({"l_quantity": (10, 20)}, "float_dim", True)
            .unionByName(agg_box({"l_partkey": (1, pk_hi)}, "int_dim", False))
            .localCheckpoint()  # eager: frees the temp dir below
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# salted_path_join — the round-12 flagship's LAST gap closed (VERDICT
# r12 task 2): the salted-join mitigation driven PURELY from
# ``_stats.json`` sidecars on disk. preflight_salted_join proves the
# route with hand-built in-memory stats; this proof persists the skew
# evidence through the storage lifecycle instead — compact_by_time
# (collect_stats=True, hot_keys=["event_type"]) writes the fact-side
# sidecar WITH top_values, the dim gets a plain sidecar, and
# storage.stats_aware_path_join reads both back and must ROUTE the
# exploding hot-key join through salted_join with no in-memory stats
# hand-off anywhere. Same skew fixture as preflight_salted_join
# (Zipfian-enough event_type: top value ≥ 20% by pigeonhole over 5
# types; deliberately m:n 25-row dim → Selinger says 5× the fact).
# Oracle = the PLAIN join + rollup; equality certifies a pure
# execution-strategy change. from_sidecar (top_values present in the
# JSON read back from disk), mitigated (routed-warning observed) and
# salted_plan (_salt in the physical join key) ride along.
# ---------------------------------------------------------------------------

_SPJ_ORACLE = """
WITH dim AS (
  SELECT DISTINCT e.event_type, v.variant
  FROM events e, (VALUES (1), (2), (3), (4), (5)) v(variant)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(variant) AS BIGINT) AS variant_sum,
       TRUE AS from_sidecar,
       TRUE AS mitigated,
       TRUE AS salted_plan
FROM events JOIN dim USING (event_type)
GROUP BY event_type
"""


@query("salted_path_join", _SPJ_ORACLE)
def salted_path_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import warnings as _w

    from ..stats import collect_table_stats, read_stats, write_stats
    from ..storage import compact_by_time, stats_aware_path_join

    e = t(spark, sf_dir, "events").select("event_type", "ts")
    schema = (
        "event_type string, n long, variant_sum long, "
        "from_sidecar boolean, mitigated boolean, salted_plan boolean"
    )
    if not e.head(1):  # empty source: nothing to compact, and the
        # oracle's join+groupBy over no rows is 0 rows. head(1) is an
        # executeTake — one partition-at-a-time probe, no count job.
        return local_df(spark, [], schema)
    dim = (
        e.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(1, 6).select(F.col("id").cast("int").alias("variant"))
        )
        .localCheckpoint()  # dim must be a stable 25-row table, not a plan
    )
    root = tempfile.mkdtemp(prefix="sgq_spj_")
    try:
        fp, dp = f"{root}/fact", f"{root}/dim"
        # the storage lifecycle persists the evidence: OPTIMIZE+ANALYZE
        # with the table's declared join key profiled for hot values
        compact_by_time(e, "ts", fp, n_bins=4, collect_stats=True,
                        hot_keys=["event_type"])
        dim.write.parquet(dp)
        write_stats(collect_table_stats(spark.read.parquet(dp)), dp)
        side = read_stats(fp)
        from_sidecar = bool(
            (side or {}).get("columns", {})
            .get("event_type", {})
            .get("top_values")
        )
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            joined = stats_aware_path_join(
                spark, fp, dp, "event_type", threshold_bytes=1
            )
        mitigated = any("routed through salted_join" in str(c.message)
                        for c in caught)
        salted_plan = "_salt" in (
            joined._jdf.queryExecution().executedPlan().toString()
        )
        out = (
            joined.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("variant").cast("long").alias("variant_sum"),
            )
            .select(
                "event_type", "n", "variant_sum",
                F.lit(from_sidecar).alias("from_sidecar"),
                F.lit(mitigated).alias("mitigated"),
                F.lit(salted_plan).alias("salted_plan"),
            )
            .localCheckpoint()  # eager: frees the temp dir below
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# compact_roundtrip — the size-targeted small-files compaction
# (storage.compact_parquet, the sibling of the driver-proven
# compact_by_time; folded in from sinks/compact.py this round so the
# repo has ONE compaction module) driven end-to-end: fragment a copy
# of events into 64 tiny files, compact to target-sized files
# (shuffle-free coalesce + atomic directory swap), and verify the
# rewrite changed LAYOUT only — row count, distinct users, and the
# value checksum hash-match the straight source-table oracle, with
# `compacted` (file count strictly fell) as the structural column.
# ---------------------------------------------------------------------------

_CR_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS value_cents,
       TRUE AS compacted
FROM events
"""


@query("compact_roundtrip", _CR_ORACLE)
def compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..storage import compact_parquet, parquet_file_count

    e = t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    if e.limit(1).count() == 0:  # empty source cannot fragment: the
        # oracle's zero-row aggregate with the structural constant
        return local_df(spark, 
            [(0, 0, None, True)],
            "n_rows long, n_users long, value_cents long, "
            "compacted boolean",
        )
    root = tempfile.mkdtemp(prefix="sgq_cr_")
    try:
        path = f"{root}/events_frag"
        e.repartition(64).write.parquet(path)  # genuinely fragmented
        before = parquet_file_count(path)
        after = compact_parquet(spark, path, target_file_bytes=8 * 1024 * 1024)
        out = (
            spark.read.parquet(path)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.countDistinct("user_id").cast("long").alias("n_users"),
                F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                .cast("long")
                .alias("value_cents"),
            )
            .select(
                "n_rows", "n_users", "value_cents",
                F.lit(after < before).alias("compacted"),
            )
            .localCheckpoint()  # eager: frees the temp dir below
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out
