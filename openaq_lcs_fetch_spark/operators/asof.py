"""As-of join — an operator Spark's DataFrame API lacks (the brief's
canonical example of a custom operator composed from existing ops).

``asof_join(left, right, key, ts)``: for every left row, attach the
most recent right row with ``right.ts <= left.ts`` within the same key.

Spark-first realization (no UDF):
  1. tag both sides and union on (key, ts);
  2. per-key window ordered by (ts, tag) with ``last(value,
     ignorenulls=True)`` carries the latest right-side payload forward;
  3. keep only left rows.

Scale note — the plain per-key window partitions the whole fact table
by the join key alone; a low-cardinality key (e.g. 5 event types) means
a handful of straggler tasks own everything at 100 TB. Pass
``bucket_seconds`` to switch to the skew-free plan: the carry-forward
window partitions by (key, time_bucket) — parallelism grows with the
time range — and each bucket is seeded with the latest right-side row
from all earlier buckets (the per-bucket seed table is |keys|×|buckets|
rows, so its key-only carry window is trivially small). Semantics are
identical; right-side rows at equal ts still win (inclusive ``<=``,
matching DuckDB's ASOF JOIN used as the oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timestamps import micros

# sort priorities inside the carry-forward window: seeds first (they
# represent strictly-earlier right rows), then real right rows (ties at
# equal ts resolve inclusively), then left rows.
_PRIO_SEED, _PRIO_RIGHT, _PRIO_LEFT = 0, 1, 2


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    ts: str,
    value_cols: Sequence[str] | None = None,
    suffix: str = "asof_",
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join; right ``value_cols`` arrive prefixed with
    ``suffix`` plus ``{suffix}ts`` (the matched right timestamp), NULL
    when no right row precedes the left row.

    ``bucket_seconds`` (timestamp ``ts`` only) enables the skew-free
    (key, time-bucket) windowed plan — use it whenever the key has low
    cardinality relative to the cluster.
    """
    keys = [key] if isinstance(key, str) else list(key)
    value_cols = value_cols or [c for c in right.columns if c not in (*keys, ts)]

    # the right payload travels as ONE struct so (ts, values) stay
    # atomic — a matched right row with a NULL value column must yield
    # that NULL, never an older row's value (DuckDB ASOF semantics).
    # _ts is the struct's FIRST field: struct max/ordering = latest ts,
    # value columns as deterministic tiebreakers.
    rtypes = dict(right.dtypes)
    payload_t = (
        "struct<_ts:" + rtypes[ts] + ","
        + ",".join(f"{c}:{rtypes[c]}" for c in value_cols)
        + ">"
    )
    l_tag = left.withColumn("_prio", F.lit(_PRIO_LEFT)).withColumn(
        "_r", F.lit(None).cast(payload_t)
    )
    r_tag = right.select(
        *keys,
        F.col(ts),
        F.lit(_PRIO_RIGHT).alias("_prio"),
        F.struct(
            F.col(ts).alias("_ts"), *[F.col(c) for c in value_cols]
        ).alias("_r"),
    )
    for c in left.columns:
        if c not in (*keys, ts):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    if bucket_seconds is None:
        unioned = l_tag.unionByName(r_tag)
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts).asc(), F.col("_prio").asc(), F.col("_r").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        us = bucket_seconds * 1_000_000
        # the join axis may be a LONG microsecond column (the forward
        # variant negates micros); floor-division buckets negatives
        # toward -inf, preserving order. Timestamp axes go through the
        # NTZ-safe micros() helper (timestamps.py) — raw unix_micros
        # rejects TIMESTAMP_NTZ input.
        axis = (
            F.col(ts).cast("long")
            if rtypes[ts] in ("bigint", "int")
            else micros(F.col(ts))
        )
        bkt = F.floor(axis / F.lit(us)).alias("_bkt")
        lb = l_tag.withColumn("_bkt", bkt)
        rb = r_tag.withColumn("_bkt", bkt)

        # per-(key, bucket) latest right payload (struct max == latest
        # _ts, deterministic value tiebreak), then carry it across the
        # bucket spine so every bucket knows the last right row that
        # precedes it. The spine is |keys| × |buckets| rows — the
        # key-only window here is over the TINY table, not the facts.
        r_per_bkt = rb.groupBy(*keys, "_bkt").agg(F.max("_r").alias("_rmax"))
        spine = (
            lb.select(*keys, "_bkt")
            .unionByName(rb.select(*keys, "_bkt"))
            .distinct()
        )
        w_seed = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_bkt").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        seeds = (
            spine.join(r_per_bkt, [*keys, "_bkt"], "left")
            .withColumn("_seed", F.last("_rmax", ignorenulls=True).over(w_seed))
            .filter(F.col("_seed").isNotNull())
            .select(
                *keys,
                F.col("_bkt"),
                # seed sorts at its bucket's start (≤ every real row in
                # the bucket; _prio breaks the tie in the seed's favor)
                (
                    (F.col("_bkt") * F.lit(us)).cast(rtypes[ts])
                    if rtypes[ts] in ("bigint", "int")
                    else F.timestamp_micros(F.col("_bkt") * F.lit(us)).cast(
                        rtypes[ts]
                    )
                ).alias(ts),
                F.lit(_PRIO_SEED).alias("_prio"),
                F.col("_seed").alias("_r"),
            )
        )
        for c in left.columns:
            if c not in (*keys, ts):
                seeds = seeds.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

        unioned = lb.unionByName(rb).unionByName(seeds)
        w = (
            Window.partitionBy(*keys, "_bkt")
            .orderBy(F.col(ts).asc(), F.col("_prio").asc(), F.col("_r").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )

    carried = unioned.withColumn(
        "_match",
        F.last(
            F.when(F.col("_prio") <= _PRIO_RIGHT, F.col("_r")), ignorenulls=True
        ).over(w),
    )
    out = carried.filter(F.col("_prio") == _PRIO_LEFT)
    for c in value_cols:
        out = out.withColumn(f"{suffix}{c}", F.col(f"_match.{c}"))
    out = out.withColumn(f"{suffix}ts", F.col("_match._ts"))
    return out.drop("_prio", "_r", "_match", "_bkt")


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    ts: str,
    value_cols: Sequence[str] | None = None,
    suffix: str = "asof_",
    bucket_seconds: int = 86_400,
    max_buckets_per_key: int = 100_000,
    max_marks_per_key: int = 1_000_000,
) -> DataFrame:
    """As-of join fast path for a DIMENSION-SIZED right side (calibration
    marks, config epochs, rate tables): identical semantics to
    ``asof_join`` but the fact table is never shuffled OR sorted.

    Plan shape: build a tiny (key, time-bucket) dimension where each row
    carries an array of that bucket's right-side payload structs plus a
    "seed" (the latest right row from all earlier buckets, carried by a
    window over the TINY table); broadcast it; each left row equi-joins
    its clamped bucket and resolves the match with
    ``array_max(filter(arr, m -> m._ts <= ts))`` — a pure projection.
    At 100 TB the fact side is map-only: bucket projection + broadcast
    hash join + codegen array expression, zero exchanges. The windowed
    plan (``asof_join``) remains the right tool when the right side is
    fact-sized; this one requires |keys| x bucket-span x marks to fit a
    broadcast (the caller's contract, same as any dimension broadcast).

    Clamping makes left-side bucket coverage total without scanning the
    left: a left bucket beyond the last right bucket clamps down (its
    match is the latest mark overall — that bucket's array contains it
    via marks+seed and the filter keeps everything); a left bucket
    before the first right bucket clamps up (the filter then drops every
    mark → NULL match, the correct "no preceding right row" answer).

    Tie semantics match ``asof_join`` exactly: the payload struct leads
    with ``_ts``, so ``array_max`` picks the latest timestamp with the
    value columns as deterministic tiebreakers, and equal-ts right rows
    still win (inclusive ``<=``, DuckDB ASOF parity).

    The dimension-size contract is ENFORCED, not prose: a key whose mark
    timestamps span more than ``max_buckets_per_key`` buckets (the
    ``sequence`` explode fan-out) or that collects more than
    ``max_marks_per_key`` marks (the per-key array) raises a loud
    ASSERT_TRUE error at execution instead of building a degenerate
    broadcast or OOMing an executor. The check is an executor-side
    expression folded into the explode bound — zero extra jobs — and the
    error message redirects misuse to the windowed ``asof_join``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    value_cols = value_cols or [c for c in right.columns if c not in (*keys, ts)]
    rtypes = dict(right.dtypes)
    us = bucket_seconds * 1_000_000

    def axis(c):
        return c.cast("long") if rtypes[ts] in ("bigint", "int") else micros(c)

    # ONE shuffle of the (tiny) right side: everything per key in a
    # single row, then the per-bucket mark arrays unfold with
    # higher-order functions in a single codegen projection — no second
    # groupBy, no window, no spine join (stage-count parity with a
    # plain dimension broadcast).
    rk = (
        right.select(
            *keys,
            F.struct(
                F.col(ts).alias("_ts"), *[F.col(c) for c in value_cols]
            ).alias("_r"),
            F.floor(axis(F.col(ts)) / F.lit(us)).cast("long").alias("_mb"),
        )
        .groupBy(*keys)
        .agg(
            F.collect_list(F.struct("_mb", "_r")).alias("_all"),
            F.min("_mb").alias("_minb"),
            F.max("_mb").alias("_maxb"),
        )
    )
    bkt = F.col("_bkt")
    marks_here = F.transform(
        F.filter("_all", lambda x: x["_mb"] == bkt), lambda x: x["_r"]
    )
    # seed = latest mark from any EARLIER bucket (carried into this
    # bucket so a bucket with no marks of its own still matches)
    seed = F.array_max(
        F.transform(F.filter("_all", lambda x: x["_mb"] < bkt), lambda x: x["_r"])
    )
    # contract guard: assert_true returns NULL when the predicate holds,
    # so coalesce(guard, _maxb) IS _maxb on the happy path — but keeps
    # the assertion inside the used expression tree (column pruning
    # can't silently drop it) and raises per-key details on misuse.
    guard = F.assert_true(
        (F.col("_maxb") - F.col("_minb") <= F.lit(max_buckets_per_key))
        & (F.size("_all") <= F.lit(max_marks_per_key)),
        F.concat(
            F.lit(
                "asof_join_broadcast: right side violates the dimension-size "
                "contract for key span "
            ),
            (F.col("_maxb") - F.col("_minb")).cast("string"),
            F.lit(f" buckets (max {max_buckets_per_key}) / "),
            F.size("_all").cast("string"),
            F.lit(
                f" marks (max {max_marks_per_key}); widen bucket_seconds, "
                "raise the limits, or use the windowed asof_join for a "
                "fact-sized right side"
            ),
        ),
    ).cast("long")
    dim = (
        rk.select(
            *keys,
            "_all",
            F.explode(F.sequence("_minb", F.coalesce(guard, F.col("_maxb")))).alias("_bkt"),
        )
        .select(
            *keys,
            "_bkt",
            F.concat(marks_here, F.array_compact(F.array(seed))).alias("_arr"),
        )
    )

    # per-key bucket bounds broadcast-joined to the fact for CLAMPING:
    # a left bucket past the key's last right bucket clamps down (that
    # bucket's marks+seed contain the latest mark overall and the
    # filter keeps everything); one before the first clamps up (the
    # filter drops every mark → NULL, the correct no-match). Both fact
    # joins are broadcast-hash — the fact side never exchanges.
    bounds = rk.select(*keys, "_minb", "_maxb")
    lb = (
        left.join(F.broadcast(bounds), keys, "left")
        .withColumn(
            "_bkt",
            F.least(
                F.greatest(
                    F.floor(axis(F.col(ts)) / F.lit(us)).cast("long"), F.col("_minb")
                ),
                F.col("_maxb"),
            ),
        )
        .drop("_minb", "_maxb")
    )
    joined = lb.join(F.broadcast(dim), [*keys, "_bkt"], "left")
    ts_col = F.col(ts)
    match = F.array_max(F.filter(F.col("_arr"), lambda m: m["_ts"] <= ts_col))
    out = joined.withColumn("_match", match)
    for c in value_cols:
        out = out.withColumn(f"{suffix}{c}", F.col(f"_match.{c}"))
    out = out.withColumn(f"{suffix}ts", F.col("_match._ts"))
    return out.drop("_bkt", "_arr", "_all", "_match")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    ts: str,
    value_cols: Sequence[str] | None = None,
    suffix: str = "asofnext_",
    bucket_seconds: int | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """Forward as-of: attach the EARLIEST right row with
    ``right.ts >= left.ts`` (next-or-equal — e.g. "the calibration that
    will apply next", "the following maintenance event").

    Pure reduction, not a second implementation:
    forward-asof(ts) == backward-asof(-ts). Both sides gain a negated
    microsecond axis and run through ``asof_join`` — every scale
    property (skew-free (key, bucket) windows, seed carry, struct
    payload atomicity) is inherited, and a fix in one direction cannot
    miss the other. The right row's real timestamp rides as a value
    column and comes back as ``{suffix}ts``.

    ``broadcast_right=True`` routes the reduction through
    ``asof_join_broadcast`` (dimension-sized right side, fact table
    never shuffled/sorted); the negated-long axis composes with it
    unchanged.
    """
    keys = [key] if isinstance(key, str) else list(key)
    value_cols = value_cols or [c for c in right.columns if c not in (*keys, ts)]
    neg = "_neg_us"
    l2 = left.withColumn(neg, (-micros(F.col(ts))).cast("long"))
    r2 = right.withColumn(neg, (-micros(F.col(ts))).cast("long")).select(
        # right's real timestamp rides under a mangled name so it can't
        # collide with the axis output {suffix}ts
        *keys,
        neg,
        F.col(ts).alias("_rts"),
        *value_cols,
    )
    if broadcast_right:
        out = asof_join_broadcast(
            l2,
            r2,
            key=keys,
            ts=neg,
            value_cols=["_rts", *value_cols],
            suffix=suffix,
            bucket_seconds=bucket_seconds or 86_400,
        )
    else:
        out = asof_join(
            l2,
            r2,
            key=keys,
            ts=neg,
            value_cols=["_rts", *value_cols],
            suffix=suffix,
            bucket_seconds=bucket_seconds,
        )
    # {suffix}ts from asof_join is the negated axis; the real matched
    # timestamp is the mangled value column
    return (
        out.drop(f"{suffix}ts", neg)
        .withColumnRenamed(f"{suffix}_rts", f"{suffix}ts")
    )
