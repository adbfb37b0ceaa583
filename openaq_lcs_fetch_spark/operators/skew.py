"""Skew mitigation (SURVEY.md build-plan note: 'skewed keys → salting
or AQE skew-join').

AQE's skew-join split (enabled in session.RUNTIME_CONF) handles join
skew at runtime; these helpers cover the cases AQE doesn't: skewed
*aggregations* and deliberate pre-salting for known-hot keys (a
handful of sensors produce most readings — the air-quality reality).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _row_salt(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-row salt: pmod(hash(row content), buckets).

    Map-typed columns are excluded (Spark's hash() rejects MapType —
    maps have no canonical entry order). Determinism trade-off, on
    purpose: EXACT duplicate rows share a salt, so a hot key made of
    byte-identical repeats still skews — that input calls for a
    pre-aggregation (dup rows collapse into counts) rather than salting;
    for hot keys with varying payloads (the common case) content salt
    spreads them and, unlike F.rand, survives task retries and AQE
    re-plans with identical assignments."""
    def _has_map(dt: T.DataType) -> bool:
        # hash() rejects MapType at ANY nesting depth (struct fields,
        # array elements), not just top level
        if isinstance(dt, T.MapType):
            return True
        if isinstance(dt, T.ArrayType):
            return _has_map(dt.elementType)
        if isinstance(dt, T.StructType):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    cols = [F.col(f.name) for f in df.schema.fields if not _has_map(f.dataType)]
    if not cols:  # all-map row: fall back to a constant single bucket
        return F.lit(0)
    return F.pmod(F.hash(*cols), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation under key skew: partial agg on
    (keys, salt) — spreading each hot key over ``salt_buckets``
    reducers — then final agg on keys.

    ``aggs`` maps column → 'sum'|'count'|'min'|'max' (the re-aggregable
    functions; avg = sum+count composed by the caller).

    The salt is ``pmod(hash(all columns), buckets)`` — deterministic per
    row, so task retries and AQE re-plans re-derive identical salts
    (``F.rand`` is row-order-dependent and breaks exactly-once sinks
    downstream even when the aggregate itself is retry-safe).
    """
    if "_salt" in df.columns:
        raise ValueError(
            "salted_agg: input already has a '_salt' column — the salt "
            "would silently shadow it; rename the data column first"
        )
    salted = df.withColumn("_salt", _row_salt(df, salt_buckets))
    partial_aggs, final_aggs = [], []
    for col, how in aggs.items():
        p = f"_p_{col}_{how}"
        if how == "count":
            partial_aggs.append(F.count(col).alias(p))
            final_aggs.append(F.sum(p).alias(f"{how}_{col}"))
        elif how == "sum":
            partial_aggs.append(F.sum(col).alias(p))
            final_aggs.append(F.sum(p).alias(f"{how}_{col}"))
        elif how == "min":
            partial_aggs.append(F.min(col).alias(p))
            final_aggs.append(F.min(p).alias(f"{how}_{col}"))
        elif how == "max":
            partial_aggs.append(F.max(col).alias(p))
            final_aggs.append(F.max(p).alias(f"{how}_{col}"))
        else:
            raise ValueError(f"non-re-aggregable function {how!r}")
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Pre-salted equi-join for a known-hot join key: every fact row
    takes the deterministic content salt (same retry/AQE-replan
    stability argument as salted_agg), the DIMENSION side replicates
    ``salt_buckets``× (dimension-sized by contract, so the blow-up is
    bounded), and the join key becomes (key, _salt) — each hot key's
    rows spread over ``salt_buckets`` reducers instead of one. Use when
    the dim is too big to broadcast but the fact key is Zipfian; when
    the dim broadcasts, broadcast beats salting (no shuffle at all),
    and AQE's runtime skew split handles moderate skew without the
    dimension replication cost."""
    if "_salt" in fact.columns or "_salt" in dim.columns:
        raise ValueError(
            "salted_join: an input already has a '_salt' column — the "
            "salt would silently shadow it (and the final drop would "
            "remove the data column); rename it first"
        )
    salted_fact = fact.withColumn("_salt", _row_salt(fact, salt_buckets))
    rep_dim = dim.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt"),
    )
    return salted_fact.join(rep_dim, [key, "_salt"]).drop("_salt")
