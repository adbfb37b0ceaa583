"""Top-K / latest-K per key and global top-k (SURVEY.md §2.5 A5, §2.6).

Reference: keep last 3 readings per device (lovemyair.js:127 slice(-3),
miri.js:132), first 12 rows of a daily file (iqair.js:140). Spark-first:
``row_number`` over a partitioned window — partial top-k happens map-side
per shuffle partition, so the shuffle carries only candidates.

Global top-k (orderBy().limit(k)) compiles to TakeOrderedAndProject —
no full sort at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """A5: K rows per key under a deterministic total order.

    ``order_by`` must be a *total* order (include a unique tiebreaker
    like event_id) or results are nondeterministic under retries — the
    reference's slice(-3) after array order has the same hidden
    assumption; we make it explicit.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)


def latest_per_key(
    df: DataFrame, keys: Sequence[str], ts_col: str, tiebreak: str
) -> DataFrame:
    """Latest reading per sensor — the k=1 special case."""
    return top_k_per_key(
        df, keys, [F.col(ts_col).desc(), F.col(tiebreak).desc()], 1
    )


def global_top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """O2-style order+limit → TakeOrderedAndProject physical op."""
    return df.orderBy(*order_by).limit(k)
