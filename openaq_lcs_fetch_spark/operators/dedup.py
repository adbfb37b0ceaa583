"""Deduplication operators (SURVEY.md A7/A8/T4 + north-star exact dedup).

The reference dedups with first-wins maps (cmu.js:143-166 creates each
station once across files) and includes() guards (clarity.js:51-56).
Spark-first: deterministic first-per-key via window (dropDuplicates is
order-nondeterministic — unacceptable for a reproducible engine), and
content-hash grouping for corpus-scale exact dedup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def first_per_key(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """A7: deterministic first-wins dedup (reference upsert-map
    semantics). ``order_by`` defines which duplicate survives."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_on_append(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """A8: set-semantics distinct on the key columns only."""
    return df.select(*keys).distinct()


def dedup_events(
    df: DataFrame, keys: Sequence[str], tiebreak: str
) -> DataFrame:
    """T4: overlapping micro-batch dedup — keep min(tiebreak) per
    (entity, ts) key; reference relies on downstream dedup after its
    2-minute sliding re-reads (habitatmap.js:128-136)."""
    return first_per_key(df, keys, [F.col(tiebreak).asc()])


def exact_dedup_groups(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """North-star exact dedup: group by content hash, keep canonical id
    + duplicate count. Hash-groupBy shuffles digests (16 bytes/row), not
    documents — at 100 TB the map-side partial agg collapses dup groups
    before the shuffle.

    Output: (content_hash, keep_id, n_dups).
    """
    return (
        df.select(F.md5(F.col(content_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def drop_exact_dups(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep only the canonical (min-id) row of each exact-dup group."""
    return first_per_key(
        df.withColumn("_h", F.md5(F.col(content_col))),
        ["_h"],
        [F.col(id_col).asc()],
    ).drop("_h")


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """Distributed connected components by iterative min-label
    propagation — the clustering step that turns near-dup *pairs* into
    dedup *groups* (keep one doc per component). The algorithm is the
    standard Spark/GraphFrames shape: every node starts labeled with its
    own id; each round every node takes the min of its label and its
    neighbors' labels; fixpoint = min id of the component.

    Scale properties: each round is one shuffle join on node id (labels
    are (id, long) pairs — raw payloads never travel); rounds needed =
    graph diameter, and near-dup graphs are shallow (clusters of copies,
    not chains). Lineage is truncated per round with localCheckpoint so
    the plan does not grow with iterations; convergence is detected with
    an aggregated count (no data ever collects to the driver).
    Crucially, the iteration runs ONLY over the edge-endpoint vertices —
    a node with no edge can never change its label, and on a near-dup
    graph V(edges) ≪ corpus, so per-round shuffle cost is
    O(V_edges), not O(N); the (corpus-sized) singleton set joins in
    exactly once at the end as coalesce(label, own id). Measured at
    sf0.1 (5k docs, where V_edges ≈ N so the asymptotic gap cannot
    show): old 3.5–4.9 s vs new 4.3–4.4 s interleaved — neutral within
    run noise; the shape is kept for the 100 TB regime, where riding
    billions of never-changing singleton labels through every round's
    shuffle is the scale-killer this avoids.

    Returns (id_col, 'component') for every node; singletons map to
    themselves.
    """
    sym = edges.select(
        F.col(src_col).alias("_a"), F.col(dst_col).alias("_b")
    ).union(edges.select(F.col(dst_col).alias("_a"), F.col(src_col).alias("_b")))
    # materialize the edge list once — edge GENERATION (e.g. a jaccard
    # self-join) is usually the expensive part, and every round reuses
    # sym; without this each iteration would recompute it from scratch
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("_a").alias(id_col))
        .distinct()
        .select(F.col(id_col), F.col(id_col).alias("component"))
    )
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym["_b"] == labels[id_col])
            .groupBy("_a")
            .agg(F.min("component").alias("_nc"))
        )
        updated = (
            labels.join(neighbor_min, labels[id_col] == neighbor_min["_a"], "left")
            .select(
                labels[id_col],
                F.least(
                    F.col("component"), F.coalesce(F.col("_nc"), F.col("component"))
                ).alias("_new"),
                F.col("component"),
            )
        )
        # one materialization serves BOTH the convergence count and the
        # next round's labels (count + a separate checkpoint would run
        # the propagation join twice)
        updated = updated.localCheckpoint(eager=True)
        changed = updated.filter(F.col("_new") != F.col("component")).count()
        labels = updated.select(F.col(id_col), F.col("_new").alias("component"))
        if changed == 0:
            # single corpus-sized pass: singletons (no edge → label is
            # their own id) join the converged edge-vertex labels once
            return nodes.select(id_col).join(labels, id_col, "left").select(
                F.col(id_col),
                F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(component diameter exceeds max_iters) — returning partial labels "
        "would be silently wrong; raise max_iters"
    )
