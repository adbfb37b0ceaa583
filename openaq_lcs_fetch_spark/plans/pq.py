"""Product quantization (PQ) — the memory-bounded ANN scale path.

At 100 TB of embeddings, even IVF candidate lists can't hold raw
vectors in memory; PQ compresses each D-dim vector to M one-byte codes
(here M=4 subspaces × K=16 codes over the 64-dim embeddings) and
answers queries by asymmetric distance computation (ADC): the query's
M×K distance table is broadcast and a candidate's approximate distance
is M integer lookups — no raw vector ever touches the search path.

Same determinism scheme as kmeans_clusters (plans/simsearch.py):
integer-quantized vectors, codebooks initialized from the first K
vectors, exactly one Lloyd round per subspace with exact BIGINT sums
and a single floor-divide — so the DuckDB oracle replays the whole
build bit-for-bit.

Scale shape: the codebook build touches (vec_id, m, 16-dim subvector)
rows — the only shuffles are the (m, cid, pos) recenter aggregation
and the per-vector code assignment, both on small integer keys; search
is a broadcast-join + sum, linear in codes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similarity import cosine
from .registry import query, t
from .simsearch import _ivf_dists, _ivf_sql_ctes, _ivf_vecs, _quantized

_M = 4  # subspaces
_SUB = 16  # dims per subspace
_K = 16  # codes per codebook
_QID = 42  # ADC query vector


def _subvectors(vecs: DataFrame) -> DataFrame:
    """(vec_id, q) → (vec_id, m, subq): M narrow rows per vector."""
    subs = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(F.col("q"), m * _SUB + 1, _SUB).alias("subq"),
            )
            for m in range(_M)
        ]
    )
    return vecs.select("vec_id", F.explode(subs).alias("s")).select(
        "vec_id", "s.m", "s.subq"
    )


def _d2(a: str = "subq", b: str = "cq") -> F.Column:
    """Exact integer squared-L2 between two quantized subvector columns
    — THE distance definition; every Spark-side use must call this so a
    change (e.g. an overflow guard) lands everywhere at once."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(sub: DataFrame, cb: DataFrame) -> DataFrame:
    """Nearest code per (vec_id, m): join on m against the broadcast
    codebook (M*K rows), min_by (d2, cid)."""
    return (
        sub.join(F.broadcast(cb), "m")
        .withColumn("d2", _d2())
        .groupBy("vec_id", "m")
        .agg(F.min_by("cid", F.struct(F.col("d2"), F.col("cid"))).alias("cid"))
    )


def _recenter(sub: DataFrame, assign: DataFrame) -> DataFrame:
    """One Lloyd round per subspace: exact sums, floor mean."""
    dims = (
        sub.join(assign, ["vec_id", "m"])
        .select("m", "cid", F.posexplode("subq").alias("pos", "qc"))
        .groupBy("m", "cid", "pos")
        .agg(F.sum("qc").alias("s"), F.count(F.lit(1)).alias("n"))
        .withColumn(
            "c",
            F.floor(F.col("s").cast("double") / F.col("n").cast("double")).cast(
                "long"
            ),
        )
    )
    return dims.groupBy("m", "cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cq")
    )


def _build(spark: SparkSession, sf_dir: str):
    vecs = t(spark, sf_dir, "embeddings").select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    )
    # sub/cb1/codes each feed 2-3 downstream branches and each stage
    # composes the previous one, so the un-truncated logical tree
    # repeats the scan+explode subtree ~6x — Catalyst (re-)optimizing
    # that tree was ~0.5 s of a ~2 s query wall (guide §3.3 "very wide
    # plans: planning time itself becomes the bottleneck"; measured
    # r14: pq_search 1.88 -> 1.54 s with the three lazy truncations).
    # Lazy localCheckpoint: each is materialized once on first use and
    # every later branch re-reads the short RDD-backed plan instead.
    sub = _subvectors(vecs).localCheckpoint(eager=False)
    cb0 = sub.filter(F.col("vec_id") < _K).select(
        "m", F.col("vec_id").alias("cid"), F.col("subq").alias("cq")
    )
    a1 = _assign(sub, cb0)
    cb1 = _recenter(sub, a1).localCheckpoint(eager=False)
    codes = _assign(sub, cb1).localCheckpoint(eager=False)
    return sub, cb1, codes


# --- shared oracle CTEs -----------------------------------------------------

_SQL_D2 = (
    "list_sum(list_transform(generate_series(1, len(s.subq)), "
    "i -> (s.subq[i] - c.cq[i]) * (s.subq[i] - c.cq[i])))"
)

_SQL_BUILD = f"""
  qv AS (
    SELECT vec_id,
           list_transform(CAST(embedding AS DOUBLE[]),
                          x -> CAST(ROUND(x * 1000.0, 0) AS BIGINT)) AS q
    FROM embeddings
  ),
  ms AS (SELECT unnest(generate_series(0, {_M - 1})) AS m),
  sub AS (
    SELECT vec_id, m, q[m * {_SUB} + 1 : (m + 1) * {_SUB}] AS subq
    FROM qv CROSS JOIN ms
  ),
  cb0 AS (SELECT m, vec_id AS cid, subq AS cq FROM sub WHERE vec_id < {_K}),
  a1 AS (
    SELECT vec_id, m, cid FROM (
      SELECT s.vec_id, s.m, c.cid,
             row_number() OVER (
               PARTITION BY s.vec_id, s.m
               ORDER BY {_SQL_D2} ASC, c.cid ASC
             ) AS rn
      FROM sub s JOIN cb0 c USING (m)
    ) WHERE rn = 1
  ),
  cb1 AS (
    SELECT m, cid, list(c ORDER BY pos) AS cq FROM (
      SELECT m, cid, pos,
             CAST(FLOOR(CAST(SUM(qc) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
      FROM (
        SELECT a.m, a.cid, unnest(s.subq) AS qc,
               generate_subscripts(s.subq, 1) AS pos
        FROM sub s JOIN a1 a USING (vec_id, m)
      ) GROUP BY m, cid, pos
    ) GROUP BY m, cid
  ),
  codes AS (
    SELECT vec_id, m, cid FROM (
      SELECT s.vec_id, s.m, c.cid,
             row_number() OVER (
               PARTITION BY s.vec_id, s.m
               ORDER BY {_SQL_D2} ASC, c.cid ASC
             ) AS rn
      FROM sub s JOIN cb1 c USING (m)
    ) WHERE rn = 1
  )
"""

_PQ_CODES_ORACLE = f"""
WITH {_SQL_BUILD}
SELECT c.m, c.cid, COUNT(*) AS n,
       CAST(MIN(b.qsum) AS BIGINT) AS codeword_qsum
FROM codes c
JOIN (SELECT m, cid, list_sum(cq) AS qsum FROM cb1) b USING (m, cid)
GROUP BY c.m, c.cid
ORDER BY c.m, c.cid
"""


@query("pq_codes", _PQ_CODES_ORACLE)
def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codebook build + corpus encoding summary: per (subspace, code)
    the assigned-vector count and the codeword's component sum — the
    compact witness that 2000 × 64 dims compressed to 2000 × 4 codes
    identically on both engines."""
    _sub, cb1, codes = _build(spark, sf_dir)
    qsum = cb1.select(
        "m",
        "cid",
        F.aggregate(F.col("cq"), F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "qsum"
        ),
    )
    return (
        codes.join(F.broadcast(qsum), ["m", "cid"])
        .groupBy("m", "cid")
        .agg(F.count(F.lit(1)).alias("n"), F.min("qsum").alias("codeword_qsum"))
        .orderBy("m", "cid")
    )


_PQ_SEARCH_ORACLE = f"""
WITH {_SQL_BUILD},
qsub AS (SELECT m, subq FROM sub WHERE vec_id = {_QID}),
dtab AS (
  SELECT c.m, c.cid, {_SQL_D2.replace('s.subq', 'q.subq')} AS d
  FROM cb1 c JOIN qsub q USING (m)
)
SELECT c.vec_id, CAST(SUM(d.d) AS BIGINT) AS approx_d2
FROM codes c JOIN dtab d USING (m, cid)
WHERE c.vec_id <> {_QID}
GROUP BY c.vec_id
ORDER BY approx_d2 ASC, c.vec_id ASC
LIMIT 5
"""


@query("pq_search", _PQ_SEARCH_ORACLE)
def pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-5 for one query vector: broadcast the query's M×K
    integer distance table, join codes on (m, cid), sum — the candidate
    side touches only its 4 codes, never raw vectors."""
    sub, cb1, codes = _build(spark, sf_dir)
    qsub = sub.filter(F.col("vec_id") == _QID).select(
        "m", F.col("subq").alias("qsubq")
    )
    dtab = cb1.join(F.broadcast(qsub), "m").select(
        "m", "cid", _d2("qsubq", "cq").alias("d")
    )
    return (
        codes.filter(F.col("vec_id") != _QID)
        .join(F.broadcast(dtab), ["m", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("d").alias("approx_d2"))
        .orderBy(F.col("approx_d2").asc(), F.col("vec_id").asc())
        .limit(5)
    )


# ---------------------------------------------------------------------------
# ann_ivf_multicell — IVF with BUILD-side soft assignment: every data
# vector is stored in its 2 nearest cells (the mirror of query-side
# nprobe, plans/simsearch.py ann_ivf_probe2). A query probing a single
# cell still finds neighbours that sit just across a Voronoi boundary,
# at the cost of 2× index size — the standard recall/space trade.
# ---------------------------------------------------------------------------

_MC_QID = 42


def _mc_oracle() -> str:
    return f"""
WITH {_ivf_sql_ctes()},
stored AS (SELECT vec_id, label, v, cid FROM dists WHERE rn <= 2),
qcell AS (SELECT cid, v AS qv FROM assigned WHERE vec_id = {_MC_QID})
SELECT s.vec_id, s.label,
       ROUND(list_cosine_similarity(s.v, (SELECT qv FROM qcell)), 6) AS cos_sim
FROM stored s
WHERE s.cid = (SELECT cid FROM qcell) AND s.vec_id <> {_MC_QID}
ORDER BY cos_sim DESC, s.vec_id ASC
LIMIT 5
"""


@query("ann_ivf_multicell", _mc_oracle())
def ann_ivf_multicell(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    vecs = _ivf_vecs(spark, sf_dir)
    dists = _ivf_dists(vecs)
    w = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cid").asc())
    ranked = dists.withColumn("rn", F.row_number().over(w))
    # data → 2 cells; candidates within one probed cell are unique per
    # vec_id because a vector stores at most once per cell
    stored = (
        ranked.filter(F.col("rn") <= 2)
        .select("vec_id", "cid")
        .join(vecs.select("vec_id", "label", "v"), "vec_id")
    )
    qcell = (
        ranked.filter((F.col("vec_id") == _MC_QID) & (F.col("rn") == 1))
        .select(F.col("cid").alias("qcid"))
    )
    qv = vecs.filter(F.col("vec_id") == _MC_QID).select(F.col("v").alias("qv"))
    return (
        stored.filter(F.col("vec_id") != _MC_QID)
        .join(F.broadcast(qcell), F.col("cid") == F.col("qcid"), "left_semi")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(5)
    )


# ---------------------------------------------------------------------------
# ivf_pq_search — the PRODUCTION ANN composition (FAISS IVF-PQ shape):
# the IVF coarse quantizer bounds the candidate set to the probed cell
# (1/K of the corpus), PQ ADC bounds the per-candidate cost to M integer
# table lookups. Raw vectors appear in NEITHER stage of the search path:
# the cell membership is a (vec_id, cid) pair and the scoring touches
# only the 4 codes per candidate plus the broadcast M×K distance table.
# At 100 TB this is the only listed ANN variant whose search-time memory
# AND compute are both independent of vector dimensionality.
# ---------------------------------------------------------------------------


def _ivf_pq_oracle() -> str:
    return f"""
WITH {_ivf_sql_ctes()},
{_SQL_BUILD.lstrip()},
qc AS (SELECT cid AS qcid FROM assigned WHERE vec_id = {_QID}),
cellcand AS (
  SELECT vec_id, label FROM assigned
  WHERE cid = (SELECT qcid FROM qc) AND vec_id <> {_QID}
),
qsub AS (SELECT m, subq FROM sub WHERE vec_id = {_QID}),
dtab AS (
  SELECT c.m, c.cid, {_SQL_D2.replace('s.subq', 'q.subq')} AS d
  FROM cb1 c JOIN qsub q USING (m)
)
SELECT cc.vec_id, cc.label, CAST(SUM(d.d) AS BIGINT) AS approx_d2
FROM codes co JOIN cellcand cc USING (vec_id) JOIN dtab d USING (m, cid)
GROUP BY cc.vec_id, cc.label
ORDER BY approx_d2 ASC, cc.vec_id ASC
LIMIT 5
"""


@query("ivf_pq_search", _ivf_pq_oracle())
def ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .simsearch import _ivf_assigned, _ivf_dists, _ivf_vecs

    vecs = _ivf_vecs(spark, sf_dir)
    # assigned is consumed twice (query cell + candidates) and the plan
    # re-derives the centroid pass per consumer — but checkpointing it
    # MEASURED ~25% slower at sf0.1 (2.75 → 3.49 s steady-state): the
    # eager checkpoint job serializes what the two branches otherwise
    # pipeline, and the assignment pass is cheap relative to that
    # stall. Left un-materialized by measurement.
    assigned = _ivf_assigned(vecs, _ivf_dists(vecs))
    sub, cb1, codes = _build(spark, sf_dir)
    qcell = assigned.filter(F.col("vec_id") == _QID).select(
        F.col("cid").alias("qcid")
    )
    cellcand = (
        assigned.filter(F.col("vec_id") != _QID)
        .join(F.broadcast(qcell), F.col("cid") == F.col("qcid"), "left_semi")
        .select("vec_id", "label")
    )
    qsub = sub.filter(F.col("vec_id") == _QID).select(
        "m", F.col("subq").alias("qsubq")
    )
    dtab = cb1.join(F.broadcast(qsub), "m").select(
        "m", "cid", _d2("qsubq", "cq").alias("d")
    )
    return (
        codes.join(cellcand, "vec_id")
        .join(F.broadcast(dtab), ["m", "cid"])
        .groupBy("vec_id", "label")
        .agg(F.sum("d").alias("approx_d2"))
        .orderBy(F.col("approx_d2").asc(), F.col("vec_id").asc())
        .limit(5)
    )
