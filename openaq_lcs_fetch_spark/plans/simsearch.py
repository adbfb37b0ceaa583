"""North-star similarity-search queries over ``embeddings``.

Two paths per BASELINE.json:
* brute-force cosine top-k — the correctness baseline (one broadcast of
  the query vector, a narrow map, then TakeOrderedAndProject);
* LSH-bucketed ANN — the 100 TB path (bucket assignment is a narrow
  map; search touches one bucket instead of the corpus).

Cross-engine determinism: bucket math is *integer-quantized* (round
(x·1000) per component) so Spark and DuckDB agree bit-for-bit; cosine
uses double folds rounded to 6 places.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similarity import cosine
from .registry import query, t

_N_PLANES = 8
_MULT = 2654435761  # Knuth multiplicative constant — any fixed odd works


def _quantized(col):
    """array<float> → array<long> with components round(x*1000)."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * F.lit(1000.0), 0).cast("long")
    )


def _plane_coeff_sql(j: int) -> str:
    """Integer hyperplane component for plane j at 1-based index i."""
    return f"(((i * {j + 1} * {_MULT}) % 1000) - 500)"


def _plane_dot(qcol, j: int):
    """Spark twin of _plane_coeff_sql: exact integer dot product."""
    prods = F.transform(
        qcol,
        lambda x, i: x
        * (((i + F.lit(1)) * F.lit(j + 1) * F.lit(_MULT)) % F.lit(1000) - F.lit(500)),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def _bucket_expr(qcol):
    """Sign-bit bucket id over all hyperplanes (shared by every LSH
    query so the hash definition cannot drift between them)."""
    bucket = F.lit(0).cast("long")
    for j in range(_N_PLANES):
        bucket = bucket + F.when(_plane_dot(qcol, j) >= 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        ).cast("long")
    return bucket


# ---------------------------------------------------------------------------
# cosine_topk — brute-force top-10 neighbours of vec_id 0
# ---------------------------------------------------------------------------

_COSINE_TOPK_ORACLE = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label,
       ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6) AS cos_sim
FROM embeddings
WHERE vec_id <> 0
ORDER BY cos_sim DESC, vec_id ASC
LIMIT 10
"""


@query("cosine_topk", _COSINE_TOPK_ORACLE)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(
                cosine(F.col("embedding").cast("array<double>"), F.col("qv")), 6
            ).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(10)


# ---------------------------------------------------------------------------
# ann_lsh_buckets — random-hyperplane LSH bucket per vector (integer-exact)
# ---------------------------------------------------------------------------


def _ann_oracle() -> str:
    dots = ", ".join(
        f"list_sum(list_transform(q, (x, i) -> x * {_plane_coeff_sql(j)})) AS d{j}"
        for j in range(_N_PLANES)
    )
    acc = " + ".join(
        f"CASE WHEN d{j} >= 0 THEN {1 << j} ELSE 0 END" for j in range(_N_PLANES)
    )
    return f"""
WITH qv AS (
  SELECT vec_id, label,
         list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(ROUND(x * 1000.0, 0) AS BIGINT)) AS q
  FROM embeddings
),
dots AS (SELECT vec_id, label, {dots} FROM qv)
SELECT vec_id, label, CAST({acc} AS BIGINT) AS bucket FROM dots
"""


@query("ann_lsh_buckets", _ann_oracle())
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    qcol = _quantized(F.col("embedding"))
    df = e.select("vec_id", "label", qcol.alias("q"))
    return df.select("vec_id", "label", _bucket_expr(F.col("q")).alias("bucket"))


# ---------------------------------------------------------------------------
# ann_bucket_search — the scale path end-to-end: restrict candidate set to
# the query vector's bucket, then exact cosine top-5 inside it.
# ---------------------------------------------------------------------------


def _ann_search_oracle() -> str:
    inner = _ann_oracle().strip()
    return f"""
WITH buckets AS ({inner}),
qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT e.vec_id, e.label, CAST(e.embedding AS DOUBLE[]) AS v
  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
  WHERE b.bucket = (SELECT bucket FROM qb) AND e.vec_id <> 0
)
SELECT vec_id, label,
       ROUND(list_cosine_similarity(v, (SELECT qvec FROM qv)), 6) AS cos_sim
FROM cand
ORDER BY cos_sim DESC, vec_id ASC
LIMIT 5
"""


@query("ann_bucket_search", _ann_search_oracle())
def ann_bucket_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    qcol = _quantized(F.col("embedding"))
    df = e.select("vec_id", "label", "embedding", qcol.alias("q"))
    with_bucket = df.select(
        "vec_id", "label", "embedding", _bucket_expr(F.col("q")).alias("bucket")
    )
    qrow = with_bucket.filter(F.col("vec_id") == 0).select(
        F.col("bucket").alias("qbucket"),
        F.col("embedding").cast("array<double>").alias("qvec"),
    )
    cand = (
        with_bucket.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qrow))
        .filter(F.col("bucket") == F.col("qbucket"))
    )
    scored = cand.select(
        "vec_id",
        "label",
        F.round(cosine(F.col("embedding").cast("array<double>"), F.col("qvec")), 6).alias(
            "cos_sim"
        ),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(5)


# ---------------------------------------------------------------------------
# label_centroids — distributed elementwise vector aggregation, integer-exact
# (posexplode → groupBy(label, dim) → sum), shuffle carries scalars.
# ---------------------------------------------------------------------------

_CENTROID_ORACLE = """
SELECT label, i AS dim, CAST(SUM(qc) AS BIGINT) AS sum_q, COUNT(*) AS n
FROM (
  SELECT label,
         unnest(list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(ROUND(x * 1000.0, 0) AS BIGINT))) AS qc,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
)
GROUP BY label, i
"""


@query("label_centroids", _CENTROID_ORACLE)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode(_quantized(F.col("embedding"))).alias("pos", "qc")
    )
    return (
        exploded.groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(F.sum("qc").alias("sum_q"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# embedding_norms — per-vector L2 norm over quantized components (exact
# integer dot, then one deterministic sqrt)
# ---------------------------------------------------------------------------

_NORMS_ORACLE = """
SELECT vec_id, label,
       ROUND(SQRT(CAST(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(ROUND(x * 1000.0, 0) AS BIGINT) * CAST(ROUND(x * 1000.0, 0) AS BIGINT))) AS DOUBLE)) / 1000.0, 6) AS l2_norm
FROM embeddings
"""


@query("embedding_norms", _NORMS_ORACLE)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    q = _quantized(F.col("embedding"))
    dot_qq = F.aggregate(
        F.transform(q, lambda x: x * x), F.lit(0).cast("long"), lambda a, v: a + v
    )
    return e.select(
        "vec_id",
        "label",
        F.round(F.sqrt(dot_qq.cast("double")) / F.lit(1000.0), 6).alias("l2_norm"),
    )


# ---------------------------------------------------------------------------
# ann_ivf_search — IVF variant of ANN: K fixed coarse centroids (the
# quantized vectors of vec_id 0..7 — deterministic 'training'), each
# vector assigned to its nearest centroid by exact integer L2, search
# only the query's cell. At 100 TB: centroids broadcast, assignment is
# a narrow map, each probe touches 1/K of the corpus.
# ---------------------------------------------------------------------------

_IVF_K = 8


def _ivf_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, v double[], q quantized) — IVF working set."""
    return t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
        _quantized(F.col("embedding")).alias("q"),
    )


def _ivf_dists(vecs: DataFrame) -> DataFrame:
    """Exact integer squared-L2 from every vector to every broadcast
    centroid (the first _IVF_K vec_ids) — shared by single-probe and
    multi-probe search so the distance/tie-break definition cannot
    drift between them. The heavy double vector never rides through
    this join (narrow-map assignment at scale)."""
    cent = vecs.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cq")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("q"), F.col("cq"), lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return vecs.select("vec_id", "q").crossJoin(F.broadcast(cent)).withColumn("d2", d2)


def _ivf_assigned(vecs: DataFrame, dists: DataFrame) -> DataFrame:
    """Nearest-cell assignment: min_by over struct(d2, cid) — map-side
    partial agg collapses the K candidate rows per vector BEFORE any
    shuffle."""
    cell = dists.groupBy("vec_id").agg(
        F.min_by("cid", F.struct(F.col("d2"), F.col("cid"))).alias("cid")
    )
    return vecs.select("vec_id", "label", "v").join(cell, "vec_id")


def _sql_qvec(expr: str) -> str:
    return f"list_transform(CAST({expr} AS DOUBLE[]), x -> CAST(ROUND(x * 1000.0, 0) AS BIGINT))"


def _ivf_sql_ctes() -> str:
    """Shared cent/vecs/dists/assigned CTEs — single source of truth for
    the oracle-side IVF assignment (mirrors _ivf_dists/_ivf_assigned)."""
    return f"""cent AS (
  SELECT vec_id AS cid, {_sql_qvec('embedding')} AS cq
  FROM embeddings WHERE vec_id < {_IVF_K}
),
vecs AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v, {_sql_qvec('embedding')} AS q
  FROM embeddings
),
dists AS (
  SELECT v.vec_id, v.label, v.v, c.cid,
         row_number() OVER (PARTITION BY v.vec_id ORDER BY
           list_sum(list_transform(v.q, (x, i) -> (x - c.cq[i]) * (x - c.cq[i]))) ASC,
           c.cid ASC) AS rn
  FROM vecs v, cent c
),
assigned AS (SELECT vec_id, label, v, cid FROM dists WHERE rn = 1)"""


def _ivf_oracle() -> str:
    return f"""
WITH {_ivf_sql_ctes()},
qcell AS (SELECT cid, v AS qv FROM assigned WHERE vec_id = 42)
SELECT a.vec_id, a.label,
       ROUND(list_cosine_similarity(a.v, (SELECT qv FROM qcell)), 6) AS cos_sim
FROM assigned a
WHERE a.cid = (SELECT cid FROM qcell) AND a.vec_id <> 42
ORDER BY cos_sim DESC, a.vec_id ASC
LIMIT 5
"""


@query("ann_ivf_search", _ivf_oracle())
def ann_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _ivf_vecs(spark, sf_dir)
    assigned = _ivf_assigned(vecs, _ivf_dists(vecs))
    qcell = assigned.filter(F.col("vec_id") == 42).select(
        F.col("cid").alias("qcid"), F.col("v").alias("qv")
    )
    cand = (
        assigned.filter(F.col("vec_id") != 42)
        .crossJoin(F.broadcast(qcell))
        .filter(F.col("cid") == F.col("qcid"))
    )
    return (
        cand.select(
            "vec_id", "label", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(5)
    )


# ---------------------------------------------------------------------------
# ann_multiprobe_search — multi-probe LSH: probe the query's bucket PLUS
# every bucket at Hamming distance 1 (flip one hyperplane bit), then
# exact cosine top-5 over the union. Near-boundary neighbours that
# single-bucket search misses land one bit away, so this buys recall
# without doubling the number of hash tables. The probe test is a pure
# bit trick on the already-computed bucket ids — d = bucket XOR qbucket
# is 0 (same bucket) or a power of two (one flipped plane) — so the
# candidate filter stays a narrow map over the bucketed scan; at scale
# the probe set is n_planes+1 bucket keys pushed into the bucket index.
# ---------------------------------------------------------------------------


def _multiprobe_oracle() -> str:
    inner = _ann_oracle().strip()
    return f"""
WITH buckets AS ({inner}),
qb AS (SELECT bucket FROM buckets WHERE vec_id = 0),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT e.vec_id, e.label, CAST(e.embedding AS DOUBLE[]) AS v
  FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
  CROSS JOIN qb
  WHERE e.vec_id <> 0
    AND (xor(b.bucket, qb.bucket) = 0
         OR (xor(b.bucket, qb.bucket) & (xor(b.bucket, qb.bucket) - 1)) = 0)
)
SELECT vec_id, label,
       ROUND(list_cosine_similarity(v, (SELECT qvec FROM qv)), 6) AS cos_sim
FROM cand
ORDER BY cos_sim DESC, vec_id ASC
LIMIT 5
"""


@query("ann_multiprobe_search", _multiprobe_oracle())
def ann_multiprobe_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    df = e.select(
        "vec_id", "label", "embedding", _quantized(F.col("embedding")).alias("q")
    )
    with_bucket = df.select(
        "vec_id", "label", "embedding", _bucket_expr(F.col("q")).alias("bucket")
    )
    qrow = with_bucket.filter(F.col("vec_id") == 0).select(
        F.col("bucket").alias("qbucket"),
        F.col("embedding").cast("array<double>").alias("qvec"),
    )
    d = F.col("bucket").bitwiseXOR(F.col("qbucket"))
    cand = (
        with_bucket.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qrow))
        .filter((d == 0) | (d.bitwiseAND(d - 1) == 0))
    )
    return (
        cand.select(
            "vec_id",
            "label",
            F.round(
                cosine(F.col("embedding").cast("array<double>"), F.col("qvec")), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(5)
    )


# ---------------------------------------------------------------------------
# kmeans_clusters — iterative algorithm (Lloyd's k-means, 2 iterations,
# K=8) done Spark-first: centroids live in a DataFrame the whole time
# (broadcast into assignment, rebuilt by aggregation — never a driver
# collect loop). Determinism across engines: vectors are integer-
# quantized; squared-L2 and component sums are exact BIGINT; the only
# division (centroid mean) is one IEEE double divide + floor, identical
# bit-for-bit in Spark and DuckDB. The oracle unrolls both iterations
# as CTEs. At scale each iteration is one narrow map (K broadcast
# centroids) + one posexplode aggregation — the classic Spark k-means
# shape, linear in data, no shuffle of raw vectors beyond the dim sums.
# ---------------------------------------------------------------------------

_KM_K = 8


def _km_assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, q) × broadcast centroids → (vec_id, cid) by min (d2, cid)."""
    d2 = F.aggregate(
        F.zip_with(F.col("q"), F.col("cq"), lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("d2", d2)
        .groupBy("vec_id")
        .agg(F.min_by("cid", F.struct(F.col("d2"), F.col("cid"))).alias("cid"))
    )


def _km_recenter(vecs: DataFrame, assign: DataFrame) -> DataFrame:
    """Mean (floor of exact sums) per cluster, rebuilt as array<long>."""
    dims = (
        vecs.join(assign, "vec_id")
        .select("cid", F.posexplode("q").alias("pos", "qc"))
        .groupBy("cid", "pos")
        .agg(F.sum("qc").alias("s"), F.count(F.lit(1)).alias("n"))
        .withColumn(
            "m",
            F.floor(F.col("s").cast("double") / F.col("n").cast("double")).cast("long"),
        )
    )
    return dims.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("cq")
    )


def _km_sql_assign(vec_cte: str, cent_cte: str) -> str:
    """DuckDB twin of _km_assign (1-based list indexing)."""
    return f"""
SELECT vec_id, cid FROM (
  SELECT v.vec_id, c.cid,
         row_number() OVER (
           PARTITION BY v.vec_id
           ORDER BY list_sum(list_transform(generate_series(1, len(v.q)),
                    i -> (v.q[i] - c.cq[i]) * (v.q[i] - c.cq[i]))) ASC, c.cid ASC
         ) AS rn
  FROM {vec_cte} v CROSS JOIN {cent_cte} c
) WHERE rn = 1
"""


def _km_sql_recenter(vec_cte: str, assign_cte: str) -> str:
    return f"""
SELECT cid, list(m ORDER BY pos) AS cq FROM (
  SELECT cid, pos, CAST(FLOOR(CAST(SUM(qc) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
  FROM (
    SELECT a.cid, unnest(v.q) AS qc, generate_subscripts(v.q, 1) AS pos
    FROM {vec_cte} v JOIN {assign_cte} a USING (vec_id)
  ) GROUP BY cid, pos
) GROUP BY cid
"""


def _kmeans_oracle() -> str:
    return f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(ROUND(x * 1000.0, 0) AS BIGINT)) AS q
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, q AS cq FROM qv WHERE vec_id < {_KM_K}),
a1 AS ({_km_sql_assign('qv', 'c0')}),
c1 AS ({_km_sql_recenter('qv', 'a1')}),
a2 AS ({_km_sql_assign('qv', 'c1')})
SELECT a2.cid, COUNT(*) AS n,
       CAST(MIN(c1.csum) AS BIGINT) AS centroid_qsum
FROM a2 JOIN (SELECT cid, list_sum(cq) AS csum FROM c1) c1 USING (cid)
GROUP BY a2.cid
ORDER BY a2.cid
"""


@query("kmeans_clusters", _kmeans_oracle())
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    # vecs feeds both assignment passes and the recenter — lazy
    # checkpoint scans the table once; c1 (k rows) roots the a2/csum
    # diamond, and without its checkpoint each consumer re-expands the
    # whole assign+recenter subtree (measured: 7 parquet scans → 0,
    # 1.75 → 1.46 s at sf0.1, identical output)
    vecs = e.select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    ).localCheckpoint(eager=False)
    cents = vecs.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cq")
    )
    a1 = _km_assign(vecs, cents)
    c1 = _km_recenter(vecs, a1).localCheckpoint()
    a2 = _km_assign(vecs, c1)
    csum = c1.select(
        "cid",
        F.aggregate(F.col("cq"), F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "csum"
        ),
    )
    return (
        a2.join(csum, "cid")
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"), F.min("csum").alias("centroid_qsum"))
        .orderBy("cid")
    )


# ---------------------------------------------------------------------------
# ann_ivf_probe2 — IVF with nprobe=2: data vectors stay in their single
# nearest cell, but the QUERY probes its 2 nearest cells — the standard
# recall lever (a query near a Voronoi boundary finds neighbours that
# fell just across it). Candidate volume is 2/K of the corpus; the
# probe-cell pair is computed once from the broadcast centroids.
# ---------------------------------------------------------------------------


def _ivf_probe2_oracle() -> str:
    return f"""
WITH {_ivf_sql_ctes()},
qprobe AS (SELECT cid FROM dists WHERE vec_id = 42 AND rn <= 2),
qv AS (SELECT v AS qv FROM assigned WHERE vec_id = 42)
SELECT a.vec_id, a.label,
       ROUND(list_cosine_similarity(a.v, (SELECT qv FROM qv)), 6) AS cos_sim
FROM assigned a
WHERE a.cid IN (SELECT cid FROM qprobe) AND a.vec_id <> 42
ORDER BY cos_sim DESC, a.vec_id ASC
LIMIT 5
"""


@query("ann_ivf_probe2", _ivf_probe2_oracle())
def ann_ivf_probe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _ivf_vecs(spark, sf_dir)
    dists = _ivf_dists(vecs)
    # data → 1 cell (shared helper); query → 2 cells (top-2 window over
    # the K broadcast candidates of one vector — trivial volume)
    assigned = _ivf_assigned(vecs, dists)
    from pyspark.sql import Window

    wq = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cid").asc())
    qprobe = (
        dists.filter(F.col("vec_id") == 42)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 2)
        .select(F.col("cid").alias("qcid"))
    )
    qv = assigned.filter(F.col("vec_id") == 42).select(F.col("v").alias("qv"))
    cand = (
        assigned.filter(F.col("vec_id") != 42)
        .join(F.broadcast(qprobe), F.col("cid") == F.col("qcid"), "left_semi")
        .crossJoin(F.broadcast(qv))
    )
    return (
        cand.select(
            "vec_id", "label", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(5)
    )


# ---------------------------------------------------------------------------
# semantic_dedup — SemDeDup-style embedding dedup: k-means cells bound
# the candidate set (only same-cell pairs are compared — the scale
# contract: pair volume is sum over cells of C(n_c, 2), never C(N, 2)),
# then exact cosine verifies each candidate. The LSH twin is
# embedding_near_dups (windows_q.py); together they cover both standard
# candidate generators for embedding-space dedup.
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU = 0.3


def _semantic_dedup_oracle() -> str:
    return f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(ROUND(x * 1000.0, 0) AS BIGINT)) AS q
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, q AS cq FROM qv WHERE vec_id < {_KM_K}),
a1 AS ({_km_sql_assign('qv', 'c0')}),
ve AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT x.cid, x.vec_id AS id_a, y.vec_id AS id_b,
       ROUND(list_cosine_similarity(vx.v, vy.v), 6) AS cos_sim
FROM a1 x JOIN a1 y ON x.cid = y.cid AND x.vec_id < y.vec_id
JOIN ve vx ON vx.vec_id = x.vec_id
JOIN ve vy ON vy.vec_id = y.vec_id
WHERE ROUND(list_cosine_similarity(vx.v, vy.v), 6) >= {_SEMDEDUP_TAU}
"""


@query("semantic_dedup", _semantic_dedup_oracle())
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id",
        _quantized(F.col("embedding")).alias("q"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    cents = vecs.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cq")
    )
    assign = _km_assign(vecs.select("vec_id", "q"), cents)
    # checkpoint: the cell assignment feeds BOTH sides of the self-join.
    # The vector NORM is precomputed per vector here — cosine(a, b)
    # recomputes both norms per PAIR (O(d) each), and pair volume is
    # quadratic in cell size; dot/(na*nb) is the bitwise-identical
    # arithmetic at a third of the flops.
    from ..functions.similarity import dot, norm

    cell = (
        vecs.select("vec_id", "v", norm(F.col("v")).alias("nrm"))
        .join(assign, "vec_id")
        .localCheckpoint(eager=True)
    )
    a, b = cell.alias("a"), cell.alias("b")
    cand = a.join(b, "cid").filter(F.col("a.vec_id") < F.col("b.vec_id"))
    scored = cand.select(
        "cid",
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        F.round(
            dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")), 6
        ).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= _SEMDEDUP_TAU)


# ---------------------------------------------------------------------------
# ann_recall_eval — recall@5 of the IVF single-probe search against the
# exact brute-force top-5 (query vec 42): THE quality gate every ANN
# deployment runs before trading exactness for speed. Both rankings are
# built from the same assigned/cosine definitions as ann_ivf_search /
# cosine_topk, so the metric measures the INDEX (cell pruning), not
# arithmetic drift. Output is one row: n_hits, recall_at_5.
# ---------------------------------------------------------------------------


def _recall_oracle() -> str:
    return f"""
WITH {_ivf_sql_ctes()},
qcell AS (SELECT cid, v AS qv FROM assigned WHERE vec_id = 42),
exact AS (
  SELECT a.vec_id FROM assigned a
  WHERE a.vec_id <> 42
  ORDER BY ROUND(list_cosine_similarity(a.v, (SELECT qv FROM qcell)), 6) DESC,
           a.vec_id ASC
  LIMIT 5
),
ivf AS (
  SELECT a.vec_id FROM assigned a
  WHERE a.cid = (SELECT cid FROM qcell) AND a.vec_id <> 42
  ORDER BY ROUND(list_cosine_similarity(a.v, (SELECT qv FROM qcell)), 6) DESC,
           a.vec_id ASC
  LIMIT 5
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_hits,
       CAST(COUNT(*) AS DOUBLE) / 5.0 AS recall_at_5
FROM exact JOIN ivf USING (vec_id)
"""


@query("ann_recall_eval", _recall_oracle())
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _ivf_vecs(spark, sf_dir)
    assigned = _ivf_assigned(vecs, _ivf_dists(vecs)).localCheckpoint(eager=True)
    qcell = assigned.filter(F.col("vec_id") == 42).select(
        F.col("cid").alias("qcid"), F.col("v").alias("qv")
    )
    scored = (
        assigned.filter(F.col("vec_id") != 42)
        .crossJoin(F.broadcast(qcell))
        .select(
            "vec_id",
            "cid",
            "qcid",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .localCheckpoint(eager=True)  # one scoring pass feeds both rankings
    )
    exact = scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(5)
    ivf = (
        scored.filter(F.col("cid") == F.col("qcid"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(5)
    )
    return exact.join(ivf.select("vec_id"), "vec_id", "left_semi").agg(
        F.count(F.lit(1)).alias("n_hits"),
        (F.count(F.lit(1)).cast("double") / F.lit(5.0)).alias("recall_at_5"),
    )


# ---------------------------------------------------------------------------
# ann_rerank — the RETRIEVE → RERANK production shape: the IVF index
# proposes a cheap top-20 (JVM-side, codes/cells), then a "cross-encoder"
# scores each (query, candidate) pair in an Arrow-batched mapInPandas
# stage and the final top-5 orders by a blend of retrieval and model
# score. This is the model-in-the-loop pattern every training-data
# pipeline runs (model-based quality filtering, rerank-before-label):
# the expensive model touches only the CANDIDATE count, never the
# corpus, and rides the same Arrow batch path as the multimodal ops.
# The model here is the deterministic fake (md5-derived score in
# [0, 1)) — the real-model boundary is the same env-gated stance as
# functions.multimodal.decode_stub; the fake is SQL-replayable, so the
# whole retrieve→rerank plan is oracle-verified end to end.
#
# Parity scheme: BOTH scores live as integer micro-units (cos_q =
# round(cos·1e6), model_q = md5-mod), the blend is their exact BIGINT
# sum, and every surfaced double is ONE correctly-rounded division of
# an exact integer. Never round a sum of already-rounded doubles: a
# blend landing exactly on a .5e-6 boundary rounds differently across
# engines (observed at sf0.001).
# ---------------------------------------------------------------------------

_RERANK_QID = 42
_RETRIEVE_K = 20
_FINAL_K = 5


def _fake_model_q_sql(vid: str = "vec_id", lbl: str = "label") -> str:
    """Integer micro-unit model score (0..999999)."""
    return (
        f"(('0x' || substr(md5(CAST({vid} AS VARCHAR) || ':' "
        f"|| CAST({lbl} AS VARCHAR) || ':rerank'), 1, 15))::BIGINT % 1000000)"
    )


def _rerank_oracle() -> str:
    return f"""
WITH {_ivf_sql_ctes()},
qcell AS (SELECT cid, v AS qv FROM assigned WHERE vec_id = {_RERANK_QID}),
retrieved AS (
  SELECT a.vec_id, a.label,
         CAST(ROUND(list_cosine_similarity(a.v, (SELECT qv FROM qcell))
                    * 1000000.0, 0) AS BIGINT) AS cos_q
  FROM assigned a
  WHERE a.cid = (SELECT cid FROM qcell) AND a.vec_id <> {_RERANK_QID}
  ORDER BY cos_q DESC, a.vec_id ASC
  LIMIT {_RETRIEVE_K}
),
reranked AS (
  SELECT vec_id, label, cos_q, {_fake_model_q_sql()} AS model_q
  FROM retrieved
)
SELECT vec_id, label,
       CAST(cos_q AS DOUBLE) / 1000000.0 AS cos_sim,
       CAST(model_q AS DOUBLE) / 1000000.0 AS model_score,
       CAST(cos_q + model_q AS DOUBLE) / 2000000.0 AS final_score
FROM reranked
ORDER BY cos_q + model_q DESC, vec_id ASC
LIMIT {_FINAL_K}
"""


@query("ann_rerank", _rerank_oracle())
def ann_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    from collections.abc import Iterator

    import pandas as pd

    vecs = _ivf_vecs(spark, sf_dir)
    assigned = _ivf_assigned(vecs, _ivf_dists(vecs))
    qcell = assigned.filter(F.col("vec_id") == _RERANK_QID).select(
        F.col("cid").alias("qcid"), F.col("v").alias("qv")
    )
    retrieved = (
        assigned.filter(F.col("vec_id") != _RERANK_QID)
        .crossJoin(F.broadcast(qcell))
        .filter(F.col("cid") == F.col("qcid"))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("v"), F.col("qv")) * 1_000_000.0, 0)
            .cast("long")
            .alias("cos_q"),
        )
        .orderBy(F.col("cos_q").desc(), F.col("vec_id").asc())
        .limit(_RETRIEVE_K)
    )

    def model(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        # stand-in for a cross-encoder forward pass: one Arrow batch in,
        # one scored batch out; replace the body with real inference and
        # the plan does not change
        for pdf in batches:
            keys = (
                pdf["vec_id"].astype(str) + ":" + pdf["label"].astype(str) + ":rerank"
            )
            pdf = pdf.copy()
            pdf["model_q"] = [
                int(hashlib.md5(k.encode()).hexdigest()[:15], 16) % 1_000_000
                for k in keys
            ]
            yield pdf

    scored = retrieved.mapInPandas(
        model, "vec_id long, label int, cos_q long, model_q long"
    )
    return (
        scored.orderBy(
            (F.col("cos_q") + F.col("model_q")).desc(), F.col("vec_id").asc()
        )
        .limit(_FINAL_K)
        .select(
            "vec_id",
            "label",
            (F.col("cos_q").cast("double") / 1_000_000.0).alias("cos_sim"),
            (F.col("model_q").cast("double") / 1_000_000.0).alias("model_score"),
            (
                (F.col("cos_q") + F.col("model_q")).cast("double") / 2_000_000.0
            ).alias("final_score"),
        )
    )


# ---------------------------------------------------------------------------
# embedding_dim_stats — per-DIMENSION standardization statistics + the
# applied rescale (the feature-prep pass before training / indexing:
# z-score normalize each embedding dimension, flag outliers). Exactness
# scheme: moments accumulate as BIGINT sums of the integer-quantized
# components (sum and sum-of-squares are order-independent), mean/std
# derive from the two exact integers in scalar double math, and the
# outlier test ((x-mean)^2 > 4*var) compares the same doubles on both
# engines. The stats table is 64 rows → broadcast back for the applied
# pass; at 100 TB this is two map-only scans plus one 64-key aggregate.
# ---------------------------------------------------------------------------


def _dim_stats_oracle() -> str:
    return f"""
WITH qv AS (
  SELECT vec_id, {_sql_qvec('embedding')} AS q FROM embeddings
),
comp AS (
  SELECT vec_id, unnest(q) AS qc, generate_subscripts(q, 1) AS pos FROM qv
),
stats AS (
  SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(qc) AS BIGINT) AS s1,
         CAST(SUM(qc * qc) AS BIGINT) AS s2
  FROM comp GROUP BY pos
),
derived AS (
  SELECT pos, n, s1, s2,
         CAST(s1 AS DOUBLE) / n AS mean_q,
         sqrt(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS std_q
  FROM stats
)
SELECT d.pos, d.n,
       ROUND(d.mean_q, 6) AS mean_q, ROUND(d.std_q, 6) AS std_q,
       CAST(COUNT(CASE WHEN (c.qc - d.mean_q) * (c.qc - d.mean_q)
                            > 4 * d.std_q * d.std_q THEN 1 END) AS BIGINT)
         AS n_outliers
FROM comp c JOIN derived d USING (pos)
GROUP BY d.pos, d.n, d.mean_q, d.std_q
ORDER BY d.pos
"""


@query("embedding_dim_stats", _dim_stats_oracle())
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    )
    comp = e.select("vec_id", F.posexplode("q").alias("pos0", "qc")).select(
        (F.col("pos0") + 1).alias("pos"), "qc"  # 1-based to match SQL subscripts
    )
    stats = comp.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qc").alias("s1"),
        F.sum(F.col("qc") * F.col("qc")).alias("s2"),
    )
    mean_q = F.col("s1").cast("double") / F.col("n")
    std_q = F.sqrt(
        F.col("s2").cast("double") / F.col("n") - mean_q * mean_q
    )
    derived = stats.select("pos", "n", mean_q.alias("mean_q"), std_q.alias("std_q"))
    out = (
        comp.join(F.broadcast(derived), "pos")
        .groupBy("pos", "n", "mean_q", "std_q")
        .agg(
            F.count(
                F.when(
                    (F.col("qc") - F.col("mean_q")) * (F.col("qc") - F.col("mean_q"))
                    > 4 * F.col("std_q") * F.col("std_q"),
                    1,
                )
            ).alias("n_outliers")
        )
    )
    return out.select(
        "pos",
        "n",
        F.round("mean_q", 6).alias("mean_q"),
        F.round("std_q", 6).alias("std_q"),
        "n_outliers",
    ).orderBy("pos")


# ---------------------------------------------------------------------------
# embedding_covariance — exact d×d covariance of the embedding matrix
# (the PCA/whitening precursor every embedding pipeline runs before
# indexing). Exactness scheme: components integer-quantize (×1000, the
# registry idiom), so Σqᵢqⱼ and Σqᵢ are exact BIGINTs — order- and
# partitioning-independent — and cov = S₁₂/n − (S₁/n)(S₂/n) derives in
# scalar double math identically in both engines. Shape: the upper
# triangle materializes as an equi-join on vec_id (N·d²/2 product rows
# feeding a d² -key partial aggregate — map-side combine shrinks the
# shuffle to d² rows per partition; the 64-row moment table broadcasts).
# At 100 TB the same plan holds: the shuffle is O(partitions·d²), never
# O(N); a mapInPandas numpy accumulator could cut the product-row
# materialization 10× but would reintroduce float partial-sum
# nondeterminism — exactness wins here.
# ---------------------------------------------------------------------------


def _cov_oracle() -> str:
    return f"""
WITH qv AS (
  SELECT vec_id, {_sql_qvec('embedding')} AS q FROM embeddings
),
comp AS (
  SELECT vec_id, unnest(q) AS qc, generate_subscripts(q, 1) AS pos FROM qv
),
stats AS (
  SELECT pos, CAST(SUM(qc) AS BIGINT) AS s1, CAST(COUNT(*) AS BIGINT) AS n
  FROM comp GROUP BY pos
),
pairs AS (
  SELECT a.pos AS i, b.pos AS j, CAST(SUM(a.qc * b.qc) AS BIGINT) AS s12
  FROM comp a JOIN comp b USING (vec_id)
  WHERE a.pos <= b.pos
  GROUP BY 1, 2
)
SELECT p.i, p.j,
       ROUND(CAST(p.s12 AS DOUBLE) / si.n
             - (CAST(si.s1 AS DOUBLE) / si.n) * (CAST(sj.s1 AS DOUBLE) / sj.n),
             6) AS cov_q
FROM pairs p
JOIN stats si ON si.pos = p.i
JOIN stats sj ON sj.pos = p.j
"""


@query("embedding_covariance", _cov_oracle())
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    )
    comp = e.select("vec_id", F.posexplode("q").alias("pos0", "qc")).select(
        "vec_id", (F.col("pos0") + 1).alias("pos"), "qc"
    )
    stats = comp.groupBy("pos").agg(
        F.sum("qc").alias("s1"), F.count(F.lit(1)).alias("n")
    )
    a = comp.select("vec_id", F.col("pos").alias("i"), F.col("qc").alias("qa"))
    b = comp.select("vec_id", F.col("pos").alias("j"), F.col("qc").alias("qb"))
    pairs = (
        a.join(b, "vec_id")
        .filter(F.col("i") <= F.col("j"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("s12"))
    )
    si = stats.select(
        F.col("pos").alias("i"), F.col("s1").alias("s1_i"), F.col("n").alias("n")
    )
    sj = stats.select(F.col("pos").alias("j"), F.col("s1").alias("s1_j"))
    cov = (
        F.col("s12").cast("double") / F.col("n")
        - (F.col("s1_i").cast("double") / F.col("n"))
        * (F.col("s1_j").cast("double") / F.col("n"))
    )
    return (
        pairs.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select("i", "j", F.round(cov, 6).alias("cov_q"))
    )


# ---------------------------------------------------------------------------
# jl_project — Johnson–Lindenstrauss random projection to k=8 dims with a
# DETERMINISTIC ±1 sign matrix derived from md5(i:j:'jl') — the
# dimensionality-reduction step before cheap near-dup / clustering
# passes, reproducible across engines and runs (no RNG state to ship).
# Shape: map-side explode of the k axis (no join — the sign is computed
# inline from the hash), then a (vec_id, j)-keyed exact BIGINT sum;
# one shuffle carrying N·k scalar rows. proj = Σqᵢ·signᵢⱼ / (1000·√k)
# converts the exact integer back to the float scale.
# ---------------------------------------------------------------------------

_JL_K = 8


def _jl_oracle() -> str:
    return f"""
WITH qv AS (
  SELECT vec_id, {_sql_qvec('embedding')} AS q FROM embeddings
),
comp AS (
  SELECT vec_id, unnest(q) AS qc, generate_subscripts(q, 1) AS pos FROM qv
),
proj AS (
  SELECT c.vec_id, ks.j,
         CAST(SUM(c.qc * (CASE WHEN ('0x' || substr(md5(
                 CAST(c.pos AS VARCHAR) || ':' || CAST(ks.j AS VARCHAR) || ':jl'
               ), 1, 15))::BIGINT % 2 = 0 THEN 1 ELSE -1 END)) AS BIGINT) AS pq
  FROM comp c, (SELECT unnest(generate_series(0, {_JL_K - 1})) AS j) ks
  GROUP BY 1, 2
)
SELECT vec_id, j,
       ROUND(CAST(pq AS DOUBLE) / (1000.0 * sqrt({_JL_K}.0)), 6) AS proj
FROM proj
"""


@query("jl_project", _jl_oracle())
def jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    )
    comp = e.select("vec_id", F.posexplode("q").alias("pos0", "qc")).select(
        "vec_id", (F.col("pos0") + 1).alias("pos"), "qc"
    )
    fanned = comp.select(
        "vec_id",
        "pos",
        "qc",
        F.explode(F.sequence(F.lit(0), F.lit(_JL_K - 1))).alias("j"),
    )
    from ..functions.text import h60

    h = h60(
        F.concat(
            F.col("pos").cast("string"), F.lit(":"), F.col("j").cast("string"),
            F.lit(":jl"),
        )
    )
    sign = F.when(h % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    proj = (
        fanned.groupBy("vec_id", "j")
        .agg(F.sum(F.col("qc") * sign).alias("pq"))
        .select(
            "vec_id",
            "j",
            F.round(
                F.col("pq").cast("double") / (1000.0 * float(_JL_K) ** 0.5), 6
            ).alias("proj"),
        )
    )
    return proj


# ---------------------------------------------------------------------------
# embedding_int8_quant — scalar int8 quantization (the standard serving
# format for embedding stores: per-dimension affine [min,max] → 0..255
# codes). Exactness scheme: components live on the established ×1000
# integer grid (q), the code is round-half-up((q-qmin)·255/(qmax-qmin))
# computed entirely in BIGINT ((2·num+den)//(2·den) — no double round,
# whose half-case Spark and DuckDB disagree on), and the reconstruction
# error is measured in exact integer units of q/255: e = 255·q −
# (255·qmin + code·(qmax−qmin)), so SSE and max|e| are order-independent
# BIGINT aggregates. Shape: posexplode → 64-key min/max agg (map-side
# partial keeps the 64 reducers thin at any scale) → 64-row broadcast
# back → map-only code+error pass → 64-key rollup.
# ---------------------------------------------------------------------------


def _int8_oracle() -> str:
    return f"""
WITH qv AS (SELECT vec_id, {_sql_qvec('embedding')} AS q FROM embeddings),
comp AS (
  SELECT vec_id, unnest(q) AS qc, generate_subscripts(q, 1) AS pos FROM qv
),
rng AS (
  SELECT pos, MIN(qc) AS qmin, MAX(qc) AS qmax FROM comp GROUP BY pos
),
coded AS (
  SELECT c.pos, c.qc, r.qmin, r.qmax,
         CASE WHEN r.qmax = r.qmin THEN 0
              ELSE (2 * (c.qc - r.qmin) * 255 + (r.qmax - r.qmin))
                   // (2 * (r.qmax - r.qmin)) END AS code
  FROM comp c JOIN rng r USING (pos)
),
err AS (
  SELECT pos, qmin, qmax,
         255 * qc - (255 * qmin + code * (qmax - qmin)) AS e
  FROM coded
)
SELECT pos, CAST(qmin AS BIGINT) AS qmin, CAST(qmax AS BIGINT) AS qmax,
       CAST(SUM(e * e) AS BIGINT) AS sse255,
       CAST(MAX(ABS(e)) AS BIGINT) AS max_abs_e255,
       CAST(COUNT(*) AS BIGINT) AS n
FROM err GROUP BY pos, qmin, qmax ORDER BY pos
"""


@query("embedding_int8_quant", _int8_oracle())
def embedding_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    )
    comp = e.select(F.posexplode("q").alias("pos0", "qc")).select(
        (F.col("pos0") + 1).alias("pos"), "qc"
    )
    rng = comp.groupBy("pos").agg(
        F.min("qc").alias("qmin"), F.max("qc").alias("qmax")
    )
    den = F.col("qmax") - F.col("qmin")
    # BIGINT `div`, not double `/`+cast: a correctly-rounded double
    # quotient can land half-an-ulp above an exact integer boundary and
    # truncate differently than DuckDB's integer `//`
    coded = (
        comp.join(F.broadcast(rng), "pos")
        .withColumn("num", 2 * (F.col("qc") - F.col("qmin")) * 255 + den)
        .withColumn(
            "code",
            F.when(den == 0, F.lit(0).cast("long")).otherwise(
                F.expr("num div (2 * (qmax - qmin))")
            ),
        )
    )
    err = coded.withColumn(
        "e",
        255 * F.col("qc") - (255 * F.col("qmin") + F.col("code") * den),
    )
    return (
        err.groupBy("pos", "qmin", "qmax")
        .agg(
            F.sum(F.col("e") * F.col("e")).alias("sse255"),
            F.max(F.abs(F.col("e"))).alias("max_abs_e255"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("pos")
    )


# ---------------------------------------------------------------------------
# pca_power_iteration — distributed top principal direction via
# MATRIX-FREE power iteration: v ← normalize(Σ_i (x_i·v)·x_i), three
# iterations, the d×d covariance never materializes (the real
# large-scale PCA shape — at 100 TB each iteration is a broadcast of
# the 64-double v, one map-side-combined dot-product agg keyed by
# vector, one 64-key recombination agg; nothing wider than (vec, dot)
# shuffles). Exactness scheme per iteration: components on the ×1000
# integer grid, v re-quantized to the same grid after each normalize,
# so dot products and the recombined y_j are order-independent BIGINT
# sums; Σy² accumulates in DECIMAL(38)/HUGEINT; the only double ops are
# the per-iteration norm sqrt and the 64 divisions — identical IEEE in
# both engines. Uncentered variant (top singular direction of the raw
# matrix), all-ones start: both choices documented and mirrored in the
# oracle. (Oracle trap pinned here: DuckDB CAST(double AS BIGINT)
# ROUNDS while Spark's cast truncates — lam_q floors explicitly.) BIGINT headroom: |q|≤578, |vq|≤1000 → y ≤ N·2.1e10; beyond
# N≈1e8 rows drop the v-grid to ×100.
# ---------------------------------------------------------------------------

_PCA_ITERS = 3


def _pca_oracle() -> str:
    head = f"""
WITH qv AS (SELECT vec_id, {_sql_qvec('embedding')} AS q FROM embeddings),
comp AS (
  SELECT vec_id, unnest(q) AS qc, generate_subscripts(q, 1) AS pos FROM qv
),
v0 AS (SELECT unnest(generate_series(1, 64)) AS pos, CAST(1000 AS BIGINT) AS vq)"""
    its = []
    for i in range(1, _PCA_ITERS + 1):
        p = i - 1
        its.append(
            f""",
d{i} AS (
  SELECT c.vec_id, CAST(SUM(c.qc * v.vq) AS BIGINT) AS dot
  FROM comp c JOIN v{p} v USING (pos) GROUP BY c.vec_id
),
y{i} AS (
  SELECT c.pos, CAST(SUM(d.dot * c.qc) AS BIGINT) AS y
  FROM comp c JOIN d{i} d USING (vec_id) GROUP BY c.pos
),
n{i} AS (SELECT sqrt(CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE)) AS norm FROM y{i}),
v{i} AS (
  SELECT pos,
         CAST(ROUND(CAST(y AS DOUBLE) / (SELECT norm FROM n{i}) * 1000, 0) AS BIGINT) AS vq
  FROM y{i}
)"""
        )
    last = _PCA_ITERS
    return (
        head
        + "".join(its)
        + f"""
SELECT y.pos, v.vq,
       ROUND(CAST(y.y AS DOUBLE) / (SELECT norm FROM n{last}), 6) AS v,
       CAST(FLOOR((SELECT norm FROM n{last})) AS BIGINT) AS lam_q
FROM y{last} y JOIN v{last} v USING (pos)
ORDER BY y.pos
"""
    )


@query("pca_power_iteration", _pca_oracle())
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", _quantized(F.col("embedding")).alias("q")
    )
    comp = (
        e.select("vec_id", F.posexplode("q").alias("pos0", "qc"))
        .select("vec_id", (F.col("pos0") + 1).alias("pos"), "qc")
        .localCheckpoint(eager=False)  # 3 iterations re-read this, not the scan
    )
    vq = spark.range(1, 65).select(
        F.col("id").cast("int").alias("pos"), F.lit(1000).cast("long").alias("vq")
    )
    y = norm = None
    for it in range(_PCA_ITERS):
        dots = (
            comp.join(F.broadcast(vq), "pos")
            .groupBy("vec_id")
            .agg(F.sum(F.col("qc") * F.col("vq")).alias("dot"))
        )
        y = (
            comp.join(dots, "vec_id")
            .groupBy("pos")
            .agg(F.sum(F.col("dot") * F.col("qc")).alias("y"))
        )
        if it < _PCA_ITERS - 1:
            # y feeds BOTH norm and vq, and the next iteration composes
            # on top of vq — without truncation the logical tree grows
            # ~3x per iteration (356 plan lines, ~0.5 s of Catalyst per
            # action; guide §3.3). The 64-row lazy checkpoint collapses
            # it (measured r14: 1.57 -> 1.26 s best, means 2.25 -> 1.55).
            y = y.localCheckpoint(eager=False)
        dec = F.col("y").cast("decimal(19,0)")
        norm = y.agg(
            F.sqrt(F.sum(dec * dec).cast("double")).alias("norm")
        )
        vq = (
            y.crossJoin(F.broadcast(norm))
            .select(
                "pos",
                F.round(F.col("y").cast("double") / F.col("norm") * 1000, 0)
                .cast("long")
                .alias("vq"),
            )
        )
    return (
        y.crossJoin(F.broadcast(norm))
        .join(vq.withColumnRenamed("vq", "vq_final"), "pos")
        .select(
            "pos",
            F.col("vq_final").alias("vq"),
            F.round(F.col("y").cast("double") / F.col("norm"), 6).alias("v"),
            F.col("norm").cast("long").alias("lam_q"),
        )
        .orderBy("pos")
    )


# ---------------------------------------------------------------------------
# logreg_gd_steps — distributed model TRAINING as a query: three full-
# batch gradient-descent steps of binary logistic regression (y = label
# mod 2 on the 64-dim embeddings), the map-reduce ML shape (each step =
# broadcast w → per-row score → per-dimension gradient agg). Engine-
# exact spec: the link is the ALGEBRAIC sigmoid σ̂(z) = ½ + (z/2)/(1+|z|)
# — division only, because exp() is only 1-ulp-accurate in Java and
# libm and a transcendental ulp would cascade through iterations;
# residuals quantize to 1e-6 BIGINTs, so every distributed sum (z per
# row, gradient per dim) is order-independent integer math; the update
# w ← w − S div (2000·N) is TRUNCATED division via sign-split (Spark
# `div` truncates, DuckDB `//` floors — they differ on negatives).
# Output: final per-dim weights (exact BIGINT micro-units) + training
# accuracy from the integer sign of the final logit. At 100 TB each
# step is one broadcast + two map-side-combined aggs — the textbook
# distributed-GD cost model.
# ---------------------------------------------------------------------------

_GD_ITERS = 3


def _gd_trunc_div_sql(num: str, den: str) -> str:
    return f"(CASE WHEN {num} < 0 THEN -((-({num})) // ({den})) ELSE ({num}) // ({den}) END)"


def _gd_oracle() -> str:
    head = f"""
WITH qv AS (SELECT vec_id, {_sql_qvec('embedding')} AS q FROM embeddings),
comp AS (
  SELECT vec_id, unnest(q) AS qc, generate_subscripts(q, 1) AS pos FROM qv
),
lab AS (SELECT vec_id, CAST(label % 2 AS BIGINT) AS y FROM embeddings),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
w0 AS (SELECT unnest(generate_series(1, 64)) AS pos, CAST(0 AS BIGINT) AS wq)"""
    its = []
    for i in range(1, _GD_ITERS + 1):
        p = i - 1
        resid = (
            "0.5 + ((CAST(z.z AS DOUBLE) / 1000000000.0) / 2.0)"
            " / (1.0 + ABS(CAST(z.z AS DOUBLE) / 1000000000.0))"
            " - CAST(l.y AS DOUBLE)"
        )
        its.append(
            f""",
z{i} AS (
  SELECT c.vec_id, CAST(SUM(c.qc * w.wq) AS BIGINT) AS z
  FROM comp c JOIN w{p} w USING (pos) GROUP BY c.vec_id
),
r{i} AS (
  SELECT z.vec_id,
         CAST(ROUND(({resid}) * 1000000.0, 0) AS BIGINT) AS rq
  FROM z{i} z JOIN lab l ON z.vec_id = l.vec_id
),
g{i} AS (
  SELECT c.pos, CAST(SUM(r.rq * c.qc) AS BIGINT) AS s
  FROM comp c JOIN r{i} r USING (vec_id) GROUP BY c.pos
),
w{i} AS (
  SELECT w.pos,
         w.wq - {_gd_trunc_div_sql('g.s', '2000 * (SELECT n FROM nn)')} AS wq
  FROM w{p} w JOIN g{i} g USING (pos)
)"""
        )
    last = _GD_ITERS
    return (
        head
        + "".join(its)
        + f""",
zf AS (
  SELECT c.vec_id, CAST(SUM(c.qc * w.wq) AS BIGINT) AS z
  FROM comp c JOIN w{last} w USING (pos) GROUP BY c.vec_id
),
acc AS (
  SELECT CAST(SUM(CASE WHEN (z.z >= 0) = (l.y = 1) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM zf z JOIN lab l ON z.vec_id = l.vec_id
)
SELECT w.pos, CAST(w.wq AS BIGINT) AS wq, acc.n_correct, acc.n
FROM w{last} w CROSS JOIN acc ORDER BY w.pos
"""
    )


@query("logreg_gd_steps", _gd_oracle())
def logreg_gd_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", _quantized(F.col("embedding")).alias("q"))
    comp = (
        e.select("vec_id", F.posexplode("q").alias("pos0", "qc"))
        .select("vec_id", (F.col("pos0") + 1).alias("pos"), "qc")
        .localCheckpoint(eager=False)
    )
    # lab joins into every iteration's residual plus the final accuracy
    # pass — lazy-checkpoint it alongside comp so the embeddings table
    # is scanned once, not once per consumer
    lab = emb.select(
        "vec_id", (F.col("label") % 2).cast("long").alias("y")
    ).localCheckpoint(eager=False)
    n = emb.count()  # scalar, drives the exact update denominator
    den = 2000 * max(n, 1)
    wq = spark.range(1, 65).select(
        F.col("id").cast("int").alias("pos"), F.lit(0).cast("long").alias("wq")
    )

    def logits(w):
        return (
            comp.join(F.broadcast(w), "pos")
            .groupBy("vec_id")
            .agg(F.sum(F.col("qc") * F.col("wq")).alias("z"))
        )

    for _ in range(_GD_ITERS):
        z = logits(wq)
        zd = F.col("z").cast("double") / F.lit(1000000000.0)
        resid = (
            F.lit(0.5)
            + (zd / F.lit(2.0)) / (F.lit(1.0) + F.abs(zd))
            - F.col("y").cast("double")
        )
        r = z.join(lab, "vec_id").select(
            "vec_id",
            F.round(resid * F.lit(1000000.0), 0).cast("long").alias("rq"),
        )
        g = (
            comp.join(r, "vec_id")
            .groupBy("pos")
            .agg(F.sum(F.col("rq") * F.col("qc")).alias("s"))
        )
        step = F.when(
            F.col("s") < 0, -F.expr(f"(-s) div {den}")
        ).otherwise(F.expr(f"s div {den}"))
        # materialize the 64-row weight frame each step: every later
        # reference to wq otherwise re-EXPANDS the whole earlier
        # iteration chain into the plan (measured: 15 parquet + 29 RDD
        # scans unrolled vs 0 + 4 checkpointed; 2.5 → 2.0 s at sf0.1,
        # identical weights) — the eager job is a 64-row no-op
        wq = (
            wq.join(g, "pos")
            .select("pos", (F.col("wq") - step).alias("wq"))
            .localCheckpoint(eager=True)
        )
    zf = logits(wq)
    acc = zf.join(lab, "vec_id").agg(
        F.sum(
            F.when((F.col("z") >= 0) == (F.col("y") == 1), 1).otherwise(0)
        ).cast("long").alias("n_correct"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        wq.crossJoin(F.broadcast(acc))
        .select("pos", "wq", "n_correct", "n")
        .orderBy("pos")
    )


# ---------------------------------------------------------------------------
# ann_ndcg_eval — NDCG@10 of the IVF single-probe ranking against the
# exact brute-force ranking (query vec 42): the rank-AWARE companion of
# ann_recall_eval (recall says "how many of the true top-k came back";
# NDCG says "in how good an order"). Graded relevance comes from the
# exact list (rel = 11 − exact_rank for the true top-10, 0 otherwise);
# DCG discounts by log2(position+1) per Järvelin & Kekäläinen.
# Determinism: each DCG term rel/log2(p+1) is quantized to integer
# micro-units BEFORE summation (the bm25 idiom — a last-ulp log2
# difference between engines cannot flip a 1e-6 rounding), and the
# final ratio is one IEEE division of two exact integers. Scale shape:
# ONE corpus-sized scoring pass (checkpointed — it feeds both
# rankings), two TakeOrderedAndProject top-10s, then all NDCG math on
# ≤10-row frames; the rank windows are depth-bounded by construction.
# ---------------------------------------------------------------------------


def _ndcg_oracle() -> str:
    return f"""
WITH {_ivf_sql_ctes()},
qcell AS (SELECT cid, v AS qv FROM assigned WHERE vec_id = 42),
scored AS (
  SELECT a.vec_id, a.cid,
         ROUND(list_cosine_similarity(a.v, (SELECT qv FROM qcell)), 6) AS cs
  FROM assigned a WHERE a.vec_id <> 42
),
exact10 AS (
  SELECT vec_id, row_number() OVER (ORDER BY cs DESC, vec_id ASC) AS er
  FROM scored ORDER BY cs DESC, vec_id ASC LIMIT 10
),
ivf10 AS (
  SELECT vec_id, row_number() OVER (ORDER BY cs DESC, vec_id ASC) AS p
  FROM scored WHERE cid = (SELECT cid FROM qcell)
  ORDER BY cs DESC, vec_id ASC LIMIT 10
),
gains AS (
  SELECT CAST(ROUND(
           CAST(COALESCE(11 - e.er, 0) AS DOUBLE)
           / log2(CAST(i.p AS DOUBLE) + 1.0) * 1000000.0, 0) AS BIGINT) AS sq
  FROM ivf10 i LEFT JOIN exact10 e USING (vec_id)
),
ideal AS (
  SELECT CAST(ROUND(
           CAST(11 - p AS DOUBLE)
           / log2(CAST(p AS DOUBLE) + 1.0) * 1000000.0, 0) AS BIGINT) AS isq
  FROM (SELECT unnest(generate_series(1, 10)) AS p)
),
d AS (SELECT CAST(SUM(sq) AS BIGINT) AS sd FROM gains),
i AS (SELECT CAST(SUM(isq) AS BIGINT) AS si FROM ideal)
SELECT CAST(sd AS DOUBLE) / 1000000.0 AS dcg,
       CAST(si AS DOUBLE) / 1000000.0 AS idcg,
       CAST(sd AS DOUBLE) / CAST(si AS DOUBLE) AS ndcg_at_10
FROM d CROSS JOIN i
"""


@query("ann_ndcg_eval", _ndcg_oracle())
def ann_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    vecs = _ivf_vecs(spark, sf_dir)
    assigned = _ivf_assigned(vecs, _ivf_dists(vecs)).localCheckpoint(eager=True)
    qcell = assigned.filter(F.col("vec_id") == 42).select(
        F.col("cid").alias("qcid"), F.col("v").alias("qv")
    )
    scored = (
        assigned.filter(F.col("vec_id") != 42)
        .crossJoin(F.broadcast(qcell))
        .select(
            "vec_id",
            "cid",
            "qcid",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cs"),
        )
        .localCheckpoint(eager=True)  # one scoring pass feeds both rankings
    )
    w = Window.orderBy(F.col("cs").desc(), F.col("vec_id").asc())
    exact10 = (
        scored.orderBy(F.col("cs").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.row_number().over(w).alias("er"))
    )
    ivf10 = (
        scored.filter(F.col("cid") == F.col("qcid"))
        .orderBy(F.col("cs").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.row_number().over(w).alias("p"))
    )
    gains = ivf10.join(exact10, "vec_id", "left").select(
        F.round(
            F.coalesce(F.lit(11) - F.col("er"), F.lit(0)).cast("double")
            / F.log2(F.col("p").cast("double") + F.lit(1.0))
            * F.lit(1_000_000.0),
            0,
        )
        .cast("long")
        .alias("sq")
    )
    ideal = spark.range(1, 11).select(
        F.round(
            (F.lit(11) - F.col("id")).cast("double")
            / F.log2(F.col("id").cast("double") + F.lit(1.0))
            * F.lit(1_000_000.0),
            0,
        )
        .cast("long")
        .alias("isq")
    )
    d = gains.agg(F.sum("sq").alias("sd"))
    i = ideal.agg(F.sum("isq").alias("si"))
    return d.crossJoin(F.broadcast(i)).select(
        (F.col("sd").cast("double") / 1_000_000.0).alias("dcg"),
        (F.col("si").cast("double") / 1_000_000.0).alias("idcg"),
        (F.col("sd").cast("double") / F.col("si").cast("double")).alias(
            "ndcg_at_10"
        ),
    )


# ---------------------------------------------------------------------------
# ivf_recall_curve — recall@5 as a FUNCTION of nprobe (1, 2, 4): the
# tuning curve every IVF deployment draws before fixing its
# latency/recall trade. Cells rank by the query's exact integer
# squared-L2 to each centroid (same _ivf_dists definition as search —
# the metric measures the index geometry, not arithmetic drift); the
# candidate sets nest (nprobe=1 ⊂ 2 ⊂ 4), so ONE checkpointed scoring
# pass feeds every curve point and the exact top-5. Each point's top-5
# is its own orderBy().limit(5) — a distributed TakeOrderedAndProject,
# deliberately NOT a window partitioned by nprobe (that would sort a
# corpus-sized partition per point at 100 TB).
# ---------------------------------------------------------------------------

_CURVE_QID = 42
_CURVE_PROBES = (1, 2, 4)


def _curve_oracle() -> str:
    point = """
SELECT {np} AS nprobe,
       CAST(COUNT(*) AS BIGINT) AS n_hits,
       CAST(COUNT(*) AS DOUBLE) / 5.0 AS recall_at_5
FROM exact5 JOIN (
  SELECT vec_id FROM scored WHERE crank <= {np}
  ORDER BY cos_sim DESC, vec_id ASC LIMIT 5
) USING (vec_id)"""
    points = " UNION ALL ".join(
        point.format(np=np) for np in _CURVE_PROBES
    )
    return f"""
WITH {_ivf_sql_ctes()},
qv AS (SELECT v FROM vecs WHERE vec_id = {_CURVE_QID}),
qq AS (SELECT q FROM vecs WHERE vec_id = {_CURVE_QID}),
cellrank AS (
  SELECT c.cid,
         row_number() OVER (ORDER BY
           list_sum(list_transform((SELECT q FROM qq),
                    (x, i) -> (x - c.cq[i]) * (x - c.cq[i]))) ASC,
           c.cid ASC) AS crank
  FROM cent c
),
scored AS (
  SELECT a.vec_id, r.crank,
         ROUND(list_cosine_similarity(a.v, (SELECT v FROM qv)), 6) AS cos_sim
  FROM assigned a JOIN cellrank r ON r.cid = a.cid
  WHERE a.vec_id <> {_CURVE_QID}
),
exact5 AS (
  SELECT vec_id FROM scored ORDER BY cos_sim DESC, vec_id ASC LIMIT 5
)
{points}
"""


@query("ivf_recall_curve", _curve_oracle())
def ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _ivf_vecs(spark, sf_dir)
    dists = _ivf_dists(vecs)
    assigned = _ivf_assigned(vecs, dists)
    qv = vecs.filter(F.col("vec_id") == _CURVE_QID).select(
        F.col("v").alias("qv")
    )
    from pyspark.sql import Window

    cellrank = (
        dists.filter(F.col("vec_id") == _CURVE_QID)
        .select(
            "cid",
            F.row_number()
            .over(Window.orderBy(F.col("d2").asc(), F.col("cid").asc()))
            .alias("crank"),
        )
    )
    scored = (
        assigned.filter(F.col("vec_id") != _CURVE_QID)
        .join(F.broadcast(cellrank), "cid")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "crank",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        # one scoring pass feeds the exact ranking and every curve point
        .localCheckpoint(eager=True)
    )
    exact5 = scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(5)
    points = []
    for np_ in _CURVE_PROBES:
        top = (
            scored.filter(F.col("crank") <= np_)
            .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
            .limit(5)
        )
        points.append(
            exact5.join(top.select("vec_id"), "vec_id", "left_semi")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .select(
                F.lit(np_).alias("nprobe"),
                "n_hits",
                (F.col("n_hits").cast("double") / F.lit(5.0)).alias("recall_at_5"),
            )
        )
    out = points[0]
    for p in points[1:]:
        out = out.unionAll(p)
    return out
