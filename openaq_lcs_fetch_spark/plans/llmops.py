"""Training-data pipeline operators round 2: benchmark decontamination,
PII redaction, Gopher-style quality gates, repetition filtering.

These extend the round-1 text/dedup suite (textops.py) with the
remaining table-stakes ops of an LLM data pipeline. Same parity
discipline: portable md5-based hashing, integer/exact arithmetic where
engines could disagree, every computed column aliased identically in
Spark and the DuckDB oracle.

Scale notes: the benchmark side of decontamination is benchmark-sized
(thousands of docs, not billions) → broadcast; the corpus side only
ever shuffles (doc_id, int64-hash) pairs. PII and quality gates are
pure Column expressions — whole-stage codegen, zero Python in the hot
path, no shuffle at all beyond the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..localdf import local_df
from .registry import query, t
from .textops import _SQL_TOKS, _sql_hmod, _sql_shingles

# ---------------------------------------------------------------------------
# decontaminate — benchmark n-gram overlap (the eval-leakage check every
# training corpus needs; n=2 here because the synthetic vocabulary is
# small — production would use 8-13-gram exact overlap)
# ---------------------------------------------------------------------------

_DECON_N = 2
_DECON_EVAL_MOD = 29  # doc_id % 29 == 0 → the pseudo-benchmark set
# contamination = ≥55 distinct overlapping bigrams — ~p90 of the benign
# background overlap of the synthetic small-vocabulary corpus (production
# 8-13-gram overlap uses ≥1: any shared long n-gram is contamination)
_DECON_T = 55

_DECON_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
  shl AS (SELECT doc_id, {_sql_shingles('toks', _DECON_N)} AS shs FROM toks),
  shx AS (SELECT doc_id, unnest(shs) AS shingle FROM shl),
  sh  AS (SELECT DISTINCT doc_id, {_sql_hmod('shingle')} AS sh FROM shx),
  eval_sh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % {_DECON_EVAL_MOD} = 0),
  corpus AS (SELECT * FROM sh WHERE doc_id % {_DECON_EVAL_MOD} <> 0),
  hits AS (
    SELECT c.doc_id, COUNT(*) AS n_overlap
    FROM corpus c JOIN eval_sh e USING (sh)
    GROUP BY c.doc_id
  )
SELECT d.doc_id,
       COALESCE(h.n_overlap, 0) AS n_overlap,
       COALESCE(h.n_overlap, 0) >= {_DECON_T} AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {_DECON_EVAL_MOD} <> 0
"""


@query("decontaminate", _DECON_ORACLE)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag corpus documents sharing ≥_DECON_T distinct word n-grams
    with the benchmark set (threshold calibrated to the corpus's benign
    background overlap — see the constant's comment).
    The benchmark shingle set is broadcast (benchmarks
    are small by construction), so the corpus side never shuffles its
    shingles — only the final (doc_id, count) aggregation moves."""
    # spread: both shingle branches are scan-rooted CPU (r14:
    # 1.50 -> 1.18 s best)
    d = t(spark, sf_dir, "documents", spread=True)
    is_eval = F.col("doc_id") % _DECON_EVAL_MOD == 0

    def shingle_rows(docs: DataFrame) -> DataFrame:
        return docs.select(
            "doc_id",
            F.explode(
                TX.word_shingles(TX.tokens(F.col("text")), _DECON_N)
            ).alias("shingle"),
        ).select("doc_id", TX.hmod(F.col("shingle")).alias("sh"))

    # benchmark side first: filter BEFORE shingling (3% of docs), then a
    # distinct over benchmark-sized data → broadcast
    eval_sh = shingle_rows(d.filter(is_eval)).select("sh").distinct()
    # corpus side: broadcast-probe BEFORE any shuffle, so only MATCHED
    # shingle occurrences reach the exchange; count_distinct collapses
    # repeated in-doc occurrences in the same aggregation
    hits = (
        shingle_rows(d.filter(~is_eval))
        .join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh").alias("n_overlap"))
    )
    return (
        d.filter(~is_eval)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) >= _DECON_T).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# pii_scrub — regex PII redaction (emails / IPv4 / phone), counts + the
# hash of the redacted text. The synthetic corpus carries no PII, so a
# deterministic augmentation plants some on BOTH engines — the driver
# check then verifies the actual regex semantics agree, not just 0=0.
# ---------------------------------------------------------------------------

_RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_RE_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_RE_PHONE = r"\+?\d{3}[- ]\d{3}[- ]\d{4}"

_PII_AUG = (
    "text || CASE WHEN doc_id % 7 = 0 "
    "THEN ' contact user' || doc_id || '@example.com now' ELSE '' END "
    "|| CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.' || (doc_id % 256) || '.1' ELSE '' END "
    "|| CASE WHEN doc_id % 13 = 0 THEN ' call 555-867-5309' ELSE '' END"
)

_PII_ORACLE = f"""
WITH aug AS (SELECT doc_id, {_PII_AUG} AS body FROM documents),
  red AS (
    SELECT doc_id, body,
           regexp_replace(regexp_replace(regexp_replace(body,
               '{_RE_EMAIL}', '[EMAIL]', 'g'),
               '{_RE_IPV4}', '[IP]', 'g'),
               '{_RE_PHONE}', '[PHONE]', 'g') AS redacted
    FROM aug
  )
SELECT doc_id,
       len(regexp_extract_all(body, '{_RE_EMAIL}')) AS n_emails,
       len(regexp_extract_all(body, '{_RE_IPV4}')) AS n_ips,
       len(regexp_extract_all(body, '{_RE_PHONE}')) AS n_phones,
       md5(redacted) AS redacted_md5
FROM red
"""


@query("pii_scrub", _PII_ORACLE)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Column regex redaction — no UDF, stays in whole-stage
    codegen; at 100 TB this is scan-bound map work with zero shuffle.
    Patterns deliberately avoid lookarounds so Java regex (Spark) and
    RE2 (DuckDB) agree."""
    d = t(spark, sf_dir, "documents")
    body = F.expr(_PII_AUG)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(body, _RE_EMAIL, "[EMAIL]"),
            _RE_IPV4,
            "[IP]",
        ),
        _RE_PHONE,
        "[PHONE]",
    )
    return d.select(
        "doc_id",
        F.regexp_count(body, F.lit(_RE_EMAIL)).alias("n_emails"),
        F.regexp_count(body, F.lit(_RE_IPV4)).alias("n_ips"),
        F.regexp_count(body, F.lit(_RE_PHONE)).alias("n_phones"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# gopher_quality — the Gopher/MassiveText per-document quality gates
# expressible as exact arithmetic (word count bounds, mean word length,
# stopword evidence, alphabetic-word fraction)
# ---------------------------------------------------------------------------

_GQ_STOPS = TX.STOPWORDS["en"]
_GQ_STOPS_SQL = ", ".join(f"'{w}'" for w in _GQ_STOPS)

_GOPHER_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
  m AS (
    SELECT doc_id,
           len(toks) AS n_words,
           CASE WHEN len(toks) > 0
                THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                ELSE CAST(0.0 AS DOUBLE) END AS mean_word_len,
           len(list_filter(toks, x -> list_contains([{_GQ_STOPS_SQL}], x))) AS stop_hits,
           CASE WHEN len(toks) > 0
                THEN CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(toks)
                ELSE CAST(0.0 AS DOUBLE) END AS alpha_frac
    FROM toks
  )
SELECT doc_id, n_words, mean_word_len, stop_hits, alpha_frac,
       (n_words BETWEEN 50 AND 100000)
       AND (mean_word_len BETWEEN 3.0 AND 10.0)
       AND stop_hits >= 2
       AND alpha_frac > 0.8 AS passes
FROM m
"""


@query("gopher_quality", _GOPHER_ORACLE)
def gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rules as one projection pass — Column-only, no shuffle."""
    d = t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    n = F.size(toks)
    mean_len = TX.avg_token_len(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*_GQ_STOPS)))
    alpha = F.when(
        n > 0,
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))).cast("double") / n,
    ).otherwise(F.lit(0.0))
    out = d.select(
        "doc_id",
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        stop_hits.alias("stop_hits"),
        alpha.alias("alpha_frac"),
    )
    return out.withColumn(
        "passes",
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("stop_hits") >= 2)
        & (F.col("alpha_frac") > 0.8),
    )


# ---------------------------------------------------------------------------
# doc_repetition — MassiveText repetition gates: most-common-token
# fraction and duplicate-bigram fraction
# ---------------------------------------------------------------------------

_REP_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
  tok1 AS (SELECT doc_id, unnest(toks) AS tok FROM toks),
  top1 AS (
    SELECT doc_id, MAX(c) AS top_cnt FROM (
      SELECT doc_id, tok, COUNT(*) AS c FROM tok1 GROUP BY doc_id, tok
    ) GROUP BY doc_id
  ),
  bstat AS (
    SELECT doc_id, len(toks) AS n_tok,
           len({_sql_shingles('toks', 2)}) AS n_bigrams,
           len(list_distinct({_sql_shingles('toks', 2)})) AS n_distinct_bigrams
    FROM toks
  )
SELECT b.doc_id,
       CASE WHEN b.n_tok > 0 THEN CAST(COALESCE(t.top_cnt, 0) AS DOUBLE) / b.n_tok
            ELSE CAST(0.0 AS DOUBLE) END AS top_token_frac,
       CASE WHEN b.n_bigrams > 0
            THEN CAST(b.n_bigrams - b.n_distinct_bigrams AS DOUBLE) / b.n_bigrams
            ELSE CAST(0.0 AS DOUBLE) END AS dup_bigram_frac,
       (CASE WHEN b.n_tok > 0 THEN CAST(COALESCE(t.top_cnt, 0) AS DOUBLE) / b.n_tok
             ELSE CAST(0.0 AS DOUBLE) END) <= 0.2
       AND (CASE WHEN b.n_bigrams > 0
            THEN CAST(b.n_bigrams - b.n_distinct_bigrams AS DOUBLE) / b.n_bigrams
            ELSE CAST(0.0 AS DOUBLE) END) <= 0.5 AS passes
FROM bstat b LEFT JOIN top1 t USING (doc_id)
"""


def _max_run_len(sorted_arr: F.Column) -> F.Column:
    """Longest run of equal adjacent elements in a SORTED array — i.e.
    the max element frequency — computed as one fold, no explode."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


@query("doc_repetition", _REP_ORACLE)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-ONLY plan: the top-token count is the longest equal-run in
    the doc's sorted token array (an O(n log n) per-doc fold inside
    codegen) — no explode, no shuffle; the naive explode → groupBy
    (doc_id, token) version moves every token of the corpus through an
    exchange, ~10× slower at sf0.1 and shuffle-bound at 100 TB. The
    bigram dup fraction is array arithmetic in the same projection.
    r14: one scale-gated RoundRobin spread of the RAW DOC ROWS unlocks
    the cores the single-row-group bench file starves (1.62 -> 0.48 s
    best) — this ships each document once, never a token, so the
    docstring's "no token ever crosses an exchange" stance stands; at
    100 TB the size gate makes it a no-op (tables._spread_scan)."""
    d = t(spark, sf_dir, "documents", spread=True)
    toks = TX.tokens(F.col("text"))
    n = F.size(toks)
    top_cnt = _max_run_len(F.sort_array(toks))
    bigrams = TX.word_shingles(toks, 2)
    nb = F.size(bigrams)
    ndb = F.size(F.array_distinct(bigrams))
    top_frac = F.when(n > 0, top_cnt.cast("double") / n).otherwise(F.lit(0.0))
    dup_frac = F.when(
        nb > 0, (nb - ndb).cast("double") / nb
    ).otherwise(F.lit(0.0))
    out = d.select(
        "doc_id",
        top_frac.alias("top_token_frac"),
        dup_frac.alias("dup_bigram_frac"),
    )
    return out.withColumn(
        "passes",
        (F.col("top_token_frac") <= 0.2) & (F.col("dup_bigram_frac") <= 0.5),
    )


# ---------------------------------------------------------------------------
# corpus_pipeline — the composed clean-corpus materialization: Gopher
# gates + repetition filter + decontamination + exact dedup in ONE plan,
# summarized per source. This is the query a real training-data run
# executes nightly; each stage reuses the single-op building blocks
# above so their individual oracles transfer.
# ---------------------------------------------------------------------------

_PIPE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, md5(text) AS h, {_SQL_TOKS} AS toks
  FROM documents WHERE doc_id % {_DECON_EVAL_MOD} <> 0
),
  gates AS (
    SELECT doc_id, source, h,
      (len(toks) BETWEEN 50 AND 100000)
      AND (CASE WHEN len(toks) > 0
           THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
           ELSE CAST(0.0 AS DOUBLE) END BETWEEN 3.0 AND 10.0)
      AND len(list_filter(toks, x -> list_contains([{_GQ_STOPS_SQL}], x))) >= 2
      AND (CASE WHEN len(toks) > 0
           THEN CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(toks)
           ELSE CAST(0.0 AS DOUBLE) END) > 0.8 AS gopher_ok,
      (CASE WHEN len(toks) > 0 THEN
         CAST((SELECT MAX(c) FROM (
            SELECT COUNT(*) AS c FROM unnest(list_sort(toks)) AS u(tok) GROUP BY tok
         )) AS DOUBLE) / len(toks) ELSE CAST(0.0 AS DOUBLE) END) <= 0.2
      AND (CASE WHEN len({_sql_shingles('toks', 2)}) > 0
           THEN CAST(len({_sql_shingles('toks', 2)}) - len(list_distinct({_sql_shingles('toks', 2)})) AS DOUBLE)
                / len({_sql_shingles('toks', 2)})
           ELSE CAST(0.0 AS DOUBLE) END) <= 0.5 AS rep_ok
    FROM toks
  ),
  shl AS (SELECT doc_id, {_sql_shingles('toks', _DECON_N)} AS shs
          FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)),
  shx AS (SELECT doc_id, unnest(shs) AS shingle FROM shl),
  sh  AS (SELECT DISTINCT doc_id, {_sql_hmod('shingle')} AS sh FROM shx),
  eval_sh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % {_DECON_EVAL_MOD} = 0),
  hits AS (
    SELECT c.doc_id, COUNT(*) AS n_overlap
    FROM (SELECT * FROM sh WHERE doc_id % {_DECON_EVAL_MOD} <> 0) c
    JOIN eval_sh e USING (sh) GROUP BY c.doc_id
  ),
  flagged AS (
    SELECT g.source, g.gopher_ok, g.rep_ok,
           COALESCE(h.n_overlap, 0) < {_DECON_T} AS clean,
           g.doc_id = MIN(g.doc_id) OVER (PARTITION BY g.h) AS canonical
    FROM gates g LEFT JOIN hits h USING (doc_id)
  )
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN gopher_ok AND rep_ok AND clean AND canonical
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN NOT gopher_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_fail,
       CAST(SUM(CASE WHEN NOT rep_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_fail,
       CAST(SUM(CASE WHEN NOT clean THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       CAST(SUM(CASE WHEN NOT canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_dups
FROM flagged GROUP BY source ORDER BY source
"""


@query("corpus_pipeline", _PIPE_ORACLE)
def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source keep/drop accounting for the full cleaning chain.

    Plan shape at 100 TB: the quality/repetition gates are projection
    work fused into the scan; contamination is the broadcast probe of
    ``decontaminate``; exact-dedup canonicality is a window over md5
    partitions (16-byte shuffle keys). One corpus pass + two narrow
    shuffles, then a tiny per-source aggregate."""
    d = t(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % _DECON_EVAL_MOD == 0
    base = d.filter(~is_eval)
    toks = TX.tokens(F.col("text"))
    n = F.size(toks)
    mean_len = TX.avg_token_len(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*_GQ_STOPS)))
    alpha = F.when(
        n > 0,
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))).cast("double") / n,
    ).otherwise(F.lit(0.0))
    top_cnt = _max_run_len(F.sort_array(toks))
    bigrams = TX.word_shingles(toks, 2)
    nb, ndb = F.size(bigrams), F.size(F.array_distinct(bigrams))
    top_frac = F.when(n > 0, top_cnt.cast("double") / n).otherwise(F.lit(0.0))
    dup_frac = F.when(nb > 0, (nb - ndb).cast("double") / nb).otherwise(F.lit(0.0))
    gates = base.select(
        "doc_id",
        "source",
        F.md5(F.col("text").cast("binary")).alias("h"),
        (
            n.between(50, 100000)
            & mean_len.between(3.0, 10.0)
            & (stop_hits >= 2)
            & (alpha > 0.8)
        ).alias("gopher_ok"),
        ((top_frac <= 0.2) & (dup_frac <= 0.5)).alias("rep_ok"),
    )

    def shingle_rows(docs: DataFrame) -> DataFrame:
        return docs.select(
            "doc_id",
            F.explode(
                TX.word_shingles(TX.tokens(F.col("text")), _DECON_N)
            ).alias("shingle"),
        ).select("doc_id", TX.hmod(F.col("shingle")).alias("sh"))

    eval_sh = shingle_rows(d.filter(is_eval)).select("sh").distinct()
    hits = (
        shingle_rows(base)
        .join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh").alias("n_overlap"))
    )
    from pyspark.sql import Window

    canonical = F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("h"))
    flagged = (
        gates.join(hits, "doc_id", "left")
        .withColumn("clean", F.coalesce(F.col("n_overlap"), F.lit(0)) < _DECON_T)
        .withColumn("canonical", canonical)
    )
    kept = F.col("gopher_ok") & F.col("rep_ok") & F.col("clean") & F.col("canonical")
    as_cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            as_cnt(kept).alias("n_kept"),
            as_cnt(~F.col("gopher_ok")).alias("n_gopher_fail"),
            as_cnt(~F.col("rep_ok")).alias("n_rep_fail"),
            as_cnt(~F.col("clean")).alias("n_contaminated"),
            as_cnt(~F.col("canonical")).alias("n_dups"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# kmv_distinct_users — K-minimum-values distinct sketch with PORTABLE
# hashing. HLL estimates (approx_count_distinct) are engine-specific —
# the one rows-only check in the registry — but a KMV over the repo's
# md5-based hmod is deterministic arithmetic BOTH engines replay
# exactly: estimate = floor((k-1) * HASH_MOD / kth_min_hash).
# ---------------------------------------------------------------------------

_KMV_K = 64

_KMV_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT event_type, {_sql_hmod("CAST(user_id AS VARCHAR)")} AS hv
  FROM events
),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv ASC) AS rn
  FROM h
),
agg AS (
  SELECT event_type, COUNT(*) AS n,
         MAX(CASE WHEN rn = {_KMV_K} THEN hv END) AS hk
  FROM r WHERE rn <= {_KMV_K} GROUP BY event_type
)
SELECT event_type,
       CASE WHEN n < {_KMV_K} THEN n
            ELSE CAST(FLOOR(({_KMV_K} - 1) * CAST({TX.HASH_MOD} AS DOUBLE) / hk) AS BIGINT)
       END AS kmv_distinct
FROM agg ORDER BY event_type
"""


@query("kmv_distinct_users", _KMV_ORACLE)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user estimate per event type via KMV.

    Scale shape: distinct hashes shuffle as (type, int64) pairs, and
    the rank<=k filter compiles to WindowGroupLimit — Spark keeps only
    k rows per type PER MAP PARTITION before the exchange, so the
    sketch costs one bounded shuffle regardless of corpus size (the
    same reason top-k-per-key scales)."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    h = e.select(
        "event_type", TX.hmod(F.col("user_id").cast("string")).alias("hv")
    ).distinct()
    # NULLS LAST pins engine parity: Spark ASC defaults nulls-first,
    # DuckDB nulls-last — a NULL hash (NULL user_id) would displace the
    # k-th minimum on one engine only
    w = Window.partitionBy("event_type").orderBy(F.col("hv").asc_nulls_last())
    r = h.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _KMV_K)
    agg = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.when(F.col("rn") == _KMV_K, F.col("hv"))).alias("hk"),
    )
    est = F.when(F.col("n") < _KMV_K, F.col("n")).otherwise(
        F.floor(
            F.lit(_KMV_K - 1) * F.lit(float(TX.HASH_MOD)) / F.col("hk")
        ).cast("long")
    )
    return agg.select("event_type", est.alias("kmv_distinct")).orderBy("event_type")


# ---------------------------------------------------------------------------
# sequence_pack — pack documents into fixed-length training sequences
# (the batcher step before an LLM training run): deterministic global
# order (md5 of doc_id), running token count, sequence k = tokens
# [k*L, (k+1)*L). A naive global cumsum is a single-partition window —
# the anti-pattern; this plan computes it as a DISTRIBUTED prefix sum:
# 256 hash-ordered buckets cumsum independently (parallel), the
# per-bucket totals (256 rows) prefix-sum on one partition (trivial),
# and the bucket offsets broadcast back. Scale: fact shuffles once by
# bucket, once by seq_id; the only serial step is over 256 rows.
# ---------------------------------------------------------------------------

_SEQ_LEN = 512  # tokens per packed sequence

_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR)) AS hkey,
         len({_SQL_TOKS}) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY hkey ASC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
  FROM toks
)
SELECT CAST(FLOOR(cum_before / {_SEQ_LEN}.0) AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM cum
GROUP BY 1
ORDER BY seq_id
"""


@query("sequence_pack", _PACK_ORACLE)
def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    base = d.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("hkey"),
        F.size(toks).alias("n_tokens"),
    ).withColumn(
        # first md5 byte → 256 buckets that partition the hash ORDER:
        # every key in bucket b sorts before every key in bucket b+1,
        # so per-bucket cumsum + bucket offset == global cumsum
        "bucket",
        F.conv(F.substring("hkey", 1, 2), 16, 10).cast("int"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(F.col("hkey").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offsets = (
        base.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("btoks"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("btoks").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "offset")
    )
    packed = (
        base.withColumn("cum_in", F.sum("n_tokens").over(w_in))
        .join(F.broadcast(offsets), "bucket")
        .withColumn(
            "seq_id",
            F.floor(
                (F.col("offset") + F.col("cum_in") - F.col("n_tokens"))
                / F.lit(float(_SEQ_LEN))
            ).cast("long"),
        )
    )
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("seq_id")
    )


# ---------------------------------------------------------------------------
# corpus_mix_weights — training-data MIXING: per-source sampling factors
# that move the corpus toward a target domain distribution
# (downsample-only, factor capped at 1 — the standard pretraining-mix
# shape: you can drop from over-represented sources but not invent
# rows). One map-side source rollup joined to the broadcast target
# spec; factors and the resulting effective sizes are ratios/products
# of exact BIGINTs with one final double division per row. Sources
# absent from the spec get target share 0 → factor 0 (excluded).
# ---------------------------------------------------------------------------

_MIX_TARGETS = (("src0", 40), ("src1", 25), ("src2", 20), ("src3", 15))  # percent

_MIX_VALUES_SQL = ", ".join(f"('{s}', {p})" for s, p in _MIX_TARGETS)

_MIX_ORACLE = f"""
WITH actual AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM actual),
spec(source, target_pct) AS (VALUES {_MIX_VALUES_SQL})
SELECT a.source, a.n_docs, a.n_chars,
       CAST(a.n_chars AS DOUBLE) / t.total_chars AS actual_share,
       COALESCE(s.target_pct, 0) / 100.0 AS target_share,
       LEAST(1.0, (COALESCE(s.target_pct, 0) * t.total_chars)
                  / (100.0 * a.n_chars)) AS sample_factor
FROM actual a
LEFT JOIN spec s ON s.source = a.source
CROSS JOIN tot t
"""


@query("corpus_mix_weights", _MIX_ORACLE)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    actual = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    tot = actual.agg(F.sum("n_chars").cast("long").alias("total_chars"))
    spec = local_df(spark, 
        list(_MIX_TARGETS), "source string, target_pct int"
    )
    j = actual.join(F.broadcast(spec), "source", "left").crossJoin(
        F.broadcast(tot)
    )
    tp = F.coalesce(F.col("target_pct"), F.lit(0))
    # try_divide: a source whose docs are all EMPTY (n_chars 0) is
    # legal dirty data — its sample_factor is undefined → NULL on both
    # engines (ANSI Spark would error on the raw double division;
    # DuckDB yields NULL; see ORACLE_NOTES)
    return j.select(
        "source",
        "n_docs",
        "n_chars",
        F.try_divide(
            F.col("n_chars").cast("double"), F.col("total_chars")
        ).alias("actual_share"),
        (tp / F.lit(100.0)).alias("target_share"),
        F.least(
            F.lit(1.0),
            F.try_divide(
                tp * F.col("total_chars"), F.lit(100.0) * F.col("n_chars")
            ),
        ).alias("sample_factor"),
    )
