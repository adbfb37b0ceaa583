"""North-star text-analysis + dedup queries over ``documents``.

Every query is verified against a DuckDB oracle that mirrors the exact
arithmetic — possible because all hashing goes through the portable
md5-hex→int64 scheme (functions.text.h60) and all set math is integer.

Scale notes: everything here is explode → hash-partitioned groupBy/join
on hashes (16-byte keys), never on document bodies; candidate
generation for near-dup is equi-join-on-bucket, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions import similarity as SIM
from ..operators.dedup import exact_dedup_groups
from ..localdf import local_df
from .registry import query, t

# --- shared SQL fragments (the DuckDB mirror of functions.text) -----------

_SQL_TOKS = (
    "CASE WHEN length(trim(text)) = 0 THEN [] "
    "ELSE string_split_regex(trim(text), '\\s+') END"
)


def _sql_hmod(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT % {TX.HASH_MOD})"


def _sql_shingles(toks: str, n: int) -> str:
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(generate_series(1, len({toks}) - {n - 1}), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )


def _sql_stop_ratio(toks: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"CAST(len(list_filter({toks}, x -> list_contains([{lst}], x))) AS DOUBLE)"
        f" / len({toks}) ELSE CAST(0.0 AS DOUBLE) END"
    )


#: distinct (doc_id, shingle-hash) rows — basis for jaccard/minhash oracles
_SQL_SHINGLE_TABLE = f"""
  toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
  shl  AS (SELECT doc_id, {_sql_shingles('toks', 3)} AS shs FROM toks),
  shx  AS (SELECT doc_id, unnest(shs) AS shingle FROM shl),
  sh   AS (SELECT DISTINCT doc_id, {_sql_hmod('shingle')} AS sh FROM shx)
"""

# ---------------------------------------------------------------------------
# doc_token_stats — token counting (north-star text analysis)
# ---------------------------------------------------------------------------

_TOKEN_STATS_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_distinct,
       CASE WHEN len(toks) > 0
            THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
            ELSE CAST(0.0 AS DOUBLE) END AS avg_token_len
FROM toks
"""


@query("doc_token_stats", _TOKEN_STATS_ORACLE)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        TX.avg_token_len(toks).alias("avg_token_len"),
    )


# ---------------------------------------------------------------------------
# doc_language — stopword-ratio language ID with deterministic argmax
# ---------------------------------------------------------------------------


def _lang_oracle() -> str:
    scores = {
        lang: _sql_stop_ratio("toks", words) for lang, words in TX.STOPWORDS.items()
    }
    langs = sorted(scores)
    best = "GREATEST(" + ", ".join(f"{lang}_score" for lang in langs) + ")"
    case = " ".join(
        f"WHEN {best} > 0 AND {lang}_score = {best} THEN '{lang}'" for lang in langs
    )
    cols = ", ".join(f"{scores[lang]} AS {lang}_score" for lang in langs)
    return f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
scored AS (SELECT doc_id, {cols} FROM toks)
SELECT doc_id, {', '.join(f'{lang}_score' for lang in langs)},
       CASE {case} ELSE 'und' END AS predicted_lang
FROM scored
"""


@query("doc_language", _lang_oracle())
def doc_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    scores = TX.language_scores(F.col("text"))
    cols = [scores[lang].alias(f"{lang}_score") for lang in sorted(scores)]
    return d.select(
        "doc_id", *cols, TX.predicted_language(F.col("text")).alias("predicted_lang")
    )


# ---------------------------------------------------------------------------
# doc_quality — composite quality score (north-star quality scoring)
# ---------------------------------------------------------------------------

_QUALITY_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
SELECT doc_id,
       CAST(0.4 AS DOUBLE) * (CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE CAST(0.0 AS DOUBLE) END)
     + CAST(0.3 AS DOUBLE) * {_sql_stop_ratio('toks', TX.STOPWORDS['en'])}
     + CAST(0.3 AS DOUBLE) * LEAST(CAST(1.0 AS DOUBLE), CAST(len(toks) AS DOUBLE) / CAST(64.0 AS DOUBLE))
       AS quality
FROM toks
"""


@query("doc_quality", _QUALITY_ORACLE)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", TX.quality_score(F.col("text")).alias("quality"))


# ---------------------------------------------------------------------------
# doc_fingerprint — min portable hash over 3-gram shingles (winnowing-style
# global minimum fingerprint)
# ---------------------------------------------------------------------------

_FINGERPRINT_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
shl AS (SELECT doc_id, toks, {_sql_shingles('toks', 3)} AS shs FROM toks),
basis AS (SELECT doc_id, CASE WHEN len(shs) > 0 THEN shs ELSE toks END AS basis FROM shl)
SELECT doc_id,
       list_aggregate(list_transform(basis, s -> {_sql_hmod('s')}), 'min') AS fingerprint
FROM basis
"""


@query("doc_fingerprint", _FINGERPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint(F.col("text"), 3).alias("fingerprint"))


# ---------------------------------------------------------------------------
# dedup_exact — content-hash exact dedup groups (north-star)
# ---------------------------------------------------------------------------

_EXACT_DEDUP_ORACLE = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents GROUP BY md5(text)
"""


@query("dedup_exact", _EXACT_DEDUP_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(t(spark, sf_dir, "documents"), "text", "doc_id")


# ---------------------------------------------------------------------------
# simhash_docs — 32-bit portable SimHash
# ---------------------------------------------------------------------------


def _simhash_ctes() -> str:
    """CTE chain ending in ``sim(doc_id, simhash)`` — shared by the
    simhash query and the near-dup query."""
    votes = ", ".join(
        f"SUM(CASE WHEN (th >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(SIM.SIMHASH_BITS)
    )
    acc = " + ".join(
        f"CASE WHEN v{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END"
        for j in range(SIM.SIMHASH_BITS)
    )
    return f"""
toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
tokx AS (SELECT DISTINCT doc_id, unnest(toks) AS tok FROM toks),
th AS (SELECT doc_id, (('0x' || substr(md5(tok), 1, 15))::BIGINT % 4294967296) AS th FROM tokx),
votes AS (SELECT doc_id, {votes} FROM th GROUP BY doc_id),
sim AS (SELECT doc_id, {acc} AS simhash FROM votes)
"""


def _simhash_oracle() -> str:
    return f"WITH {_simhash_ctes()} SELECT doc_id, simhash FROM sim"


@query("simhash_docs", _simhash_oracle())
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.simhash(t(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------------------------------------------------------------------
# ngram_jaccard_top — exact n-gram Jaccard near-dup pairs (candidates by
# shared shingle, never all-pairs), top-50 deterministic
# ---------------------------------------------------------------------------

_JACCARD_ORACLE = f"""
WITH {_SQL_SHINGLE_TABLE},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b,
         CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, jaccard FROM jac
ORDER BY jaccard DESC, id_a ASC, id_b ASC
LIMIT 50
"""


@query("ngram_jaccard_top", _JACCARD_ORACLE)
def ngram_jaccard_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    # df-capped candidate generation: hot shingles never enter the
    # self-join (bounded fan-out at 100 TB); output is runtime-certified
    # equal to the exact unfiltered top-50 the oracle computes.
    return SIM.df_capped_jaccard_topk(
        t(spark, sf_dir, "documents", spread=True),
        "doc_id", "text", k=50, shingle_n=3, df_cap=64
    )


# ---------------------------------------------------------------------------
# minhash_signatures — k=16 portable MinHash signature per doc
# ---------------------------------------------------------------------------

_MINHASH_K = 16
_MINHASH_BANDS = 8  # rows per band = 2


def _minhash_sig_sql() -> str:
    mins = ", ".join(
        f"MIN(({a} * sh + {b}) % {TX.HASH_MOD}) AS mh{i}"
        for i, (a, b) in enumerate(SIM.minhash_params(_MINHASH_K))
    )
    return f"WITH {_SQL_SHINGLE_TABLE} SELECT doc_id, {mins} FROM sh GROUP BY doc_id"


@query("minhash_signatures", _minhash_sig_sql())
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.minhash_signatures(
        t(spark, sf_dir, "documents"), "doc_id", "text", k=_MINHASH_K, shingle_n=3
    )


# ---------------------------------------------------------------------------
# minhash_lsh_pairs — LSH banding candidates + signature-estimated jaccard
# ---------------------------------------------------------------------------


def _minhash_lsh_sql() -> str:
    rows = _MINHASH_K // _MINHASH_BANDS
    band_selects = []
    for bnd in range(_MINHASH_BANDS):
        key = " || ',' || ".join(
            f"CAST(mh{bnd * rows + j} AS VARCHAR)" for j in range(rows)
        )
        band_selects.append(
            f"SELECT doc_id, {bnd} AS band, {key} AS band_key FROM sigs"
        )
    buckets = " UNION ALL ".join(band_selects)
    eq = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(_MINHASH_K)
    )
    mins = ", ".join(
        f"MIN(({a} * sh + {b}) % {TX.HASH_MOD}) AS mh{i}"
        for i, (a, b) in enumerate(SIM.minhash_params(_MINHASH_K))
    )
    return f"""
WITH {_SQL_SHINGLE_TABLE},
sigs AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
buckets AS ({buckets}),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT p.id_a, p.id_b, ({eq}) / CAST({_MINHASH_K} AS DOUBLE) AS est_jaccard
FROM pairs p
JOIN sigs sa ON sa.doc_id = p.id_a
JOIN sigs sb ON sb.doc_id = p.id_b
"""


@query("minhash_lsh_pairs", _minhash_lsh_sql())
def minhash_lsh_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the signature build's shingle explode is scan-rooted CPU
    # (r14 interleaved: 1.92 -> 1.24 s best)
    docs = t(spark, sf_dir, "documents", spread=True)
    # lazy truncation: the bucket self-join references sigs on BOTH
    # sides, so the un-truncated tree carries the shingle explode +
    # 16-min aggregate twice (measured r14: 1.68 -> 1.46 s best). NOT
    # applied inside lsh_verified_pairs — there the same checkpoint
    # serializes against the verify stage's own eager shingle
    # checkpoint and measured slightly slower.
    sigs = SIM.minhash_signatures(
        docs, "doc_id", "text", k=_MINHASH_K, shingle_n=3
    ).localCheckpoint(eager=False)
    # fused path: signatures ride through the bucket join, estimate
    # computed in the candidate stage (no join back to sigs)
    return SIM.lsh_similar_pairs(sigs, "doc_id", k=_MINHASH_K, bands=_MINHASH_BANDS)


# ---------------------------------------------------------------------------
# multimodal_meta — opaque-binary column plumbing: payload bytes + digest
# (decode/feature-extraction runs as mapInPandas over these payloads; see
# functions/multimodal.py — the metadata path is fully verifiable)
# ---------------------------------------------------------------------------

_MULTIMODAL_ORACLE = """
SELECT doc_id,
       'text' AS modality,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS digest
FROM documents
"""


@query("multimodal_meta", _MULTIMODAL_ORACLE)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.lit("text").alias("modality"),
        F.length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("digest"),
    )


# ---------------------------------------------------------------------------
# simhash_near_dups — the SimHash dedup end-game: byte-band the 32-bit
# hash (pigeonhole: hamming<=3 pairs must share a band), candidates via
# band equi-join, exact hamming verify via bit_count(xor).
# ---------------------------------------------------------------------------

#: pigeonhole guarantee: 4 byte-bands over 32 bits give FULL recall only
#: for hamming ≤ 3 (4+ differing bits can land one per band and share no
#: band) — so the threshold IS the guarantee, not a loose cut above it
_HAMMING_MAX = 3


def _simhash_near_oracle() -> str:
    bands = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {j} AS band, (simhash >> {8 * j}) & 255 AS byte FROM sim"
        for j in range(4)
    )
    return f"""
WITH {_simhash_ctes()},
bands AS ({bands}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, a.simhash AS sh_a, b.doc_id AS id_b, b.simhash AS sh_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b)) AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)) <= {_HAMMING_MAX}
"""


@query("simhash_near_dups", _simhash_near_oracle())
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    sim = SIM.simhash(t(spark, sf_dir, "documents"), "doc_id", "text").localCheckpoint(eager=True)
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band"),
                    F.shiftright(F.col("simhash"), 8 * j).bitwiseAND(F.lit(255)).alias("byte"),
                )
                for j in range(4)
            ])
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band", "b.byte")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, on=["band", "byte"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= _HAMMING_MAX
    )


# ---------------------------------------------------------------------------
# corpus_clean — the composite training-data pipeline: exact-dedup
# (canonical min-id per content hash) → language filter → quality
# threshold → per-source stats. One declarative plan end-to-end.
# ---------------------------------------------------------------------------


def _corpus_clean_oracle() -> str:
    lang_case = (
        "CASE WHEN GREATEST(en_s, de_s, es_s) > 0 AND en_s = GREATEST(en_s, de_s, es_s) THEN 'en' "
        "WHEN GREATEST(en_s, de_s, es_s) > 0 AND de_s = GREATEST(en_s, de_s, es_s) THEN 'de' "
        "WHEN GREATEST(en_s, de_s, es_s) > 0 AND es_s = GREATEST(en_s, de_s, es_s) THEN 'es' "
        "ELSE 'und' END"
    )
    return f"""
WITH toks AS (SELECT doc_id, source, text, {_SQL_TOKS} AS toks FROM documents),
scored AS (
  SELECT doc_id, source,
         CAST(0.4 AS DOUBLE) * (CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE CAST(0.0 AS DOUBLE) END)
       + CAST(0.3 AS DOUBLE) * {_sql_stop_ratio('toks', TX.STOPWORDS['en'])}
       + CAST(0.3 AS DOUBLE) * LEAST(CAST(1.0 AS DOUBLE), CAST(len(toks) AS DOUBLE) / CAST(64.0 AS DOUBLE)) AS quality,
         {_sql_stop_ratio('toks', TX.STOPWORDS['en'])} AS en_s,
         {_sql_stop_ratio('toks', TX.STOPWORDS['de'])} AS de_s,
         {_sql_stop_ratio('toks', TX.STOPWORDS['es'])} AS es_s,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
  FROM toks
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CAST(ROUND(quality, 6) AS DECIMAL(27,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_quality
FROM scored
WHERE rn = 1 AND quality >= 0.5 AND {lang_case} = 'en'
GROUP BY source
"""


@query("corpus_clean", _corpus_clean_oracle())
def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import first_per_key

    d = t(spark, sf_dir, "documents")
    canonical = first_per_key(
        d.withColumn("_h", F.md5(F.col("text"))), ["_h"], [F.col("doc_id").asc()]
    ).drop("_h")
    scored = canonical.withColumn("quality", TX.quality_score(F.col("text"))).withColumn(
        "predicted", TX.predicted_language(F.col("text"))
    )
    kept = scored.filter((F.col("quality") >= 0.5) & (F.col("predicted") == "en"))
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.round(F.col("quality"), 6).cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_quality"),
    )


# ---------------------------------------------------------------------------
# bpe_token_stats — 'BPE-ish regex' token counting (BASELINE.json):
# lowercase runs / digit runs / punctuation runs as subword-ish units,
# via regexp_extract_all in both engines.
# ---------------------------------------------------------------------------

_BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"

_BPE_ORACLE = f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) AS n_bpe_tokens,
       len(list_distinct(regexp_extract_all(lower(text), '{_BPE_PATTERN}'))) AS n_bpe_distinct
FROM documents
"""


@query("bpe_token_stats", _BPE_ORACLE)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_bpe_distinct"),
    )


# ---------------------------------------------------------------------------
# token_doc_freq — corpus-level document frequency per token (the IDF
# denominator): explode distinct tokens per doc, count docs per token.
# Shuffle carries (token, 1) pairs with map-side combine.
# ---------------------------------------------------------------------------

_DOC_FREQ_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
tokx AS (SELECT DISTINCT doc_id, unnest(toks) AS token FROM toks)
SELECT token, COUNT(*) AS doc_freq
FROM tokx GROUP BY token
"""


@query("token_doc_freq", _DOC_FREQ_ORACLE)
def token_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    tokx = d.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("token")
    ).distinct()
    return tokx.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))


# ---------------------------------------------------------------------------
# doc_winnow — true positional winnowing (Schleimer et al.): the min
# shingle-hash of every sliding window of w=4 consecutive shingles, as
# a distinct fingerprint set per doc. Guarantees any shared run of
# w+n-1 tokens yields a shared fingerprint.
# ---------------------------------------------------------------------------

_WINNOW_W = 4


def _winnow_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
shl AS (SELECT doc_id, {_sql_shingles('toks', 3)} AS shs FROM toks),
hs AS (SELECT doc_id, list_transform(shs, s -> {_sql_hmod('s')}) AS hs FROM shl),
wins AS (
  SELECT doc_id,
         CASE WHEN len(hs) >= {_WINNOW_W}
              THEN list_transform(generate_series(1, len(hs) - {_WINNOW_W - 1}),
                                  i -> list_aggregate(hs[i:i+{_WINNOW_W - 1}], 'min'))
              ELSE CASE WHEN len(hs) > 0 THEN [list_aggregate(hs, 'min')] ELSE [] END
         END AS fps
  FROM hs
)
SELECT DISTINCT doc_id, unnest(fps) AS fingerprint FROM wins
"""


@query("doc_winnow", _winnow_oracle())
def doc_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    hs = F.transform(TX.word_shingles(toks, 3), lambda s: TX.hmod(s))
    k = F.size(hs) - F.lit(_WINNOW_W - 1)
    windows = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_min(F.slice(hs, i, _WINNOW_W)),
        ),
    ).otherwise(
        F.when(F.size(hs) > 0, F.array(F.array_min(hs))).otherwise(
            F.array().cast("array<bigint>")
        )
    )
    return (
        d.select("doc_id", F.explode(windows).alias("fingerprint")).distinct()
    )


# ---------------------------------------------------------------------------
# corpus_sample — deterministic content-hash sampling (the reproducible
# alternative to rand() sampling a training pipeline needs: the same
# doc always lands in or out, regardless of partitioning/cluster size).
# ---------------------------------------------------------------------------

_SAMPLE_ORACLE = f"""
SELECT doc_id, source
FROM documents
WHERE {_sql_hmod('text')} % 100 < 10
"""


@query("corpus_sample", _SAMPLE_ORACLE)
def corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.filter(TX.hmod(F.col("text")) % 100 < 10).select("doc_id", "source")


# ---------------------------------------------------------------------------
# corpus_split — stratified train/val/test assignment by content-hash
# bucket (90/5/5), reported per (source, split). Deterministic: a doc's
# split never changes when the corpus grows.
# ---------------------------------------------------------------------------

_SPLIT_ORACLE = f"""
WITH assigned AS (
  SELECT source,
         CASE WHEN {_sql_hmod('text')} % 100 < 90 THEN 'train'
              WHEN {_sql_hmod('text')} % 100 < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT source, split, COUNT(*) AS n
FROM assigned GROUP BY source, split
"""


@query("corpus_split", _SPLIT_ORACLE)
def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    bucket = TX.hmod(F.col("text")) % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        d.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# tfidf_top_terms — per-document top-3 terms by tf·(N/df). All inputs are
# exact integer counts; the single double division per term is
# IEEE-identical across engines (no log, deliberately). Plan shape:
# explode → two hash aggs sharing the token-key shuffle → join on token
# → per-doc window top-k. At scale df is vocabulary-sized (≪ corpus) →
# broadcast; the explode never materializes document bodies, only
# (doc_id, token) pairs.
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf,
         CAST(tf * (SELECT n FROM n) AS DOUBLE) / CAST(df AS DOUBLE) AS tfidf
  FROM tf JOIN df USING (tok)
)
SELECT doc_id, tok, tf, tfidf
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC
  ) AS rn FROM scored
) WHERE rn <= 3
"""


@query("tfidf_top_terms", _TFIDF_ORACLE)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            "tf",
            (
                (F.col("tf") * F.col("_n")).cast("double")
                / F.col("df").cast("double")
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# bigram_lift_top — corpus-level collocation mining: lift(a,b) =
# N·c(a,b) / (c(a)·c(b)) over consecutive-token bigrams, min support 5,
# top-20. Integer numerators/denominators (counts), one double division
# → cross-engine exact. The bigram explode reuses the token explode's
# shape; both unigram joins broadcast the vocabulary-sized count table.
# ---------------------------------------------------------------------------

_BIGRAM_LIFT_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
uni AS (
  SELECT tok, COUNT(*) AS c FROM (SELECT unnest(toks) AS tok FROM toks) GROUP BY tok
),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
bg AS (
  SELECT bigram, COUNT(*) AS c_ab FROM (
    SELECT unnest(
      CASE WHEN len(toks) >= 2 THEN
        list_transform(generate_series(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i + 1])
      ELSE [] END
    ) AS bigram
    FROM toks
  ) GROUP BY bigram
)
SELECT bigram, CAST(c_ab AS BIGINT) AS c_ab,
       CAST(c_ab * (SELECT n FROM n) AS DOUBLE)
         / CAST(ua.c * ub.c AS DOUBLE) AS lift
FROM bg
JOIN uni ua ON ua.tok = string_split(bigram, ' ')[1]
JOIN uni ub ON ub.tok = string_split(bigram, ' ')[2]
WHERE c_ab >= 5
ORDER BY lift DESC, bigram ASC
LIMIT 20
"""


@query("bigram_lift_top", _BIGRAM_LIFT_ORACLE)
def bigram_lift_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", TX.tokens(F.col("text")).alias("toks"))
    uni = (
        toks.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = uni.agg(F.sum("c").cast("bigint").alias("_n"))
    bigrams = toks.select(
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> concat(toks[i], ' ', toks[i + 1]))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram")
    )
    bg = bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("c_ab"))
    ua = uni.select(F.col("tok").alias("_ta"), F.col("c").alias("_ca"))
    ub = uni.select(F.col("tok").alias("_tb"), F.col("c").alias("_cb"))
    parts = F.split(F.col("bigram"), " ")
    return (
        bg.filter(F.col("c_ab") >= 5)
        .withColumn("_a", parts.getItem(0))
        .withColumn("_b", parts.getItem(1))
        .join(F.broadcast(ua), F.col("_a") == F.col("_ta"))
        .join(F.broadcast(ub), F.col("_b") == F.col("_tb"))
        .crossJoin(F.broadcast(n))
        .select(
            "bigram",
            "c_ab",
            (
                (F.col("c_ab") * F.col("_n")).cast("double")
                / (F.col("_ca") * F.col("_cb")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("bigram").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# dedup_components — near-dup PAIRS → dedup GROUPS: connected components
# (iterative min-label propagation, operators.dedup.connected_components)
# over the jaccard≥0.3 edge set, then one row per doc with its component
# and a canonical flag (keep component-min). The oracle computes the
# same fixpoint with a recursive CTE — matching it exactly is the
# convergence proof for the iterative path. This is the missing step
# between pairwise similarity and an actually-deduplicated corpus.
# ---------------------------------------------------------------------------

_COMPONENTS_ORACLE = f"""
WITH RECURSIVE {_SQL_SHINGLE_TABLE},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.3
),
sym AS (SELECT id_a AS a, id_b AS b FROM edges
        UNION ALL SELECT id_b, id_a FROM edges),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.a, reach.r FROM sym s JOIN reach ON reach.id = s.b
)
SELECT id AS doc_id, MIN(r) AS component,
       CAST(MIN(r) = id AS BOOLEAN) AS is_canonical
FROM reach GROUP BY id
"""


@query("dedup_components", _COMPONENTS_ORACLE)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    # spread: edge generation's shingle explode is scan-rooted CPU
    # (r14 interleaved best-of-4: 2.88 -> 2.63 s, 4/4 pairwise wins,
    # mean 3.76 -> 2.82; tables._spread_scan for the scale gate)
    d = t(spark, sf_dir, "documents", spread=True)
    edges = SIM.ngram_jaccard_pairs(d, "doc_id", "text", shingle_n=3, threshold=0.3)
    comp = connected_components(
        d.select("doc_id"), edges, id_col="doc_id", src_col="id_a", dst_col="id_b"
    )
    return comp.select(
        "doc_id",
        "component",
        (F.col("component") == F.col("doc_id")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# sample_k_per_source — fixed-size uniform sample per group (reservoir-
# equivalent, deterministic): rank docs inside each source by the
# portable hash of their id and keep the first 3. Hash-rank order is a
# uniform permutation, so this IS sampling-without-replacement, but
# reproducible across engines/reruns — the property a train/eval
# pipeline actually needs. One window shuffle on source; no RNG state.
# ---------------------------------------------------------------------------

_K_PER_SOURCE_ORACLE = f"""
SELECT source, doc_id
FROM (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_sql_hmod("CAST(doc_id AS VARCHAR)")} ASC, doc_id ASC
         ) AS rn
  FROM documents
) WHERE rn <= 3
"""


@query("sample_k_per_source", _K_PER_SOURCE_ORACLE)
def sample_k_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    h = TX.hmod(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .select("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# dedup_keep_best — canonical selection by QUALITY, not min-id: within
# each exact-duplicate text group keep the doc with the longest text
# (proxy ranking; ties → min doc_id). This is the retention policy a
# corpus pipeline actually wants — "keep the best copy" — layered on the
# same hash-group shuffle as dedup_exact.
# ---------------------------------------------------------------------------

_KEEP_BEST_ORACLE = f"""
SELECT doc_id, source, n_chars
FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (
           PARTITION BY {_sql_hmod('text')}
           ORDER BY n_chars DESC, doc_id ASC
         ) AS rn
  FROM documents
) WHERE rn = 1
"""


@query("dedup_keep_best", _KEEP_BEST_ORACLE)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy(TX.hmod(F.col("text"))).orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        d.select("doc_id", "source", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_chars")
    )


# ---------------------------------------------------------------------------
# containment_pairs — asymmetric near-containment detection (quotes /
# excerpts / subset docs): C(A→B) = |A∩B|/|A| per directed pair, the
# pairs a symmetric Jaccard threshold misses when a small doc hides
# inside a big one. Same bucketed candidate generation as the jaccard
# family (equi-join on shingle hash).
# ---------------------------------------------------------------------------

_CONTAIN_T = 0.5

_CONTAINMENT_ORACLE = f"""
WITH {_SQL_SHINGLE_TABLE},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
j AS (
  SELECT id_a, id_b, n_inter, sa.sz AS sz_a, sb.sz AS sz_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
)
SELECT id_a AS id_sub, id_b AS id_super,
       ROUND(CAST(n_inter AS DOUBLE) / sz_a, 6) AS containment
FROM j WHERE ROUND(CAST(n_inter AS DOUBLE) / sz_a, 6) >= {_CONTAIN_T}
UNION ALL
SELECT id_b, id_a, ROUND(CAST(n_inter AS DOUBLE) / sz_b, 6)
FROM j WHERE ROUND(CAST(n_inter AS DOUBLE) / sz_b, 6) >= {_CONTAIN_T}
"""


@query("containment_pairs", _CONTAINMENT_ORACLE)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the shingle explode is scan-rooted CPU (r14 interleaved
    # 2.51 -> 2.05 s best; tables._spread_scan for the scale gate)
    d = t(spark, sf_dir, "documents", spread=True)
    return SIM.ngram_containment_pairs(
        d, "doc_id", "text", shingle_n=3, threshold=_CONTAIN_T
    )


# ---------------------------------------------------------------------------
# media_features — the mapInPandas DECODE path as a driver query: text
# payloads ride the binary-asset pipeline (payload → Arrow batch →
# Python worker → feature vector) with the deterministic-fake decoder,
# so the full multimodal plumbing is oracle-verified end to end (the
# fake feature is a pure function of the sha256 digest, expressible in
# SQL). Features surface as SCALAR f0/f7 probes + a checksum — never an
# array column (driver canonicalizer can't sort arrays).
# ---------------------------------------------------------------------------

_MEDIA_FEATURES_ORACLE = """
WITH a AS (
  SELECT CAST(doc_id AS VARCHAR) AS asset_id,
         CASE WHEN text IS NULL THEN NULL ELSE sha256(text) END AS digest,
         COALESCE(octet_length(encode(text)), 0) AS n_bytes,
         text IS NULL AS is_null
  FROM documents
),
b AS (
  SELECT asset_id, digest, n_bytes, is_null,
         CASE WHEN digest IS NULL THEN NULL ELSE
           list_transform(generate_series(0, 7),
             i -> ROUND(('0x' || substr(digest, 2 * i + 1, 2))::INT / 255.0, 6)
           ) END AS f
  FROM a
)
SELECT asset_id, n_bytes, digest,
       CASE WHEN is_null THEN 'null_payload' ELSE 'ok' END AS decode_status,
       f[1] AS f0, f[8] AS f7,
       ROUND(list_sum(f), 6) AS f_sum
FROM b
"""


@query("media_features", _MEDIA_FEATURES_ORACLE)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import extract_features

    d = t(spark, sf_dir, "documents")
    assets = d.select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    feats = extract_features(assets, deterministic_fake=True)
    fd = F.transform(F.col("feature"), lambda x: x.cast("double"))
    return feats.select(
        "asset_id",
        "n_bytes",
        "digest",
        "decode_status",
        F.round(F.element_at(fd, 1), 6).alias("f0"),
        F.round(F.element_at(fd, 8), 6).alias("f7"),
        F.round(
            F.aggregate(fd, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("f_sum"),
    )


# ---------------------------------------------------------------------------
# media_frame_sample — the video frame-sampling partition-explode as a
# driver query: every-10th synthetic frame index per asset (frame count
# derived from payload size; pixel decode stays behind the env gate).
# ---------------------------------------------------------------------------

_FRAME_SAMPLE_ORACLE = """
SELECT CAST(doc_id AS VARCHAR) AS asset_id,
       unnest(generate_series(
         0, CAST(octet_length(encode(text)) // 1024 AS INT), 10
       )) AS frame_index
FROM documents
"""


@query("media_frame_sample", _FRAME_SAMPLE_ORACLE)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.multimodal import frame_sample_plan

    d = t(spark, sf_dir, "documents")
    assets = d.select(
        F.col("doc_id").cast("string").alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    return frame_sample_plan(assets, every_n=10)


# ---------------------------------------------------------------------------
# lsh_verified_pairs — the production dedup pattern in one query: LSH
# banding proposes candidates (recall lever, bucketed equi-join), exact
# n-gram Jaccard verifies them (precision gate). Verification cost is
# bounded by the CANDIDATE count (each pair's shingles join through the
# pair list), never by the corpus pair space — the property that lets
# the same plan run at 100 TB. Estimated-vs-exact disagreement is the
# documented false-positive band of MinHash.
# ---------------------------------------------------------------------------

_VERIFY_T = 0.3


def _lsh_verified_sql() -> str:
    rows = _MINHASH_K // _MINHASH_BANDS
    band_selects = []
    for bnd in range(_MINHASH_BANDS):
        key = " || ',' || ".join(
            f"CAST(mh{bnd * rows + j} AS VARCHAR)" for j in range(rows)
        )
        band_selects.append(
            f"SELECT doc_id, {bnd} AS band, {key} AS band_key FROM sigs"
        )
    buckets = " UNION ALL ".join(band_selects)
    mins = ", ".join(
        f"MIN(({a} * sh + {b}) % {TX.HASH_MOD}) AS mh{i}"
        for i, (a, b) in enumerate(SIM.minhash_params(_MINHASH_K))
    )
    return f"""
WITH {_SQL_SHINGLE_TABLE},
sigs AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
buckets AS ({buckets}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id)
SELECT i.id_a, i.id_b,
       CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= {_VERIFY_T}
"""


@query("lsh_verified_pairs", _lsh_verified_sql())
def lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the checkpointed shingle build is scan-rooted CPU (r14:
    # 2.43 -> 1.44 s best; split_leakage_audit inherits the win)
    docs = t(spark, sf_dir, "documents", spread=True)
    sh = SIM.shingle_table(docs, "doc_id", "text", 3).localCheckpoint(eager=True)
    # r14: signatures derive from the checkpointed DISTINCT shingle
    # table instead of a second full shingle-explode over documents —
    # MIN is duplicate-insensitive, so the signatures are bit-identical
    # to minhash_signatures(docs) (the same derivation
    # minhash_error_audit uses, and exactly the oracle's `sigs AS
    # (... FROM sh GROUP BY doc_id)`). One corpus shingle scan instead
    # of two (guide §1.2). The candidate join also drops the fused
    # estimate (lsh_candidate_pairs, not lsh_similar_pairs): the
    # verify stage recomputes exact Jaccard anyway, so carrying the
    # 16-element sig array through the band self-join only widened the
    # shuffle (guide §2.3).
    # r14 follow-up: the per-doc `sizes` count rides the SAME groupBy
    # (sh is distinct, so COUNT(*) here == the oracle's sizes CTE) and
    # the fused aggregate is lazily checkpointed — sh is aggregated by
    # doc_id ONCE per run instead of twice (sigs + sizes), and the four
    # plan references (band self-join a/b, sz_a, sz_b) share the
    # materialized result (guide §1.2; interleaved A/B with
    # split_leakage_audit 4/4 wins, 2.00 -> 1.78 s best).
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("sh") + F.lit(b)) % F.lit(TX.HASH_MOD)).alias(
                f"mh{i}"
            )
            for i, (a, b) in enumerate(SIM.minhash_params(_MINHASH_K))
        ],
        F.count(F.lit(1)).alias("sz"),
    ).localCheckpoint(eager=False)
    cand = SIM.lsh_candidate_pairs(
        sigs, "doc_id", k=_MINHASH_K, bands=_MINHASH_BANDS
    )
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("id_a"), "sh"), "id_a")
        .join(sh.select(F.col("doc_id").alias("id_b"), "sh"), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = (
        inter.join(sigs.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sigs.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
    )
    return jac.filter(F.col("jaccard") >= _VERIFY_T).select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# token_budget_select — data selection under a global token budget: take
# docs in quality order (best first) until the budget is exhausted — the
# curation step between scoring and training. The greedy prefix needs a
# GLOBAL running token count over the quality order; computed with the
# same distributed-prefix-sum shape as sequence_pack, bucketing by
# quantized quality (floor is monotone, so bucket order == quality
# order) — the per-doc cumsum window stays 256-way parallel.
# ---------------------------------------------------------------------------

_TOKEN_BUDGET = 20_000

_BUDGET_ORACLE = f"""
WITH toks AS (SELECT doc_id, source, {_SQL_TOKS} AS toks FROM documents),
scored AS (
  SELECT doc_id, source, len(toks) AS n_tokens,
         CAST(0.4 AS DOUBLE) * (CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE CAST(0.0 AS DOUBLE) END)
       + CAST(0.3 AS DOUBLE) * {_sql_stop_ratio('toks', TX.STOPWORDS['en'])}
       + CAST(0.3 AS DOUBLE) * LEAST(CAST(1.0 AS DOUBLE), CAST(len(toks) AS DOUBLE) / CAST(64.0 AS DOUBLE))
         AS quality
  FROM toks
),
cum AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
  FROM scored
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM cum WHERE cum_before < {_TOKEN_BUDGET}
GROUP BY source
ORDER BY source
"""


@query("token_budget_select", _BUDGET_ORACLE)
def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    scored = d.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tokens"),
        TX.quality_score(F.col("text")).alias("quality"),
    ).withColumn(
        # quantized-quality bucket: floor is monotone DEcreasing in
        # quality here, so every doc in bucket b outranks every doc in
        # bucket b+1 — per-bucket cumsum + bucket offsets == the global
        # cumsum over (quality DESC, doc_id ASC)
        "bucket",
        F.least(
            F.greatest(
                F.floor((F.lit(1.0) - F.col("quality")) * 256).cast("int"), F.lit(0)
            ),
            F.lit(255),
        ),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offsets = (
        scored.groupBy("bucket")
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
    picked = (
        scored.withColumn("cum_in", F.sum("n_tokens").over(w_in))
        .join(F.broadcast(offsets), "bucket")
        .filter(
            (F.col("offset") + F.col("cum_in") - F.col("n_tokens"))
            < F.lit(_TOKEN_BUDGET)
        )
    )
    return (
        picked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# passage_dedup — passage-level exact dedup with reassembly (the
# RefinedWeb/CCNet shape): split every document into fixed token
# passages, keep only the globally FIRST occurrence of each passage
# (first = lowest (doc_id, position)), and reassemble the surviving
# passages in document order. Unlike document-level dedup this removes
# boilerplate repeated ACROSS documents while keeping the unique
# remainder of each.
#
# Scale shape: the dedup key is the passage string (16-byte hash at
# scale) — groupBy(passage).agg(min(struct(doc_id, pos))) instead of a
# row_number window, so a pathologically hot passage (site boilerplate
# in 10⁹ docs) collapses MAP-SIDE via partial aggregation rather than
# routing every copy through one reducer. Reassembly is one shuffle on
# doc_id with collect_list over (pos, passage) structs.
# ---------------------------------------------------------------------------

_PASS_N = 3  # tokens per passage


_PASSAGE_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS tk FROM documents),
np AS (
  SELECT doc_id, tk,
         CAST((len(tk) + {_PASS_N - 1}) // {_PASS_N} AS INT) AS n_pass
  FROM toks
),
p AS (
  SELECT doc_id, pos,
         array_to_string(tk[pos * {_PASS_N} + 1 : pos * {_PASS_N} + {_PASS_N}], ' ')
           AS passage
  FROM (
    SELECT doc_id, tk, unnest(generate_series(0, n_pass - 1)) AS pos FROM np
  )
),
kept AS (
  SELECT doc_id, pos, passage FROM (
    SELECT doc_id, pos, passage,
           row_number() OVER (PARTITION BY passage ORDER BY doc_id, pos) AS rn
    FROM p
  ) WHERE rn = 1
),
agg AS (
  SELECT doc_id, string_agg(passage, ' ' ORDER BY pos) AS dedup_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT n.doc_id,
       COALESCE(a.dedup_text, '') AS dedup_text,
       CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(n.n_pass - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
FROM np n LEFT JOIN agg a USING (doc_id)
"""


@query("passage_dedup", _PASSAGE_ORACLE)
def passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", TX.tokens(F.col("text")).alias("tk"))
    n_pass = F.expr(f"CAST((size(tk) + {_PASS_N - 1}) DIV {_PASS_N} AS INT)")
    chunks = F.transform(
        F.sequence(F.lit(0), n_pass - 1),
        lambda i: F.array_join(F.slice(F.col("tk"), i * _PASS_N + 1, _PASS_N), " "),
    )
    base = d.select("doc_id", n_pass.alias("n_pass")).localCheckpoint(eager=False)
    p = d.select("doc_id", F.posexplode(chunks).alias("pos", "passage"))
    # first-wins via min(struct): map-side partial agg — hot passages
    # never concentrate on a single reducer the way a window rank would
    kept = (
        p.groupBy("passage")
        .agg(F.min(F.struct("doc_id", "pos")).alias("s"))
        .select(F.col("s.doc_id").alias("doc_id"), F.col("s.pos").alias("pos"), "passage")
    )
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "passage"))),
                lambda s: s["passage"],
            ),
            " ",
        ).alias("dedup_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        (F.col("n_pass") - F.coalesce("n_kept", F.lit(0))).cast("long").alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# doc_lm_score — corpus-conditional bigram log-probability scoring (the
# CCNet/KenLM-style LM quality filter, with the corpus itself as the
# model): score(doc) = mean over its bigram instances of
# ln((c(w1,w2) + 1) / (c(w1·) + V)), add-one smoothed over the
# prediction vocabulary V = |distinct w2|. Smoothing matters: without
# it a document of corpus-unique words scores a perfect 0 (its singleton
# contexts are trivially "certain"); with it, unseen transitions cost
# ~ln(1/V). Low scores mark documents whose word transitions are
# unusual for the corpus — the standard perplexity-bucket filter.
#
# Parity: each bigram's log-prob is quantized to integer micro-nats
# BEFORE the per-doc sum (BIGINT accumulation is order-independent;
# a raw double sum differs in the last ulps between partitionings).
#
# Scale shape: bigram stats are a groupBy on the bigram key; the
# stats-to-instance joins are plain equi-joins on (w1[,w2]) — AQE
# broadcasts them when small, shuffles when the vocabulary is web-scale.
# No driver-side collection of the model.
# ---------------------------------------------------------------------------

_LM_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS tk FROM documents),
bg AS (
  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
  FROM (
    SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
    FROM toks WHERE len(tk) >= 2
  )
),
q AS (
  SELECT doc_id,
         CAST(ROUND(ln(
           CAST(COUNT(*) OVER (PARTITION BY w1, w2) + 1 AS DOUBLE)
           / (COUNT(*) OVER (PARTITION BY w1)
              + (SELECT COUNT(DISTINCT w2) FROM bg))
         ) * 1000000.0, 0) AS BIGINT) AS qlp
  FROM bg
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(CAST(SUM(qlp) AS DOUBLE) / COUNT(*) / 1000000.0, 6) AS lm_score
FROM q GROUP BY doc_id
"""


@query("doc_lm_score", _LM_ORACLE)
def doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", TX.tokens(F.col("text")).alias("tk")
    )
    pairs = F.when(
        F.size("tk") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - 1),
            lambda i: F.struct(
                F.element_at("tk", i).alias("w1"),
                F.element_at("tk", i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = d.select("doc_id", F.explode(pairs).alias("b")).select(
        "doc_id", "b.w1", "b.w2"
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = bg.agg(F.countDistinct("w2").alias("v"))  # 1 row, broadcast
    qlp = F.round(
        F.log(
            (F.col("c2") + 1).cast("double") / (F.col("c1") + F.col("v"))
        )
        * 1_000_000.0,
        0,
    ).cast("long")
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", qlp.alias("qlp"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("qlp").alias("_sq"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                F.col("_sq").cast("double") / F.col("n_bigrams") / 1_000_000.0, 6
            ).alias("lm_score"),
        )
    )


# ---------------------------------------------------------------------------
# weighted_sample — deterministic importance sampling by per-source
# weight (the DoReMi/data-mixing shape: a tiny domain-weights artifact
# drives how much of each source enters the training mix). Acceptance
# is pure hashing — accept doc iff h(doc_id) mod 1e6 < weight·1e6 — so
# the sample is reproducible across engines, runs, and partitionings,
# and composes with the other hash-rank samplers (corpus_sample,
# stratified_sample) without coordination.
#
# Scale shape: the weights table is dimension-sized by construction →
# broadcast join; acceptance is a map-only predicate; one final groupBy
# on source for the audit counts.
# ---------------------------------------------------------------------------

_WS_WEIGHTS: list[tuple[str, float]] = [
    (f"src{i}", (i % 4 + 1) * 0.25) for i in range(20)
]


def _ws_oracle() -> str:
    values = ", ".join(f"('{s}', {w})" for s, w in _WS_WEIGHTS)
    return f"""
WITH w(source, weight) AS (VALUES {values}),
j AS (
  SELECT d.doc_id, d.source, w.weight,
         (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':ws'), 1, 15))::BIGINT
          % 1000000) < CAST(w.weight * 1000000 AS BIGINT) AS acc
  FROM documents d JOIN w USING (source)
)
SELECT source, weight,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(COUNT(CASE WHEN acc THEN 1 END) AS BIGINT) AS n_sampled,
       CAST(MIN(CASE WHEN acc THEN doc_id END) AS BIGINT) AS first_doc
FROM j GROUP BY source, weight ORDER BY source
"""


@query("weighted_sample", _ws_oracle())
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    wdf = local_df(spark, _WS_WEIGHTS, "source string, weight double")
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":ws"))), 1, 15),
        16,
        10,
    ).cast("long")
    acc = (h % 1_000_000) < (F.col("weight") * 1_000_000).cast("long")
    return (
        d.join(F.broadcast(wdf), "source")
        .withColumn("_acc", acc)
        .groupBy("source", "weight")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("_acc"), 1)).alias("n_sampled"),
            F.min(F.when(F.col("_acc"), F.col("doc_id"))).alias("first_doc"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# bm25_scores — BM25 retrieval scoring for a fixed query over the corpus
# (k1=1.2, b=0.75, the Robertson/Sparck-Jones idf with +1 floor). The
# corpus stats (df per term, N, avgdl) are dimension-sized → broadcast;
# per-(doc, term) partial scores quantize to integer micro-units BEFORE
# the per-doc sum so accumulation order cannot produce ulp drift. At
# scale: one explode → filtered tf aggregation on (doc, term), tiny
# stats joins, top-k via TakeOrderedAndProject.
# ---------------------------------------------------------------------------

_BM25_TERMS = ("table", "value", "row")
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS tk FROM documents),
dl AS (SELECT doc_id, len(tk) AS dl FROM toks),
n_avg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tk) AS term FROM toks)
  WHERE term IN ({terms})
  GROUP BY doc_id, term
),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
partial AS (
  SELECT t.doc_id,
         CAST(ROUND(
           ln((CAST(a.n_docs - d.df AS DOUBLE) + 0.5) / (d.df + 0.5) + 1.0)
           * (t.tf * ({_BM25_K1} + 1.0))
           / (t.tf + {_BM25_K1} * (1.0 - {_BM25_B}
              + {_BM25_B} * l.dl / a.avgdl))
           * 1000000.0, 0) AS BIGINT) AS sq
  FROM tf t
  JOIN df d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN n_avg a
)
SELECT doc_id,
       CAST(SUM(sq) AS DOUBLE) / 1000000.0 AS bm25
FROM partial GROUP BY doc_id
ORDER BY SUM(sq) DESC, doc_id ASC
LIMIT 20
"""


def _bm25_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, _s) — per-doc BM25 score in exact integer micro-units
    for the fixed query terms. Shared by bm25_scores and
    hybrid_rrf_fusion so the lexical ranking definition cannot drift
    between the standalone query and the fusion."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", TX.tokens(F.col("text")).alias("tk")
    )
    # corpus stats in ONE pure-aggregate scan (no explode), and tf+dl in
    # ONE explode scan (dl rides along as max() — constant per doc), so
    # documents is read exactly twice instead of the naive 3-way diamond
    # (dl join + tf + stats each re-planning the tokenize)
    n_avg = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.size("tk")).cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        d.select("doc_id", F.size("tk").alias("dl"), F.explode("tk").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    # tf roots a diamond (df_tab aggregate + the partial-score join);
    # checkpoint it so neither consumer re-plans the explode scan. The
    # frame is (matching doc, term) — bounded by the docs that contain a
    # query term, always ≪ corpus for a bounded term list
    tf = tf.localCheckpoint()
    df_tab = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        ((F.col("n_docs") - F.col("df")).cast("double") + 0.5)
        / (F.col("df") + 0.5)
        + 1.0
    )
    score = (
        idf
        * (F.col("tf") * (_BM25_K1 + 1.0))
        / (
            F.col("tf")
            + _BM25_K1
            * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    partial = (
        tf.join(F.broadcast(df_tab), "term")
        .crossJoin(F.broadcast(n_avg))
        .select("doc_id", F.round(score * 1_000_000.0, 0).cast("long").alias("sq"))
    )
    return partial.groupBy("doc_id").agg(F.sum("sq").alias("_s"))


@query("bm25_scores", _bm25_oracle())
def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _bm25_sq(spark, sf_dir)
        .orderBy(F.col("_s").desc(), F.col("doc_id").asc())
        .limit(20)
        .select("doc_id", (F.col("_s").cast("double") / 1_000_000.0).alias("bm25"))
    )


# ---------------------------------------------------------------------------
# doc_chunking — overlapping sliding-window chunks (size 8, stride 4):
# the RAG / context-window prep every retrieval corpus runs. Start
# offsets are 0, 4, 8, ... while start < len; trailing chunks may be
# short. Map-only: chunking is a transform + posexplode in the scan
# stage — no shuffle until a downstream consumer aggregates.
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 8
_CHUNK_STRIDE = 4


_CHUNK_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS tk FROM documents)
SELECT doc_id, pos AS chunk_id,
       array_to_string(
         tk[pos * {_CHUNK_STRIDE} + 1 : pos * {_CHUNK_STRIDE} + {_CHUNK_SIZE}], ' '
       ) AS chunk_text,
       CAST(least({_CHUNK_SIZE}, len(tk) - pos * {_CHUNK_STRIDE}) AS INT)
         AS n_chunk_tokens
FROM (
  SELECT doc_id, tk,
         unnest(generate_series(0,
           CAST((len(tk) - 1) // {_CHUNK_STRIDE} AS INT))) AS pos
  FROM toks WHERE len(tk) > 0
)
"""


@query("doc_chunking", _CHUNK_ORACLE)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", TX.tokens(F.col("text")).alias("tk")
    )
    n_chunks = F.expr(f"CAST((size(tk) - 1) DIV {_CHUNK_STRIDE} AS INT) + 1")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.array_join(
                F.slice(F.col("tk"), i * _CHUNK_STRIDE + 1, _CHUNK_SIZE), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(_CHUNK_SIZE), F.size("tk") - i * _CHUNK_STRIDE
            ).cast("int").alias("n_chunk_tokens"),
        ),
    )
    return (
        d.filter(F.size("tk") > 0)
        .select("doc_id", F.posexplode(chunks).alias("chunk_id", "c"))
        .select("doc_id", "chunk_id", "c.chunk_text", "c.n_chunk_tokens")
    )


# ---------------------------------------------------------------------------
# dup_span_stats — EXACT substring-duplication coverage (the Lee et al.
# "Deduplicating Training Data Makes Language Models Better" measure,
# arXiv:2107.06499): every character 20-gram position in the corpus is
# checked against every other; a position whose gram occurs anywhere
# else (same doc or another) is a duplicated span. Per doc: how many
# positions, how many duplicated, what fraction. This is the exact
# (suffix-array-equivalent) complement of the MinHash/SimHash sketches:
# those bound whole-doc similarity, this finds verbatim boilerplate.
# Shape: positions explode map-side; the gram string immediately
# collapses to a 60-bit md5 prefix so the groupBy-gram shuffle carries
# an 8-byte key + count, not 20-char strings (the hash is computed
# IDENTICALLY in both engines, so any collision affects both equally —
# parity is exact by construction). Count-join back on the same key,
# then a doc-keyed rollup. At 100 TB this is the standard two-shuffle
# suffix-dedup plan; fan-out is n_chars rows per doc, bounded per row.
# ---------------------------------------------------------------------------

_DUP_SPAN_ORACLE = """
WITH g AS (
  SELECT doc_id,
         substr(md5(substr(text, CAST(p AS INT), 20)), 1, 15) AS gh
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1, CAST(n_chars - 19 AS BIGINT))) AS p)
  WHERE n_chars >= 20
),
c AS (SELECT gh, COUNT(*) AS cnt FROM g GROUP BY gh)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(CASE WHEN cnt > 1 THEN 1 END) AS BIGINT) AS n_dup_grams,
       ROUND(CAST(COUNT(CASE WHEN cnt > 1 THEN 1 END) AS DOUBLE) / COUNT(*), 6)
         AS dup_frac
FROM g JOIN c USING (gh)
GROUP BY doc_id
"""


@query("dup_span_stats", _DUP_SPAN_ORACLE)
def dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the per-position char-gram explode is the heaviest
    # scan-rooted map stage in the family (r14: 2.93 -> 0.82 s best)
    d = t(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "text", "n_chars"
    )
    grams = (
        d.filter(F.col("n_chars") >= 20)  # sequence(1, n<1) would DESCEND in Spark
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("n_chars") - 19)
            ).alias("p"),
            "text",
        )
        .select(
            "doc_id",
            F.substring(
                F.md5(F.expr("substring(text, CAST(p AS INT), 20)")), 1, 15
            ).alias("gh"),
        )
    )
    # per-gram occurrence count as a WINDOW over gh, not groupBy+join —
    # the join shape evaluates the explode+md5 Generate twice (once per
    # side) and sort-merge-joins two gram-sized inputs; the window reads
    # the gram table once (measured 14x at sf0.1: 11.05 s -> 0.76 s)
    from pyspark.sql import Window

    cnt = F.count(F.lit(1)).over(Window.partitionBy("gh"))
    flagged = grams.select("doc_id", cnt.alias("cnt"))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count(F.when(F.col("cnt") > 1, 1)).alias("n_dup_grams"),
        F.round(
            F.count(F.when(F.col("cnt") > 1, 1)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("dup_frac"),
    )


# ---------------------------------------------------------------------------
# conjunctive_search — inverted-index probe: the two highest-df terms
# (deterministic tiebreak on the token) AND-ed — docs must contain BOTH.
# This is the retrieval twin of token_doc_freq's index build: postings
# are distinct (doc, token) rows, the query side is a 2-row broadcast,
# and the AND is "count of matched distinct terms == number of query
# terms" — the standard posting-intersection-as-groupBy shape, which at
# 100 TB stays one broadcast join + one doc-keyed count (no posting-list
# materialization on the driver, no self-join).
# ---------------------------------------------------------------------------

_CONJ_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
postings AS (SELECT DISTINCT doc_id, unnest(toks) AS tok FROM toks),
df AS (SELECT tok, COUNT(*) AS df FROM postings GROUP BY tok),
query_terms AS (
  SELECT tok FROM df ORDER BY df DESC, tok ASC LIMIT 2
)
SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched
FROM postings p JOIN query_terms q USING (tok)
GROUP BY p.doc_id
HAVING COUNT(*) = 2
"""


@query("conjunctive_search", _CONJ_ORACLE)
def conjunctive_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    postings = d.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok")
    ).distinct()
    df = postings.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    query_terms = (
        df.orderBy(F.col("df").desc(), F.col("tok").asc()).limit(2).select("tok")
    )
    return (
        postings.join(F.broadcast(query_terms), "tok")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .filter(F.col("n_matched") == 2)
    )


# ---------------------------------------------------------------------------
# bpe_pair_counts — the first BPE merge iteration (Sennrich 2015 shape):
# count adjacent-token pairs corpus-wide, report the top merge
# candidates. This is the inner loop of tokenizer training at corpus
# scale — each iteration is one explode + hash agg on the pair key
# (strings shuffle once, pre-aggregated map-side), never a driver-side
# vocabulary walk. Ties at the cut are broken (n DESC, a, b) — a total
# order, so the top-50 set is deterministic in both engines.
# ---------------------------------------------------------------------------

_PAIR_ORACLE = f"""
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '{_BPE_PATTERN}') AS tk FROM documents
),
pairs AS (
  SELECT p[1] AS a, p[2] AS b
  FROM (SELECT unnest(list_zip(tk[1:len(tk)-1], tk[2:len(tk)])) AS p FROM toks)
)
SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs GROUP BY a, b
ORDER BY n DESC, a, b LIMIT 50
"""


@query("bpe_pair_counts", _PAIR_ORACLE)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0)
    n_tok = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n_tok - 1),
        F.slice(toks, 2, n_tok - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )
    return (
        d.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "a", "b")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# vocab_oov_rate — tokenizer-coverage audit: build the top-500 token
# vocabulary (count DESC, token ASC — total order, deterministic cut)
# and measure per-source out-of-vocabulary rates. The corpus-side freq
# table shuffles token hashes once; the 500-row vocabulary goes back as
# a broadcast (map-only probe), so the applied pass adds no shuffle —
# the same two-phase shape a 100 TB tokenizer-coverage job needs.
# ---------------------------------------------------------------------------

_VOCAB_K = 500

_OOV_ORACLE = f"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) AS tok
  FROM documents
),
vocab AS (
  SELECT tok FROM (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok)
  ORDER BY n DESC, tok LIMIT {_VOCAB_K}
)
SELECT t.source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       (CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE)) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY t.source
"""


@query("vocab_oov_rate", _OOV_ORACLE)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0)
        ).alias("tok"),
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(_VOCAB_K)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    probed = toks.join(F.broadcast(vocab), "tok", "left")
    oov = F.when(F.col("in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0))
    return probed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(oov).cast("long").alias("n_oov"),
        (
            F.sum(oov).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# split_leakage_audit — train/val/test LEAKAGE check: near-duplicate
# pairs (LSH candidates → exact-Jaccard verified, same machinery and
# thresholds as lsh_verified_pairs) classified by the split assignment
# of each side (same content-hash rule as corpus_split). A verified
# near-dup pair whose endpoints land in different splits IS evaluation
# leakage — the audit every serious pretraining curation pipeline runs
# after splitting (val/test examples with a train near-twin overstate
# model quality). Output: pair counts per unordered (split_a, split_b)
# cell, cross_split flagged. Composition cost: the verify stage bounds
# everything (candidates only), and the split columns ride the existing
# doc-keyed joins — no new shuffle beyond two broadcast-sized maps.
# ---------------------------------------------------------------------------


def _leakage_sql() -> str:
    split_case = (
        f"CASE WHEN {_sql_hmod('text')} % 100 < 90 THEN 'train' "
        f"WHEN {_sql_hmod('text')} % 100 < 95 THEN 'val' "
        "ELSE 'test' END"
    )
    return f"""
WITH vp AS ({_lsh_verified_sql()}),
assigned AS (SELECT doc_id, {split_case} AS split FROM documents),
classified AS (
  SELECT LEAST(a.split, b.split) AS split_lo,
         GREATEST(a.split, b.split) AS split_hi
  FROM vp JOIN assigned a ON vp.id_a = a.doc_id
          JOIN assigned b ON vp.id_b = b.doc_id
)
SELECT split_lo, split_hi,
       (split_lo <> split_hi) AS cross_split,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM classified GROUP BY split_lo, split_hi
"""


@query("split_leakage_audit", _leakage_sql())
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # (r15: lazily checkpointing this composed selection — the r14
    # item-8 truncation — was A/B'd in-process over 5 interleaved
    # rounds: 2.54 vs 2.52 s mean, LOSES on the quiet rounds; the
    # materialization stalls what the composed pipeline streams, so
    # the plain composition stays.)
    pairs = lsh_verified_pairs(spark, sf_dir).select("id_a", "id_b")
    bucket = TX.hmod(F.col("text")) % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    assigned = docs.select("doc_id", split.alias("split"))
    classified = (
        pairs.join(
            assigned.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")),
            "id_a",
        )
        .join(
            assigned.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")),
            "id_b",
        )
        .select(
            F.least(F.col("sa"), F.col("sb")).alias("split_lo"),
            F.greatest(F.col("sa"), F.col("sb")).alias("split_hi"),
        )
    )
    return classified.groupBy("split_lo", "split_hi").agg(
        (F.col("split_lo") != F.col("split_hi")).alias("cross_split"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


# ---------------------------------------------------------------------------
# ctfidf_top_terms — class-based TF-IDF (the BERTopic/c-TF-IDF shape):
# aggregate term counts per SOURCE (the "class"), weight by how few
# classes carry the term, report each source's top-3 label terms. Kept
# division-only (tf_class · N_classes / class_freq — no log) so the
# score is one IEEE op from exact integers, same policy as
# tfidf_top_terms. Shape: one (source, token) agg, a token-keyed
# class-frequency agg that is vocabulary-sized → broadcast, then a
# per-source WindowGroupLimit top-3 — the per-class cardinality is
# bounded by vocabulary, never corpus rows.
# ---------------------------------------------------------------------------

_CTFIDF_ORACLE = f"""
WITH toks AS (SELECT source, unnest({_SQL_TOKS}) AS tok FROM documents),
ctf AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY source, tok),
cf AS (SELECT tok, CAST(COUNT(DISTINCT source) AS BIGINT) AS cf FROM toks GROUP BY tok),
nsrc AS (SELECT COUNT(DISTINCT source) AS n FROM documents),
scored AS (
  SELECT c.source, c.tok, c.tf,
         CAST(c.tf * (SELECT n FROM nsrc) AS DOUBLE) / CAST(f.cf AS DOUBLE) AS score
  FROM ctf c JOIN cf f USING (tok)
),
ranked AS (
  SELECT source, tok, tf, score,
         row_number() OVER (PARTITION BY source ORDER BY score DESC, tok ASC) AS rn
  FROM scored
)
SELECT source, tok, tf, score, rn FROM ranked WHERE rn <= 3
"""


@query("ctfidf_top_terms", _CTFIDF_ORACLE)
def ctfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(TX.tokens(F.col("text"))).alias("tok"))
    ctf = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("tf"))
    cf = toks.groupBy("tok").agg(F.countDistinct("source").alias("cf"))
    nsrc = d.agg(F.countDistinct("source").alias("n"))
    scored = (
        ctf.join(F.broadcast(cf), "tok")
        .crossJoin(F.broadcast(nsrc))
        .withColumn(
            "score",
            (F.col("tf") * F.col("n")).cast("double") / F.col("cf").cast("double"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("source", "tok", "tf", "score", "rn")
    )


# ---------------------------------------------------------------------------
# domain_cap_sample — per-domain quota sampling (cap each source at 10
# docs so no domain dominates the mixture — the balancing step next to
# weighted_sample's global reweighting). Deterministic: rank within
# source by (content-hash, doc_id) — the same hash-rank discipline as
# corpus_sample, so a doc's in/out status is stable under corpus growth
# within its domain prefix. Shape: ONE window (WindowGroupLimit prunes
# to 10 per source before the final shuffle's merge); no joins.
# ---------------------------------------------------------------------------

_DOMAIN_CAP = 10

_DOMAIN_CAP_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY {_sql_hmod('text')} ASC, doc_id ASC) AS rn
  FROM documents
)
SELECT doc_id, source, rn FROM ranked WHERE rn <= {_DOMAIN_CAP}
"""


@query("domain_cap_sample", _DOMAIN_CAP_ORACLE)
def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        TX.hmod(F.col("text")).asc(), F.col("doc_id").asc()
    )
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _DOMAIN_CAP)
    )


# ---------------------------------------------------------------------------
# quality_winsorize — robust per-source score conditioning: clip each
# document's quality at its source's p05/p95 (winsorization), flag which
# tail it came from. The cut is the NEAREST-RANK order statistic (the
# k=ceil(p·n)-th smallest, k in pure integer math) — interpolated
# percentiles were measured 1 ulp apart between Spark `percentile` and
# DuckDB quantile_cont at sf0.001, so the cut value must be an actual
# data value, making the clip pure comparison with no new float
# arithmetic anywhere. Shape: one per-source rank window + a 20-row cuts
# agg broadcast back for the map-only applied pass.
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = f"""
WITH toks AS (SELECT doc_id, source, {_SQL_TOKS} AS toks FROM documents),
scored AS (
  SELECT doc_id, source,
         CAST(0.4 AS DOUBLE) * (CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE CAST(0.0 AS DOUBLE) END)
       + CAST(0.3 AS DOUBLE) * {_sql_stop_ratio('toks', TX.STOPWORDS['en'])}
       + CAST(0.3 AS DOUBLE) * LEAST(CAST(1.0 AS DOUBLE), CAST(len(toks) AS DOUBLE) / CAST(64.0 AS DOUBLE))
         AS quality
  FROM toks
),
ranked AS (
  SELECT doc_id, source, quality,
         row_number() OVER (PARTITION BY source ORDER BY quality ASC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS cnt
  FROM scored
),
cuts AS (
  SELECT source,
         MIN(CASE WHEN rn = (5 * cnt + 99) // 100 THEN quality END) AS p05,
         MIN(CASE WHEN rn = (95 * cnt + 99) // 100 THEN quality END) AS p95
  FROM ranked GROUP BY source
)
SELECT s.doc_id, s.source, s.quality,
       LEAST(GREATEST(s.quality, c.p05), c.p95) AS clipped,
       (s.quality < c.p05) AS clipped_low,
       (s.quality > c.p95) AS clipped_high
FROM scored s JOIN cuts c USING (source)
"""


@query("quality_winsorize", _WINSOR_ORACLE)
def quality_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", TX.quality_score(F.col("text")).alias("quality")
    )
    from pyspark.sql import Window

    wq = Window.partitionBy("source").orderBy(
        F.col("quality").asc(), F.col("doc_id").asc()
    )
    wc = Window.partitionBy("source")
    ranked = scored.withColumn("rn", F.row_number().over(wq)).withColumn(
        "cnt", F.count(F.lit(1)).over(wc)
    )
    k05 = F.expr("(5 * cnt + 99) div 100")
    k95 = F.expr("(95 * cnt + 99) div 100")
    cuts = ranked.groupBy("source").agg(
        F.min(F.when(F.col("rn") == k05, F.col("quality"))).alias("p05"),
        F.min(F.when(F.col("rn") == k95, F.col("quality"))).alias("p95"),
    )
    return scored.join(F.broadcast(cuts), "source").select(
        "doc_id",
        "source",
        "quality",
        F.least(F.greatest(F.col("quality"), F.col("p05")), F.col("p95")).alias(
            "clipped"
        ),
        (F.col("quality") < F.col("p05")).alias("clipped_low"),
        (F.col("quality") > F.col("p95")).alias("clipped_high"),
    )


# ---------------------------------------------------------------------------
# token_pagerank — PageRank over the token-BIGRAM graph (nodes =
# BPE-ish tokens, edge a→b weighted by adjacent-pair count): the second
# classic iterative graph op next to connected-components dedup, and
# the standard centrality pass over co-occurrence graphs. Integer spec
# (so three iterations stay bit-identical across engines): PR lives in
# 1e12 micro-units, per-edge contribution is (pr·w) div out_w (floor —
# part of the operator's spec, not an approximation), damping is the
# exact rational 85/100 applied as BIGINT (15·base + 85·Σcontrib) div
# 100; dangling tokens lose their mass (documented choice). Scale
# shape: nodes/edges are VOCABULARY-sized (≪ corpus rows); each
# iteration is one broadcast-joined edge pass + one node-keyed agg —
# the corpus is read once, in the pair-count stage.
# ---------------------------------------------------------------------------

_PR_ITERS = 3
_PR_UNIT = 10**12
_PR_TOPK = 20


def _pagerank_oracle() -> str:
    head = f"""
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '{_BPE_PATTERN}') AS tk FROM documents
),
edges AS (
  SELECT p[1] AS a, p[2] AS b, CAST(COUNT(*) AS BIGINT) AS w
  FROM (SELECT unnest(list_zip(tk[1:len(tk)-1], tk[2:len(tk)])) AS p FROM toks)
  GROUP BY a, b
),
nodes AS (
  SELECT DISTINCT tok FROM (
    SELECT a AS tok FROM edges UNION SELECT b AS tok FROM edges
  )
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
outw AS (SELECT a, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY a),
pr0 AS (SELECT tok, {_PR_UNIT} // (SELECT n FROM nn) AS pr FROM nodes)"""
    its = []
    for i in range(1, _PR_ITERS + 1):
        p = i - 1
        its.append(
            f""",
c{i} AS (
  SELECT e.b AS tok, CAST(SUM((p.pr * e.w) // o.ow) AS BIGINT) AS cin
  FROM edges e JOIN pr{p} p ON e.a = p.tok JOIN outw o ON e.a = o.a
  GROUP BY e.b
),
pr{i} AS (
  SELECT n.tok,
         (15 * ({_PR_UNIT} // (SELECT n FROM nn)) + 85 * COALESCE(c.cin, 0)) // 100 AS pr
  FROM nodes n LEFT JOIN c{i} c ON n.tok = c.tok
)"""
        )
    return (
        head
        + "".join(its)
        + f"""
SELECT tok, CAST(pr AS BIGINT) AS pr_q
FROM pr{_PR_ITERS} ORDER BY pr DESC, tok ASC LIMIT {_PR_TOPK}
"""
    )


@query("token_pagerank", _pagerank_oracle())
def token_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0)
    n_tok = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, n_tok - 1),
        F.slice(toks, 2, n_tok - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )
    edges = (
        d.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=False)  # iterations re-read edges, not the corpus
    )
    nodes = (
        edges.select(F.col("a").alias("tok"))
        .union(edges.select(F.col("b").alias("tok")))
        .distinct()
    )
    outw = edges.groupBy("a").agg(F.sum("w").alias("ow"))
    n_nodes = nodes.count()  # vocabulary-sized scalar; drives exact literals
    base = _PR_UNIT // max(n_nodes, 1)  # empty corpus -> no nodes, 0 rows out
    pr = nodes.select("tok", F.lit(base).cast("long").alias("pr"))
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(pr.withColumnRenamed("tok", "a"), "a")
            .join(outw, "a")
            .select(F.col("b").alias("tok"), F.expr("(pr * w) div ow").alias("c"))
            .groupBy("tok")
            .agg(F.sum("c").alias("cin"))
        )
        pr = nodes.join(contrib, "tok", "left").select(
            "tok",
            F.expr(f"(15 * {base} + 85 * coalesce(cin, 0)) div 100")
            .cast("long")
            .alias("pr"),
        )
    return (
        pr.select("tok", F.col("pr").alias("pr_q"))
        .orderBy(F.desc("pr_q"), F.asc("tok"))
        .limit(_PR_TOPK)
    )


# ---------------------------------------------------------------------------
# ppjoin_pairs — the PREFIX-FILTERED threshold Jaccard join (PPJoin
# family, Xiao et al.) as a driver query: two sets with J ≥ t must
# share an element in the first ⌊(1-t)·|A|⌋+1 of any agreed global
# ordering, so the self-join runs on the prefix table (a (1-t)
# fraction) and only surviving candidates pay exact verification. The
# filter is LOSSLESS — the oracle is the PLAIN unfiltered threshold
# join, and equality with it is the operator's correctness claim.
# Complements the df-capped and LSH candidate generators: prefix
# filtering prunes hardest exactly where they pay most (Zipfian-hot
# shingles sort to the suffix end and never enter the join).
# ---------------------------------------------------------------------------

_PPJOIN_T = 0.3

_PPJOIN_ORACLE = f"""
WITH {_SQL_SHINGLE_TABLE},
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id)
SELECT c.id_a, c.id_b,
       CAST(c.inter AS DOUBLE) / (sa.sz + sb.sz - c.inter) AS jaccard
FROM cand c
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE CAST(c.inter AS DOUBLE) / (sa.sz + sb.sz - c.inter) >= {_PPJOIN_T}
"""


@query("ppjoin_pairs", _PPJOIN_ORACLE)
def ppjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return SIM.prefix_filtered_jaccard_pairs(
        docs, "doc_id", "text", _PPJOIN_T, shingle_n=3
    )


# ---------------------------------------------------------------------------
# dedup_shrink_report — the end-to-end dedup ACCOUNTING pass
# (RefinedWeb-style): near-dup pairs → connected components →
# keep-component-canonical, reported as per-source corpus shrink
# (docs and chars, before → after). This is the number a curation run
# actually publishes — "dedup removed X% of source Y" — and it rides
# the same edge set and fixpoint as dedup_components, so the oracle's
# recursive CTE re-proves convergence while the rollup checks the
# accounting. Shape: everything upstream is the bounded candidate
# pipeline; the report adds one broadcast-sized join (doc → component)
# and a 20-key aggregate.
# ---------------------------------------------------------------------------

_SHRINK_ORACLE = f"""
WITH RECURSIVE {_SQL_SHINGLE_TABLE},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
edges AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.3
),
sym AS (SELECT id_a AS a, id_b AS b FROM edges
        UNION ALL SELECT id_b, id_a FROM edges),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.a, reach.r FROM sym s JOIN reach ON reach.id = s.b
),
comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN c.component = d.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(d.n_chars) AS BIGINT) AS chars_before,
       CAST(SUM(CASE WHEN c.component = d.doc_id THEN d.n_chars ELSE 0 END)
            AS BIGINT) AS chars_after
FROM documents d JOIN comp c USING (doc_id)
GROUP BY d.source
"""


@query("dedup_shrink_report", _SHRINK_ORACLE)
def dedup_shrink_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    # spread: same edge-generation pipeline as dedup_components (r14
    # interleaved best-of-4: 3.74 -> 3.36 s, 3/4 pairwise wins)
    d = t(spark, sf_dir, "documents", spread=True)
    edges = SIM.ngram_jaccard_pairs(d, "doc_id", "text", shingle_n=3, threshold=0.3)
    comp = connected_components(
        d.select("doc_id"), edges, id_col="doc_id", src_col="id_a", dst_col="id_b"
    )
    kept = F.when(F.col("component") == F.col("doc_id"), 1).otherwise(0)
    return (
        d.select("doc_id", "source", "n_chars")
        .join(comp, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept).cast("long").alias("n_kept"),
            F.sum("n_chars").cast("long").alias("chars_before"),
            F.sum(F.col("n_chars") * kept).cast("long").alias("chars_after"),
        )
    )


# ---------------------------------------------------------------------------
# quality_percent_rank — rank-based score normalization per source (the
# distribution-free sibling of quality_winsorize: map each doc's
# quality to its within-source percentile, the transform that makes
# scores comparable across heterogeneous domains before mixing). Exact
# rational: percent_rank = (rank-1)/(n-1) where rank ties share the
# SQL-standard minimum rank — integers from one window pass, a single
# IEEE division. n=1 groups define pr = 0 in both engines.
# ---------------------------------------------------------------------------

_PRANK_ORACLE = f"""
WITH toks AS (SELECT doc_id, source, {_SQL_TOKS} AS toks FROM documents),
scored AS (
  SELECT doc_id, source,
         CAST(0.4 AS DOUBLE) * (CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE CAST(0.0 AS DOUBLE) END)
       + CAST(0.3 AS DOUBLE) * {_sql_stop_ratio('toks', TX.STOPWORDS['en'])}
       + CAST(0.3 AS DOUBLE) * LEAST(CAST(1.0 AS DOUBLE), CAST(len(toks) AS DOUBLE) / CAST(64.0 AS DOUBLE))
         AS quality
  FROM toks
)
SELECT doc_id, source,
       CASE WHEN COUNT(*) OVER (PARTITION BY source) = 1 THEN 0.0
            ELSE CAST(RANK() OVER (PARTITION BY source ORDER BY quality) - 1 AS DOUBLE)
                 / (COUNT(*) OVER (PARTITION BY source) - 1) END AS pr
FROM scored
"""


@query("quality_percent_rank", _PRANK_ORACLE)
def quality_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", TX.quality_score(F.col("text")).alias("quality")
    )
    w = Window.partitionBy("source").orderBy("quality")
    wc = Window.partitionBy("source")
    n = F.count(F.lit(1)).over(wc)
    pr = F.when(n == 1, F.lit(0.0)).otherwise(
        (F.rank().over(w) - 1).cast("double") / (n - 1)
    )
    return scored.select("doc_id", "source", pr.alias("pr"))


# ---------------------------------------------------------------------------
# source_lang_tv — distribution-drift audit across corpus slices: for
# each source, the total-variation distance between its language mix
# and the whole corpus's (the drift score monitoring pipelines alarm
# on). TV = ½·Σ|p_l − q_l| stays EXACT by clearing denominators:
# tv_num = Σ_l |c_{s,l}·N − C_l·n_s| (integers in HUGEINT/DECIMAL38),
# and the reported tv is the single division tv_num / (2·n_s·N).
# Missing (source, lang) combos count as 0 via the dense source×lang
# matrix (langs are a broadcast dimension). Shape: one map-side
# (source, lang) rollup; everything downstream is rollup-sized.
# ---------------------------------------------------------------------------

_LANG_TV_ORACLE = """
WITH sl AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
),
srcs AS (SELECT source, SUM(c) AS n_s FROM sl GROUP BY 1),
langs AS (SELECT lang, SUM(c) AS c_l FROM sl GROUP BY 1),
tot AS (SELECT SUM(c) AS n FROM sl),
dense AS (
  SELECT s.source, l.lang, s.n_s, l.c_l, COALESCE(x.c, 0) AS c
  FROM srcs s CROSS JOIN langs l
  LEFT JOIN sl x ON x.source = s.source AND x.lang = l.lang
)
SELECT d.source, CAST(MIN(d.n_s) AS BIGINT) AS n_docs,
       CAST(SUM(ABS(CAST(d.c AS HUGEINT) * t.n - d.c_l * d.n_s)) AS BIGINT)
         AS tv_num,
       CAST(SUM(ABS(CAST(d.c AS HUGEINT) * t.n - d.c_l * d.n_s)) AS DOUBLE)
         / CAST(2 * MIN(d.n_s) * t.n AS DOUBLE) AS tv
FROM dense d CROSS JOIN tot t
GROUP BY d.source, t.n
"""


@query("source_lang_tv", _LANG_TV_ORACLE)
def source_lang_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    d38 = "decimal(38,0)"
    sl = (
        t(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        # the sources × langs rollup roots the srcs/langs/tot/dense
        # diamond: checkpoint so the documents scan happens once
        .localCheckpoint()
    )
    srcs = sl.groupBy("source").agg(F.sum("c").alias("n_s"))
    langs = sl.groupBy("lang").agg(F.sum("c").alias("c_l"))
    tot = sl.agg(F.sum("c").alias("n"))
    dense = (
        srcs.crossJoin(F.broadcast(langs))
        .join(sl, ["source", "lang"], "left")
        .select(
            "source", "lang", "n_s", "c_l",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
        .crossJoin(F.broadcast(tot))
    )
    term = F.abs(
        F.col("c").cast(d38) * F.col("n") - F.col("c_l").cast(d38) * F.col("n_s")
    )
    return dense.groupBy("source").agg(
        F.min("n_s").cast("long").alias("n_docs"),
        F.sum(term).cast("long").alias("tv_num"),
        (
            F.sum(term).cast("double")
            / (F.lit(2).cast(d38) * F.min("n_s") * F.min("n")).cast("double")
        ).alias("tv"),
    )


# ---------------------------------------------------------------------------
# centroid_lang_classifier — a complete train→score→evaluate ML loop
# as one declarative plan: a nearest-centroid language classifier over
# character-frequency vectors ('a'–'z' + space), trained on the
# content-hash 80% split and evaluated on the held-out 20% as a
# confusion matrix. The distance is scale-normalized L2 cleared of
# fractions: argmin_l Σ_ch (f_ch·T_l − F_{l,ch}·n_d)² — every term an
# exact integer (DECIMAL(38,0)/HUGEINT), so train, score and argmin
# are all engine-portable with (dist, lang) as the deterministic
# tiebreak. Shape: char counts are 27 length/replace expressions per
# doc (map-only, no tokenizer state); centroids collapse to a
# 5×27-row broadcast; scoring is a map-side join + per-doc rollup and
# the argmin window sees 5 rows per doc. The hash split reuses the
# corpus_split idiom — a doc's split never changes as the corpus
# grows.
# ---------------------------------------------------------------------------

_CLF_CHARS = tuple(" abcdefghijklmnopqrstuvwxyz")

_CLF_ORACLE = f"""
WITH chars(ch) AS (VALUES {', '.join("(' ')" if c == ' ' else f"('{c}')" for c in _CLF_CHARS)}),
docs AS (
  SELECT doc_id, lang, text,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 5)
           AS fold
  FROM documents
),
feat AS (
  SELECT d.doc_id, d.lang, d.fold, c.ch,
         CAST(length(d.text) - length(replace(d.text, c.ch, '')) AS BIGINT)
           AS cnt
  FROM docs d CROSS JOIN chars c
),
centroid AS (
  SELECT lang, ch, CAST(SUM(cnt) AS HUGEINT) AS fc
  FROM feat WHERE fold <> 0 GROUP BY 1, 2
),
ctot AS (SELECT lang, SUM(fc) AS tl FROM centroid GROUP BY 1),
test AS (
  SELECT doc_id, lang AS true_lang, ch, CAST(cnt AS HUGEINT) AS f,
         SUM(CAST(cnt AS HUGEINT)) OVER (PARTITION BY doc_id) AS nd
  FROM feat WHERE fold = 0
),
dist AS (
  SELECT te.doc_id, te.true_lang, c.lang,
         SUM((te.f * ct.tl - c.fc * te.nd) * (te.f * ct.tl - c.fc * te.nd))
           AS d2
  FROM test te
  JOIN centroid c ON c.ch = te.ch
  JOIN ctot ct ON ct.lang = c.lang
  GROUP BY 1, 2, 3
),
picked AS (
  SELECT doc_id, true_lang, lang AS pred_lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY d2, lang) AS rn
  FROM dist
)
SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM picked WHERE rn = 1
GROUP BY 1, 2
"""


@query("centroid_lang_classifier", _CLF_ORACLE)
def centroid_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "text",
        (TX.h60(F.col("doc_id").cast("string")) % 5).alias("fold"),
    )
    chars = local_df(spark, [(c,) for c in _CLF_CHARS], "ch string")
    feat = docs.crossJoin(F.broadcast(chars)).select(
        "doc_id",
        "lang",
        "fold",
        "ch",
        F.expr("CAST(length(text) - length(replace(text, ch, '')) AS BIGINT)")
        .alias("cnt"),
    )
    centroid = (
        feat.filter(F.col("fold") != 0)
        .groupBy("lang", "ch")
        .agg(F.sum(F.col("cnt").cast(d38)).alias("fc"))
    )
    ctot = centroid.groupBy("lang").agg(F.sum("fc").alias("tl"))
    test = feat.filter(F.col("fold") == 0).select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        "ch",
        F.col("cnt").cast(d38).alias("f"),
        F.sum(F.col("cnt").cast(d38))
        .over(Window.partitionBy("doc_id"))
        .alias("nd"),
    )
    cc = centroid.join(F.broadcast(ctot), "lang").select(
        F.col("lang").alias("pred"), "ch", "fc", "tl"
    )
    diff = F.col("f") * F.col("tl") - F.col("fc") * F.col("nd")
    dist = (
        test.join(F.broadcast(cc), "ch")
        .groupBy("doc_id", "true_lang", "pred")
        .agg(F.sum(diff * diff).alias("d2"))
    )
    w = Window.partitionBy("doc_id").orderBy("d2", "pred")
    picked = dist.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return picked.groupBy(
        F.col("true_lang"), F.col("pred").alias("pred_lang")
    ).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# quality_quantile_map — quantile NORMALIZATION across corpus slices
# (the cross-domain feature transform: replace each doc's within-source
# rank statistic with the corresponding global quantile VALUE, so
# every source's distribution maps onto the corpus's). Everything is
# rank arithmetic on exact integers: within-source rank r of n_s maps
# to target global rank g = 1 + ((r−1)·(N−1)) div max(n_s−1, 1)
# (endpoints map to endpoints), and the mapped value is the global
# order statistic at g. BOTH rankings use the grid-cell distributed
# shape (global_rank_sample): per-(key, cell) ROW_NUMBERs partition on
# the 4096-way value grid — the within-source window is NEVER
# partitioned by source alone (20 sources at 100 TB = 20 reducers; the
# (source, cell) key spreads each source over the grid). The final
# value lookup is an equi-join on the target rank.
# ---------------------------------------------------------------------------

_QMAP_GRID = 4096

_QMAP_ORACLE = """
WITH g AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (ORDER BY n_chars, doc_id) AS grank,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM documents
),
s AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
           AS srank,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ns
  FROM documents
),
target AS (
  SELECT s.doc_id, s.source, s.n_chars,
         1 + ((s.srank - 1) * (g0.n - 1))
             // CASE WHEN s.ns > 1 THEN s.ns - 1 ELSE 1 END AS tg
  FROM s CROSS JOIN (SELECT DISTINCT n FROM g) g0
)
SELECT t.doc_id, t.source, t.n_chars,
       v.n_chars AS mapped_chars
FROM target t JOIN g v ON v.grank = t.tg
"""


@query("quality_quantile_map", _QMAP_ORACLE)
def quality_quantile_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.quantiles import range_bucket

    B = _QMAP_GRID
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    bounds = d.agg(F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi"))
    # eb roots a 4-way diamond (two rankings × local-rank + offsets) and
    # the count frames below, so the planned tree re-scans documents per
    # branch. MEASURED tradeoff (sf0.1, 32 cores, like-for-like
    # steady-state runs): localCheckpoint-ing this corpus-SIZED frame
    # ran ~1.25× slower (1.95 s vs 1.57 s) — materializing a row-format
    # corpus intermediate costs more than the 3-column pruned parquet
    # re-scans it saves, and at 100 TB it would also gamble executor
    # storage on a corpus-scale block set. Rollup-sized diamond roots
    # (hourly_value_emd etc.) DO checkpoint and measured faster — the
    # cutoff is whether the frame is corpus-sized.
    eb = d.crossJoin(F.broadcast(bounds)).withColumn(
        "cell", range_bucket("n_chars", "lo", "hi", B)
    )

    def cell_ranked(df, keys: list[str], rank_name: str):
        """Exact rank over (n_chars, doc_id) within ``keys`` via the
        grid: per-(keys, cell) local ROW_NUMBER + prefix-count offsets
        over the cell table (keys x <=4096 rows)."""
        part = keys + ["cell"]
        w_local = Window.partitionBy(*part).orderBy(
            F.col("n_chars").asc(), F.col("doc_id").asc()
        )
        w_off = Window.partitionBy(*keys).orderBy(F.col("cell").asc()).rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = (
            df.groupBy(*part)
            .agg(F.count(F.lit(1)).alias("cn"))
            .withColumn("off", F.coalesce(F.sum("cn").over(w_off), F.lit(0)))
            .select(*part, "off")
        )
        return (
            df.withColumn("lr", F.row_number().over(w_local))
            .join(offsets, part)
            .withColumn(rank_name, (F.col("off") + F.col("lr")).cast("long"))
            .drop("lr", "off")
        )

    g = cell_ranked(eb, [], "grank")
    n_tot = eb.agg(F.count(F.lit(1)).alias("n"))
    s = cell_ranked(eb, ["source"], "srank")
    ns = eb.groupBy("source").agg(F.count(F.lit(1)).alias("ns"))
    target = (
        s.join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "doc_id",
            "source",
            "n_chars",
            (
                F.lit(1)
                + F.expr(
                    "((srank - 1) * (n - 1))"
                    " div (CASE WHEN ns > 1 THEN ns - 1 ELSE 1 END)"
                )
            ).alias("tg"),
        )
    )
    lookup = g.select(F.col("grank").alias("tg"), F.col("n_chars").alias("mapped_chars"))
    return target.join(lookup, "tg").select(
        "doc_id", "source", "n_chars", "mapped_chars"
    )


# ---------------------------------------------------------------------------
# bpe_train_merges — THREE full rounds of BPE tokenizer training
# (Sennrich 2015), the iterative sequence-REWRITING loop none of the
# other driver loops cover (k-means/PCA/logreg iterate on numbers, BFS
# on frontiers; BPE rewrites symbol sequences). The Sennrich insight
# makes this 100 TB-safe: training never touches the corpus after one
# map-side pass — the corpus collapses to the (word, freq) vocabulary
# (capped top-4096 by freq DESC, word — a deterministic cut), and
# every round runs on that vocabulary-sized table: pair counts are
# freq-weighted BIGINT sums, the argmax merge is (n DESC, a, b)
# ORDER BY LIMIT 1 broadcast back, and the greedy leftmost
# non-overlapping merge is pure window arithmetic — runs of
# consecutive match positions (only possible when a = b) take
# odd offsets within the run, exactly the sequential left-to-right
# semantics, with no sequential execution. Per-round localCheckpoint
# keeps the lineage flat (the bfs_hops pattern). Output: the merge
# table (round, a, b, n) — the actual artifact a tokenizer ships.
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3
_BPE_VOCAB_CAP = 4096


def _bpe_round_sql(r: int) -> str:
    """CTE block advancing w{r-1} -> best{r}, w{r}."""
    return f"""
p{r - 1} AS (
  SELECT word, freq, t.i AS i, syms[t.i] AS s, syms[t.i+1] AS s_next
  FROM w{r - 1}, unnest(generate_series(1, len(syms))) AS t(i)
),
pairs{r} AS (
  SELECT s AS a, s_next AS b, CAST(SUM(freq) AS BIGINT) AS n
  FROM p{r - 1} WHERE s_next IS NOT NULL GROUP BY 1, 2
),
best{r} AS (SELECT a, b, n FROM pairs{r} ORDER BY n DESC, a, b LIMIT 1),
sel{r} AS (
  SELECT word, pos FROM (
    SELECT word, pos,
           row_number() OVER (PARTITION BY word, grp ORDER BY pos) AS k
    FROM (SELECT p.word, p.i AS pos,
                 p.i - row_number() OVER (PARTITION BY p.word ORDER BY p.i)
                   AS grp
          FROM p{r - 1} p, best{r}
          WHERE p.s = best{r}.a AND p.s_next = best{r}.b)
  ) WHERE k % 2 = 1
),
w{r} AS (
  SELECT p.word, ANY_VALUE(p.freq) AS freq,
         list(CASE WHEN s.pos IS NOT NULL THEN p.s || p.s_next ELSE p.s END
              ORDER BY p.i) AS syms
  FROM p{r - 1} p
  LEFT JOIN sel{r} s  ON s.word = p.word AND s.pos = p.i
  LEFT JOIN sel{r} s2 ON s2.word = p.word AND s2.pos = p.i - 1
  WHERE s2.pos IS NULL
  GROUP BY p.word
)"""


_BPE_TRAIN_ORACLE = (
    f"""
WITH words AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(regexp_extract_all(lower(text), '{_BPE_PATTERN}')) AS w
        FROM documents)
  GROUP BY w ORDER BY freq DESC, word LIMIT {_BPE_VOCAB_CAP}
),
w0 AS (SELECT word, freq, regexp_extract_all(word, '.') AS syms FROM words),
"""
    + ",\n".join(_bpe_round_sql(r) for r in range(1, _BPE_ROUNDS + 1))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT {r} AS round, a, b, n FROM best{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
)


@query("bpe_train_merges", _BPE_TRAIN_ORACLE)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0)
    w = (
        d.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(_BPE_VOCAB_CAP)
        .withColumn(
            "syms", F.regexp_extract_all(F.col("word"), F.lit("."), 0)
        )
        .localCheckpoint()
    )

    w_seq = Window.partitionBy("word").orderBy("i")
    best_rows: list[tuple[int, str, str, int]] = []
    for r in range(1, _BPE_ROUNDS + 1):
        p = (
            w.select("word", "freq", F.posexplode("syms").alias("i", "s"))
            .withColumn("s_next", F.lead("s").over(w_seq))
        )
        pairs = (
            p.filter(F.col("s_next").isNotNull())
            .groupBy(F.col("s").alias("a"), F.col("s_next").alias("b"))
            .agg(F.sum("freq").cast("long").alias("n"))
        )
        # the winning pair is ONE row over a <=vocab-sized pair table —
        # take it to the driver (TakeOrdered, one job) instead of
        # checkpoint + broadcast-join: the old shape paid an eager
        # checkpoint job plus a broadcast exchange per round just to
        # compare two string columns against one row (guide §1.2).
        top = pairs.orderBy(F.desc("n"), "a", "b").limit(1).collect()
        if not top:  # no adjacent pair left anywhere: nothing can ever
            break    # merge again — identical output to the old no-op rounds
        a_v, b_v = top[0]["a"], top[0]["b"]
        best_rows.append((r, a_v, b_v, int(top[0]["n"])))

        m = (
            p.filter((F.col("s") == F.lit(a_v)) & (F.col("s_next") == F.lit(b_v)))
            .select("word", F.col("i").alias("pos"))
        )
        grp = (
            F.col("pos")
            - F.row_number().over(Window.partitionBy("word").orderBy("pos"))
        ).alias("grp")
        sel = (
            m.select("word", "pos", grp)
            .withColumn(
                "k",
                F.row_number().over(
                    Window.partitionBy("word", "grp").orderBy("pos")
                ),
            )
            .filter(F.col("k") % 2 == 1)
            .select("word", "pos")
        )
        s1 = sel.select("word", F.col("pos").alias("i"))
        s2 = sel.select("word", (F.col("pos") + 1).alias("i"))
        merged = (
            p.join(s1.withColumn("hit", F.lit(True)), ["word", "i"], "left")
            .join(s2.withColumn("skip", F.lit(True)), ["word", "i"], "left")
            .filter(F.col("skip").isNull())
            .select(
                "word",
                "freq",
                "i",
                F.when(
                    F.col("hit").isNotNull(),
                    F.concat(F.col("s"), F.col("s_next")),
                )
                .otherwise(F.col("s"))
                .alias("new_s"),
            )
        )
        w = (
            merged.groupBy("word")
            .agg(
                F.first("freq").alias("freq"),
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("i"), F.col("new_s")))
                    ),
                    lambda x: x["new_s"],
                ).alias("syms"),
            )
            .localCheckpoint()
        )

    return local_df(
        spark, best_rows, "round int, a string, b string, n long"
    )


# ---------------------------------------------------------------------------
# inverted_postings — inverted-index LAYOUT COSTING (the build-planning
# pass of a search index over the corpus): per token, the posting-list
# stats an index builder sizes storage with — document frequency, doc-id
# envelope, and the EXACT byte cost of the standard delta+varint
# posting encoding (first posting stores doc_id+1, the rest store the
# gap to the previous doc_id; each value costs ceil(bits/7) bytes —
# computed as (length(bin(x))+6) div 7, the same md5/bin() integer
# idiom the HLL sketch uses, bit-identical across engines). Shape: one
# distinct (token, doc_id) rollup (the token_doc_freq shuffle), then a
# per-TOKEN ordered window for the gaps — parallelizes across the
# vocabulary, the window frame is one posting list. Known envelope: a
# stopword token's posting list is corpus-sized, making its window
# partition a straggler at 100 TB — production index builds doc-shard
# exactly those (they're the "common terms" every IR system
# special-cases); the df output is the detector. min_df=2 drops the
# hapax tail (typically half the vocabulary, zero index value) from
# the output after the rollup — the gap window still runs over it,
# which is fine: hapax partitions are single-row.
# ---------------------------------------------------------------------------

_POSTINGS_MIN_DF = 2

_POSTINGS_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
tokx AS (SELECT DISTINCT doc_id, unnest(toks) AS token FROM toks),
gapped AS (
  SELECT token, doc_id,
         COALESCE(doc_id - lag(doc_id) OVER w, doc_id + 1) AS stored
  FROM tokx
  WINDOW w AS (PARTITION BY token ORDER BY doc_id)
),
per_tok AS (
  SELECT token,
         CAST(COUNT(*) AS BIGINT) AS df,
         CAST(MIN(doc_id) AS BIGINT) AS min_doc,
         CAST(MAX(doc_id) AS BIGINT) AS max_doc,
         CAST(SUM((length(bin(stored)) + 6) // 7) AS BIGINT) AS varint_bytes
  FROM gapped GROUP BY token
)
SELECT token, df, min_doc, max_doc, varint_bytes,
       CAST(varint_bytes AS DOUBLE) / CAST(df AS DOUBLE) AS bytes_per_posting
FROM per_tok WHERE df >= {_POSTINGS_MIN_DF}
"""


@query("inverted_postings", _POSTINGS_ORACLE)
def inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    tokx = d.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("token")
    ).distinct()
    w = Window.partitionBy("token").orderBy("doc_id")
    gapped = tokx.withColumn(
        "stored",
        F.coalesce(
            F.col("doc_id") - F.lag("doc_id").over(w), F.col("doc_id") + 1
        ),
    )
    per_tok = gapped.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.sum(F.expr("(length(bin(stored)) + 6) div 7")).alias("varint_bytes"),
    )
    return per_tok.filter(F.col("df") >= _POSTINGS_MIN_DF).select(
        "token",
        "df",
        "min_doc",
        "max_doc",
        "varint_bytes",
        (F.col("varint_bytes").cast("double") / F.col("df").cast("double")).alias(
            "bytes_per_posting"
        ),
    )


# ---------------------------------------------------------------------------
# hybrid_rrf_fusion — hybrid retrieval (lexical BM25 + dense cosine)
# fused with Reciprocal Rank Fusion, the standard hybrid-search
# combiner (Cormack et al., SIGIR'09: score = Σ 1/(k + rank), k=60).
# The query is document 0: its salient terms drive the lexical list
# (the fixed bm25_scores terms) and its embedding (embeddings.vec_id =
# documents.doc_id) drives the dense list. Both lists are depth-20;
# RRF contributions use ranks only, so the fusion is immune to the two
# scorers' incomparable scales — exactly why production hybrid search
# uses it. Determinism: ranks come from exact-integer orderings (BM25
# micro-units; cosine rounded to 6dp), and each RRF term 1/(60+r) is a
# single IEEE division of exact values, summed once — bit-identical
# across engines. Scale shape: the corpus-sized work is the two
# top-k's (TakeOrderedAndProject over the BM25 rollup / the broadcast-
# query cosine scan); everything after runs on 2×20 rows — the rank
# windows are depth-bounded by construction and the full-outer fuse
# join is top-k × top-k, never corpus-sized.
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_DEPTH = 20


def _rrf_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS tk FROM documents),
dl AS (SELECT doc_id, len(tk) AS dl FROM toks),
n_avg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tk) AS term FROM toks)
  WHERE term IN ({terms})
  GROUP BY doc_id, term
),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
partial AS (
  SELECT t.doc_id,
         CAST(ROUND(
           ln((CAST(a.n_docs - d.df AS DOUBLE) + 0.5) / (d.df + 0.5) + 1.0)
           * (t.tf * ({_BM25_K1} + 1.0))
           / (t.tf + {_BM25_K1} * (1.0 - {_BM25_B}
              + {_BM25_B} * l.dl / a.avgdl))
           * 1000000.0, 0) AS BIGINT) AS sq
  FROM tf t
  JOIN df d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN n_avg a
),
lex AS (
  SELECT doc_id, SUM(sq) AS s FROM partial
  WHERE doc_id <> 0 GROUP BY doc_id
  ORDER BY SUM(sq) DESC, doc_id ASC LIMIT {_RRF_DEPTH}
),
lexr AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY s DESC, doc_id ASC) AS INTEGER)
           AS lex_rank
  FROM lex
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
dense AS (
  SELECT vec_id,
         ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                      (SELECT qv FROM q)), 6) AS cs
  FROM embeddings WHERE vec_id <> 0
  ORDER BY cs DESC, vec_id ASC LIMIT {_RRF_DEPTH}
),
denser AS (
  SELECT vec_id,
         CAST(row_number() OVER (ORDER BY cs DESC, vec_id ASC) AS INTEGER)
           AS dense_rank
  FROM dense
)
SELECT COALESCE(l.doc_id, d.vec_id) AS doc_id,
       l.lex_rank, d.dense_rank,
       COALESCE(CAST(1.0 AS DOUBLE)
                / (CAST({_RRF_K} AS DOUBLE) + CAST(l.lex_rank AS DOUBLE)),
                CAST(0.0 AS DOUBLE))
       + COALESCE(CAST(1.0 AS DOUBLE)
                  / (CAST({_RRF_K} AS DOUBLE) + CAST(d.dense_rank AS DOUBLE)),
                  CAST(0.0 AS DOUBLE)) AS rrf_score
FROM lexr l FULL OUTER JOIN denser d ON l.doc_id = d.vec_id
ORDER BY rrf_score DESC, doc_id ASC
LIMIT 10
"""


@query("hybrid_rrf_fusion", _rrf_oracle())
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    lex = (
        _bm25_sq(spark, sf_dir)
        .filter(F.col("doc_id") != 0)
        .orderBy(F.col("_s").desc(), F.col("doc_id").asc())
        .limit(_RRF_DEPTH)
    )
    # rank windows run over the ALREADY-LIMITED depth-20 frames — a
    # single-partition window bounded by construction, never the corpus
    lexr = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("_s").desc(), F.col("doc_id").asc()))
        .alias("lex_rank"),
    )

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    dense = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                SIM.cosine(F.col("embedding").cast("array<double>"), F.col("qv")), 6
            ).alias("cs"),
        )
        .orderBy(F.col("cs").desc(), F.col("vec_id").asc())
        .limit(_RRF_DEPTH)
    )
    denser = dense.select(
        "vec_id",
        F.row_number()
        .over(Window.orderBy(F.col("cs").desc(), F.col("vec_id").asc()))
        .alias("dense_rank"),
    )

    rrf_term = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(float(_RRF_K)) + r.cast("double")), F.lit(0.0)
    )
    fused = lexr.join(
        denser, lexr["doc_id"] == denser["vec_id"], "full_outer"
    ).select(
        F.coalesce(F.col("doc_id"), F.col("vec_id")).alias("doc_id"),
        "lex_rank",
        "dense_rank",
        (rrf_term(F.col("lex_rank")) + rrf_term(F.col("dense_rank"))).alias(
            "rrf_score"
        ),
    )
    return fused.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc()).limit(10)


# ---------------------------------------------------------------------------
# ngram_novelty_curve — corpus freshness audit for training-data
# collection (the "are new batches still adding anything?" signal): in
# doc-id order (the arrival proxy), split the corpus into 10 equal-id
# batches and report, per batch, how many distinct 3-gram shingles
# appear there AT ALL vs how many appear there FIRST. A healthy crawl
# keeps novelty high; a saturated or looping source trends to zero and
# should rotate out of the mix (corpus_mix_weights' upstream signal).
# Scale shape: one distinct (doc_id, shingle-hash) explode (the shared
# sh basis), batch ids from a broadcast min/max — NEVER a global
# row_number over docs — then ONE map-side-combinable rollup per
# branch: per-gram min-batch (shuffle on the 8-byte gram hash) and
# per-batch distincts; the join that fuses them is 10 rows vs 10 rows.
# All counts exact BIGINTs; the ppm ratio is truncating integer math.
# ---------------------------------------------------------------------------

_NOVELTY_BATCHES = 10

_NOVELTY_ORACLE = f"""
WITH {_SQL_SHINGLE_TABLE},
bounds AS (
  SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents
),
shb AS (
  SELECT CAST(((sh.doc_id - b.lo) * {_NOVELTY_BATCHES})
              // (b.hi - b.lo + 1) AS BIGINT) AS batch,
         sh.doc_id, sh.sh
  FROM sh, bounds b
),
per_batch AS (
  SELECT batch,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_gram_rows,
         CAST(COUNT(DISTINCT sh) AS BIGINT) AS distinct_grams
  FROM shb GROUP BY batch
),
firsts AS (
  SELECT MIN(batch) AS batch FROM shb GROUP BY sh
),
novel AS (
  SELECT batch, CAST(COUNT(*) AS BIGINT) AS novel_grams
  FROM firsts GROUP BY batch
)
SELECT p.batch, p.n_docs, p.n_gram_rows, p.distinct_grams,
       COALESCE(n.novel_grams, 0) AS novel_grams,
       CAST((COALESCE(n.novel_grams, 0) * 1000000) // p.distinct_grams
            AS BIGINT) AS novelty_ppm
FROM per_batch p LEFT JOIN novel n ON n.batch = p.batch
"""


@query("ngram_novelty_curve", _NOVELTY_ORACLE)
def ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: shingle explode dominates (r14: 1.58 -> 1.02 s best)
    d = t(spark, sf_dir, "documents", spread=True)
    bounds = d.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    shb = (
        SIM.shingle_table(d, "doc_id", "text", shingle_n=3)
        .crossJoin(F.broadcast(bounds))
        .select(
            F.expr(f"((doc_id - lo) * {_NOVELTY_BATCHES}) div (hi - lo + 1)")
            .cast("long")
            .alias("batch"),
            "doc_id",
            "sh",
        )
        # roots a two-branch diamond (per-batch stats + per-gram
        # first-batch): checkpoint so the shingle explode runs once
        .localCheckpoint()
    )
    per_batch = shb.groupBy("batch").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_gram_rows"),
        F.countDistinct("sh").alias("distinct_grams"),
    )
    novel = (
        shb.groupBy("sh")
        .agg(F.min("batch").alias("batch"))
        .groupBy("batch")
        .agg(F.count(F.lit(1)).alias("novel_grams"))
    )
    from ..functions.numeric import exact_div

    return (
        per_batch.join(novel, "batch", "left")
        .select(
            "batch",
            "n_docs",
            "n_gram_rows",
            "distinct_grams",
            F.coalesce(F.col("novel_grams"), F.lit(0)).alias("novel_grams"),
            exact_div(
                F.coalesce(F.col("novel_grams"), F.lit(0)) * F.lit(1000000),
                F.col("distinct_grams"),
            )
            .cast("long")
            .alias("novelty_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# cross_source_dups — provenance-leakage audit: near-duplicate pairs
# that span DIFFERENT sources (a mirror site, a syndicated feed, a
# scraped re-post), rolled up per source pair. Within-source dups are a
# dedup problem; CROSS-source dups are a sampling problem — a corpus
# mix that weights sources independently double-counts exactly these.
# Same banded LSH candidate generation as minhash_lsh_pairs (equi-join
# on (band, band_key) — fan-out banding-bounded, never all-pairs); the
# doc→source attachment joins the candidate list (pairs-sized) against
# the id→source projection, and the pair key is normalized
# lexicographically so (A,B) and (B,A) collapse. Counts exact BIGINTs.
# ---------------------------------------------------------------------------


def _cross_source_sql() -> str:
    rows = _MINHASH_K // _MINHASH_BANDS
    band_selects = []
    for bnd in range(_MINHASH_BANDS):
        key = " || ',' || ".join(
            f"CAST(mh{bnd * rows + j} AS VARCHAR)" for j in range(rows)
        )
        band_selects.append(
            f"SELECT doc_id, {bnd} AS band, {key} AS band_key FROM sigs"
        )
    buckets = " UNION ALL ".join(band_selects)
    mins = ", ".join(
        f"MIN(({a} * sh + {b}) % {TX.HASH_MOD}) AS mh{i}"
        for i, (a, b) in enumerate(SIM.minhash_params(_MINHASH_K))
    )
    return f"""
WITH {_SQL_SHINGLE_TABLE},
sigs AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
buckets AS ({buckets}),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
tagged AS (
  SELECT LEAST(da.source, db.source) AS source_a,
         GREATEST(da.source, db.source) AS source_b
  FROM pairs p
  JOIN documents da ON da.doc_id = p.id_a
  JOIN documents db ON db.doc_id = p.id_b
  WHERE da.source <> db.source
)
SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM tagged GROUP BY 1, 2
"""


@query("cross_source_dups", _cross_source_sql())
def cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # lazy truncation: the band self-join references sigs on BOTH
    # sides, so the un-truncated tree carried the shingle explode +
    # 16-min aggregate twice (same fix as minhash_lsh_pairs, r14)
    sigs = SIM.minhash_signatures(
        docs, "doc_id", "text", k=_MINHASH_K, shingle_n=3
    ).localCheckpoint(eager=False)
    pairs = SIM.lsh_candidate_pairs(sigs, "doc_id", k=_MINHASH_K, bands=_MINHASH_BANDS)
    src = docs.select("doc_id", "source")
    tagged = (
        pairs.join(src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa")), "id_a")
        .join(src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb")), "id_b")
        .filter(F.col("sa") != F.col("sb"))
        .select(
            F.least(F.col("sa"), F.col("sb")).alias("source_a"),
            F.greatest(F.col("sa"), F.col("sb")).alias("source_b"),
        )
    )
    return tagged.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


# ---------------------------------------------------------------------------
# source_dataset_card — the per-source "dataset card" rollup every
# corpus release ships: document count, exact token mass, average
# document length, language spread and the dominant language's share.
# ONE pass over the corpus feeds a (source, lang) rollup; the card
# assembles from that rollup and its source-level re-aggregation —
# nothing downstream scales with documents. The dominant language is
# max_by over exact counts with a lang tiebreak (deterministic), its
# share an exact_div ppm; mean chars is one division of exact BIGINTs
# (never an engine AVG over doubles).
# ---------------------------------------------------------------------------

_CARD_ORACLE = """
WITH per AS (
  SELECT source, lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END
             AS BIGINT)) AS toks,
         SUM(CAST(n_chars AS BIGINT)) AS chars
  FROM documents GROUP BY 1, 2
),
ranked AS (
  SELECT source, lang, n_docs,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_docs DESC, lang ASC) AS rn
  FROM per
),
card AS (
  SELECT source,
         SUM(n_docs) AS n_docs,
         SUM(toks) AS total_tokens,
         SUM(chars) AS total_chars,
         CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM per GROUP BY source
)
SELECT c.source, CAST(c.n_docs AS BIGINT) AS n_docs,
       CAST(c.total_tokens AS BIGINT) AS total_tokens,
       CAST(c.total_chars AS DOUBLE) / c.n_docs AS mean_chars,
       c.n_langs, r.lang AS top_lang,
       CAST((r.n_docs * 1000000) // c.n_docs AS BIGINT)
         AS top_lang_share_ppm
FROM card c JOIN ranked r ON r.source = c.source AND r.rn = 1
"""


@query("source_dataset_card", _CARD_ORACLE)
def source_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import exact_div

    d = t(spark, sf_dir, "documents").select(
        "source", "lang", TX.token_count(F.col("text")).alias("toks"), "n_chars"
    )
    per = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("toks"),
        F.sum("n_chars").alias("chars"),
    )
    card = per.groupBy("source").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("toks").alias("total_tokens"),
        F.sum("chars").alias("total_chars"),
        F.count(F.lit(1)).alias("n_langs"),
        F.min_by("lang", F.struct((-F.col("n_docs")).alias("neg"), F.col("lang"))).alias(
            "top_lang"
        ),
        F.max("n_docs").alias("top_lang_docs"),
    )
    return card.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        (F.col("total_chars").cast("double") / F.col("n_docs")).alias("mean_chars"),
        F.col("n_langs").cast("long").alias("n_langs"),
        "top_lang",
        exact_div(
            F.col("top_lang_docs").cast("decimal(38,0)") * F.lit(1000000),
            F.col("n_docs"),
        )
        .cast("long")
        .alias("top_lang_share_ppm"),
    )


# ---------------------------------------------------------------------------
# doc_length_histogram — the sequence-length planning histogram behind
# sequence_pack / token_budget_select: documents bucketed by the BIT
# WIDTH of their token count (log2 buckets: 1, 2-3, 4-7, 8-15, … —
# exactly length(bin(n)), integer bit math on both engines, no float
# log2 at a power-of-two boundary), per language. Tells the packing
# stage what fraction of the corpus fits a context window and how much
# mass truncation loses. One map-side-combined rollup; nothing scales
# past (lang × ~20 buckets).
# ---------------------------------------------------------------------------

_DLH_ORACLE = f"""
WITH toks AS (
  SELECT lang,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END
           AS BIGINT) AS n
  FROM documents
)
SELECT lang,
       CAST(CASE WHEN n = 0 THEN 0 ELSE length(bin(n)) END AS BIGINT)
         AS len_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       MIN(n) AS min_tokens,
       MAX(n) AS max_tokens
FROM toks GROUP BY 1, 2
"""


@query("doc_length_histogram", _DLH_ORACLE)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "lang", TX.token_count(F.col("text")).cast("long").alias("n")
    )
    bucket = F.when(F.col("n") == 0, F.lit(0)).otherwise(
        F.length(F.bin(F.col("n")))
    )
    return d.select("lang", bucket.cast("long").alias("len_bucket"), "n").groupBy(
        "lang", "len_bucket"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").alias("total_tokens"),
        F.min("n").alias("min_tokens"),
        F.max("n").alias("max_tokens"),
    )


# ---------------------------------------------------------------------------
# minhash_error_audit — sketch-quality gate for the LSH pipeline: on
# the banding CANDIDATE pairs, compare the 16-component signature's
# Jaccard estimate against the exact shingle Jaccard and report the
# error envelope (mean + max |error| in ppm). This is the audit that
# says whether k=16 is enough before trusting est_jaccard thresholds
# at 100 TB. Everything is exact integer ppm — est = matches·1e6//k,
# truth = inter·1e6//union — so the error itself hash-matches. Shape:
# candidates are banding-bounded; the exact-intersection join touches
# only candidate docs' shingle rows (semi-joined first), the same
# verify-narrowing as lsh_verified_pairs.
# ---------------------------------------------------------------------------


def _mh_err_oracle() -> str:
    rows = _MINHASH_K // _MINHASH_BANDS
    band_selects = []
    for bnd in range(_MINHASH_BANDS):
        key = " || ',' || ".join(
            f"CAST(mh{bnd * rows + j} AS VARCHAR)" for j in range(rows)
        )
        band_selects.append(
            f"SELECT doc_id, {bnd} AS band, {key} AS band_key FROM sigs"
        )
    buckets = " UNION ALL ".join(band_selects)
    eq = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END"
        for i in range(_MINHASH_K)
    )
    mins = ", ".join(
        f"MIN(({a} * sh + {b}) % {TX.HASH_MOD}) AS mh{i}"
        for i, (a, b) in enumerate(SIM.minhash_params(_MINHASH_K))
    )
    return f"""
WITH {_SQL_SHINGLE_TABLE},
sigs AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
buckets AS ({buckets}),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT p.id_a, p.id_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM pairs p
  JOIN sh a ON a.doc_id = p.id_a
  JOIN sh b ON b.doc_id = p.id_b AND b.sh = a.sh
  GROUP BY 1, 2
),
scored AS (
  SELECT p.id_a, p.id_b,
         ({eq}) * 1000000 // {_MINHASH_K} AS est_ppm,
         COALESCE(i.n_inter, 0) * 1000000
           // (za.sz + zb.sz - COALESCE(i.n_inter, 0)) AS exact_ppm
  FROM pairs p
  JOIN sigs sa ON sa.doc_id = p.id_a
  JOIN sigs sb ON sb.doc_id = p.id_b
  JOIN sizes za ON za.doc_id = p.id_a
  JOIN sizes zb ON zb.doc_id = p.id_b
  LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(ABS(est_ppm - exact_ppm)) // COUNT(*) AS BIGINT)
         AS mean_abs_err_ppm,
       CAST(MAX(ABS(est_ppm - exact_ppm)) AS BIGINT) AS max_abs_err_ppm
FROM scored
"""


@query("minhash_error_audit", _mh_err_oracle())
def minhash_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import exact_div

    # spread: shingle build is scan-rooted CPU (r14: 2.79 -> 2.22 s)
    docs = t(spark, sf_dir, "documents", spread=True)
    sh = SIM.shingle_table(docs, "doc_id", "text", shingle_n=3).localCheckpoint()
    # sigs feeds three branches (banding + sig_a + sig_b); the lazy
    # truncation stops the 16-min aggregate subtree from appearing in
    # each (measured r14 interleaved: best 3.00 -> 2.73 s).
    # r14 follow-up: the per-doc size COUNT rides the same groupBy (sh
    # is distinct, so COUNT(*) == the oracle's sizes CTE) — one
    # aggregation of sh instead of two, and the scored plan joins the
    # sizes as columns already on sig_a/sig_b instead of two extra
    # joins (5 -> 3; interleaved A/B 3/4 wins, best 2.42 -> 2.07 s).
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("sh") + F.lit(b)) % F.lit(TX.HASH_MOD)).alias(
                f"mh{i}"
            )
            for i, (a, b) in enumerate(SIM.minhash_params(_MINHASH_K))
        ],
        F.count(F.lit(1)).alias("sz"),
    ).localCheckpoint(eager=False)
    pairs = SIM.lsh_candidate_pairs(
        sigs, "doc_id", k=_MINHASH_K, bands=_MINHASH_BANDS
    ).localCheckpoint()
    # exact intersection restricted to candidate docs (semi-join first)
    cand_ids = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    shc = sh.join(cand_ids, "doc_id", "left_semi")
    a = shc.select(F.col("doc_id").alias("id_a"), "sh")
    b = shc.select(F.col("doc_id").alias("id_b"), "sh")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    # (r15: packing the 16 mh columns into ONE array per side — to cut
    # the scored subtree's attribute count — was A/B'd over 10
    # interleaved rounds and measured pure noise; the 16-column join
    # stays as the simpler plan.)
    sig_a = sigs.select(
        F.col("doc_id").alias("id_a"),
        F.col("sz").alias("sza"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(_MINHASH_K)],
    )
    sig_b = sigs.select(
        F.col("doc_id").alias("id_b"),
        F.col("sz").alias("szb"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(_MINHASH_K)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(_MINHASH_K)
    )
    scored = (
        pairs.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .join(inter, ["id_a", "id_b"], "left")
        .select(
            exact_div(
                matches.cast("decimal(38,0)") * F.lit(1000000),
                F.lit(_MINHASH_K).cast("decimal(38,0)"),
            ).alias("est_ppm"),
            exact_div(
                F.coalesce(F.col("n_inter"), F.lit(0)).cast("decimal(38,0)")
                * F.lit(1000000),
                (
                    F.col("sza") + F.col("szb") - F.coalesce(F.col("n_inter"), F.lit(0))
                ).cast("decimal(38,0)"),
            ).alias("exact_ppm"),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        exact_div(
            F.sum(F.abs(F.col("est_ppm") - F.col("exact_ppm"))),
            F.count(F.lit(1)).cast("decimal(38,0)"),
        )
        .cast("long")
        .alias("mean_abs_err_ppm"),
        F.max(F.abs(F.col("est_ppm") - F.col("exact_ppm")))
        .cast("long")
        .alias("max_abs_err_ppm"),
    )


# ---------------------------------------------------------------------------
# boilerplate_ngrams — template/boilerplate detection (the C4-style
# cleaning signal doc_repetition's WITHIN-doc lens misses): shingles
# that recur across a large fraction of a source's documents are
# navigation chrome, footers, license headers — content no model should
# see a thousand times. Per source: doc count, distinct shingles,
# shingles present in >25% of the source's docs (df-ratio on exact
# integers: 4·df > n_docs), and the boilerplate MASS ratio (occurrence
# rows owned by boilerplate shingles, exact ppm) — the number that says
# how much of the source a template-strip would delete. Shape: the
# distinct (doc, shingle) basis collapses to per-(source, shingle) df
# map-side; everything downstream is df-rollup-sized; threshold
# arithmetic stays integer (no float ratio at the boundary).
# ---------------------------------------------------------------------------

_BOILER_ORACLE = f"""
WITH {_SQL_SHINGLE_TABLE},
docsrc AS (SELECT doc_id, source FROM documents),
occ AS (
  SELECT d.source, s.sh, s.doc_id
  FROM sh s JOIN docsrc d ON d.doc_id = s.doc_id
),
nd AS (
  SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM occ GROUP BY 1
),
df AS (
  SELECT source, sh, CAST(COUNT(*) AS BIGINT) AS df
  FROM occ GROUP BY 1, 2
)
SELECT d.source, n.n_docs,
       CAST(COUNT(*) AS BIGINT) AS distinct_shingles,
       CAST(SUM(CASE WHEN 4 * d.df > n.n_docs THEN 1 ELSE 0 END) AS BIGINT)
         AS boilerplate_shingles,
       CAST((SUM(CASE WHEN 4 * d.df > n.n_docs THEN d.df ELSE 0 END)
             * 1000000) // SUM(d.df) AS BIGINT) AS boilerplate_mass_ppm
FROM df d JOIN nd n ON n.source = d.source
GROUP BY d.source, n.n_docs
"""


@query("boilerplate_ngrams", _BOILER_ORACLE)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import exact_div

    # spread: shingle explode dominates (r14: 1.84 -> 1.03 s best)
    docs = t(spark, sf_dir, "documents", spread=True)
    occ = (
        SIM.shingle_table(docs, "doc_id", "text", shingle_n=3)
        .join(docs.select("doc_id", "source"), "doc_id")
        # roots the n_docs + df diamond: one shingle explode
        .localCheckpoint()
    )
    nd = occ.groupBy("source").agg(F.countDistinct("doc_id").alias("n_docs"))
    df = occ.groupBy("source", "sh").agg(F.count(F.lit(1)).alias("df"))
    boiler = F.when(4 * F.col("df") > F.col("n_docs"), F.col("df")).otherwise(0)
    return (
        df.join(F.broadcast(nd), "source")
        .groupBy("source", "n_docs")
        .agg(
            F.count(F.lit(1)).alias("distinct_shingles"),
            F.sum(
                F.when(4 * F.col("df") > F.col("n_docs"), 1).otherwise(0)
            )
            .cast("long")
            .alias("boilerplate_shingles"),
            exact_div(
                F.sum(boiler).cast("decimal(38,0)") * F.lit(1000000),
                F.sum("df").cast("decimal(38,0)"),
            )
            .cast("long")
            .alias("boilerplate_mass_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# token_freq_spectrum — the Zipf diagnostic of the corpus vocabulary:
# the count-of-counts table of token frequencies (how many distinct
# tokens occur exactly f times), plus the total/vocab masses. Reads as
# a dataset-health gate: a natural corpus is heavy-tailed (huge
# hapax count); a templated or synthetic one collapses to few spikes.
# The spectrum is O(√N) rows by construction (the skew_audit argument),
# so the output is bounded at any corpus size; token counts come from
# ONE explode + two map-side-combining rollups. Exact integers
# throughout — no log-log slope here because ln() is not correctly
# rounded cross-engine (ORACLE_NOTES); the spectrum itself carries the
# same information losslessly.
# ---------------------------------------------------------------------------

_TFS_ORACLE = f"""
WITH toks AS (
  SELECT unnest({_SQL_TOKS}) AS tok FROM documents
),
tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM toks GROUP BY 1),
spec AS (
  SELECT f, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tf GROUP BY 1
)
SELECT f AS freq, n_tokens,
       CAST(f * n_tokens AS BIGINT) AS token_mass
FROM spec
"""


@query("token_freq_spectrum", _TFS_ORACLE)
def token_freq_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(TX.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    return (
        tf.groupBy("f")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
        .select(
            F.col("f").alias("freq"),
            "n_tokens",
            (F.col("f") * F.col("n_tokens")).cast("long").alias("token_mass"),
        )
    )
