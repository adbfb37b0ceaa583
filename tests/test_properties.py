"""Property-based tests (SURVEY.md §5: 'property-test the conversions').

Hypothesis drives the pure-Python helpers; Spark expressions are tested
batch-style (one job over a seeded random batch — per-example Spark
jobs would be prohibitively slow) against independent Python models.
"""

from __future__ import annotations

import random
import zoneinfo
from datetime import datetime, timedelta

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from openaq_lcs_fetch_spark.config import ConfigError, validate_source_config
from openaq_lcs_fetch_spark.functions.cleaning import coerce_number
from openaq_lcs_fetch_spark.functions.timestamps import from_local
from openaq_lcs_fetch_spark.measurands import UNIT_CONVERSIONS, normalize_unit_and_scale

# --- pure helpers under hypothesis -----------------------------------------


@given(st.text(min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_normalize_unit_total(unit):
    """normalize never throws and is idempotent on its own output."""
    nu, scale = normalize_unit_and_scale(unit)
    assert scale > 0
    nu2, scale2 = normalize_unit_and_scale(nu)
    if nu not in UNIT_CONVERSIONS:  # normalized units are fixed points
        assert (nu2, scale2) == (nu, 1.0)


@given(
    st.fixed_dictionaries(
        {
            "schema": st.just("v1"),
            "provider": st.text(min_size=1, max_size=10),
            "frequency": st.sampled_from(["minute", "hour", "day"]),
            "active": st.booleans(),
        }
    )
)
@settings(max_examples=100, deadline=None)
def test_valid_configs_always_pass(cfg):
    assert validate_source_config(cfg) == cfg


@given(st.dictionaries(st.text(max_size=8), st.integers(), max_size=4))
@settings(max_examples=100, deadline=None)
def test_garbage_configs_always_rejected(cfg):
    if set(cfg) >= {"schema", "provider", "frequency", "active"}:
        return  # could be valid; covered above
    with pytest.raises(ConfigError):
        validate_source_config(cfg)


# --- Spark expressions over seeded random batches --------------------------


def test_coerce_number_matches_python_float(spark):
    rng = random.Random(42)
    cases = []
    for _ in range(200):
        v = round(rng.uniform(-1e6, 1e6), rng.randint(0, 4))
        s = f"{v:,}" if rng.random() < 0.5 else str(v)
        cases.append((s, v))
    cases += [
        ("junk", None), ("", None), ("1.2.3", None), ("--5", None),
        ("1,2,3", None), ("12,34", None), ("+1.5", 1.5), ("1,234,567.25", 1234567.25),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "raw string")
    got = [r[0] for r in df.select(coerce_number(F.col("raw"))).collect()]
    for (s, want), g in zip(cases, got):
        if want is None:
            assert g is None, s
        else:
            assert g == pytest.approx(want), s


def test_from_local_matches_zoneinfo(spark):
    """C6 against Python's zoneinfo across random instants (includes
    DST transitions for America/New_York; naive local times that are
    ambiguous/nonexistent are excluded — providers emit sampled clock
    readings, not wall-clock edge cases)."""
    tz = zoneinfo.ZoneInfo("America/New_York")
    rng = random.Random(7)
    base = datetime(2023, 1, 1)
    rows, expected = [], []
    while len(rows) < 100:
        local = base + timedelta(minutes=rng.randint(0, 2 * 365 * 24 * 60))
        aware = local.replace(tzinfo=tz)
        # skip ambiguous/nonexistent local times (fold-sensitive)
        if aware.utcoffset() != local.replace(tzinfo=tz, fold=1).utcoffset():
            continue
        rows.append((local.strftime("%Y-%m-%d %H:%M:%S"),))
        expected.append(aware.astimezone(zoneinfo.ZoneInfo("UTC")).replace(tzinfo=None))
    df = spark.createDataFrame(rows, "raw string")
    got = [
        r[0]
        for r in df.select(
            from_local(F.col("raw"), "yyyy-MM-dd HH:mm:ss", "America/New_York")
        ).collect()
    ]
    assert got == expected


def test_minhash_estimates_jaccard(spark):
    """The k=64 signature estimate tracks exact jaccard within 0.25 for
    synthetic doc pairs across the similarity range."""
    from openaq_lcs_fetch_spark.functions.similarity import (
        lsh_similar_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(50)]
    docs = []
    base = [rng.choice(vocab) for _ in range(60)]
    for i in range(10):  # progressively mutated copies of one base doc
        words = list(base)
        for _ in range(i * 6):
            words[rng.randrange(len(words))] = rng.choice(vocab)
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = minhash_signatures(df, "doc_id", "text", k=64, shingle_n=2)
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in lsh_similar_pairs(sigs, "doc_id", k=64, bands=32).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "doc_id", "text", shingle_n=2).collect()
    }
    checked = 0
    for pair, e in est.items():
        if pair in exact:
            assert abs(e - exact[pair]) < 0.25, (pair, e, exact[pair])
            checked += 1
    assert checked >= 5  # banding with r=2 must surface the similar pairs


def test_connected_components_matches_union_find(spark):
    """CC on seeded random graphs equals a plain union-find model."""
    from openaq_lcs_fetch_spark.operators.dedup import connected_components

    rng = random.Random(99)
    for n_nodes, n_edges in ((30, 10), (40, 45), (25, 0)):
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ]
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        # canonical label = min node id in the component
        comp_min: dict[int, int] = {}
        for v in range(n_nodes):
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        want = {v: comp_min[find(v)] for v in range(n_nodes)}

        nodes_df = spark.createDataFrame([(i,) for i in range(n_nodes)], "id long")
        edges_df = spark.createDataFrame(
            edges or [(0, 0)], "src long, dst long"
        )
        got = {
            r.id: r.component
            for r in connected_components(nodes_df, edges_df).collect()
        }
        assert got == want, (n_nodes, n_edges)


def test_word_shingles_matches_python_reference(spark):
    """The zip_with shingle construction equals the obvious Python
    n-gram join for random token streams, including the short-doc and
    empty-doc edges."""
    rng = random.Random(7)
    vocab = ["a", "bb", "ccc", "x1", "zz9"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 9))))
        for i in range(60)
    ] + [(100, ""), (101, "solo")]
    df = spark.createDataFrame(rows, "id long, text string")
    from openaq_lcs_fetch_spark.functions.text import tokens, word_shingles

    for n in (2, 3, 5):
        got = {
            r.id: r.s
            for r in df.select(
                "id", word_shingles(tokens(F.col("text")), n).alias("s")
            ).collect()
        }
        for i, text in rows:
            toks = text.split() if text.strip() else []
            want = [
                " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
            ]
            assert got[i] == want, (n, i, text)


def test_max_run_len_matches_counter(spark):
    """_max_run_len over the sorted array == the max token frequency."""
    from collections import Counter

    from openaq_lcs_fetch_spark.functions.text import tokens
    from openaq_lcs_fetch_spark.plans.llmops import _max_run_len

    rng = random.Random(11)
    vocab = ["t", "u", "vv", "w"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: r.m
        for r in df.select(
            "id", _max_run_len(F.sort_array(tokens(F.col("text")))).alias("m")
        ).collect()
    }
    for i, text in rows:
        assert got[i] == max(Counter(text.split()).values()), (i, text)


def test_containment_capped_equals_plain_on_random_corpora(spark):
    """The df-capped containment (hot-shingle exclusion + hot-array
    recovery + asymmetric certificate + adaptive fallback) must return
    EXACTLY the plain join's answer on seeded random corpora spanning
    the interesting regimes: no hot shingles (vacuous cap), moderate
    boilerplate (capped path), and hot-dominated docs (fallback)."""
    import random

    from openaq_lcs_fetch_spark.functions.similarity import ngram_containment_pairs

    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(30)]
    for trial, (n_docs, boiler_runs, thr, cap) in enumerate(
        [
            (30, 0, 0.4, 4),   # no shared boilerplate → vacuous cap
            (40, 1, 0.4, 4),   # one hot run in every doc → capped path
            (40, 3, 0.3, 4),   # mostly boilerplate → certificate fails → fallback
        ]
    ):
        boiler = "alpha beta gamma delta"
        docs = []
        for i in range(n_docs):
            words = [rng.choice(vocab) for _ in range(rng.randrange(6, 14))]
            text = " ".join(boiler.split() * boiler_runs + words)
            docs.append((i, text))
        # a few exact dups and one excerpt to guarantee passing pairs
        docs.append((1000, docs[0][1]))
        docs.append((1001, " ".join(docs[1][1].split()[:6])))
        df = spark.createDataFrame(docs, "doc_id long, text string")

        def pairs(df_cap):
            return {
                (r.id_sub, r.id_super, r.containment)
                for r in ngram_containment_pairs(
                    df, "doc_id", "text", 3, thr, df_cap=df_cap
                ).collect()
            }

        capped, plain = pairs(cap), pairs(10**9)
        assert capped == plain, f"trial {trial}: capped != plain"
        assert any(p[0] == 1000 or p[1] == 1000 for p in capped), trial


# --- round-4b operator properties ------------------------------------------


def test_zorder_interleave_roundtrip(spark):
    """The Morton key de-interleaves back to its inputs (bijectivity is
    what makes contiguous z-ranges = bounded rectangles), and sharing a
    z-prefix implies sharing coordinate prefixes."""
    from openaq_lcs_fetch_spark.storage import zorder_column

    rng = random.Random(7)
    pts = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(300)]
    df = spark.createDataFrame(pts, "a long, b long")
    rows = df.select(
        "a", "b", zorder_column(["a", "b"], bits=16).alias("z")
    ).collect()
    for r in rows:
        a = b = 0
        for k in range(16):
            a |= ((r.z >> (2 * k)) & 1) << k
            b |= ((r.z >> (2 * k + 1)) & 1) << k
        assert (a, b) == (r.a, r.b), r


def test_sql_zorder_matches_column_zorder(spark):
    """The DuckDB twin emits the identical key for identical inputs."""
    import duckdb

    from openaq_lcs_fetch_spark.storage import sql_zorder, zorder_column

    rng = random.Random(11)
    pts = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(200)]
    df = spark.createDataFrame(pts, "a long, b long")
    spark_z = [
        r.z
        for r in df.select(zorder_column(["a", "b"], bits=16).alias("z"))
        .orderBy("z")
        .collect()
    ]
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame(pts, columns=["a", "b"]))
    duck_z = [
        r[0]
        for r in con.sql(
            f"SELECT {sql_zorder(['a', 'b'], 16)} AS z FROM pts ORDER BY z"
        ).fetchall()
    ]
    assert spark_z == duck_z


def test_ols_trend_matches_numpy(spark):
    """user_value_trend's closed-form sufficient-statistics solve agrees
    with numpy's least squares on random per-key series."""
    import numpy as np

    from openaq_lcs_fetch_spark.plans import QUERIES  # ensure session tuned
    from openaq_lcs_fetch_spark.plans.temporal import user_value_trend

    rng = random.Random(13)
    base = datetime(2024, 1, 1)
    rows = []
    series = {}
    for uid in range(5):
        n = rng.randint(5, 30)
        xs, ys = [], []
        for i in range(n):
            t_off = rng.randint(0, 29 * 24 * 3600)
            v = round(rng.uniform(0, 500), 2)
            rows.append((len(rows), base + timedelta(seconds=t_off), uid, "click", v, None))
            xs.append(t_off * 1_000_000)
            ys.append(round(v * 1_000_000) / 1_000_000)
        series[uid] = (xs, ys)
    import tempfile, os
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r.user_id: (r.slope_per_hour, r.intercept)
        for r in user_value_trend(spark, d).collect()
    }
    for uid, (xs, ys) in series.items():
        A = np.vstack([np.array(xs, dtype=float), np.ones(len(xs))]).T
        slope_us, intercept = np.linalg.lstsq(A, np.array(ys), rcond=None)[0]
        want_slope = slope_us * 3.6e9
        assert got[uid][0] == pytest.approx(want_slope, rel=1e-4, abs=1e-4), uid
        assert got[uid][1] == pytest.approx(intercept, rel=1e-4, abs=1e-4), uid


def test_cms_never_undercounts(spark, sf_dir):
    """Count-min guarantee: estimate >= exact for every probed key."""
    from openaq_lcs_fetch_spark.plans import QUERIES

    out = QUERIES["cms_user_counts"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r.cms_estimate >= r.exact_n
        assert r.overcount >= 0


def test_kmv_estimate_within_theory(spark, sf_dir):
    """KMV relative error stays within ~4/sqrt(k) of the exact count
    (k=64 -> 50%; the md5 'randomness' is fixed, so this is a
    deterministic regression pin, not a statistical gamble)."""
    from openaq_lcs_fetch_spark.plans import QUERIES

    row = QUERIES["kmv_daily_merge"].fn(spark, sf_dir).collect()[0]
    assert row.rel_err <= 4.0 / (64 ** 0.5), row


def test_twa_bounded_and_constant_exact(spark, sf_dir):
    """Time-weighted average lies within [min, max] of the user-day's
    values; a constant series gives exactly that constant."""
    import os
    import tempfile

    from openaq_lcs_fetch_spark.plans.temporal import time_weighted_avg

    d = tempfile.mkdtemp()
    base = datetime(2024, 3, 1)
    rows = []
    # user 1: constant 42.5; user 2: varying
    for i in range(10):
        rows.append((i, base + timedelta(minutes=17 * i), 1, "view", 42.5, None))
    rng = random.Random(3)
    for i in range(10, 30):
        rows.append(
            (i, base + timedelta(minutes=11 * i), 2, "view", round(rng.uniform(1, 9), 2), None)
        )
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r.user_id: r.twa for r in time_weighted_avg(spark, d).collect()}
    assert out[1] == pytest.approx(42.5, abs=1e-6)
    assert 1.0 <= out[2] <= 9.0


def _write_embeddings(spark, d, vecs, labels):
    import os

    rows = [
        (i, [float(x) for x in v], int(lab))
        for i, (v, lab) in enumerate(zip(vecs, labels))
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))


def test_pca_power_iteration_matches_numpy_spec(spark):
    """The distributed PCA plan must equal an INDEPENDENT single-process
    implementation of the same integer spec (quantize -> 3 x (dot,
    recombine, normalize, requantize)) bit-for-bit — the strongest
    convergence check available without a second SQL engine."""
    import tempfile

    import numpy as np

    from openaq_lcs_fetch_spark.plans.simsearch import pca_power_iteration

    rng = random.Random(7)
    n, dim = 40, 64
    vecs = [[rng.uniform(-0.6, 0.6) for _ in range(dim)] for _ in range(n)]
    d = tempfile.mkdtemp()
    _write_embeddings(spark, d, vecs, [0] * n)

    # independent reference: float32 load, x1000 half-up quantize
    q = np.array(
        [[int(round(float(np.float32(x)) * 1000.0)) for x in v] for v in vecs],
        dtype=np.int64,
    )
    vq = np.full(dim, 1000, dtype=np.int64)
    for _ in range(3):
        dots = q @ vq                       # exact int64
        y = q.T @ dots                      # exact int64
        norm = float(np.sqrt(float(sum(int(v) ** 2 for v in y))))
        vq = np.array(
            [int(np.floor(abs(v / norm * 1000) + 0.5) * (1 if v >= 0 else -1))
             for v in y],
            dtype=np.int64,
        )
    got = {r.pos: r.vq for r in pca_power_iteration(spark, d).collect()}
    want = {i + 1: int(vq[i]) for i in range(dim)}
    assert got == want


def test_logreg_gd_matches_numpy_spec(spark):
    """Same contract for the GD steps: the distributed integer spec
    (algebraic sigmoid, 1e-6 residual grid, truncated-div update)
    replayed in NumPy must reproduce the weights exactly."""
    import tempfile

    import numpy as np

    from openaq_lcs_fetch_spark.plans.simsearch import logreg_gd_steps

    rng = random.Random(11)
    n, dim = 50, 64
    vecs = [[rng.uniform(-0.6, 0.6) for _ in range(dim)] for _ in range(n)]
    labels = [rng.randrange(25) for _ in range(n)]
    d = tempfile.mkdtemp()
    _write_embeddings(spark, d, vecs, labels)

    q = np.array(
        [[int(round(float(np.float32(x)) * 1000.0)) for x in v] for v in vecs],
        dtype=np.int64,
    )
    y = np.array([lab % 2 for lab in labels], dtype=np.int64)
    wq = np.zeros(dim, dtype=np.int64)
    den = 2000 * n

    def trunc_div(a, b):
        return -((-a) // b) if a < 0 else a // b

    for _ in range(3):
        z = q @ wq
        zd = z.astype(float) / 1e9
        s = 0.5 + (zd / 2.0) / (1.0 + np.abs(zd))
        r = s - y.astype(float)
        rq = np.array(
            [int(np.floor(abs(v * 1e6) + 0.5) * (1 if v >= 0 else -1)) for v in r],
            dtype=np.int64,
        )
        g = q.T @ rq
        wq = wq - np.array([trunc_div(int(v), den) for v in g], dtype=np.int64)
    rows = logreg_gd_steps(spark, d).collect()
    got = {r.pos: r.wq for r in rows}
    want = {i + 1: int(wq[i]) for i in range(dim)}
    assert got == want
    # and the reported accuracy equals the integer-sign rule
    zf = q @ wq
    n_correct = int(np.sum((zf >= 0) == (y == 1)))
    assert rows[0].n_correct == n_correct and rows[0].n == n


def test_pareto_front_is_exactly_the_skyline(spark, sf_dir):
    """Dominance law on real data: no returned part is dominated by
    another part, and every excluded part is dominated by some part
    (price <= and size <=, one strict)."""
    from openaq_lcs_fetch_spark.plans.relational_adv import pareto_front_parts
    from openaq_lcs_fetch_spark.plans.registry import t as load

    front = {
        (round(r.p_retailprice, 2), r.p_size)
        for r in pareto_front_parts(spark, sf_dir).collect()
    }
    allp = [
        (round(r.p_retailprice, 2), r.p_size)
        for r in load(spark, sf_dir, "part").select("p_retailprice", "p_size").collect()
    ]

    def dominated(p, by):
        return (
            by[0] <= p[0] and by[1] <= p[1] and (by[0] < p[0] or by[1] < p[1])
        )

    for p in allp:
        is_front = p in front
        dom = any(dominated(p, q) for q in set(allp) if q != p)
        if is_front:
            assert not dom, f"front point {p} is dominated"
        else:
            assert dom, f"excluded point {p} dominated by nobody"


def test_token_pagerank_matches_pure_python_spec(spark):
    """Third-engine check for the third iterative operator: the
    PageRank integer spec (1e12 micro-units, per-edge floor-div
    contribution, BIGINT 85/100 damping) replayed in pure Python over
    a tiny corpus must reproduce pr_q exactly."""
    import os
    import re
    import tempfile

    from openaq_lcs_fetch_spark.plans.textops import _BPE_PATTERN, token_pagerank

    docs = [
        "the cat sat on the mat",
        "the cat ran",
        "a dog sat on a log",
        "the dog and the cat",
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    # pure-python replay of the spec
    edges: dict[tuple[str, str], int] = {}
    for t in docs:
        toks = re.findall(_BPE_PATTERN, t.lower())
        for a, b in zip(toks, toks[1:]):
            edges[(a, b)] = edges.get((a, b), 0) + 1
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    unit = 10**12
    base = unit // len(nodes)
    outw = {}
    for (a, _), w in edges.items():
        outw[a] = outw.get(a, 0) + w
    pr = {t: base for t in nodes}
    for _ in range(3):
        cin = {t: 0 for t in nodes}
        for (a, b), w in edges.items():
            cin[b] += (pr[a] * w) // outw[a]
        pr = {t: (15 * base + 85 * cin[t]) // 100 for t in nodes}
    want = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.tok, r.pr_q) for r in token_pagerank(spark, d).collect()]
    assert got == want


def test_diff_upsert_idempotent_and_commutes_with_rerun(spark, tmp_path):
    """K3 property: re-upserting an identical batch writes ZERO rows
    (the elision is total), and any randomized sequence of changed /
    unchanged batches leaves the store equal to last-writer-wins over
    the keys — checked against a plain dict replay."""
    import random

    from openaq_lcs_fetch_spark.sinks.stations import diff_upsert

    rng = random.Random(90210)
    store = str(tmp_path / "store")
    truth: dict[int, str] = {}

    def batch(pairs):
        return spark.createDataFrame(
            [(k, v) for k, v in pairs], "station long, label string"
        )

    # seed
    pairs = [(k, f"v0-{k}") for k in range(8)]
    r = diff_upsert(spark, batch(pairs), store, "station")
    truth.update(pairs)
    assert (r["written"], r["skipped_unchanged"], r["total"]) == (8, 0, 8)

    # identical re-run: fully elided, store unchanged
    r = diff_upsert(spark, batch(pairs), store, "station")
    assert (r["written"], r["skipped_unchanged"], r["total"]) == (0, 8, 8)

    # three randomized mixed batches
    for step in range(1, 4):
        upd = [
            (k, f"v{step}-{k}" if rng.random() < 0.5 else truth[k])
            for k in rng.sample(range(8), 5)
        ]
        changed = sum(1 for k, v in upd if truth[k] != v)
        r = diff_upsert(spark, batch(upd), store, "station")
        assert r["written"] == changed, (step, upd)
        assert r["skipped_unchanged"] == len(upd) - changed
        truth.update(upd)
        got = {
            row.station: row.label
            for row in spark.read.parquet(store).collect()
        }
        assert got == truth, step


def test_file_time_spans_match_ground_truth_on_random_files(spark, tmp_path):
    """Manifest property: for randomized file contents, every footer
    span equals the file's true (min, max) in epoch micros — the
    invariant both vacuum_by_retention and read_time_range stand on."""
    import datetime as dt
    import glob
    import os
    import random

    from openaq_lcs_fetch_spark.storage import file_time_spans

    rng = random.Random(424242)
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    root = str(tmp_path / "ds")
    os.makedirs(root)
    truth = {}
    for i in range(6):
        offs = sorted(rng.sample(range(0, 10_000_000), rng.randint(1, 20)))
        rows = [
            (j, (base + dt.timedelta(seconds=o)).replace(tzinfo=None))
            for j, o in enumerate(offs)
        ]
        df = spark.createDataFrame(rows, "event_id long, ts timestamp")
        tmp = str(tmp_path / f"w_{i}")
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "*.parquet"))[0]
        name = f"f{i}.parquet"
        os.replace(part, os.path.join(root, name))
        to_us = lambda o: int((base + dt.timedelta(seconds=o)).timestamp() * 1_000_000)
        truth[name] = (to_us(offs[0]), to_us(offs[-1]))

    spans = file_time_spans(root, "ts")
    got = {os.path.basename(f): span for f, span in spans.items()}
    assert got == truth


def test_collect_table_stats_sane_on_every_testdata_table(spark, sf_dir):
    """ANALYZE smoke over the full schema zoo (arrays, strings, every
    numeric/timestamp flavor): one pass per table, n_rows matches
    count(), nulls never exceed rows, NDV never exceeds rows by more
    than HLL tolerance, ordered min <= max."""
    import os

    from openaq_lcs_fetch_spark.stats import collect_table_stats
    from openaq_lcs_fetch_spark.tables import TABLE_NAMES

    for name in TABLE_NAMES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        st = collect_table_stats(df)
        n = df.count()
        assert st["n_rows"] == n, name
        for c, cs in st["columns"].items():
            assert 0 <= cs["n_nulls"] <= n, (name, c)
            assert cs["ndv"] <= max(1, int(n * 1.2) + 1), (name, c)
            if "min" in cs and cs["min"] is not None:
                assert str(cs["min"]) <= str(cs["max"]) or cs["min"] <= cs["max"], (name, c)


def test_file_int_spans_match_ground_truth_on_random_files(spark, tmp_path):
    """Manifest property, integer flavor: for randomized multi-file
    layouts, every footer envelope equals each file's true (min, max)
    per requested column — the invariant read_int_box's file exclusion
    stands on — and a box read over the layout always returns exactly
    the rows a plain filtered read returns, whatever subset of files
    the envelopes excluded."""
    import glob
    import os
    import random

    from openaq_lcs_fetch_spark.storage import file_int_spans, read_int_box

    rng = random.Random(171717)
    root = str(tmp_path / "ds")
    os.makedirs(root)
    truth = {}
    all_rows = []
    for i in range(6):
        xs = [rng.randint(-500, 500) for _ in range(rng.randint(1, 25))]
        ys = [rng.randint(0, 10_000) for _ in xs]
        rows = list(zip(xs, ys, range(len(xs))))
        all_rows += [(x, y) for x, y, _ in rows]
        df = spark.createDataFrame(rows, "x long, y long, k long")
        tmp = str(tmp_path / f"w_{i}")
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "*.parquet"))[0]
        name = f"f{i}.parquet"
        os.replace(part, os.path.join(root, name))
        truth[name] = {
            "x": (min(xs), max(xs)),
            "y": (min(ys), max(ys)),
        }

    spans = file_int_spans(root, ["x", "y"])
    got = {os.path.basename(f): per for f, per in spans.items()}
    assert got == truth

    # correctness never depends on pruning: random boxes, exact rows
    for _ in range(5):
        x_lo = rng.randint(-500, 400)
        x_hi = x_lo + rng.randint(0, 300)
        y_lo = rng.randint(0, 9_000)
        y_hi = y_lo + rng.randint(0, 3_000)
        boxed, plan = read_int_box(
            spark, root, {"x": (x_lo, x_hi), "y": (y_lo, y_hi)}
        )
        want = sorted(
            (x, y) for x, y in all_rows if x_lo <= x <= x_hi and y_lo <= y <= y_hi
        )
        assert sorted((r.x, r.y) for r in boxed.collect()) == want
        assert 0 <= plan["n_selected"] <= plan["n_total"] == 6


def test_salted_route_equals_plain_join_on_random_skew(spark):
    """Batch-style property: for random Zipf-ish key shapes, whenever
    the pre-flight routes through salted_join the result is EXACTLY the
    plain join (same multiset of rows, same columns) — the mitigation
    is a pure execution-strategy change. Also asserts the route's
    decision is internally consistent: routed => the plan is salted,
    not routed => it isn't. Seeded random, one Spark pass per shape."""
    from openaq_lcs_fetch_spark.stats import (
        collect_table_stats,
        stats_aware_join,
    )

    rng = random.Random(12)
    for trial in range(4):
        n_fact = rng.randint(5_000, 20_000)
        n_keys = rng.randint(20, 120)
        hot_share_target = rng.choice([0.0, 0.3, 0.6])  # 0.0: uniform
        dim_rows_per_key = rng.randint(1, 30)
        hot_cut = int(n_fact * hot_share_target)
        fact = spark.range(n_fact).selectExpr(
            f"CASE WHEN id < {hot_cut} THEN CAST(0 AS BIGINT) "
            f"ELSE CAST(id % {n_keys} AS BIGINT) END AS k",
            "id AS v",
        )
        dim = spark.range(n_keys * dim_rows_per_key).selectExpr(
            f"CAST(id % {n_keys} AS BIGINT) AS k", "id AS d"
        )
        st_f = collect_table_stats(fact, hot_keys=["k"])
        st_d = collect_table_stats(dim)
        import warnings as _w

        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            j = stats_aware_join(fact, dim, "k", st_f, st_d,
                                 threshold_bytes=1)
        routed = any("routed through salted_join" in str(c.message)
                     for c in caught)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert ("_salt" in plan) == routed, (trial, routed)
        plain = fact.join(dim, "k")
        assert j.columns == plain.columns
        got = j.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.sum("d").alias("sd"),
        ).collect()
        want = plain.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.sum("d").alias("sd"),
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want)), trial
