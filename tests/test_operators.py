"""Unit tests for operator/function building blocks (SURVEY.md §2)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from openaq_lcs_fetch_spark.functions.cleaning import coerce_number
from openaq_lcs_fetch_spark.functions.ids import to_camel_case, zero_pad
from openaq_lcs_fetch_spark.functions.timestamps import (
    days_in_month,
    from_local,
    hour_ending,
    month_sequence,
)
from openaq_lcs_fetch_spark.functions.multimodal import (
    decode_stub,
    extract_features,
    frame_sample_plan,
)
from openaq_lcs_fetch_spark.measurands import join_and_normalize, measurand_dim
from openaq_lcs_fetch_spark.operators.filters import coordinate_precision, late_window
from openaq_lcs_fetch_spark.operators.joins import enrich_with_miss_report
from openaq_lcs_fetch_spark.operators.reshape import explode_map, melt, nest_stations, zip_arrays


def test_coerce_number(spark):
    df = spark.createDataFrame(
        [("1,234.5",), ("-3.2e2",), ("abc",), (".5",), ("",)], "raw string"
    )
    got = [r[0] for r in df.select(coerce_number(F.col("raw"))).collect()]
    assert got == [1234.5, -320.0, None, 0.5, None]


def test_month_sequence_year_crossover(spark):
    """The reference's one real unit test (cmu getMonthQuery,
    test/cmu.test.js:8-39): month enumeration across a year boundary."""
    df = spark.createDataFrame([("2019-11-15", "2020-02-10")], "a string, b string")
    months = df.select(
        month_sequence(F.to_timestamp("a"), F.to_timestamp("b")).alias("m")
    ).first()["m"]
    assert [str(m) for m in months] == ["2019-11-01", "2019-12-01", "2020-01-01", "2020-02-01"]


def test_timestamp_scalars(spark):
    df = spark.createDataFrame([("2024-02-11 10:30:00",)], "ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    row = df.select(
        hour_ending(F.col("ts")).alias("he"),
        days_in_month(F.col("ts")).alias("dim"),
    ).first()
    assert row["he"] == dt.datetime(2024, 2, 11, 11, 0)
    assert row["dim"] == 29  # leap year


def test_from_local_kolkata_shift(spark):
    """cpcb.js:144-152: Asia/Kolkata local minus 3 h."""
    df = spark.createDataFrame([("2024-06-01 12:00:00",)], "raw string")
    got = df.select(
        from_local(F.col("raw"), "yyyy-MM-dd HH:mm:ss", "Asia/Kolkata", -180).alias("ts")
    ).first()["ts"]
    # 12:00 IST = 06:30 UTC, minus 3h = 03:30 UTC
    assert got == dt.datetime(2024, 6, 1, 3, 30)


def test_melt_drops_nulls(spark):
    df = spark.createDataFrame([(1, 10.0, None)], "id int, a double, b double")
    out = melt(df, ["id"], ["a", "b"])
    assert [(r.parameter, r.value) for r in out.collect()] == [("a", 10.0)]


def test_melt_codegen_safe_same_rows_generate_shape(spark):
    """codegen_safe melt: identical rows/order to the Expand shape, a
    Generate (explode) physical plan (Expand's mutable-state output
    slots break whole-stage codegen under subexpression elimination on
    this Spark version — see melt's docstring), nulls still dropped,
    dotted headers still quoted; mixed-type value columns rejected."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [("r1", "10", None, "30"), ("r2", "11", "21", "31")],
        "id string, `PM2.5` string, b string, c string",
    )
    want = [
        (r.parameter, r.value)
        for r in melt(df, ["id"], ["PM2.5", "b", "c"]).collect()
    ]
    safe = melt(df, ["id"], ["PM2.5", "b", "c"], codegen_safe=True)
    assert [(r.parameter, r.value) for r in safe.collect()] == want
    plan = safe._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plan and "Expand" not in plan

    mixed = spark.createDataFrame([(1, "x", 2.0)], "id int, a string, b double")
    with _pytest.raises(TypeError, match="same-typed"):
        melt(mixed, ["id"], ["a", "b"], codegen_safe=True)


def test_codegen_guard_makes_janino_fallback_loud(spark):
    """The self-announcing janino guard (VERDICT r11 task 7):
    assert_compiles runs a plan with codegen fallback disabled, so the
    4.1.2 Expand+CSE bug RAISES (CompileException) instead of silently
    running interpreted — and the codegen_safe melt shape passes it.
    This is the test that would have caught the bug (and will catch a
    regression of melt(codegen_safe=True) back to the Expand shape).
    Conf restored either way."""
    import pytest as _pytest

    from openaq_lcs_fetch_spark.debug import assert_compiles
    from openaq_lcs_fetch_spark.functions.cleaning import (
        clean_measure, sentinel_flag,
    )

    df = spark.createDataFrame(
        [("s1", "1.5", "2,000", "N/A")],
        "sid string, a string, b string, c string",
    ).repartition(2)

    def shaped(codegen_safe):
        # the provider hot path's clean+flag pair shares the sentinel
        # subexpression over the melted column — the trigger shape
        long = melt(df, ["sid"], ["a", "b", "c"], codegen_safe=codegen_safe)
        return long.withColumn(
            "value", clean_measure(F.col("value"))
        ).withColumn("flags", sentinel_flag(F.col("value")))

    assert_compiles(shaped(codegen_safe=True))  # compiled clean

    with _pytest.raises(Exception, match="CompileException|Failed to compile"):
        assert_compiles(shaped(codegen_safe=False))
    # the guard restored the conf: the buggy shape still EXECUTES
    # under normal fallback (interpreted, correct rows)
    assert spark.conf.get("spark.sql.codegen.fallback") == "true"
    # 3 melted rows: the N/A sentinel nulls the VALUE, not the row
    assert shaped(codegen_safe=False).count() == 3


def test_explode_map_and_zip(spark):
    df = spark.createDataFrame([(1, {"x": "1", "y": "2"})], "id int, m map<string,string>")
    out = explode_map(df, "m")
    assert sorted((r.parameter, r.value) for r in out.collect()) == [("x", "1"), ("y", "2")]

    zdf = spark.createDataFrame(
        [(["f1", "f2"], [["a", "b"], ["c", "d"]])],
        "fields array<string>, data array<array<string>>",
    )
    recs = zip_arrays(zdf, "fields", "data").collect()
    assert [r.record for r in recs] == [{"f1": "a", "f2": "b"}, {"f1": "c", "f2": "d"}]


def test_nest_stations(spark):
    df = spark.createDataFrame(
        [
            ("n1", "sys1", "s1", "pm25"),
            ("n1", "sys1", "s2", "pm10"),
            ("n1", "sys2", "s3", "co"),
        ],
        "node string, sys string, sensor_id string, param string",
    )
    out = nest_stations(df, ["node"], "sys", ["sensor_id", "param"]).first()
    systems = {s["sys"]: s for s in out["sensor_systems"]}
    assert len(systems) == 2
    assert len(systems["sys1"]["sensors"]) == 2


def test_measurand_normalize_expr(spark):
    dim = measurand_dim(spark)
    facts = spark.createDataFrame(
        [("ozone1", 150.0), ("pressure", 101325.0), ("unsupported", 1.0)],
        "input_param string, value double",
    )
    out = {r.parameter: r.value for r in join_and_normalize(facts, dim).collect()}
    assert out["ozone"] == pytest.approx(0.15)  # ppb → ppm
    assert out["pressure"] == pytest.approx(1013.25)  # Pa → hPa
    assert "unsupported" not in out  # whitelist drop


def test_coordinate_precision(spark):
    df = spark.createDataFrame(
        [(40.123, -79.456), (40.1, -79.456), (None, -79.456)], "lat double, lon double"
    )
    kept = df.filter(coordinate_precision(F.col("lat"), F.col("lon"), 3)).collect()
    assert [(r.lat, r.lon) for r in kept] == [(40.123, -79.456)]


def test_late_window(spark):
    """airgradient.js:137-159: [now-3h, now-1h) hour-aligned."""
    now = "2024-06-01 10:30:00"
    df = spark.createDataFrame(
        [("2024-06-01 06:59:00",), ("2024-06-01 07:00:00",), ("2024-06-01 08:30:00",),
         ("2024-06-01 09:00:00",), ("2024-06-01 10:00:00",)],
        "ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    kept = [str(r.ts) for r in df.filter(late_window(F.col("ts"), now, 1, 2)).collect()]
    assert kept == ["2024-06-01 07:00:00", "2024-06-01 08:30:00"]


def test_enrich_miss_report(spark):
    facts = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k int, v string")
    dim = spark.createDataFrame([(1, "one")], "k int, name string")
    enriched, misses = enrich_with_miss_report(facts, dim, "k")
    assert enriched.count() == 3
    assert sorted(r.k for r in misses.collect()) == [2, 3]


def test_camel_and_pad(spark):
    df = spark.createDataFrame([("some key_name",)], "s string")
    row = df.select(
        to_camel_case(F.col("s")).alias("c"), zero_pad(F.lit(7), 2).alias("p")
    ).first()
    assert row["c"] == "someKeyName"
    assert row["p"] == "07"


# --- multimodal plumbing ----------------------------------------------------


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_stub(b"bytes", "image")


def test_extract_features_plumbing(spark):
    assets = spark.createDataFrame(
        [("a1", "image", bytearray(b"payload-1"), "image/png", None),
         ("a2", "audio", None, "audio/wav", None)],
        "asset_id string, modality string, payload binary, mime_type string, meta map<string,string>",
    )
    out = {r.asset_id: r for r in extract_features(assets).collect()}
    assert out["a1"].decode_status == "ok"
    assert len(out["a1"].feature) == 8
    assert out["a1"].n_bytes == 9
    assert out["a2"].decode_status == "null_payload"
    # deterministic: same payload → same feature
    again = {r.asset_id: r for r in extract_features(assets).collect()}
    assert again["a1"].feature == out["a1"].feature


def test_frame_sample_plan(spark):
    assets = spark.createDataFrame(
        [("v1", "video", bytearray(b"x" * 2048), "video/mp4", None)],
        "asset_id string, modality string, payload binary, mime_type string, meta map<string,string>",
    )
    frames = [r.frame_index for r in frame_sample_plan(assets, every_n=1).collect()]
    assert frames == [0, 1, 2]


# --- geo (C9) ---------------------------------------------------------------


def test_split_latlon_and_geometry(spark):
    from openaq_lcs_fetch_spark.functions.geo import latlon_to_geometry, split_latlon

    df = spark.createDataFrame([("40.44, -79.94",)], "s string")
    row = df.select(split_latlon(F.col("s")).alias("p")).select(
        "p.lat", "p.lon", latlon_to_geometry(F.col("p.lat"), F.col("p.lon")).alias("g")
    ).first()
    assert (row["lat"], row["lon"]) == (40.44, -79.94)
    assert row["g"] == [-79.94, 40.44]  # [lon, lat] order (station.js:10)


def test_tz_lookup_join(spark):
    from openaq_lcs_fetch_spark.functions.geo import tz_dim, tz_lookup_join

    df = spark.createDataFrame(
        [("pitt", 40.44, -79.94), ("delhi", 28.6, 77.2), ("ocean", 0.0, -150.0)],
        "id string, lat double, lon double",
    )
    out = {r.id: r.timezone for r in tz_lookup_join(df, "lat", "lon", tz_dim(spark)).collect()}
    assert out == {"pitt": "America/New_York", "delhi": "Asia/Kolkata", "ocean": "UTC"}


def test_tz_pandas_udf_gated():
    from openaq_lcs_fetch_spark.functions.geo import tz_pandas_udf

    with pytest.raises(NotImplementedError, match="timezonefinder"):
        tz_pandas_udf()


# --- as-of join (custom composed operator) ---------------------------------


def test_asof_join_semantics(spark):
    from openaq_lcs_fetch_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k1", "2024-01-01T00:30:00", 1), ("k1", "2024-01-01T02:00:00", 2),
         ("k1", "2024-01-01T01:00:00", 3),  # exactly at a right mark → inclusive
         ("k2", "2024-01-01T05:00:00", 4)],  # key with no right rows
        "k string, ts string, left_id int",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("k1", "2024-01-01T00:00:00", 10.0), ("k1", "2024-01-01T01:00:00", 20.0)],
        "k string, ts string, factor double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.left_id: (r.asof_factor, r.asof_ts) for r in
           asof_join(left, right, "k", "ts").collect()}
    assert out[1][0] == 10.0          # 00:30 → mark at 00:00
    assert out[3][0] == 20.0          # 01:00 → inclusive match at 01:00
    assert out[2][0] == 20.0          # 02:00 → latest mark 01:00
    assert out[4] == (None, None)     # no preceding right row → NULLs


def test_asof_join_null_value_in_matched_row(spark):
    """A matched right row with a NULL value yields that NULL — never an
    older row's value (the (ts, value) pair must exist in the right)."""
    from openaq_lcs_fetch_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", "2024-01-01T02:30:00", 1)], "k string, ts string, left_id int"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("k", "2024-01-01T01:00:00", 5.0), ("k", "2024-01-01T02:00:00", None)],
        "k string, ts string, factor double",
    ).withColumn("ts", F.to_timestamp("ts"))
    row = asof_join(left, right, "k", "ts").first()
    assert row["asof_ts"].hour == 2      # matched the 02:00 row...
    assert row["asof_factor"] is None    # ...including its NULL value


def test_connected_components_chain(spark):
    """A 4-node chain needs multiple propagation rounds (diameter 3);
    singletons stay their own component."""
    from openaq_lcs_fetch_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
    edges = spark.createDataFrame(
        [(3, 2), (2, 1), (1, 0), (4, 5)], "src long, dst long"
    )
    got = {
        r.id: r.component for r in connected_components(nodes, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4}


def test_prefix_filtered_jaccard_equals_plain(spark):
    """Prefix filtering is lossless at ANY threshold: identical pairs +
    jaccard values as the unfiltered join. 0.8/0.9 exercise the float
    ceiling trap (0.8*10 etc.); the crafted pair sits exactly AT the
    threshold where an off-by-one prefix silently drops it."""
    from openaq_lcs_fetch_spark.functions.similarity import (
        ngram_jaccard_pairs,
        prefix_filtered_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for th in (0.3, 0.5, 0.8):
        plain = sorted(
            map(tuple, ngram_jaccard_pairs(docs, "doc_id", "text", 3, th).collect())
        )
        pf = sorted(
            map(tuple, prefix_filtered_jaccard_pairs(docs, "doc_id", "text", th).collect())
        )
        assert plain == pf, th
    # adversarial small corpus: overlapping suffix rotations produce
    # pairs sitting at/near the threshold where an off-by-one prefix
    # length silently drops candidates
    words = [f"w{i}" for i in range(12)]
    docs2 = spark.createDataFrame(
        [(i, " ".join(words[i:] + words[:max(0, i - 6)])) for i in range(8)],
        "doc_id long, text string",
    )
    for th in (0.8, 0.9):
        plain = sorted(map(tuple, ngram_jaccard_pairs(docs2, "doc_id", "text", 3, th).collect()))
        pf = sorted(map(tuple, prefix_filtered_jaccard_pairs(docs2, "doc_id", "text", th).collect()))
        assert plain == pf, th


def test_asof_join_bucketed_matches_unbucketed(spark):
    """The skew-free (key, time-bucket) plan is semantically identical to
    the per-key window plan — including buckets with no right rows (the
    seed must carry across empty buckets) and inclusive-<= ties."""
    import random

    from openaq_lcs_fetch_spark.operators.asof import asof_join

    rnd = random.Random(7)
    base = 1704067200  # 2024-01-01T00:00:00Z
    left = spark.createDataFrame(
        [(f"k{i % 3}", base + rnd.randrange(0, 6 * 86400), i) for i in range(200)],
        "k string, sec long, left_id int",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "left_id")
    # right rows only in the first two days -> later buckets rely on seeds
    right = spark.createDataFrame(
        [(f"k{i % 3}", base + rnd.randrange(0, 2 * 86400), float(i)) for i in range(30)],
        "k string, sec long, factor double",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "factor")

    plain = {r.left_id: (r.asof_ts, r.asof_factor) for r in
             asof_join(left, right, "k", "ts").collect()}
    bucketed = {r.left_id: (r.asof_ts, r.asof_factor) for r in
                asof_join(left, right, "k", "ts", bucket_seconds=3600).collect()}
    assert plain == bucketed
    assert len(plain) == 200


def test_asof_join_bucketed_window_is_keyed_by_bucket(spark):
    """Plan check: with bucket_seconds the fact-table window partitions on
    (key, _bkt), never the bare low-cardinality key."""
    from openaq_lcs_fetch_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("a", "2024-01-01T00:30:00", 1)], "k string, ts string, left_id int"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("a", "2024-01-01T00:00:00", 1.0)], "k string, ts string, factor double"
    ).withColumn("ts", F.to_timestamp("ts"))
    plan = asof_join(left, right, "k", "ts", bucket_seconds=3600)._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(k#" in plan.replace(" ", "").lower() or "_bkt" in plan
    # every Window over the unioned fact table must include _bkt in its
    # partition spec (the seed window runs over the tiny spine only)
    import re
    specs = re.findall(r"windowspecdefinition\(([^)]*?)ts#", plan)
    assert specs, plan
    for s in specs:
        assert "_bkt" in s, f"fact window not bucketed: {s}"


def test_df_capped_jaccard_topk_matches_plain(spark):
    """df-capped top-k equals the unfiltered exact top-k — including on a
    corpus with genuinely hot shingles (df > cap), where the certificate
    must either hold or trigger the exact fallback."""
    from openaq_lcs_fetch_spark.functions.similarity import (
        df_capped_jaccard_topk,
        ngram_jaccard_pairs,
    )

    # 3 near-dup clusters + one hot boilerplate phrase in EVERY doc
    boiler = "all rights reserved contact us for details "
    rows = []
    for c in range(3):
        base = " ".join(f"w{c}_{i}" for i in range(30))
        for v in range(4):
            rows.append((c * 10 + v, boiler + base + f" variant {v}"))
    for i in range(12, 40):
        rows.append((100 + i, boiler + " ".join(f"u{i}_{j}" for j in range(25))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    plain = (
        ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.0)
        .orderBy(F.col("jaccard").desc(), "id_a", "id_b").limit(10).collect()
    )
    capped = df_capped_jaccard_topk(
        docs, "doc_id", "text", k=10, shingle_n=3, df_cap=8
    ).collect()
    assert [(r.id_a, r.id_b, round(r.jaccard, 12)) for r in capped] == [
        (r.id_a, r.id_b, round(r.jaccard, 12)) for r in plain
    ]


def test_df_capped_jaccard_excludes_hot_shingles_from_selfjoin(spark):
    """Plan check: the candidate self-join reads the df-filtered branch
    (pushed _df <= cap filter present), so hot-shingle fan-out is bounded."""
    from openaq_lcs_fetch_spark.functions.similarity import df_capped_jaccard_topk

    # near-dup clusters share RARE shingles; the boilerplate prefix is hot
    # (df=24 > cap=8) → capped branch taken AND certificate holds, so the
    # returned plan is the df-filtered one
    boiler = "all rights reserved contact us today "
    rows = [
        (c * 10 + v, boiler + " ".join(f"w{c}_{i}" for i in range(20)) + f" v{v}")
        for c in range(6)
        for v in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    plan = df_capped_jaccard_topk(docs, "doc_id", "text", k=5, df_cap=8, materialize=False)._jdf.queryExecution().executedPlan().toString()
    assert "_df" in plan and "<= 8" in plan.replace("#", " #")
    assert "array_intersect" in plan


def test_salted_agg_tolerates_map_columns(spark):
    """hash() rejects MapType — the salt must skip map columns instead
    of failing analysis on frames carrying a flags map (the pipeline's
    own measures schema)."""
    from openaq_lcs_fetch_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [("k", float(i), {"q": str(i)}) for i in range(20)],
        "k string, v double, flags map<string,string>",
    )
    got = salted_agg(df, ["k"], {"v": "sum"}, 4).collect()
    assert len(got) == 1 and got[0]["sum_v"] == sum(float(i) for i in range(20))
    # nested maps (struct fields, array elements) are just as unhashable
    nested = spark.createDataFrame(
        [("k", float(i), (i, {"q": str(i)}), [{"r": str(i)}]) for i in range(10)],
        "k string, v double, s struct<x:int,m:map<string,string>>, "
        "a array<map<string,string>>",
    )
    got = salted_agg(nested, ["k"], {"v": "sum"}, 4).collect()
    assert len(got) == 1 and got[0]["sum_v"] == sum(float(i) for i in range(10))


def test_salted_agg_deterministic_under_repartitioning(spark):
    """Salted and unsalted aggregates agree, and the salt assignment is
    row-content-determined — identical results whatever the partitioning
    (F.rand salts are row-order-dependent under retries/AQE re-plans)."""
    from openaq_lcs_fetch_spark.operators.skew import _row_salt, salted_agg

    df = spark.createDataFrame(
        [("hot", i, float(i)) for i in range(500)] + [("cold", i, float(i)) for i in range(5)],
        "k string, id int, v double",
    )
    expect = {(r.k): (r.n, r.mx) for r in
              df.groupBy("k").agg(F.count("v").alias("n"), F.max("v").alias("mx")).collect()}
    for parts in (1, 7):
        got = {r.k: (r.count_v, r.max_v) for r in
               salted_agg(df.repartition(parts), ["k"], {"v": "count"} | {}, 8)
               .join(salted_agg(df.repartition(parts), ["k"], {"v": "max"}, 8), "k")
               .collect()}
        assert got == expect
    # salt itself is stable across partitionings
    s1 = sorted(r[0] for r in df.repartition(3).select(_row_salt(df, 8)).collect())
    s2 = sorted(r[0] for r in df.repartition(11).select(_row_salt(df, 8)).collect())
    assert s1 == s2 and len(set(s1)) > 1


def test_point_in_interval_join_inner_left_and_boundaries(spark):
    """Bucketized range join: half-open [start, end) semantics hold
    across bucket boundaries; 'left' keeps unmatched points with NULL
    interval columns; intervals longer than one bucket still match."""
    from openaq_lcs_fetch_spark.operators.rangejoin import (
        interval_overlap_condition,
        point_in_interval_join,
    )

    points = spark.createDataFrame(
        [
            ("u1", 1, "2024-06-01 10:00:00"),  # == start → in
            ("u1", 2, "2024-06-01 11:59:59"),  # inside, later bucket
            ("u1", 3, "2024-06-01 12:00:00"),  # == end → OUT
            ("u1", 4, "2024-06-01 09:59:59"),  # before → out
            ("u2", 5, "2024-06-01 10:30:00"),  # right time, wrong key
        ],
        "user string, pid int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    intervals = spark.createDataFrame(
        [("u1", "iv1", "2024-06-01 10:00:00", "2024-06-01 12:00:00")],
        "user string, iv string, s string, e string",
    ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))

    inner = point_in_interval_join(
        points, intervals, ["user"], "ts", "s", "e", bucket_seconds=3600
    )
    assert sorted(r.pid for r in inner.collect()) == [1, 2]

    left = point_in_interval_join(
        points, intervals, ["user"], "ts", "s", "e", bucket_seconds=3600, how="left"
    )
    got = {r.pid: r.iv for r in left.collect()}
    assert got == {1: "iv1", 2: "iv1", 3: None, 4: None, 5: None}

    # the overlap predicate: [10,12) vs [12,13) do NOT overlap
    df = spark.createDataFrame([(1,)], "x int")
    row = df.select(
        interval_overlap_condition(
            F.lit("2024-06-01 10:00:00").cast("timestamp"),
            F.lit("2024-06-01 12:00:00").cast("timestamp"),
            F.lit("2024-06-01 12:00:00").cast("timestamp"),
            F.lit("2024-06-01 13:00:00").cast("timestamp"),
        ).alias("a"),
        interval_overlap_condition(
            F.lit("2024-06-01 10:00:00").cast("timestamp"),
            F.lit("2024-06-01 12:00:00").cast("timestamp"),
            F.lit("2024-06-01 11:00:00").cast("timestamp"),
            F.lit("2024-06-01 13:00:00").cast("timestamp"),
        ).alias("b"),
    ).first()
    assert row.a is False and row.b is True


def test_point_in_interval_join_subsecond_boundaries_and_null_columns(spark):
    """Two confirmed-repro regressions: (1) whole-second bucketing
    dropped matches when a sub-second interval end crossed a bucket
    boundary; (2) the left path duplicated matched points carrying NULL
    columns (null-unsafe anti-join)."""
    from openaq_lcs_fetch_spark.operators.rangejoin import point_in_interval_join

    points = spark.createDataFrame(
        [("u1", 1, None, "2024-06-01 11:00:00.100")],
        "user string, pid int, payload string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    intervals = spark.createDataFrame(
        [("u1", "iv1", "2024-06-01 10:00:00.250", "2024-06-01 11:00:00.250")],
        "user string, iv string, s string, e string",
    ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))

    inner = point_in_interval_join(
        points, intervals, ["user"], "ts", "s", "e", bucket_seconds=3600
    ).collect()
    assert [r.pid for r in inner] == [1]  # sub-second end, later bucket

    left = point_in_interval_join(
        points, intervals, ["user"], "ts", "s", "e", bucket_seconds=3600, how="left"
    ).collect()
    assert [(r.pid, r.iv) for r in left] == [(1, "iv1")]  # exactly once


def test_asof_join_forward_both_plans(spark):
    """Forward as-of (next-or-equal) agrees between the plain window
    plan and the skew-free bucketed plan, including the inclusive
    boundary and keys with no following right row."""
    from openaq_lcs_fetch_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", 1), ("a", "2024-01-01 11:30:00", 2),
         ("b", "2024-01-01 10:00:00", 3), ("a", "2024-01-02 00:00:00", 4),
         ("a", "2024-01-01 11:00:00", 5)],
        "k string, ts string, eid int",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 11:00:00", 1.5), ("a", "2024-01-01 12:00:00", 2.5),
         ("b", "2024-01-01 09:00:00", 9.9)],
        "k string, ts string, factor double",
    ).withColumn("ts", F.to_timestamp("ts"))
    want = {1: ("2024-01-01 11:00:00", 1.5), 2: ("2024-01-01 12:00:00", 2.5),
            3: ("None", None), 4: ("None", None),
            5: ("2024-01-01 11:00:00", 1.5)}  # inclusive >=
    for bs in (None, 3600):
        got = {r.eid: (str(r.asofnext_ts), r.asofnext_factor) for r in
               asof_join_forward(left, right, "k", "ts", bucket_seconds=bs).collect()}
        assert got == want, bs


def test_asof_join_forward_inherits_bucketed_window(spark):
    """The forward reduction must land in the same skew-free plan: every
    window over the unioned fact table partitions on (key, _bkt)."""
    import re

    from openaq_lcs_fetch_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [("a", "2024-01-01T00:30:00", 1)], "k string, ts string, left_id int"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("a", "2024-01-01T01:00:00", 1.0)], "k string, ts string, factor double"
    ).withColumn("ts", F.to_timestamp("ts"))
    plan = (
        asof_join_forward(left, right, "k", "ts", bucket_seconds=3600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*?)_neg_us#", plan)
    assert specs, plan
    for s in specs:
        assert "_bkt" in s, f"fact window not bucketed: {s}"


def test_asof_join_broadcast_matches_windowed(spark):
    """The dimension-broadcast as-of plan is semantically identical to
    the windowed plans — seeds across empty buckets, inclusive-<= ties,
    left rows before the first mark (NULL), keys absent from the right
    (NULL), and left buckets past the last mark (clamp-down)."""
    import random

    from openaq_lcs_fetch_spark.operators.asof import asof_join, asof_join_broadcast

    rnd = random.Random(13)
    base = 1704067200  # 2024-01-01T00:00:00Z
    # left spans 6 days and includes a key ("orphan") the right never has
    rows = [(f"k{i % 3}", base + rnd.randrange(-86400, 6 * 86400), i) for i in range(200)]
    rows += [("orphan", base + i * 3600, 1000 + i) for i in range(5)]
    left = spark.createDataFrame(
        rows, "k string, sec long, left_id int"
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "left_id")
    # right marks only in the first two days → later left buckets rely
    # on clamping to the last mark bucket; ties included
    rrows = [(f"k{i % 3}", base + rnd.randrange(0, 2 * 86400), float(i)) for i in range(30)]
    rrows.append(("k0", base + 777, 999.0))
    rrows.append(("k0", base + 777, 998.0))  # equal-ts tie → max factor wins
    right = spark.createDataFrame(
        rrows, "k string, sec long, factor double"
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "factor")

    windowed = {r.left_id: (r.asof_ts, r.asof_factor) for r in
                asof_join(left, right, "k", "ts", bucket_seconds=3600).collect()}
    bcast = {r.left_id: (r.asof_ts, r.asof_factor) for r in
             asof_join_broadcast(left, right, "k", "ts", bucket_seconds=3600).collect()}
    assert windowed == bcast
    assert len(bcast) == 205
    assert all(bcast[i] == (None, None) for i in range(1000, 1005))  # orphan key


def test_asof_join_broadcast_never_shuffles_the_fact(spark, sf_dir):
    """Plan check: the broadcast as-of must not sort-merge or window the
    fact table — fact side is scan → broadcast joins → projection. The
    only Exchanges allowed are the tiny right-side aggregation and the
    broadcast exchanges themselves."""
    from openaq_lcs_fetch_spark.operators.asof import asof_join_broadcast
    from openaq_lcs_fetch_spark.plans.temporal import _calib
    from openaq_lcs_fetch_spark.tables import load

    e = load(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    calib = _calib(spark).withColumnRenamed("calib_ts", "ts")
    plan = (
        asof_join_broadcast(e, calib, key="event_type", ts="ts",
                            value_cols=["factor"], bucket_seconds=86_400)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # no window function anywhere (the old plan windowed the fact union)
    assert "windowspecdefinition" not in plan
    # every (non-broadcast) exchange hashes the tiny key side, never the
    # fact: the fact scan feeds straight into broadcast joins
    import re
    shuffles = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    for s in shuffles:
        assert "event_id" not in s, f"fact table shuffled: {s}"


def test_asof_join_broadcast_guard_trips_on_contract_violation(spark):
    """The dimension-size contract is enforced at runtime: marks spanning
    more buckets than max_buckets_per_key must raise loudly (ASSERT_TRUE
    with per-key details) instead of exploding an unbounded sequence —
    and the guard must NOT fire on a compliant dimension."""
    import pytest

    from openaq_lcs_fetch_spark.operators.asof import asof_join_broadcast

    left = spark.createDataFrame(
        [("a", 1704067200)], "k string, sec long"
    ).select("k", F.timestamp_seconds("sec").alias("ts"))
    # marks 4 years apart → ~1461 daily buckets for one key
    right = spark.createDataFrame(
        [("a", 1577836800, 1.0), ("a", 1704067200, 2.0)],
        "k string, sec long, factor double",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "factor")

    with pytest.raises(Exception, match="dimension-size contract"):
        asof_join_broadcast(
            left, right, "k", "ts", ["factor"], max_buckets_per_key=100
        ).collect()
    with pytest.raises(Exception, match="dimension-size contract"):
        asof_join_broadcast(
            left, right, "k", "ts", ["factor"], max_marks_per_key=1
        ).collect()
    # compliant dimension: same inputs, limits at defaults → clean run
    ok = asof_join_broadcast(left, right, "k", "ts", ["factor"]).collect()
    assert len(ok) == 1 and ok[0]["asof_factor"] == 2.0


def test_containment_pairs_detects_subset_doc(spark):
    """A verbatim excerpt must yield containment 1.0 sub→super (and a
    low symmetric jaccard — the case the asymmetric measure exists for)."""
    from openaq_lcs_fetch_spark.functions.similarity import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    excerpt = "gamma delta epsilon zeta eta"  # 3 shingles, all inside big
    docs = spark.createDataFrame(
        [(1, big), (2, excerpt), (3, "totally unrelated words here now")],
        "doc_id long, text string",
    )
    rows = {
        (r.id_sub, r.id_super): r.containment
        for r in ngram_containment_pairs(docs, "doc_id", "text", 3, 0.9).collect()
    }
    assert rows == {(2, 1): 1.0}
    # the same pair falls below a symmetric jaccard threshold
    jac = ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.5).collect()
    assert not any({r.id_a, r.id_b} == {1, 2} for r in jac)


def test_containment_df_cap_hot_shingle_fixture(spark):
    """Scale regression for the df-capped containment join: a boilerplate
    shingle shared by MORE docs than df_cap must be excluded from
    candidate generation (bounded fan-out) while the result stays equal
    to the uncapped exact join — hot-side intersections recovered via
    the per-doc hot arrays."""
    from openaq_lcs_fetch_spark.functions.similarity import ngram_containment_pairs

    # every doc opens with the same 3-token boilerplate (1 hot shingle,
    # df = n_docs) followed by unique content (rare shingles); docs 100
    # and 101 are verbatim duplicates, doc 102 is an excerpt of doc 100
    rows = [(i, f"common boiler plate u{i}a u{i}b u{i}c u{i}d") for i in range(40)]
    rows += [
        (100, "common boiler plate alpha beta gamma delta epsilon"),
        (101, "common boiler plate alpha beta gamma delta epsilon"),
        (102, "alpha beta gamma delta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def as_set(df):
        return {(r.id_sub, r.id_super, r.containment) for r in df.collect()}

    capped = ngram_containment_pairs(docs, "doc_id", "text", 3, 0.5, df_cap=4)
    plain = ngram_containment_pairs(
        docs, "doc_id", "text", 3, 0.5, df_cap=10_000_000
    )
    got = as_set(capped)
    assert got == as_set(plain)
    # the duplicate pair (1.0 both ways) and the excerpt (102 ⊂ 100/101)
    assert (100, 101, 1.0) in got and (101, 100, 1.0) in got
    assert (102, 100, 1.0) in got and (102, 101, 1.0) in got
    # the capped path actually ran (hot-array recovery in the plan), and
    # the candidate self-join inputs are df-filtered — the bounded
    # fan-out property, pinned mechanically like the never-cartesian test
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "array_intersect" in plan
    assert "_df" in plan and "CartesianProduct" not in plan


def test_containment_df_cap_falls_back_when_certificate_fails(spark):
    """A doc made ENTIRELY of hot shingles (hot/sz = 1 ≥ threshold) can
    form passing pairs the capped join never sees — the adaptive branch
    must detect it (max_r ≥ t) and fall back to the exact join."""
    from openaq_lcs_fetch_spark.functions.similarity import ngram_containment_pairs

    # "common boiler plate" docs: the pure-boiler doc 999 is a subset of
    # every other doc — only discoverable through the hot shingle
    rows = [(i, f"common boiler plate u{i}a u{i}b u{i}c") for i in range(20)]
    rows.append((999, "common boiler plate"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_sub, r.id_super): r.containment
        for r in ngram_containment_pairs(
            docs, "doc_id", "text", 3, 0.9, df_cap=4
        ).collect()
    }
    # doc 999 (single hot shingle) is contained in all 20 others
    assert len(got) == 20
    assert all(k[0] == 999 and v == 1.0 for k, v in got.items())


def test_resize_images_plumbing(spark):
    """Arrow-batched resize: deterministic digest = sha256(payload+dims),
    null payloads flagged, output schema stable."""
    import hashlib

    from openaq_lcs_fetch_spark.functions.multimodal import resize_images

    assets = spark.createDataFrame(
        [("a", bytearray(b"pixels")), ("b", None)],
        "asset_id string, payload binary",
    )
    out = {r.asset_id: r for r in resize_images(assets, 224, 224).collect()}
    assert out["a"].resize_status == "ok"
    assert out["a"].resized_digest == hashlib.sha256(b"pixels" + b"224x224").hexdigest()
    assert out["a"].n_bytes_in == 6 and out["a"].target_w == 224
    assert out["b"].resize_status == "null_payload" and out["b"].resized_digest is None


def test_passage_dedup_semantics(spark, tmp_path):
    """Cross-document passage dedup: the first (doc_id, pos) occurrence
    of a passage survives, later copies are removed, and unique passages
    reassemble in document order."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    docs = spark.createDataFrame(
        [
            # doc 1: two passages P1="a b c", P2="d e f"
            (1, "a b c d e f"),
            # doc 2: repeats P1 (removed), keeps its own "x y z"
            (2, "a b c x y z"),
            # doc 3: entirely a copy of doc 1 → everything removed
            (3, "a b c d e f"),
        ],
        "doc_id long, text string",
    )
    sf = str(tmp_path)
    docs.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    out = {
        r.doc_id: (r.dedup_text, r.n_kept, r.n_removed)
        for r in QUERIES["passage_dedup"].fn(spark, sf).collect()
    }
    assert out[1] == ("a b c d e f", 2, 0)
    assert out[2] == ("x y z", 1, 1)
    assert out[3] == ("", 0, 2)


def test_doc_lm_score_orders_by_typicality(spark, tmp_path):
    """The corpus-bigram LM must score a document made of corpus-typical
    transitions higher than one full of transitions seen nowhere else."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((100, "zebra quark flux beacon prism"))  # singleton bigrams
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sf = str(tmp_path)
    docs.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    scores = {
        r.doc_id: r.lm_score for r in QUERIES["doc_lm_score"].fn(spark, sf).collect()
    }
    assert scores[0] > scores[100]
    # typical doc: p(w2|w1)=1 for every transition except 'the'->{cat,mat}
    assert scores[0] > -1.0


def test_grid_quantiles_matches_naive_reference(spark):
    """grid_quantiles (operators/quantiles.py) vs a sorted-python naive
    lower-quantile on adversarial fixtures: zero weights, all-zero
    groups, heavy value ties, constant-value groups, negative values,
    mass concentrated in one grid cell."""
    import random

    from openaq_lcs_fetch_spark.operators.quantiles import grid_quantiles
    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = []
    # group a: heavy ties + zero weights
    rows += [("a", float(rng.choice([1, 2, 2, 3])), rng.choice([0, 1, 5]))
             for _ in range(400)]
    # group b: constant values
    rows += [("b", 42.0, rng.randint(0, 3)) for _ in range(50)]
    # group c: all-zero weights (median = smallest value by convention)
    rows += [("c", float(v), 0) for v in (9, 4, 7)]
    # group d: negative + one-cell mass concentration
    rows += [("d", -1e9, 1)] + [("d", rng.uniform(0, 1e-6), 1) for _ in range(200)]
    df = spark.createDataFrame(rows, "k string, v double, w long")

    fracs = [(1, 4), (1, 2), (3, 4)]
    got = {
        (r.k, r.num, r.den): (r.qvalue, r.total_weight)
        for r in grid_quantiles(
            df, "k", "v", weight=F.col("w"), fractions=fracs
        ).collect()
    }

    by_k: dict = {}
    for k, v, w in rows:
        by_k.setdefault(k, []).append((v, w))
    for k, vals in by_k.items():
        vals.sort()
        tw = sum(w for _, w in vals)
        for num, den in fracs:
            cum = 0
            expect = vals[0][0]
            for v, w in vals:
                cum += w
                if den * cum >= num * tw:
                    expect = v
                    break
            qv, got_tw = got[(k, num, den)]
            assert got_tw == tw, (k, num, den)
            assert qv == expect, (k, num, den, qv, expect)


def test_integer_div_matches_duckdb_on_negatives(spark):
    """Negative-operand division audit (round-6 de-trap): Spark `div`
    and DuckDB's integer `//` BOTH truncate toward zero — measured here
    across both signs, exact multiples, and the cells bracketing zero —
    so `div`-bucketing oracles (streaming_value_histogram et al.) carry
    NO hidden non-negativity fixture dependency. The genuine remaining
    trap is `//` on DOUBLE operands, which DuckDB does NOT floor (it is
    plain division there); the second assertion pins that so no oracle
    ever bucketizes an un-cast double with `//`."""
    import duckdb

    from pyspark.sql import functions as F

    cents = [-1250, -1000, -999, -501, -500, -499, -1, 0, 1, 499, 500, 501, 999, 1000, 1250]
    df = spark.createDataFrame([(c,) for c in cents], "c long")
    got = {
        r.c: r.cell
        for r in df.withColumn("cell", F.expr("c div 500")).collect()
    }
    want = {
        c: cell
        for c, cell in duckdb.sql(
            "SELECT c, c // 500 FROM (SELECT UNNEST($1::BIGINT[]) AS c)",
            params=[cents],
        ).fetchall()
    }
    assert got == want
    # DOUBLE `//` in DuckDB is NOT floor division — integer-cast first,
    # always (docs/ORACLE_NOTES.md "Integer division" bullet)
    assert duckdb.sql("SELECT -5.0 // 2").fetchone()[0] == -2.5


def test_copurchase_triangles_known_graph(spark, tmp_path):
    """Hand-built order basket whose co-purchase graph has exactly two
    triangles: orders {1,2,3}, {1,2,4}... edges (1,2)(1,3)(2,3)(1,4)(2,4)
    → triangles {1,2,3} and {1,2,4}."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    li = [
        (100, 1), (100, 2), (100, 3),   # order 100 → triangle 1-2-3
        (101, 1), (101, 2), (101, 3),   # repeat → pairs reach support 2
        (200, 1), (200, 2), (200, 4),   # order 200 → triangle 1-2-4
        (201, 1), (201, 2), (201, 4),
        (300, 5), (301, 5), (302, 5, ), # isolated node never makes edges
        (400, 6), (400, 7),             # support-1 pair → filtered out
    ]
    rows = [(ok, pk, 1.0) for ok, pk in li]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long, x double")
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "lineitem.parquet"))
    out = QUERIES["copurchase_triangles"].fn(spark, sf).collect()[0]
    assert out.n_nodes == 4          # node 5 has no edges
    assert out.n_edges == 5
    assert out.n_triangles == 2


def test_item_item_cosine_known_baskets(spark, tmp_path):
    """Hand-built baskets with a known similarity order: items 1 and 2
    co-occur in 3 of their 4/4 orders (cosine 0.75); items 1 and 3 in
    2 of 4/2 (cosine 1/sqrt(2) ~= 0.707); the support-1 pair (4, 5) is
    filtered out entirely."""
    import math
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    baskets = {
        100: [1, 2], 101: [1, 2], 102: [1, 2, 3], 103: [1, 3],
        104: [2], 105: [2], 200: [4, 5],
    }
    rows = [(ok, pk) for ok, parts in baskets.items() for pk in parts]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "lineitem.parquet"))
    out = {
        (r.part_u, r.part_v): r
        for r in QUERIES["item_item_cosine"].fn(spark, sf).collect()
    }
    assert set(out) == {(1, 2), (1, 3)}  # (4,5) has support 1 -> dropped
    r12, r13 = out[(1, 2)], out[(1, 3)]
    # item 1 in orders {100,101,102,103}; item 2 in {100,101,102,104,105}
    assert (r12.co_orders, r12.n_u, r12.n_v) == (3, 4, 5)
    assert abs(r12.cosine - 3 / math.sqrt(20)) < 1e-12
    assert (r13.co_orders, r13.n_u, r13.n_v) == (2, 4, 2)
    assert abs(r13.cosine - 2 / math.sqrt(8)) < 1e-12


def test_kaplan_meier_textbook_fold(spark, tmp_path):
    """Textbook KM check on a hand-built cohort: 4 users with lifetimes
    0/0/1/2 days, the 2-day user censored (last event at the dataset
    end). Life table: t=0 (n=4, d=2), t=1 (n=2, d=1), t=2 (n=1, c=1).
    S = 1/2 after t=0, 1/4 after t=1, unchanged by the censoring."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    base = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    rows = [
        # user 1, 2: single-burst users (dur 0), churned well before end
        (1, base), (1, base + dt.timedelta(hours=1)),
        (2, base),
        # user 3: dur 1 day, churned
        (3, base), (3, base + day),
        # user 4: dur 2 days, last event AT the end -> censored
        (4, base + dt.timedelta(days=8)), (4, base + dt.timedelta(days=10)),
    ]
    df = spark.createDataFrame(
        [(u, ts, u, "click", 1.0, "{}") for u, ts in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))
    out = {
        r.t_days: r for r in QUERIES["kaplan_meier"].fn(spark, sf).collect()
    }
    assert set(out) == {0, 1, 2}
    assert (out[0].n_risk, out[0].n_events, out[0].n_censored) == (4, 2, 0)
    assert out[0].surv_ppt == 500_000_000_000
    assert (out[1].n_risk, out[1].n_events) == (2, 1)
    assert out[1].surv_ppt == 250_000_000_000
    assert (out[2].n_risk, out[2].n_events, out[2].n_censored) == (1, 0, 1)
    assert out[2].surv_ppt == 250_000_000_000


def test_ma_crossover_detects_level_shift(spark, tmp_path):
    """Daily revenue flat at 100 for 40 days then stepped to 200: the
    7-day average crosses above the 28-day average exactly once, a few
    days after the shift; no death cross inside the horizon."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    base = dt.date(2024, 1, 1)
    rows = []
    for i in range(60):
        price = 100.0 if i < 40 else 200.0
        rows.append((i, base + dt.timedelta(days=i), price))
    df = spark.createDataFrame(
        [(ok, d, p, 1, "O", "x") for ok, d, p in rows],
        "o_orderkey long, o_orderdate date, o_totalprice double,"
        " o_custkey long, o_orderstatus string, o_orderpriority string",
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))
    out = QUERIES["ma_crossover"].fn(spark, sf).collect()
    assert len(out) == 1
    sig = out[0]
    assert sig.direction == "golden"
    # the cross happens once the short window holds step-up days
    shift_idx = (base + dt.timedelta(days=40) - dt.date(1970, 1, 1)).days
    assert shift_idx <= sig.day_idx <= shift_idx + 7


def test_kaplan_meier_matches_naive_reference_random_cohorts(spark, tmp_path):
    """Property check: the distributed KM pipeline equals a brute pure-
    python estimator (sorted fold with arbitrary-precision ints) on
    seeded random cohorts — independent of the DuckDB oracle, which
    shares the recursive fold's *shape* and could in principle share a
    bug with it."""
    import datetime as dt
    import os
    import random

    from openaq_lcs_fetch_spark.plans import QUERIES

    rng = random.Random(42)
    base = dt.datetime(2024, 3, 1)
    rows = []
    horizon = 40  # days of observation
    for uid in range(1, 120):
        start = rng.randint(0, horizon - 1)
        life = rng.randint(0, horizon - 1 - start)
        rows.append((uid, base + dt.timedelta(days=start, hours=1)))
        if life:
            rows.append((uid, base + dt.timedelta(days=start + life, hours=1)))
    df = spark.createDataFrame(
        [(i, ts, u, "click", 1.0, "{}") for i, (u, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    # naive reference
    spans: dict = {}
    for u, ts in rows:
        f, l = spans.get(u, (ts, ts))
        spans[u] = (min(f, ts), max(l, ts))
    end = max(l for _, l in spans.values())
    marked = [
        (
            (l - f).days,
            1 if (end - l) >= dt.timedelta(days=7) else 0,
        )
        for f, l in spans.values()
    ]
    from collections import defaultdict

    life_tab: dict = defaultdict(lambda: [0, 0])
    for dur, ev in marked:
        life_tab[dur][0 if ev else 1] += 1
    total = len(marked)
    s, exited = 10**12, 0
    expect = {}
    for dur in sorted(life_tab):
        d, c = life_tab[dur]
        n_risk = total - exited
        s = s * (n_risk - d) // n_risk
        expect[dur] = (n_risk, d, c, s)
        exited += d + c

    got = {
        r.t_days: (r.n_risk, r.n_events, r.n_censored, r.surv_ppt)
        for r in QUERIES["kaplan_meier"].fn(spark, sf).collect()
    }
    assert got == expect


def test_hll_distinct_within_bound_and_portable_registers(spark, sf_dir):
    """The md5-register HLL must (a) land inside its 3-sigma bound for
    every type at the oracle SF (event_id cardinality sits above the
    2.5m small-range switch there — the documented regime contract;
    USER cardinality does not, which is why the sketch counts events)
    and (b) be a deterministic pure function of the input — two runs
    produce identical estimate BITS."""
    from openaq_lcs_fetch_spark.plans import QUERIES

    run1 = {
        r.event_type: (r.hll_events, r.within_3sigma, r.exact_events)
        for r in QUERIES["hll_distinct_events"].fn(spark, sf_dir).collect()
    }
    assert all(ex > 2.5 * 512 for _, _, ex in run1.values()), run1
    assert all(ok for _, ok, _ in run1.values()), run1
    run2 = {
        r.event_type: r.hll_events
        for r in QUERIES["hll_distinct_events"].fn(spark, sf_dir).collect()
    }
    assert {k: v[0] for k, v in run1.items()} == run2


def test_bfs_hops_known_graph(spark, tmp_path):
    """Path graph A-B-C-D (each edge co-purchased twice) plus an
    isolated supported edge E-F: the hub is the max-degree node (B or C
    -> min id wins among degree-2 nodes = B... in a path A-B-C-D, B and
    C both have degree 2; min node id tie-break picks B). Hops from B:
    {B:0, A:1, C:1, D:2}; E/F unreachable."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    A, B, C, D, E, Fn = 1, 2, 3, 4, 5, 6
    pairs = [(A, B), (B, C), (C, D), (E, Fn)]
    rows = []
    ok = 100
    for u, v in pairs:
        for _ in range(2):  # support 2
            rows += [(ok, u), (ok, v)]
            ok += 1
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "lineitem.parquet"))
    out = {r.hop: r.n_nodes for r in QUERIES["bfs_hops"].fn(spark, sf).collect()}
    assert out == {0: 1, 1: 2, 2: 1}


def test_exact_div_survives_bigint_quotient_wrap(spark):
    """functions/numeric.exact_div vs the measured Spark `div` trap
    (round-6 ADVICE): `div` on DECIMAL operands returns BIGINT and
    SILENTLY WRAPS past 2^63 — a ~1.6e22 quotient came back as a
    garbage positive long — while DuckDB computes the same truncating
    division in HUGEINT. exact_div stays in DECIMAL(38,0) space; this
    pins (a) bit-parity with DuckDB `//` both below and far above the
    wrap point, including a non-exact quotient, and (b) that the raw
    `div` result really is wrong up there (the trap stays measured)."""
    import duckdb

    from pyspark.sql import functions as F

    from openaq_lcs_fetch_spark.functions.numeric import exact_div

    cases = [  # (num, den): quotient spans both sides of 2^63
        (10**22 + 7, 3),              # ~3.3e21 — far past the wrap
        (16 * 10**21, 1),             # the measured ADVICE repro shape
        (2**63 + 1, 1),               # first wrapped value
        (2**63 - 1, 1),               # last safe value
        (123456789012345678901234567, 987654321),  # non-exact quotient
        (5, 2),
        (0, 7),
    ]
    df = spark.createDataFrame(
        [(str(n), str(d)) for n, d in cases], "ns string, ds string"
    ).select(
        F.col("ns").cast("decimal(38,0)").alias("n"),
        F.col("ds").cast("decimal(38,0)").alias("d"),
    )
    got = [
        int(r.q)
        for r in df.select(exact_div(F.col("n"), F.col("d")).alias("q"))
        .collect()
    ]
    want = [
        int(
            duckdb.sql(
                f"SELECT CAST({n} AS HUGEINT) // CAST({d} AS HUGEINT)"
            ).fetchone()[0]
        )
        for n, d in cases
    ]
    assert got == want
    assert got[0] == (10**22 + 7) // 3  # python ground truth too
    # and the trap itself: raw `div` wraps silently on the same input
    wrapped = (
        df.limit(1)
        .select(F.expr("n div d").alias("q"))
        .collect()[0]
        .q
    )
    assert wrapped != want[0] and wrapped < 2**63


def test_fixture_events_value_has_no_nan(spark):
    """The repo-wide NaN contract is split (ADVICE r6, resolved): the
    five round-6 value-casting queries guard NaN explicitly BOTH
    engines (wilson/ols/mase/seasonal filter it, churn monetizes it as
    0), while the older casting sites rely on the fixture invariant
    pinned HERE — events.value contains NULLs but never NaN. If a
    future fixture regeneration injects NaN, this fails before any
    silent Spark-casts-NaN-to-0 / DuckDB-errors divergence can."""
    from pyspark.sql import functions as F

    n_nan = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(F.isnan("value"))
        .count()
    )
    assert n_nan == 0


def test_clustering_coefficients_known_graph(spark, tmp_path):
    """Hand-built co-purchase graph (support 2 per edge): edges
    (1,2)(1,3)(2,3)(1,4) → one triangle {1,2,3}. Degrees: 1→3, 2→2,
    3→2, 4→1. Coefficients: node 1 = 2·1/(3·2) = 1/3; nodes 2,3 =
    2·1/(2·1) = 1.0; node 4 has degree 1 → undefined (NULL)."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    pairs = [(1, 2), (1, 3), (2, 3), (1, 4)]
    rows = []
    ok = 100
    for u, v in pairs:
        for _ in range(2):  # support 2 so every pair passes the gate
            rows += [(ok, u), (ok, v)]
            ok += 1
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "lineitem.parquet"))
    out = {
        r.node: (r.degree, r.tri_cnt, r.coeff)
        for r in QUERIES["clustering_coefficients"].fn(spark, sf).collect()
    }
    assert out[1] == (3, 1, 1.0 / 3.0)
    assert out[2] == (2, 1, 1.0)
    assert out[3] == (2, 1, 1.0)
    assert out[4] == (1, 0, None)


def test_inverted_postings_varint_boundary(spark, tmp_path):
    """Hand-computed delta+varint costs across the 7-bit boundaries:
    token 'x' in docs {0, 127, 255, 16510}. Stored values: first =
    doc_id+1 = 1 (1 byte), gaps 127 (1 byte: 7 bits), 128 (2 bytes),
    16255 (2 bytes: 14 bits exactly, since 16255 < 2^14). Total = 6
    bytes, df = 4."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = [(d, "x", "en", "s", 1) for d in (0, 127, 255, 16510)]
    # a second token below min_df=2 must be absent from the output
    rows.append((1, "hapax", "en", "s", 1))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    out = {r.token: r for r in QUERIES["inverted_postings"].fn(spark, sf).collect()}
    assert set(out) == {"x"}
    r = out["x"]
    assert (r.df, r.min_doc, r.max_doc, r.varint_bytes) == (4, 0, 16510, 6)
    assert r.bytes_per_posting == 6 / 4


def test_skew_audit_known_distribution(spark, tmp_path):
    """100 keys with 1 order each + 1 hub key with 100 orders: n_rows
    200, n_keys 101, max 100; top1 share = 100·1e6 // 200 = 500000 ppm;
    p50 = 1 (51st key by count order), p90 = 1 (91st ≤ 100·0.9=90.9 →
    smallest cnt with 10·cum ≥ 9·101 i.e. cum ≥ 90.9 → cnt 1 at
    cum=100), p99 = 1 (cum 100 ≥ 99.99), salt = ceil(100·101/200) =
    51."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = [(k, k) for k in range(1, 101)]  # 100 singleton keys
    rows += [(1000 + i, 999) for i in range(100)]  # hub key 999
    df = spark.createDataFrame(rows, "o_orderkey long, o_custkey long")
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))
    r = QUERIES["skew_audit"].fn(spark, sf).collect()[0]
    assert (r.n_rows, r.n_keys, r.max_cnt) == (200, 101, 100)
    assert r.top1_share_ppm == 500000
    assert (r.p50_rows_per_key, r.p90_rows_per_key, r.p99_rows_per_key) == (1, 1, 1)
    assert r.salt_factor == 51


def test_last_touch_attribution_buckets(spark, tmp_path):
    """One user, hand-placed clicks/purchases: purchase 30 min after a
    click → lt_1h; purchase 2 h after the latest click → 1h_24h;
    purchase with no prior click → organic; a click AFTER a purchase
    must not attribute backwards."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, minutes, typ, val=10.0):
        return (eid, t0 + dt.timedelta(minutes=minutes), 1, typ, val, "{}")

    rows = [
        ev(1, 0, "purchase"),          # no prior click → organic
        ev(2, 10, "click", None),
        ev(3, 40, "purchase"),         # 30 min after click 2 → lt_1h
        ev(4, 100, "click", None),
        ev(5, 220, "purchase"),        # 120 min after click 4 → 1h_24h
        ev(6, 500, "click", None),     # trailing click, attributes nothing
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))
    out = {
        r.bucket: (r.n_purchases, r.total_cents, r.sum_gap_us)
        for r in QUERIES["last_touch_attribution"].fn(spark, sf).collect()
    }
    assert out == {
        "organic": (1, 1000, 0),
        "lt_1h": (1, 1000, 30 * 60 * 1_000_000),
        "1h_24h": (1, 1000, 120 * 60 * 1_000_000),
    }


def test_rrf_fusion_hand_ranked_lists(spark, tmp_path):
    """Hand-computed RRF: docs 1,2,3 score IDENTICALLY on BM25 (same
    tf=1/dl=2 for the same term), so lex_rank is the doc_id tiebreak
    1,2,3; embeddings rank dense as 3,2,1 (cos 1, 1/√2, 0) with doc 4
    dense-only at rank 4 (cos −1). RRF sums: doc1 = 1/61+1/63 =
    124/3843 ties doc3 exactly (IEEE addition is commutative), doc2 =
    2/62 = 124/3844 is strictly smaller, doc4 = 1/64. Expected order:
    doc1, doc3 (tie → id), doc2, doc4 — fusing ranks, not scores."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    docs = [
        (0, "table", "en", "s", 5),      # the query doc (excluded)
        (1, "table x", "en", "s", 7),
        (2, "table x", "en", "s", 7),
        (3, "table x", "en", "s", 7),
        (4, "y z", "en", "s", 3),        # no query term → dense-only
    ]
    vecs = [
        (0, [1.0, 0.0], 0),              # the query vector
        (1, [0.0, 1.0], 0),
        (2, [0.5, 0.5], 0),
        (3, [1.0, 0.0], 0),
        (4, [-1.0, 0.0], 0),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(os.path.join(sf, "embeddings.parquet"))

    rows = QUERIES["hybrid_rrf_fusion"].fn(spark, sf).collect()
    assert [r.doc_id for r in rows] == [1, 3, 2, 4]
    by_id = {r.doc_id: r for r in rows}
    assert (by_id[1].lex_rank, by_id[1].dense_rank) == (1, 3)
    assert (by_id[2].lex_rank, by_id[2].dense_rank) == (2, 2)
    assert (by_id[3].lex_rank, by_id[3].dense_rank) == (3, 1)
    assert (by_id[4].lex_rank, by_id[4].dense_rank) == (None, 4)
    assert by_id[1].rrf_score == 1 / 61 + 1 / 63
    assert by_id[1].rrf_score == by_id[3].rrf_score
    assert by_id[2].rrf_score == 1 / 62 + 1 / 62
    assert by_id[4].rrf_score == 1 / 64


def test_ndcg_eval_two_cell_geometry(spark, tmp_path):
    """Independent recomputation on a constructed two-cell geometry
    (all components dyadic, so float32 storage and double math are both
    exact): centroids 0..7, query 42=[0.875,0.125] lands in cell 0 with
    members {0,100,101,102}; the good neighbors 200/201 sit in cell 1
    and are invisible to the single probe, so NDCG@10 < 1. Expected
    dcg/idcg/ndcg are recomputed in pure Python with the same fold
    order, 6dp cosine rounding and micro-unit quantization."""
    import math
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    emb = {
        0: [1.0, 0.0],
        1: [0.0, 1.0],
        2: [-1.0, 0.0],
        3: [-1.0, -0.125],
        4: [-1.0, -0.25],
        5: [-1.0, -0.375],
        6: [-1.0, -0.5],
        7: [-1.0, -0.625],
        42: [0.875, 0.125],
        100: [0.75, 0.25],
        101: [0.625, 0.375],
        102: [0.875, 0.25],
        200: [0.5, 0.625],
        201: [0.25, 0.75],
    }
    sf = str(tmp_path)
    spark.createDataFrame(
        [(k, v, 0) for k, v in sorted(emb.items())],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.parquet(os.path.join(sf, "embeddings.parquet"))

    # --- python twin of the plan's math ---------------------------------
    def q(v):  # integer-quantized copy used for cell assignment
        return [round(x * 1000) for x in v]

    def cell(v):
        d2 = [
            (sum((a - c) ** 2 for a, c in zip(q(v), q(emb[cid]))), cid)
            for cid in range(8)
        ]
        return min(d2)[1]

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):  # sequential fold, like F.aggregate
            dot += x * y
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    qv = emb[42]
    qcid = cell(qv)
    assert qcid == 0
    scored = sorted(
        ((-cos(emb[v], qv), v) for v in emb if v != 42)
    )
    exact10 = {v: r + 1 for r, (_, v) in enumerate(scored[:10])}
    ivf = [(s, v) for s, v in scored if cell(emb[v]) == qcid]
    assert len(ivf) == 4  # cell 0 = {0, 100, 101, 102}
    sd = sum(
        round((11 - exact10.get(v, 11)) / math.log2(p + 2) * 1e6)
        if v in exact10
        else 0
        for p, (_, v) in enumerate(ivf[:10])
    )
    si = sum(round((11 - p) / math.log2(p + 1) * 1e6) for p in range(1, 11))

    row = QUERIES["ann_ndcg_eval"].fn(spark, sf).collect()[0]
    assert row.dcg == sd / 1e6
    assert row.idcg == si / 1e6
    assert row.ndcg_at_10 == sd / si
    assert 0 < row.ndcg_at_10 < 1


def test_compaction_bins_sixteen_unit_days(spark, tmp_path):
    """16 days × 1 event: total 16, target ceil(16/8)=2 → 8 bins of
    exactly 2 consecutive days, each 100% full (fill_ppm 1000000) —
    the packing actually merges small files and keeps time order."""
    import datetime as _dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = [
        (
            i,
            _dt.datetime(2024, 3, 1 + i, 12, 0, 0),
            1,
            "click",
            1.0,
            "{}",
        )
        for i in range(16)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    out = sorted(
        QUERIES["compaction_bins"].fn(spark, sf).collect(),
        key=lambda r: r.bin_id,
    )
    assert [r.bin_id for r in out] == list(range(8))
    for k, r in enumerate(out):
        assert (r.n_files, r.n_rows, r.fill_ppm) == (2, 2, 1_000_000)
        assert r.first_day == _dt.datetime(2024, 3, 1 + 2 * k)
        assert r.last_day == _dt.datetime(2024, 3, 2 + 2 * k)


def test_emd_ks_hand_computed_two_hour_geometry(spark, tmp_path):
    """Hand-computed EMD + KS on 4 rows across 2 hours. Cells =
    round(value·100) div 500: h0 holds cells {0,1}, h1 holds {0,0};
    global spine {0:3, 1:1}, N=4, widths 1. Cleared-denominator terms
    |cumh·N − cumg·nh| per (h, cell) are (2,0) for BOTH hours, so
    emd_num = ks_num = 2 and emd_cells = ks = 2/(2·4) = 0.25 — one
    geometry pins the shared CDF scaffold, the sum-vs-max split and
    the final division for both queries."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 4, 1, 7, 0, 0)
    rows = [
        (1, t0, 10, "click", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=30), 11, "click", 5.0, "{}"),
        (3, t0 + dt.timedelta(hours=1), 12, "click", 0.0, "{}"),
        (4, t0 + dt.timedelta(hours=1, minutes=10), 13, "click", 1.0, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    h0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) // 3_600_000_000
    emd = {r.h: r for r in QUERIES["hourly_value_emd"].fn(spark, sf).collect()}
    assert set(emd) == {h0, h0 + 1}
    for h in (h0, h0 + 1):
        assert (emd[h].n, emd[h].emd_num, emd[h].emd_cells) == (2, 2, 0.25)

    ks = {r.h: r for r in QUERIES["hourly_ks_drift"].fn(spark, sf).collect()}
    assert set(ks) == {h0, h0 + 1}
    for h in (h0, h0 + 1):
        assert (ks[h].n, ks[h].ks_num, ks[h].ks) == (2, 2, 0.25)


def test_cramers_v_empty_cells_still_count(spark, tmp_path):
    """2×2 perfect association with two EMPTY cells: type A only on
    Monday, type B only on Tuesday (2 rows each). Textbook chi² = N·1
    = 4 (each of the 4 spine cells — two occupied, two empty —
    contributes exactly 1), so V = 1.0. Summing only occupied cells
    would give chi² = 2 and V = √0.5 ≈ 0.707 — the bug this fixture
    pins out: an empty contingency cell still contributes r·s/n."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    mon = dt.datetime(2024, 4, 1, 9, 0, 0)   # a Monday
    tue = mon + dt.timedelta(days=1)
    rows = [
        (1, mon, 1, "A", 1.0, "{}"),
        (2, mon + dt.timedelta(hours=1), 2, "A", 1.0, "{}"),
        (3, tue, 3, "B", 1.0, "{}"),
        (4, tue + dt.timedelta(hours=1), 4, "B", 1.0, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    r = QUERIES["cramers_v"].fn(spark, sf).collect()[0]
    assert (r.n, r.chi2_micro) == (4, 4_000_000)
    assert r.cramers_v == 1.0


def test_type_day_chisq_emits_empty_cells(spark, tmp_path):
    """The per-cell χ² scaffold must include EMPTY contingency cells
    (obs 0, term = expected): on the 2×2 perfect-association fixture
    the reader-summed terms must reach the textbook chi² = 4.0 over 4
    rows — 2 occupied + 2 empty, each contributing exactly 1.0."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    mon = dt.datetime(2024, 4, 1, 9, 0, 0)
    tue = mon + dt.timedelta(days=1)
    rows = [
        (1, mon, 1, "A", 1.0, "{}"),
        (2, mon + dt.timedelta(hours=1), 2, "A", 1.0, "{}"),
        (3, tue, 3, "B", 1.0, "{}"),
        (4, tue + dt.timedelta(hours=1), 4, "B", 1.0, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    out = QUERIES["type_day_chisq"].fn(spark, sf).collect()
    assert len(out) == 4  # full 2×2 spine, not just the 2 occupied cells
    cells = {(r.event_type, r.dow): r for r in out}
    assert cells[("A", 2)].obs == 0 and cells[("B", 1)].obs == 0
    assert all(r.expected == 1.0 and r.chisq_term == 1.0 for r in out)
    assert sum(r.chisq_term for r in out) == 4.0


def test_degenerate_inputs_yield_null_not_ansi_error(spark, tmp_path):
    """ANSI Spark ERRORS on double x/0 while DuckDB yields NULL — on
    legal degenerate inputs the undefined statistic must be NULL on
    both engines, not a crash: OLS over a type whose events share one
    hour (zero x-variance), MASE over a series constant at lag 24, and
    Cramér's V on a single-category table. One fixture covers all
    three (one type, one weekday, constant value, 26 hourly rows)."""
    import datetime as dt
    import os

    import duckdb

    from openaq_lcs_fetch_spark.plans import QUERIES

    base = dt.datetime(2024, 4, 1, 0, 0, 0)  # Monday
    # 26 hourly rows, constant value: lag-24 errors are all 0 (MASE
    # undefined); all rows same type+weekday (V undefined). Separate
    # one-hour type pins the OLS zero-x-variance branch.
    rows = [
        (i, base + dt.timedelta(hours=i), 1, "A", 2.0, "{}") for i in range(26)
    ] + [
        (100, base.replace(hour=5), 2, "ONEHOUR", 1.0, "{}"),
        (101, base.replace(hour=5, minute=30), 3, "ONEHOUR", 3.0, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )

    ols = {r.event_type: r for r in QUERIES["ols_hourly_trend"].fn(spark, sf).collect()}
    assert ols["ONEHOUR"].slope_per_hour is None  # undefined, not a crash
    assert ols["ONEHOUR"].r2 is None
    assert ols["A"].r2 is None  # constant y: den_y = 0
    o = {r[0]: r for r in con.sql(QUERIES["ols_hourly_trend"].oracle).fetchall()}
    assert o["ONEHOUR"][3] is None and o["A"][5] is None  # oracle agrees

    mase = {r.event_type: r.mase for r in QUERIES["mase_naive_eval"].fn(spark, sf).collect()}
    assert mase["A"] is None  # constant series: mae24 = 0
    om = {r[0]: r[-1] for r in con.sql(QUERIES["mase_naive_eval"].oracle).fetchall()}
    assert om["A"] is None

    # Cramér's V needs only the single-category slice
    sf2 = os.path.join(str(tmp_path), "single")
    os.makedirs(sf2)
    spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=i), 1, "A", 1.0, "{}") for i in range(4)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf2, "events.parquet"))
    r = QUERIES["cramers_v"].fn(spark, sf2).collect()[0]
    assert r.chi2_micro == 0 and r.cramers_v is None
    con2 = duckdb.connect()
    con2.sql(
        f"CREATE VIEW events AS SELECT * FROM '{sf2}/events.parquet/*.parquet'"
    )
    ro = con2.sql(QUERIES["cramers_v"].oracle).fetchall()[0]
    assert ro[1] == 0 and ro[2] is None


def test_fixture_embeddings_have_no_zero_vector(spark):
    """Input contract of the cosine family (ORACLE_NOTES): a zero
    embedding makes DuckDB return a nonsense −1.0 similarity while
    ANSI Spark raises DIVIDE_BY_ZERO — there is no NULL-alignment that
    keeps both meaningful, so the invariant lives in the data. If a
    future fixture regeneration ships a zero vector, this fails before
    any cosine query silently diverges."""
    from pyspark.sql import functions as F

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        e = spark.read.parquet(f"{sf}/embeddings.parquet")
        n_zero = e.filter(
            F.aggregate(
                F.col("embedding"),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
            == 0.0
        ).count()
        assert n_zero == 0, sf


def test_seasonal_decompose_periodic_series_exact(spark, tmp_path):
    """Hand-computed decomposition of a perfectly 24-periodic series:
    value 2.0 for hour-of-day < 12, 4.0 otherwise, one event per hour
    for 72 hours starting at midnight UTC. For ANY 24-periodic series
    the 2×MA-24 trend is exactly the period mean (t_num = 2·S = 48·M),
    so trend = 300 cents everywhere defined (48 interior hours = 2
    full cycles, n_k = 2 per slot), seasonal = y_k − 300 = ±100
    exactly, and every residual is exactly 0.0 — all three divisions
    are exact in doubles, so equality is bit-for-bit."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    base = dt.datetime(2024, 4, 1, 0, 0, 0)  # midnight UTC → h0 % 24 == 0
    rows = [
        (i, base + dt.timedelta(hours=i), 1, "A",
         2.0 if i % 24 < 12 else 4.0, "{}")
        for i in range(72)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    out = QUERIES["seasonal_decompose_24"].fn(spark, sf).collect()
    assert len(out) == 48  # 72 hours minus 12 undefined at each edge
    h0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
    for r in out:
        k = r.h % 24
        assert r.y == (200 if k < 12 else 400)
        assert r.trend == 300.0
        assert r.seasonal == (-100.0 if k < 12 else 100.0)
        assert r.residual == 0.0
        assert h0 + 12 <= r.h <= h0 + 59  # the defined interior only


def test_nest_stations_is_partition_order_canonical(spark):
    """The assembled station tree must hash identically regardless of
    how the shuffle delivered the rows: same content, reversed input
    order and different partitioning → identical content_hash (an
    unsorted collect_list would re-write unchanged stations forever)."""
    from openaq_lcs_fetch_spark.operators.reshape import nest_stations
    from openaq_lcs_fetch_spark.sinks.stations import content_hash

    rows = [
        ("n1", "sys1", "s1", "pm25"),
        ("n1", "sys1", "s2", "pm10"),
        ("n1", "sys2", "s3", "co"),
    ]
    schema = "node string, sys string, sensor_id string, param string"

    def hash_of(data, parts):
        df = spark.createDataFrame(data, schema).repartition(parts)
        nested = nest_stations(df, ["node"], "sys", ["sensor_id", "param"])
        return content_hash(nested, "node").select("content_hash").first()[0]

    h1 = hash_of(rows, 1)
    h2 = hash_of(list(reversed(rows)), 7)
    assert h1 == h2


def test_max_drawdown_hand_series(spark, tmp_path):
    """Hand-computed drawdowns. Type A: cents [1000, 1200 (same hour),
    800, 1100, 500, 900] → running max 1200 from the second row, max
    drawdown 700 at the 500-cent trough (event 4) — exercising the
    within-hour local window AND the cross-hour prefix merge. Type B:
    [1000, 600, 1400, 1000] has TWO 400-cent drawdowns; the tiebreak
    must pick the EARLIEST trough (event 11)."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 4, 2, 0, 0, 0)

    def ev(i, minutes, typ, v):
        return (i, t0 + dt.timedelta(minutes=minutes), 1, typ, v, "{}")

    rows = [
        ev(0, 0, "A", 10.0),
        ev(1, 30, "A", 12.0),        # same hour as event 0
        ev(2, 60, "A", 8.0),         # dd 400
        ev(3, 120, "A", 11.0),       # dd 100
        ev(4, 150, "A", 5.0),        # dd 700 ← max
        ev(5, 180, "A", 9.0),        # dd 300
        ev(10, 0, "B", 10.0),
        ev(11, 60, "B", 6.0),        # dd 400 (earliest)
        ev(12, 120, "B", 14.0),
        ev(13, 180, "B", 10.0),      # dd 400 (later — loses tiebreak)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    out = {r.event_type: r for r in QUERIES["max_drawdown"].fn(spark, sf).collect()}
    a, b = out["A"], out["B"]
    assert (a.drawdown_cents, a.trough_event) == (700, 4)
    assert a.trough_us == int(
        (t0 + dt.timedelta(minutes=150)).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )
    assert (b.drawdown_cents, b.trough_event) == (400, 11)


def test_cusum_level_shift_hand_series(spark, tmp_path):
    """Hand-computed CUSUM on a clean level shift: four 10.0 readings
    then four 20.0 (N=8, total 12000 cents), so d_i = ±4000 and
    S = [-4k,-8k,-12k,-16k,-12k,-8k,-4k,0] — |S| peaks at exactly the
    last pre-shift event (id 3, s_scaled −16000). The first two rows
    share an hour, so both the in-hour cumsum and the cross-hour
    bucket offset participate."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 4, 3, 0, 0, 0)
    minutes = [0, 30, 60, 120, 180, 240, 300, 360]
    rows = [
        (i, t0 + dt.timedelta(minutes=m), 1, "A", 10.0 if i < 4 else 20.0, "{}")
        for i, m in enumerate(minutes)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    r = QUERIES["cusum_changepoint"].fn(spark, sf).collect()[0]
    assert (r.change_event, r.s_scaled) == (3, -16_000)
    assert r.change_us == int(
        (t0 + dt.timedelta(minutes=120)).replace(tzinfo=dt.timezone.utc).timestamp()
        * 1_000_000
    )


def test_gini_hand_values(spark, tmp_path):
    """Textbook Gini: customer revenues (1.00, 3.00) → G = 0.25
    exactly ((2·(1·100+2·300) − 3·400)/(2·400)); a second run with
    three equal revenues must give exactly 0.0 — pinning the
    rank-offset machinery and the (n+1) mean-difference formula."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    def write(sf, prices):
        rows = [
            (i, i, "F", p, dt.datetime(2024, 1, 1 + i), "1-URGENT")
            for i, p in enumerate(prices)
        ]
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    sf1 = os.path.join(str(tmp_path), "a")
    os.makedirs(sf1)
    write(sf1, [1.0, 3.0])
    r = QUERIES["gini_revenue"].fn(spark, sf1).collect()[0]
    assert (r.n_customers, r.total_cents, r.gini) == (2, 400, 0.25)

    sf2 = os.path.join(str(tmp_path), "b")
    os.makedirs(sf2)
    write(sf2, [2.0, 2.0, 2.0])
    r = QUERIES["gini_revenue"].fn(spark, sf2).collect()[0]
    assert (r.n_customers, r.total_cents, r.gini) == (3, 600, 0.0)


def test_theil_sen_hand_pairs(spark, tmp_path):
    """Hand-computed Theil-Sen: daily means (1.0, 2.0, 4.0, 3.0) give
    six pairwise slopes (−1, 0.5, 2/3, 1, 1.5, 2 in value units); the
    LOWER median (rank 4 of 6) is exactly 1.0 per day — pinning the
    pair fan-out, the selection (no averaging) and the cents scaling."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 4, 7, 12, 0, 0)
    vals = [1.0, 2.0, 4.0, 3.0]
    rows = [
        (i, t0 + dt.timedelta(days=i), 1, "A", v, "{}")
        for i, v in enumerate(vals)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    r = QUERIES["theil_sen_daily_slope"].fn(spark, sf).collect()[0]
    assert (r.n_pairs, r.slope_per_day) == (6, 1.0)


def test_autocorr24_periodic_and_constant(spark, tmp_path):
    """A 24-periodic hourly count series autocorrelates to EXACTLY 1.0
    at lag 24 (x and y coincide pair-by-pair, so num = vx and den =
    √(vx²)); a constant series has zero variance and must yield NULL
    through try_divide, not an ANSI crash."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 4, 10, 0, 0, 0)

    def build(sf, periodic):
        rows, eid = [], 0
        for h in range(48):
            n = (1 if (h % 24) < 12 else 2) if periodic else 1
            for j in range(n):
                rows.append(
                    (eid, t0 + dt.timedelta(hours=h, minutes=j), 1, "A", 1.0, "{}")
                )
                eid += 1
        os.makedirs(sf)
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    p = os.path.join(str(tmp_path), "p")
    build(p, periodic=True)
    r = QUERIES["hourly_autocorr24"].fn(spark, p).collect()[0]
    assert (r.n_pairs, r.autocorr24) == (24, 1.0)

    c = os.path.join(str(tmp_path), "c")
    build(c, periodic=False)
    r = QUERIES["hourly_autocorr24"].fn(spark, c).collect()[0]
    assert r.n_pairs == 24 and r.autocorr24 is None  # zero variance → NULL


def test_wilson_boundary_and_interval(spark, tmp_path):
    """The success predicate is STRICTLY > 5000 cents: a value of
    exactly 50.0 must not count. With n=4, k=1 the Wilson interval is
    recomputed in python from the same closed form (identical IEEE
    ops) and must bracket phat = 0.25."""
    import datetime as dt
    import math
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 4, 11, 0, 0, 0)
    vals = [50.0, 50.01, 10.0, 20.0]  # boundary row must NOT count
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "A", v, "{}")
        for i, v in enumerate(vals)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    r = QUERIES["wilson_proportion_ci"].fn(spark, sf).collect()[0]
    assert (r.n, r.k, r.phat) == (4, 1, 0.25)

    p, nn = 0.25, 4.0
    lo = (p + 1.9208 / nn - 1.96 * math.sqrt(p * (1.0 - p) / nn + 0.9604 / (nn * nn))) / (
        1.0 + 3.8416 / nn
    )
    hi = (p + 1.9208 / nn + 1.96 * math.sqrt(p * (1.0 - p) / nn + 0.9604 / (nn * nn))) / (
        1.0 + 3.8416 / nn
    )
    assert r.ci_lo == lo and r.ci_hi == hi
    assert r.ci_lo < r.phat < r.ci_hi


def test_interval_union_hand_islands(spark, tmp_path):
    """Hand-computed union of 30-minute activity intervals: events at
    +0, +10 and +45 minutes open [0,30]∪[10,40]∪[45,75] → two islands
    covering exactly 70 minutes; a second user with one event pins the
    singleton island (30 minutes). Overlap must not double-count."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 4, 12, 9, 0, 0)
    rows = [
        (0, t0, 1, "click", 1.0, "{}"),
        (1, t0 + dt.timedelta(minutes=10), 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=45), 1, "click", 1.0, "{}"),
        (3, t0, 2, "view", 1.0, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    out = {r.user_id: r for r in QUERIES["interval_union_length"].fn(spark, sf).collect()}
    assert (out[1].n_islands, out[1].covered_us) == (2, 70 * 60 * 1_000_000)
    assert (out[2].n_islands, out[2].covered_us) == (1, 30 * 60 * 1_000_000)


def test_peak_concurrency_hand_sessions(spark, tmp_path):
    """Hand-computed sweep line. Three users: u1 at +0 (session
    [0, 30m]), u2 at +10m ([10m, 40m]), u3 at +50m ([50m, 80m]); u1
    adds a second event at +20m, extending its session to [0, 50m] —
    NOT a new session (gap 20m < 30m). Peak concurrency is 2 (u1∩u2);
    u1's end coincides with u3's start at +50m, and the same-instant
    collapse must NOT count 3. Change points: 0, 10m, 40m, 50m, 80m."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 4, 13, 8, 0, 0)
    rows = [
        (0, t0, 1, "click", 1.0, "{}"),
        (1, t0 + dt.timedelta(minutes=20), 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=10), 2, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=50), 3, "click", 1.0, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    r = QUERIES["session_peak_concurrency"].fn(spark, sf).collect()[0]
    assert (r.peak_concurrent, r.n_change_points) == (2, 5)


def test_purchase_streaks_hand_islands(spark, tmp_path):
    """Gaps-and-islands by hand: u1 purchases on days 1,2,3, skips 4,
    then 5,6 → longest streak 3 (two purchases on day 2 must not
    inflate it); u2 purchases on day 1 only → streak 1; u3 only clicks
    → absent from the output entirely."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    def ev(i, day, user, typ, minute=0):
        return (
            i,
            dt.datetime(2024, 5, day, 12, minute),
            user,
            typ,
            1.0,
            "{}",
        )

    rows = [
        ev(0, 1, 1, "purchase"),
        ev(1, 2, 1, "purchase"),
        ev(2, 2, 1, "purchase", minute=30),  # same-day dup: no effect
        ev(3, 3, 1, "purchase"),
        ev(4, 5, 1, "purchase"),
        ev(5, 6, 1, "purchase"),
        ev(6, 1, 2, "purchase"),
        ev(7, 1, 3, "click"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    out = {r.user_id: r.longest_streak for r in QUERIES["purchase_streaks"].fn(spark, sf).collect()}
    assert out == {1: 3, 2: 1}


def test_funnel_strict_ordering_hand(spark, tmp_path):
    """Funnel stages must be STRICTLY ordered per user: u1 completes
    view→click→purchase in order (counts everywhere); u2's purchase
    precedes its click (counts as viewer and clicker only); u3 clicks
    without ever viewing (counts nowhere)."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 5, 10, 9, 0, 0)

    def ev(i, user, typ, minutes):
        return (i, t0 + dt.timedelta(minutes=minutes), user, typ, 1.0, "{}")

    rows = [
        ev(0, 1, "view", 0), ev(1, 1, "click", 10), ev(2, 1, "purchase", 20),
        ev(3, 2, "view", 0), ev(4, 2, "purchase", 5), ev(5, 2, "click", 10),
        ev(6, 3, "click", 0), ev(7, 3, "purchase", 10),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    r = QUERIES["funnel_conversion"].fn(spark, sf).collect()[0]
    assert (r.n_viewed, r.n_clicked_after, r.n_purchased_after) == (2, 2, 1)


def test_retention_cohort_week_floor_hand(spark, tmp_path):
    """weeks_since is an exact day-difference floor, never a calendar
    week boundary: activity on day 6 after first touch is week 0,
    day 7 is week 1, day 13 is still week 1 — one user, one cohort
    day, n_active 1 in weeks {0, 1} and nothing else."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 5, 1, 18, 0, 0)  # a Wednesday evening
    rows = [
        (0, t0, 1, "click", 1.0, "{}"),
        (1, t0 + dt.timedelta(days=6), 1, "click", 1.0, "{}"),   # week 0
        (2, t0 + dt.timedelta(days=7), 1, "click", 1.0, "{}"),   # week 1
        (3, t0 + dt.timedelta(days=13), 1, "click", 1.0, "{}"),  # week 1
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    out = {
        (r.cohort_day, r.weeks_since): r.n_active
        for r in QUERIES["retention_cohorts"].fn(spark, sf).collect()
    }
    cohort = dt.datetime(2024, 5, 1)
    assert out == {(cohort, 0): 1, (cohort, 1): 1}


def test_ewma_half_life_hand(spark, tmp_path):
    """Half-life decay by hand: values (1, 2, 4) in time order decay
    as 0.5², 0.5¹, 0.5⁰ → exactly 5.25 (powers of two keep every term
    an exact double; the micro-quantized sum reconstructs it
    losslessly)."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 5, 2, 9, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "click", v, "{}")
        for i, v in enumerate([1.0, 2.0, 4.0])
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    out = QUERIES["ewma_user_value"].fn(spark, sf).collect()
    assert len(out) == 1
    assert out[0].user_id == 1 and out[0].decayed_value == 5.25


def test_ab_test_zstat_hand_counts(spark, tmp_path):
    """Hand-checked two-proportion z: conversion is ≥3 purchases, the
    split is user parity. Even users: one converter of two; odd: none
    of two → p0=0.5, p1=0, pooled 0.25, z = 0.5/√(0.25·0.75·1) ≈
    1.1547. Exact counts pinned; z to 1e-6."""
    import datetime as dt
    import math
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 5, 3, 9, 0, 0)
    rows = []
    eid = 0
    for j in range(3):  # user 2: three purchases → converted
        rows.append((eid, t0 + dt.timedelta(minutes=eid), 2, "purchase", 1.0, "{}")); eid += 1
    rows.append((eid, t0, 4, "purchase", 1.0, "{}")); eid += 1  # only one
    rows.append((eid, t0, 1, "click", 1.0, "{}")); eid += 1
    rows.append((eid, t0, 3, "click", 1.0, "{}")); eid += 1
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    r = QUERIES["ab_test_zstat"].fn(spark, sf).collect()[0]
    assert (r.n0, r.c0, r.n1, r.c1) == (2, 1, 2, 0)
    assert abs(r.z - 0.5 / math.sqrt(0.1875)) < 1e-6


def test_views_before_purchase_boundary_hand(spark, tmp_path):
    """Interval boundary semantics of the bucketed point-in-interval
    join: the window is [purchase − 1h, purchase) — a view exactly one
    hour before COUNTS (closed start), a view at the purchase instant
    does NOT (open end), a view 61 minutes before is out, and the
    views straddle an hour-bucket boundary so the bucket fan-out is
    exercised."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    p = dt.datetime(2024, 5, 4, 10, 30, 0)
    rows = [
        (0, p, 1, "purchase", 1.0, "{}"),
        (1, p - dt.timedelta(hours=1), 1, "view", 1.0, "{}"),          # in (closed start)
        (2, p - dt.timedelta(minutes=61), 1, "view", 1.0, "{}"),       # out
        (3, p - dt.timedelta(minutes=10), 1, "view", 1.0, "{}"),       # in
        (4, p, 1, "view", 1.0, "{}"),                                  # out (open end)
        (5, p - dt.timedelta(minutes=5), 2, "view", 1.0, "{}"),        # other user
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    out = {r.purchase_id: r.n_views_before for r in QUERIES["views_before_purchase"].fn(spark, sf).collect()}
    assert out == {0: 2}


def test_locf_fill_hand_spine(spark, tmp_path):
    """LOCF by hand: readings 1.0 at 09:10 and 2.0 at 11:40 give an
    hourly spine 09:00..11:00; the 09:00 slot precedes the first
    reading (no carry → absent), 10:00 and 11:00 carry 1.0 — a slot
    never sees a reading from its own future, and the spine/reading
    interleave at equal ts is resolved by the ord tiebreak."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = [
        (0, dt.datetime(2024, 5, 5, 9, 10), 1, "click", 1.0, "{}"),
        (1, dt.datetime(2024, 5, 5, 11, 40), 1, "click", 2.0, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    out = {r.slot: r.locf_value for r in QUERIES["locf_fill"].fn(spark, sf).collect()}
    assert out == {
        dt.datetime(2024, 5, 5, 10, 0): 1.0,
        dt.datetime(2024, 5, 5, 11, 0): 1.0,
    }


def test_trailing_1h_range_frame_boundaries(spark, tmp_path):
    """RANGE-frame boundaries by hand: the trailing window is
    [t − 1h, t] INCLUSIVE on both ends in event-time — an event
    exactly one hour earlier counts, one at 61 minutes does not, and
    two events at the IDENTICAL microsecond see each other (RANGE, not
    ROWS: peers share the frame)."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 5, 6, 12, 0, 0)
    rows = [
        (0, t0 - dt.timedelta(minutes=61), 1, "click", 1.0, "{}"),
        (1, t0 - dt.timedelta(hours=1), 1, "click", 2.0, "{}"),
        (2, t0, 1, "click", 4.0, "{}"),
        (3, t0, 1, "click", 8.0, "{}"),  # same instant as event 2
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    out = {r.event_id: (r.n_1h, r.sum_1h) for r in QUERIES["trailing_1h_stats"].fn(spark, sf).collect()}
    assert out[0] == (1, 1.0)          # only itself
    assert out[1] == (2, 3.0)          # includes the 61-min-ago event
    assert out[2] == (3, 14.0)         # peers at t0 share the frame...
    assert out[3] == (3, 14.0)         # ...symmetrically


def test_ohlc_bars_tiebreak_hand(spark, tmp_path):
    """OHLC by hand in one 6-hour bar: prices 3, 9, 1, 5 in time order
    → open 3, high 9, low 1, close 5; two SIMULTANEOUS rows at the bar
    open must resolve open/close by the event_id tiebreak (smaller id
    opens, larger id is not the close unless last overall)."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 5, 7, 0, 0, 0)  # bar-aligned (midnight)
    rows = [
        (0, t0, 1, "A", 3.0, "{}"),
        (1, t0, 1, "A", 9.0, "{}"),                            # same instant
        (2, t0 + dt.timedelta(hours=2), 1, "A", 1.0, "{}"),
        (3, t0 + dt.timedelta(hours=5), 1, "A", 5.0, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    r = QUERIES["ohlc_bars"].fn(spark, sf).collect()[0]
    assert (r.open, r.high, r.low, r.close, r.n) == (3.0, 9.0, 1.0, 5.0, 4)


def test_pareto_front_hand_points(spark, tmp_path):
    """Skyline by hand on (price, size): front = {(1.0, 5), (2.0, 3),
    (4.0, 1)}. Dominated: (3.0, 5) by the cheaper same-size part,
    (5.0, 2) by (4.0, 1). Price tie at 2.0: only the smaller size
    survives; the exact duplicate of a front point coexists (both
    partkeys kept)."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    parts = [
        (1, "a", "B1", "T", 5, 1.0),    # front
        (2, "b", "B1", "T", 3, 2.0),    # front (price-tie winner)
        (3, "c", "B1", "T", 4, 2.0),    # dominated by partkey 2 (tie, larger)
        (4, "d", "B1", "T", 1, 4.0),    # front
        (5, "e", "B1", "T", 5, 3.0),    # dominated by partkey 1
        (6, "f", "B1", "T", 2, 5.0),    # dominated by partkey 4
        (7, "g", "B1", "T", 3, 2.0),    # exact duplicate of 2 → coexists
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        parts,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).coalesce(1).write.parquet(os.path.join(sf, "part.parquet"))

    keys = sorted(r.p_partkey for r in QUERIES["pareto_front_parts"].fn(spark, sf).collect())
    assert keys == [1, 2, 4, 7]


def test_event_motifs_hand_trigrams(spark, tmp_path):
    """Trigrams by hand: user 1's sequence v,c,p,v yields motifs
    v>c>p and c>p>v (sliding, overlapping); user 2's v,c,p adds a
    second v>c>p. Sequences never cross users, and a 2-event user
    contributes nothing. Expect v>c>p ×2, c>p>v ×1."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 5, 8, 9, 0, 0)

    def ev(i, user, typ, m):
        return (i, t0 + dt.timedelta(minutes=m), user, typ, 1.0, "{}")

    rows = [
        ev(0, 1, "view", 0), ev(1, 1, "click", 1), ev(2, 1, "purchase", 2), ev(3, 1, "view", 3),
        ev(4, 2, "view", 0), ev(5, 2, "click", 1), ev(6, 2, "purchase", 2),
        ev(7, 3, "view", 0), ev(8, 3, "click", 1),  # too short for a trigram
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    out = {r.motif: r.n for r in QUERIES["event_motifs"].fn(spark, sf).collect()}
    assert out == {"view>click>purchase": 2, "click>purchase>view": 1}


def test_dedup_keep_best_hand_groups(spark, tmp_path):
    """Keep-the-best-copy by hand: three docs share one text (keep the
    longest n_chars, tie → min doc_id), a singleton survives, and two
    docs whose texts differ only by whitespace-trim equivalence stay
    SEPARATE groups (the hash is over the raw text)."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    docs = [
        (1, "same text", "en", "s1", 9),
        (2, "same text", "en", "s2", 20),   # longest → kept
        (3, "same text", "en", "s3", 20),   # tie loses to smaller id 2
        (4, "unique", "en", "s1", 6),       # singleton → kept
        (5, "same text ", "en", "s1", 10),  # trailing space: different text
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))

    kept = sorted(r.doc_id for r in QUERIES["dedup_keep_best"].fn(spark, sf).collect())
    assert kept == [2, 4, 5]


def test_sequence_pack_exact_fit_invariant(spark, tmp_path):
    """Packing invariant: four 256-token docs fill exactly two 512-
    token sequences with two docs each — true under ANY md5 global
    order, so the assertion pins the offset math (seq = floor(start /
    512)) without depending on the hash permutation."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    text = " ".join(["w"] * 256)
    docs = [(i, text, "en", "s", len(text)) for i in range(4)]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))

    out = sorted(
        QUERIES["sequence_pack"].fn(spark, sf).collect(), key=lambda r: r.seq_id
    )
    assert [(r.seq_id, r.n_docs, r.n_tokens) for r in out] == [
        (0, 2, 512),
        (1, 2, 512),
    ]


def test_conjunctive_search_hand_postings(spark, tmp_path):
    """Posting intersection by hand: df(x)=3, df(y)=3, df(z)=1 → the
    query is {x, y} (top-2 by df); only docs containing BOTH terms
    survive ({2, 3}), a repeated term inside one doc counts once
    (distinct postings), and doc 5 with y alone is excluded."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    docs = [
        (1, "x x x z", "en", "s", 7),  # x only (repeats don't help)
        (2, "x y", "en", "s", 3),      # both → match
        (3, "y x y", "en", "s", 5),    # both → match
        (4, "x q", "en", "s", 3),      # x only
        (5, "y", "en", "s", 1),        # y only
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))

    out = {r.doc_id: r.n_matched for r in QUERIES["conjunctive_search"].fn(spark, sf).collect()}
    assert out == {2: 2, 3: 2}


def test_outliers_3sigma_integer_identity_hand(spark, tmp_path):
    """The cleared-denominator 3σ identity by hand: ten 1.0 readings
    plus one 10.0 → for the big point (n·x−S)² = 81e6 exceeds
    9(nQ−S²) = 72.9e6 (outlier), while each 1.0 gives 0.81e6 (inlier)
    → exactly one outlier among 11 — the flag never materializes a
    float mean or variance."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 5, 9, 9, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "A", 1.0, "{}") for i in range(10)
    ] + [(10, t0 + dt.timedelta(minutes=10), 1, "A", 10.0, "{}")]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    r = QUERIES["value_outliers_3sigma"].fn(spark, sf).collect()[0]
    assert (r.n, r.n_outliers) == (11, 1)


def test_lag_features_user_isolation_hand(spark, tmp_path):
    """Lag features by hand: user 1's fourth event carries lags
    (3.0, 2.0, 1.0); its first event has all-NULL lags; and user 2's
    single event must NOT see user 1's values — the lag frame never
    crosses the user partition."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 5, 11, 9, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "click", float(i + 1), "{}")
        for i in range(4)
    ] + [(9, t0 + dt.timedelta(minutes=9), 2, "click", 99.0, "{}")]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    out = {r.event_id: (r.lag1, r.lag2, r.lag3) for r in QUERIES["lag_features"].fn(spark, sf).collect()}
    assert out[3] == (3.0, 2.0, 1.0)
    assert out[0] == (None, None, None)
    assert out[9] == (None, None, None)  # user isolation


def test_dau_wau_hand_window(spark, tmp_path):
    """DAU/WAU by hand: u1 active on days 0 and 6, u2 on day 6 only.
    Day 0: dau 1, wau 1 (trailing week = day 0 alone). Day 6: dau 2,
    wau 2 — u1's day-0 activity is still inside the trailing 7-day
    window and must not double-count u1 (distinct users, not
    user-days); stickiness 1.0 on both days."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 5, 13, 10, 0, 0)
    rows = [
        (0, t0, 1, "click", 1.0, "{}"),
        (1, t0 + dt.timedelta(days=6), 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(days=6, hours=1), 1, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(days=6), 2, "click", 1.0, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    day0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) // 86_400_000_000
    out = {r.day: (r.dau, r.wau, r.stickiness) for r in QUERIES["dau_wau_stickiness"].fn(spark, sf).collect()}
    assert out == {day0: (1, 1, 1.0), day0 + 6: (2, 2, 1.0)}


def test_single_bucket_degenerates_agree(spark, tmp_path):
    """Round-7 verdict task #6: the newest statistical queries on their
    smallest legal inputs — one HOUR of events (which is also one day)
    — must yield the degenerate answer on BOTH engines, not a crash:

    * theil_sen_daily_slope: a type with a single day has zero pairwise
      slopes, so the type is ABSENT from the output (the self-join is
      empty), on both engines;
    * hourly_type_correlation: a single shared hour gives every pair
      n=1 and zero variance -> cov_num 0, pearson_r NULL;
    * compaction_bins: a single day packs into exactly one bin whose
      fill is n*1e6 // ceil(n/8) ppm — the "one giant file overfills
      its bin" case the planner must report, not split.

    A second two-day fixture pins the control: theil_sen emits the
    2-day type (exact hand slope) and still omits the 1-day type.
    """
    import datetime as dt
    import os

    import duckdb

    from openaq_lcs_fetch_spark.plans import QUERIES

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    h = dt.datetime(2024, 4, 1, 5, 0, 0)
    rows = [
        (0, h, 1, "A", 2.0, "{}"),
        (1, h + dt.timedelta(minutes=10), 2, "A", 4.0, "{}"),
        (2, h + dt.timedelta(minutes=20), 3, "B", 1.0, "{}"),
        (3, h + dt.timedelta(minutes=30), 4, "B", 3.0, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        os.path.join(sf, "events.parquet")
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'")

    # theil_sen: every type has one day -> no pairs -> empty on BOTH
    assert QUERIES["theil_sen_daily_slope"].fn(spark, sf).count() == 0
    assert con.sql(QUERIES["theil_sen_daily_slope"].oracle).fetchall() == []

    # correlation: single-hour spine -> n=1, zero variance -> NULL r
    r = QUERIES["hourly_type_correlation"].fn(spark, sf).collect()
    assert len(r) == 1
    assert (r[0].type_a, r[0].type_b, r[0].n_hours, r[0].cov_num) == ("A", "B", 1, 0)
    assert r[0].pearson_r is None
    ro = con.sql(QUERIES["hourly_type_correlation"].oracle).fetchall()
    assert len(ro) == 1 and ro[0][3] == 0 and ro[0][4] is None

    # compaction: 4 rows, target ceil(4/8)=1 -> ONE bin of one "file",
    # fill 4,000,000 ppm (the un-splittable oversized day)
    b = QUERIES["compaction_bins"].fn(spark, sf).collect()
    assert len(b) == 1
    assert (b[0].bin_id, b[0].n_files, b[0].n_rows, b[0].fill_ppm) == (0, 1, 4, 4_000_000)
    assert b[0].first_day == b[0].last_day
    bo = con.sql(QUERIES["compaction_bins"].oracle).fetchall()
    assert len(bo) == 1 and (bo[0][1], bo[0][2], bo[0][5]) == (1, 4, 4_000_000)

    # control: A spans two days (day1 mean 200 cents, day2 500 cents ->
    # slope 3.0 value-units/day), B stays single-day and stays absent
    sf2 = os.path.join(str(tmp_path), "twodays")
    os.makedirs(sf2)
    d1 = dt.datetime(2024, 4, 1, 12, 0, 0)
    rows2 = [
        (0, d1, 1, "A", 1.0, "{}"),
        (1, d1 + dt.timedelta(hours=1), 2, "A", 3.0, "{}"),
        (2, d1 + dt.timedelta(days=1), 3, "A", 5.0, "{}"),
        (3, d1, 4, "B", 7.0, "{}"),
    ]
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        os.path.join(sf2, "events.parquet")
    )
    out = {r.event_type: r for r in QUERIES["theil_sen_daily_slope"].fn(spark, sf2).collect()}
    assert set(out) == {"A"}
    assert out["A"].n_pairs == 1 and out["A"].slope_per_day == 3.0
    con2 = duckdb.connect()
    con2.sql(f"CREATE VIEW events AS SELECT * FROM '{sf2}/events.parquet/*.parquet'")
    oo = con2.sql(QUERIES["theil_sen_daily_slope"].oracle).fetchall()
    assert len(oo) == 1 and oo[0][0] == "A" and oo[0][2] == 3.0


def test_ngram_novelty_curve_two_batches(spark, tmp_path):
    """Two docs at opposite ends of the id range land in batches 0 and
    9 (batch = (id-lo)*10 // span). Doc 0 'x y z w' contributes grams
    {x y z, y z w} — both corpus-first → novelty 1e6 ppm. Doc 9
    'x y z q' contributes {x y z, y z q}: only 'y z q' is first-seen
    there → 500000 ppm (truncating integer ratio)."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = [
        (0, "x y z w", "en", "s1", 7),
        (9, "x y z q", "en", "s1", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    out = {r.batch: r for r in QUERIES["ngram_novelty_curve"].fn(spark, sf).collect()}
    assert set(out) == {0, 9}
    assert (out[0].n_docs, out[0].n_gram_rows, out[0].distinct_grams) == (1, 2, 2)
    assert (out[0].novel_grams, out[0].novelty_ppm) == (2, 1_000_000)
    assert (out[9].n_docs, out[9].n_gram_rows, out[9].distinct_grams) == (1, 2, 2)
    assert (out[9].novel_grams, out[9].novelty_ppm) == (1, 500_000)


def test_degree_assortativity_star_is_minus_one(spark, tmp_path):
    """A 2-leaf star is perfectly disassortative: hub degree 2, leaves
    degree 1; over the 4 directed edges the endpoint-degree Pearson is
    exactly −1.0 (num −4, both variances 4 → −4/(2·2); every step is
    exact in IEEE doubles). Each undirected edge needs two orders to
    pass the support-2 gate."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    baskets = {100: [1, 2], 101: [1, 2], 200: [1, 3], 201: [1, 3]}
    rows = [(ok, pk) for ok, parts in baskets.items() for pk in parts]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "lineitem.parquet"))
    out = QUERIES["degree_assortativity"].fn(spark, sf).collect()[0]
    assert (out.n_nodes, out.n_edges) == (3, 2)
    assert out.assortativity == -1.0


def test_kcore_nodes_k4_plus_pendant(spark, tmp_path):
    """K4 on {1,2,3,4} (two orders holding all four parts give every
    pair support 2) plus a support-2 pendant edge (4,5). Peeling at
    k=3: node 5 (degree 1) drops in round one, node 4 falls back to
    degree 3 and survives — the 3-core is exactly the K4, every member
    at core degree 3."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    baskets = {
        100: [1, 2, 3, 4], 101: [1, 2, 3, 4],
        200: [4, 5], 201: [4, 5],
    }
    rows = [(ok, pk) for ok, parts in baskets.items() for pk in parts]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "lineitem.parquet"))
    out = {r.node: r.core_degree for r in QUERIES["kcore_nodes"].fn(spark, sf).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_rfm_segments_five_singleton_quintiles(spark, tmp_path):
    """Five single-order customers engineered so ntile(5) puts one per
    quintile on every axis: customer i ordered on day 10−i at price
    (6−i)·100 — customer 1 is newest/biggest (scores 5/5/5 after the
    all-tied frequency axis tie-breaks by custkey), customer 5 oldest/
    smallest (1/1/1). Exact cents and the one-division average pin the
    arithmetic."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = [
        (
            100 + i,
            i,
            "O",
            float((6 - i) * 100),
            dt.datetime(2024, 1, 10 - i),
            "1-URGENT",
        )
        for i in range(1, 6)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))
    out = {
        (r.r_score, r.f_score, r.m_score): r
        for r in QUERIES["rfm_segments"].fn(spark, sf).collect()
    }
    # frequency all-tied → f follows custkey order: cust i gets 6-i
    assert set(out) == {(5, 5, 5), (4, 4, 4), (3, 3, 3), (2, 2, 2), (1, 1, 1)}
    top = out[(5, 5, 5)]
    assert (top.n_customers, top.total_cents, top.avg_value) == (1, 50000, 500.0)
    assert out[(1, 1, 1)].total_cents == 10000


def test_l_diversity_audit_hand_classes(spark, tmp_path):
    """Two QI classes: ('A', 1) holds three customers at one balance
    (diversity 1 — weak at every l); ('B', 1) holds the global min and
    max balances (deciles 0 and 9, diversity 2 — weak only at l≥3).
    Exposure rates are exact fractions of the 5 rows."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = [
        (1, "c1", 1, 100.0, "A"),
        (2, "c2", 1, 100.0, "A"),
        (3, "c3", 1, 100.0, "A"),
        (4, "c4", 1, 100.0, "B"),
        (5, "c5", 1, 200.0, "B"),
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "customer.parquet"))
    out = {r.l: r for r in QUERIES["l_diversity_audit"].fn(spark, sf).collect()}
    assert (out[2].n_classes, out[2].weak_classes, out[2].exposed_rows) == (2, 1, 3)
    assert out[2].exposed_rate == 0.6
    for l in (3, 4):
        assert (out[l].weak_classes, out[l].exposed_rows, out[l].exposed_rate) == (
            2,
            5,
            1.0,
        )


def test_histogram_selectivity_audit_uniform_is_exact(spark, tmp_path):
    """20 orders priced at exactly the 20 cent-values 0..19: every
    histogram bucket holds one value of width 1, so uniform-within-
    bucket interpolation IS the truth — est_rows equals actual_rows and
    err_ppm is 0 for all five thresholds ((W·q)//100 = 5,10,15,18,19)."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = [
        (i, 1, "O", i / 100.0, dt.datetime(2024, 1, 1), "1-URGENT")
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))
    out = {r.pct: r for r in QUERIES["histogram_selectivity_audit"].fn(spark, sf).collect()}
    expect = {25: (5, 15), 50: (10, 10), 75: (15, 5), 90: (18, 2), 99: (19, 1)}
    assert set(out) == set(expect)
    for pct, (thr, actual) in expect.items():
        r = out[pct]
        assert (r.threshold_cents, r.actual_rows, r.est_rows, r.err_ppm) == (
            thr,
            actual,
            actual,
            0,
        )


def test_encoding_cost_audit_hand_runs(spark, tmp_path):
    """Six events, two types, values including NaN (cents NULL on both
    engines). Under (event_type, ts, event_id): user runs u1|u2|u3 = 3
    (the A→B seam carries u2 across — NOT a boundary), cents runs
    100|200|NULL|100 = 4 (null-safe: NULL==NULL inside the run), type
    runs = 2. NDV ignores the NULL cents → 2 distinct; dict bits:
    bin(1)=1, bin(2)=2."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (1, t0, 1, "A", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "A", 2.0, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 2, "A", 2.0, "{}"),
        (4, t0, 2, "B", float("nan"), "{}"),
        (5, t0 + dt.timedelta(minutes=1), 2, "B", float("nan"), "{}"),
        (6, t0 + dt.timedelta(minutes=2), 3, "B", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))
    out = {r.column_name: r for r in QUERIES["encoding_cost_audit"].fn(spark, sf).collect()}
    et, us, ce = out["event_type"], out["user_id"], out["value_cents"]
    assert (et.n_rows, et.n_runs, et.n_distinct, et.dict_index_bits) == (6, 2, 2, 1)
    assert (us.n_runs, us.n_distinct, us.dict_index_bits) == (3, 3, 2)
    assert (ce.n_runs, ce.n_distinct, ce.dict_index_bits) == (4, 2, 1)
    assert (et.runs_ppm, us.runs_ppm, ce.runs_ppm) == (333333, 500000, 666666)


def test_timed_funnel_hand_journeys(spark, tmp_path):
    """Three viewers: u1 converts fully inside the windows (click +30m,
    purchase +45m after click); u2's click comes 2h after the view
    (outside); u3's click lands at EXACTLY +1h (inclusive boundary,
    counted) but the purchase misses its window by a minute. Expected
    funnel: 3 viewed → 2 clicked ≤1h → 1 purchased ≤1h."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 6, 1, 9, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + 30 * m, 1, "click", 1.0, "{}"),
        (3, t0 + 75 * m, 1, "purchase", 1.0, "{}"),
        (4, t0, 2, "view", 1.0, "{}"),
        (5, t0 + 120 * m, 2, "click", 1.0, "{}"),
        (6, t0 + 121 * m, 2, "purchase", 1.0, "{}"),
        (7, t0, 3, "view", 1.0, "{}"),
        (8, t0 + 60 * m, 3, "click", 1.0, "{}"),
        (9, t0 + 121 * m, 3, "purchase", 1.0, "{}"),
        (10, t0, 4, "click", 1.0, "{}"),  # click with no view: outside funnel
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))
    out = QUERIES["timed_funnel"].fn(spark, sf).collect()[0]
    assert (out.n_viewed, out.n_clicked_1h, out.n_purchased_1h) == (3, 2, 1)


def test_seasonal_hour_outliers_needs_eleven_baselines(spark, tmp_path):
    """For a single spike over an otherwise-constant slot the cleared-
    denominator identity flags iff n−1 > 9 (dev² = (n−1)²δ², 9·var =
    9(n−1)δ²) — so a 2-event hour against 11 constant-1 days of its
    hour-of-day slot IS flagged, and nothing else is. 12 days × 24
    hours, one extra event at day 5 hour 7."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 2, 1, 0, 0, 0)
    rows = []
    eid = 0
    for day in range(12):
        for hod in range(24):
            rows.append(
                (eid, t0 + dt.timedelta(days=day, hours=hod), 1, "click", 1.0, "{}")
            )
            eid += 1
    rows.append((eid, t0 + dt.timedelta(days=5, hours=7, minutes=30), 2, "click", 1.0, "{}"))
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))
    out = QUERIES["seasonal_hour_outliers"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    h0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
    assert (r.h, r.hod, r.n_events, r.is_high) == (h0 + 5 * 24 + 7, 7, 2, True)
    assert r.hod_mean == 13.0 / 12.0


def test_heavy_hitters_twophase_certified_exact(spark, tmp_path):
    """Parts 1..40 with strictly decreasing counts 40..1: every true
    top-10 part ranks in its shard's top-4, the largest per-shard 4th
    count is 16 (< the 10th merged count 31), so the merge is certified
    and equals the exact top-10."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = []
    ok = 0
    for part in range(1, 41):
        for _ in range(41 - part):
            rows.append((ok, part))
            ok += 1
    sf = str(tmp_path)
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").coalesce(
        1
    ).write.parquet(os.path.join(sf, "lineitem.parquet"))
    out = QUERIES["heavy_hitters_twophase"].fn(spark, sf).collect()
    assert len(out) == 10
    by_rank = {r.rank: r for r in out}
    for rank in range(1, 11):
        r = by_rank[rank]
        assert (r.l_partkey, r.cnt, r.certified) == (rank, 41 - rank, True)


def test_cross_source_dups_counts_cross_pairs_only(spark, tmp_path):
    """Three identical docs (sources a, b, a) and one unrelated doc:
    identical texts share every LSH band, so candidates are all three
    pairs among them — but (1,3) is within source a and must not count.
    Expected: one (a, b) row with n_pairs = 2."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    text = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, text, "en", "a", len(text)),
        (2, text, "en", "b", len(text)),
        (3, text, "en", "a", len(text)),
        (4, "completely different words appear in this one", "en", "b", 46),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    out = QUERIES["cross_source_dups"].fn(spark, sf).collect()
    assert len(out) == 1
    assert (out[0].source_a, out[0].source_b, out[0].n_pairs) == ("a", "b", 2)


def test_source_dataset_card_hand_rollup(spark, tmp_path):
    """Source s1: two en docs (2+1 tokens) and one de doc (3 tokens),
    chars 3+1+5 → mean 3.0, top lang en at 2/3 = 666666 ppm. Source
    s2: a single es doc — a degenerate but well-defined card."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = [
        (1, "a b", "en", "s1", 3),
        (2, "c", "en", "s1", 1),
        (3, "x y z", "de", "s1", 5),
        (4, "q", "es", "s2", 1),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    out = {r.source: r for r in QUERIES["source_dataset_card"].fn(spark, sf).collect()}
    s1 = out["s1"]
    assert (s1.n_docs, s1.total_tokens, s1.mean_chars, s1.n_langs) == (3, 6, 3.0, 2)
    assert (s1.top_lang, s1.top_lang_share_ppm) == ("en", 666666)
    s2 = out["s2"]
    assert (s2.n_docs, s2.total_tokens, s2.n_langs, s2.top_lang) == (1, 1, 1, "es")
    assert s2.top_lang_share_ppm == 1_000_000


def test_join_explosion_audit_hand_counts(spark, tmp_path):
    """Two orders (3-line and 1-line): orderkey join emits 1·3 + 1·1 = 4
    rows (amplification exactly 1e6 ppm of the larger input); the
    partkey self-join emits 3² + 1² = 10 rows (2.5e6 ppm) — the
    quadratic blowup the audit exists to catch, computed without ever
    materializing a joined row."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (1, 10, "O", 1.0, dt.datetime(2024, 1, 1), "1-URGENT"),
            (2, 11, "O", 1.0, dt.datetime(2024, 1, 2), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))
    li = [(1, 7), (1, 7), (1, 7), (2, 8)]
    spark.createDataFrame(li, "l_orderkey long, l_partkey long").coalesce(
        1
    ).write.parquet(os.path.join(sf, "lineitem.parquet"))
    out = {r.join_name: r for r in QUERIES["join_explosion_audit"].fn(spark, sf).collect()}
    ol = out["orders_lineitem_orderkey"]
    assert (ol.n_left, ol.n_right, ol.join_rows, ol.amplification_ppm) == (2, 4, 4, 1_000_000)
    ll = out["lineitem_self_partkey"]
    assert (ll.n_left, ll.n_right, ll.join_rows, ll.amplification_ppm) == (4, 4, 10, 2_500_000)


def test_ivf_recall_curve_monotone_and_anchored(spark):
    """On the real sf0.001 embeddings: the curve is monotone
    non-decreasing in nprobe (candidate sets nest), capped at 5 hits,
    and its nprobe=1 point equals ann_recall_eval's single-probe
    recall@5 (the query's nearest cell IS its assigned cell — same
    min_by definition)."""
    from openaq_lcs_fetch_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    curve = {r.nprobe: r for r in QUERIES["ivf_recall_curve"].fn(spark, sf).collect()}
    assert set(curve) == {1, 2, 4}
    hits = [curve[np].n_hits for np in (1, 2, 4)]
    assert all(0 <= h <= 5 for h in hits)
    assert hits == sorted(hits)  # nested candidates: recall never drops
    single = QUERIES["ann_recall_eval"].fn(spark, sf).collect()[0]
    assert curve[1].n_hits == single.n_hits
    assert curve[1].recall_at_5 == single.recall_at_5


def test_ship_latency_percentiles_hand_decade(spark, tmp_path):
    """Two January orders with five lines each at latencies 1-5 and
    6-10 days (each relative to its own order date): the month's
    latency multiset is exactly 1..10, so the lower-selection
    percentiles are p50=5 (2c≥tot at c=5), p90=9, p99=10, max=10."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    sf = str(tmp_path)
    d1, d2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 10)
    spark.createDataFrame(
        [
            (1, 10, "O", 1.0, d1, "1-URGENT"),
            (2, 11, "O", 1.0, d2, "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))
    li = [(1, k, d1 + dt.timedelta(days=k)) for k in range(1, 6)] + [
        (2, k, d2 + dt.timedelta(days=k)) for k in range(6, 11)
    ]
    spark.createDataFrame(
        li, "l_orderkey long, l_partkey long, l_shipdate timestamp"
    ).coalesce(1).write.parquet(os.path.join(sf, "lineitem.parquet"))
    out = QUERIES["ship_latency_percentiles"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_lines, r.p50_days, r.p90_days, r.p99_days, r.max_days) == (
        10,
        5,
        9,
        10,
        10,
    )


def test_doc_length_histogram_log2_buckets(spark, tmp_path):
    """Token counts 0, 1, 3, 7, 8 land in bit-width buckets 0, 1, 2, 3,
    4 (bucket = length(bin(n)); 8 = '1000' opens the 4-bit bucket) —
    the power-of-two boundary a float log2 would wobble on."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = [
        (1, "", "en", "s", 0),
        (2, "a", "en", "s", 1),
        (3, "a b c", "en", "s", 5),
        (4, "a b c d e f g", "en", "s", 13),
        (5, "a b c d e f g h", "en", "s", 15),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    out = {r.len_bucket: r for r in QUERIES["doc_length_histogram"].fn(spark, sf).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert (out[0].n_docs, out[0].total_tokens) == (1, 0)
    for bucket, toks in ((1, 1), (2, 3), (3, 7), (4, 8)):
        assert (out[bucket].n_docs, out[bucket].total_tokens) == (1, toks)
        assert out[bucket].min_tokens == out[bucket].max_tokens == toks


def test_session_entry_conversion_hand_sessions(spark, tmp_path):
    """User 1 has two sessions split by a >30-min gap: session 1 enters
    with a view and converts; session 2 enters with a click and does
    not. User 2's single view-entry session does not convert. Expected:
    view entries 2 sessions / 1 conversion (500000 ppm), click entries
    1 / 0."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 6, 1, 9, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + 5 * m, 1, "purchase", 1.0, "{}"),
        (3, t0 + 40 * m, 1, "click", 1.0, "{}"),   # 35-min gap: new session
        (4, t0 + 41 * m, 1, "view", 1.0, "{}"),
        (5, t0, 2, "view", 1.0, "{}"),
        (6, t0 + 10 * m, 2, "click", 1.0, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))
    out = {r.entry_type: r for r in QUERIES["session_entry_conversion"].fn(spark, sf).collect()}
    assert set(out) == {"view", "click"}
    v = out["view"]
    assert (v.n_sessions, v.n_converted, v.conv_ppm) == (2, 1, 500_000)
    c = out["click"]
    assert (c.n_sessions, c.n_converted, c.conv_ppm) == (1, 0, 0)


def test_column_correlation_audit_hand_ndv(spark, tmp_path):
    """Four orders over 2 statuses × 2 priorities, but only 3 of the 4
    combinations occur → correlation 750000 ppm; status and month are
    perfectly aligned (each status in its own month) → NDV(pair)=2 of
    an independent 4, 500000 ppm."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    jan, feb = dt.datetime(2024, 1, 5), dt.datetime(2024, 2, 5)
    rows = [
        (1, 1, "O", 1.0, jan, "1-URGENT"),
        (2, 1, "O", 1.0, jan, "2-HIGH"),
        (3, 1, "F", 1.0, feb, "1-URGENT"),
        (4, 1, "F", 1.0, feb, "1-URGENT"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))
    out = {r.col_pair: r for r in QUERIES["column_correlation_audit"].fn(spark, sf).collect()}
    sp = out["status_priority"]
    assert (sp.ndv_a, sp.ndv_b, sp.ndv_pair, sp.indep_ndv) == (2, 2, 3, 4)
    assert sp.correlation_ppm == 750_000
    sm = out["status_month"]
    assert (sm.ndv_a, sm.ndv_b, sm.ndv_pair, sm.indep_ndv, sm.correlation_ppm) == (
        2, 2, 2, 4, 500_000,
    )


def test_minhash_error_audit_identical_docs_zero_error(spark, tmp_path):
    """Two identical docs: every band matches (candidate pair), the
    signature estimate is 16/16 = 1e6 ppm and the exact Jaccard is also
    1e6 ppm — the audit must report exactly zero error for the one
    pair where the sketch cannot be wrong."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, text, "en", "a", len(text)),
        (2, text, "en", "b", len(text)),
        (3, "totally unrelated words in here friend", "en", "a", 39),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    out = QUERIES["minhash_error_audit"].fn(spark, sf).collect()[0]
    assert (out.n_pairs, out.mean_abs_err_ppm, out.max_abs_err_ppm) == (1, 0, 0)


def test_boilerplate_ngrams_shared_header(spark, tmp_path):
    """Four docs in one source, two starting with the same 3-token
    header: 'home nav bar' has df=2 (4·2 > 4 → boilerplate), every
    other shingle df=1. Distinct shingles 9, occurrence mass 10, of
    which 2 rows are boilerplate → 200000 ppm."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = [
        (1, "home nav bar alpha beta", "en", "s", 23),
        (2, "home nav bar gamma delta", "en", "s", 24),
        (3, "unique words only here", "en", "s", 22),
        (4, "other totally different text", "en", "s", 28),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    out = QUERIES["boilerplate_ngrams"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.source, r.n_docs, r.distinct_shingles) == ("s", 4, 9)
    assert (r.boilerplate_shingles, r.boilerplate_mass_ppm) == (1, 200_000)


def test_token_freq_spectrum_hand_counts(spark, tmp_path):
    """Tokens a×3, b×1, c×1 → spectrum rows (freq 3: 1 token, mass 3)
    and (freq 1: 2 tokens, mass 2) — occurrences counted per instance,
    not per document."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = [(1, "a a b", "en", "s", 5), (2, "a c", "en", "s", 3)]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    out = {r.freq: r for r in QUERIES["token_freq_spectrum"].fn(spark, sf).collect()}
    assert set(out) == {1, 3}
    assert (out[3].n_tokens, out[3].token_mass) == (1, 3)
    assert (out[1].n_tokens, out[1].token_mass) == (2, 2)


def test_brand_rank_shift_two_brands_swap(spark, tmp_path):
    """Brand A leads the first half (300 vs 200 cents), B the second
    (400 vs 100): ranks swap, so A's rank_gain is −1 and B's +1. The
    midpoint day splits Jan 1 (half 0) from Jan 4 (half 1) using the
    data's own (lo+hi+1) div 2."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (1, 1, "O", 5.0, dt.datetime(2024, 1, 1), "1-URGENT"),
            (2, 1, "O", 5.0, dt.datetime(2024, 1, 4), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))
    spark.createDataFrame(
        [(10, "Brand#A"), (11, "Brand#B")],
        "p_partkey long, p_brand string",
    ).coalesce(1).write.parquet(os.path.join(sf, "part.parquet"))
    li = [(1, 10, 3.0), (1, 11, 2.0), (2, 10, 1.0), (2, 11, 4.0)]
    spark.createDataFrame(
        li, "l_orderkey long, l_partkey long, l_extendedprice double"
    ).coalesce(1).write.parquet(os.path.join(sf, "lineitem.parquet"))
    out = {r.brand: r for r in QUERIES["brand_rank_shift"].fn(spark, sf).collect()}
    a, b = out["Brand#A"], out["Brand#B"]
    assert (a.cents_h1, a.cents_h2, a.rank_h1, a.rank_h2, a.rank_gain) == (300, 100, 1, 2, -1)
    assert (b.cents_h1, b.cents_h2, b.rank_h1, b.rank_h2, b.rank_gain) == (200, 400, 2, 1, 1)


# ---------------------------------------------------------------------------
# round-9 adversarial fixtures for the round-8 operator families: each
# drives a degenerate input through BOTH engines and requires agreement
# (empty/NULL, never a crash or a one-engine answer).
# ---------------------------------------------------------------------------


def _duck_on(sf: str, *tables_needed: str):
    import duckdb

    con = duckdb.connect()
    for name in tables_needed:
        con.sql(
            f"CREATE VIEW {name} AS"
            f" SELECT * FROM '{sf}/{name}.parquet/*.parquet'"
        )
    return con


def test_kcore_nodes_peels_to_empty(spark, tmp_path):
    """A support-2 path 1–2–3 has max degree 2 < k=3: round one peels
    the leaves, round two peels the middle — the 3-core is EMPTY.
    Both the DataFrame fixpoint loop and the recursive-CTE oracle must
    agree on zero rows (the early-exit path, not an error)."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    baskets = {100: [1, 2], 101: [1, 2], 200: [2, 3], 201: [2, 3]}
    rows = [(ok, pk) for ok, parts in baskets.items() for pk in parts]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").coalesce(
        1
    ).write.parquet(os.path.join(sf, "lineitem.parquet"))

    assert QUERIES["kcore_nodes"].fn(spark, sf).count() == 0
    con = _duck_on(sf, "lineitem")
    assert con.sql(QUERIES["kcore_nodes"].oracle).fetchall() == []


def test_ngram_novelty_curve_single_batch(spark, tmp_path):
    """One document → hi == lo, span 1: the batch divisor's degenerate
    case. Everything lands in batch 0 and every gram is corpus-first
    (novelty exactly 1e6 ppm); both engines agree."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = [(7, "x y z w", "en", "s1", 7)]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))

    out = QUERIES["ngram_novelty_curve"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.batch, r.n_docs, r.n_gram_rows, r.novel_grams, r.novelty_ppm) == (
        0, 1, 2, 2, 1_000_000,
    )
    con = _duck_on(sf, "documents")
    orows = con.sql(QUERIES["ngram_novelty_curve"].oracle).fetchall()
    assert len(orows) == 1 and orows[0][0] == 0


def test_histogram_selectivity_audit_single_value(spark, tmp_path):
    """All o_totalprice identical → lo = hi, w = 1: every bucket
    degenerates to the single cell [0,0], every percentile offset is 0,
    so each predicate matches ALL rows and the interpolated estimate is
    exact (err_ppm 0). Pins the w=1 division paths on both engines."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = [
        (i, i, "O", 123.45, dt.datetime(2024, 1, 1), "1-URGENT")
        for i in range(6)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    out = QUERIES["histogram_selectivity_audit"].fn(spark, sf).collect()
    assert len(out) == 5
    for r in out:
        assert (r.threshold_cents, r.actual_rows, r.est_rows, r.err_ppm) == (
            12345, 6, 6, 0,
        )
    con = _duck_on(sf, "orders")
    orows = con.sql(QUERIES["histogram_selectivity_audit"].oracle).fetchall()
    assert len(orows) == 5
    for orow in orows:
        assert tuple(orow[1:]) == (12345, 6, 6, 0)


def test_cross_source_dups_zero_cross_pairs(spark, tmp_path):
    """LSH candidates exist (two identical docs) but both live in the
    SAME source, and the other source holds only an unrelated doc:
    the cross-source pair set is empty. Both engines must return zero
    rows — the empty-result hash-parity case."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    text = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, text, "en", "a", len(text)),
        (2, text, "en", "a", len(text)),
        (3, "completely different words appear in this one", "en", "b", 46),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))

    assert QUERIES["cross_source_dups"].fn(spark, sf).count() == 0
    con = _duck_on(sf, "documents")
    assert con.sql(QUERIES["cross_source_dups"].oracle).fetchall() == []


def test_encoding_cost_audit_null_event_type(spark, tmp_path):
    """A NULL event_type partition: with default null ordering Spark
    sorts NULLS FIRST and DuckDB NULLS LAST, which would stitch the
    seam chain in opposite type orders. Both sides now pin NULLS LAST
    explicitly — the full output must agree cell-for-cell."""
    import datetime as dt
    import math
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (1, t0, 1, "A", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 2, "A", 2.0, "{}"),
        (3, t0, 2, None, 2.0, "{}"),
        (4, t0 + dt.timedelta(minutes=1), 3, None, 3.0, "{}"),
        (5, t0, 3, "B", 3.0, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    sdf = QUERIES["encoding_cost_audit"].fn(spark, sf).toPandas()
    con = _duck_on(sf, "events")
    odf = con.sql(QUERIES["encoding_cost_audit"].oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns)

    def canon(df):
        df = df[sorted(df.columns)]
        return sorted(
            tuple(
                "NULL" if v is None or (isinstance(v, float) and math.isnan(v))
                else str(v)
                for v in row
            )
            for row in df.itertuples(index=False)
        )

    assert canon(sdf) == canon(odf)
    # NULLS LAST puts the NULL type partition AFTER B; user_id under
    # (type, us, id) order is A:1,2 | B:3 | NULL:2,3 = 1,2,3,2,3 → 5 runs
    by_col = {r.column_name: r for r in sdf.itertuples(index=False)}
    assert by_col["event_type"].n_runs == 3  # A, B, NULL each contiguous
    assert by_col["user_id"].n_runs == 5


def test_measures_csv_roundtrip_hand_values(spark, tmp_path):
    """Three events, one NaN (dropped): the CSV round-trip aggregate
    must carry exact cents and second-truncated ISO bounds."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 5, 1, 10, 0, 0, 250000)  # sub-second: truncated
    rows = [
        (1, t0, 7, "view", 1.25, "{}"),
        (2, t0 + dt.timedelta(hours=1), 7, "click", 2.50, "{}"),
        (3, t0 + dt.timedelta(hours=2), 8, "view", float("nan"), "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))
    r = QUERIES["measures_csv_roundtrip"].fn(spark, sf).collect()[0]
    assert (r.n_rows, r.n_sensors, r.sum_cents) == (2, 2, 375)
    assert r.first_iso == "2024-05-01T10:00:00Z"  # .25s truncated, not rounded
    assert r.last_iso == "2024-05-01T11:00:00Z"


def test_station_upsert_flow_hand_counts(spark, tmp_path):
    """Four suppliers, one negative balance: seed writes 4, the update
    writes 1 and elides 3, and the final store holds exactly one
    starred label."""
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = [
        (1, "Alpha", 1, 100.0),
        (2, "Beta", 2, -5.0),
        (3, "Gamma", 3, 0.0),
        (4, "Delta", 4, 7.5),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
    ).coalesce(1).write.parquet(os.path.join(sf, "supplier.parquet"))
    r = QUERIES["station_upsert_flow"].fn(spark, sf).collect()[0]
    assert (r.total, r.n_updated) == (4, 1)
    assert (r.seed_written, r.upd_written, r.upd_skipped) == (4, 1, 3)


def test_measures_json_roundtrip_hand_values(spark, tmp_path):
    """Two purchase days, two locations: the readback must show the
    4-payload-per-day shard grid, each location in exactly one shard
    per day (location rows sum to |nation| per day), and the cents
    reduced INSIDE the nested arrays — independent of DuckDB."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 5, 1, 10, 0, 0)
    d = dt.timedelta(days=1)
    rows = [
        (1, t0, 7, "purchase", 1.25, "{}"),
        (2, t0, 8, "purchase", 2.50, "{}"),
        (3, t0 + d, 7, "purchase", 4.00, "{}"),
        (4, t0 + d, 9, "view", 99.0, "{}"),          # wrong type: excluded
        (5, t0 + d, 9, "purchase", float("nan"), "{}"),  # NaN: excluded
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))
    spark.createDataFrame(
        [(0, "ALMA", 0, "x"), (1, "BRIO", 1, "y")],
        "n_nationkey long, n_name string, n_regionkey long, n_comment string",
    ).coalesce(1).write.parquet(os.path.join(sf, "nation.parquet"))

    got = {
        r.day: r
        for r in QUERIES["measures_json_roundtrip"].fn(spark, sf).collect()
    }
    assert set(got) == {"2024-05-01", "2024-05-02"}
    for day in got:
        assert got[day].n_payloads == 4           # full 4-shard grid
        assert got[day].n_location_rows == 2      # each location exactly once
    assert got["2024-05-01"].n_measures == 2
    assert got["2024-05-01"].sum_cents == 375
    assert got["2024-05-02"].n_measures == 1
    assert got["2024-05-02"].sum_cents == 400


def test_run_log_roundtrip_hand_counters(spark, tmp_path):
    """Two sources with known counters: the log table readback must
    replay n_measures and the from/to bounds per source exactly."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 5, 1, 10, 0, 0)
    h = dt.timedelta(hours=1)
    rows = [
        (1, t0, 7, "view", 1.0, "{}"),
        (2, t0 + h, 7, "view", 2.0, "{}"),
        (3, t0 + 2 * h, 8, "view", float("nan"), "{}"),  # NaN: dropped
        (4, t0 + 3 * h, 8, "click", 3.0, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    got = {
        r.source: r for r in QUERIES["run_log_roundtrip"].fn(spark, sf).collect()
    }
    assert set(got) == {"view", "click"}
    assert all(r.status == "success" for r in got.values())
    assert (got["view"].n_measures, got["click"].n_measures) == (2, 1)
    assert got["view"].from_ts == t0 and got["view"].to_ts == t0 + h
    assert got["click"].from_ts == got["click"].to_ts == t0 + 3 * h


def test_checkpoint_roundtrip_hand_marks(spark, tmp_path):
    """Even ids end at 12:00; two odd rows land strictly after → the
    incremental scan sees exactly those two and the final mark is the
    global max."""
    import datetime as dt
    import os

    from openaq_lcs_fetch_spark.plans import QUERIES

    t0 = dt.datetime(2024, 5, 1, 10, 0, 0)
    h = dt.timedelta(hours=1)
    rows = [
        (2, t0, 1, "view", 1.0, "{}"),
        (4, t0 + 2 * h, 1, "view", 1.0, "{}"),   # even max = 12:00
        (5, t0 + h, 2, "view", 1.0, "{}"),       # before hwm: not incremental
        (7, t0 + 3 * h, 2, "view", 1.0, "{}"),
        (9, t0 + 4 * h, 3, "view", 1.0, "{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))
    r = QUERIES["checkpoint_roundtrip"].fn(spark, sf).collect()[0]
    assert r.n_incremental == 2
    assert r.hwm_first == t0 + 2 * h
    assert r.hwm_final == t0 + 4 * h


def test_provider_pipeline_flow_hand_values(spark):
    """Absolute values computed BY HAND (not vs DuckDB): the June row
    parses as EDT (UTC-4) and the December row as EST (UTC-5), both
    minus 15 min; ppb scales to ppm; the comma-grouped value coerces;
    sentinel rows keep NULL measures with the token in the flag."""
    from openaq_lcs_fetch_spark.plans import QUERIES

    rows = {
        (r.sensor_id, r.ts_iso): r
        for r in QUERIES["provider_pipeline_flow"].fn(spark, "/unused").collect()
    }
    assert len(rows) == 7 and all(r.n_stations == 2 for r in rows.values())
    # 2024-06-01 10_00 America/New_York = 14:00 UTC (EDT) − 15 min
    r = rows[("cmu_fixture-st1-co", "2024-06-01T13:45:00Z")]
    assert r.measure == pytest.approx(0.4) and r.sentinel is None
    # comma-grouped 1,234.5 ppb → 1.2345 ppm
    r = rows[("cmu_fixture-st1-co", "2024-06-01T14:45:00Z")]
    assert r.measure == pytest.approx(1.2345)
    # 2024-12-01 09_30 America/New_York = 14:30 UTC (EST) − 15 min
    r = rows[("cmu_fixture-st2-co", "2024-12-01T14:15:00Z")]
    assert r.measure == pytest.approx(0.00825)
    # sentinel row: NULL measure, token preserved
    r = rows[("cmu_fixture-st1-no2", "2024-06-01T13:45:00Z")]
    assert r.measure is None and r.sentinel == "NaN"


def test_provider_keyed_map_flow_hand_values(spark):
    """By hand: last_sets=2 + drop_latest keeps exactly the middle
    (11:00) reading set of dev1; dev2's only set drops but dev2 still
    registers (station-before-slicing)."""
    from openaq_lcs_fetch_spark.plans import QUERIES

    got = QUERIES["provider_keyed_map_flow"].fn(spark, "/unused").collect()
    assert len(got) == 3 and all(r.n_stations == 2 for r in got)
    by_id = {r.sensor_id: r for r in got}
    assert set(by_id) == {
        "keyed_fixture-dev1-pm25",
        "keyed_fixture-dev1-co",
        "keyed_fixture-dev1-temperature",
    }
    assert all(r.ts_iso == "2024-06-01T11:00:00Z" for r in got)
    assert by_id["keyed_fixture-dev1-pm25"].measure == pytest.approx(16.5)
    assert by_id["keyed_fixture-dev1-co"].measure == pytest.approx(0.25)
    t = by_id["keyed_fixture-dev1-temperature"]
    assert t.measure is None and t.sentinel == "inv"


def test_provider_enriched_flow_hand_values(spark):
    """By hand: exactly one distinct missing datasource (dsX), the QC
    code rides as a flag with the value untouched, empty QC → no flag."""
    from openaq_lcs_fetch_spark.plans import QUERIES

    got = QUERIES["provider_enriched_flow"].fn(spark, "/unused").collect()
    assert len(got) == 3
    assert all(r.n_misses == 1 and r.n_stations == 2 for r in got)
    by_id = {r.sensor_id: r for r in got}
    assert by_id["Alpha Site-ds1-no2"].qc == "flagged"
    assert by_id["Alpha Site-ds1-no2"].measure == pytest.approx(0.03)
    assert by_id["Alpha Site-ds1-pm25"].qc is None  # empty string → no flag
    assert by_id["Beta Site-ds2-pm25"].measure == pytest.approx(9.0)


def test_provider_zip_arrays_flow_hand_values(spark):
    """By hand: zip decode alignment (a misaligned zip would swap
    values between fields), pp100ml/pa scales, non-numeric and null
    cells drop, 'f' unit passes through unscaled."""
    from openaq_lcs_fetch_spark.plans import QUERIES

    got = QUERIES["provider_zip_arrays_flow"].fn(spark, "/unused").collect()
    assert len(got) == 10 and all(r.n_stations == 2 for r in got)
    by_key = {(r.sensor_id, r.ts_iso): r for r in got}
    # rec1 @ unix 1717243200 = 2024-06-01T12:00:00Z
    r = by_key[("zip_fixture-pa1-um003", "2024-06-01T12:00:00Z")]
    assert r.measure == pytest.approx(2.5)      # 250 pp100ml → 2.5 /cm³
    r = by_key[("zip_fixture-pa1-pressure", "2024-06-01T12:00:00Z")]
    assert r.measure == pytest.approx(1013.25)  # Pa → hPa
    assert (r.longitude, r.latitude) == (-75.5, 40.5)
    r = by_key[("zip_fixture-pa2-temperature", "2024-06-01T13:00:00Z")]
    assert r.measure == pytest.approx(68.0)     # 'f': no conversion
    # rec3's pm25 'abc' and um003 null both dropped
    assert ("zip_fixture-pa1-pm25", "2024-06-01T14:00:00Z") not in by_key
    assert ("zip_fixture-pa1-um003", "2024-06-01T14:00:00Z") not in by_key


def test_provider_mobile_flow_hand_values(spark):
    """By hand: the paginated overlap duplicates collapse, the time
    bounds keep exactly seqs 2..21 (20 rows), and the no-future guard
    is inclusive at 'now'."""
    from openaq_lcs_fetch_spark.plans import QUERIES

    got = QUERIES["provider_mobile_flow"].fn(spark, "/unused").collect()
    assert len(got) == 20 and all(r.n_stations == 3 for r in got)
    by_ts = {r.ts_iso: r for r in got}
    assert "2023-11-14T22:13:50Z" not in by_ts   # seq 1: before start
    assert "2023-11-14T22:24:20Z" not in by_ts   # seq 22: after 'now'
    # seq 2: sess-2, pm25, value 8 + (26 % 40)/4 = 14.5
    r = by_ts["2023-11-14T22:14:20Z"]
    assert r.sensor_id == "mobile_fixture-sess-2-pm25"
    assert r.measure == pytest.approx(14.5)
    assert (r.latitude, r.longitude) == (40.02, -80.02)
    # seq 21 (inclusive 'now' bound): sess-0, rh, 8 + (273 % 40)/4 = 16.25
    r = by_ts["2023-11-14T22:23:50Z"]
    assert r.sensor_id == "mobile_fixture-sess-0-rh"
    assert r.measure == pytest.approx(16.25)


def test_run_source_roundtrip_hand_values(spark):
    """The §3.1 composition proof, checked against values computed BY
    HAND (independent of both engines): run 1 ingests 6 long rows
    (5 values + 1 NaN flag) from 2 stations; 2024-06-01 10_00
    America/New_York = 14:00 UTC (EDT) − 15 min = 13:45, so the
    high-water mark is the 11_00 row at 14:45 UTC; run 2 is fully
    bounded away by the checkpoint (0 measures, 0 stations written,
    2 elided, mark unchanged); the CSV store holds 5 rows totalling
    400000 + 12000 + 14000 + 8250 + 7000 = 441250 micro-units."""
    import datetime as dt

    from openaq_lcs_fetch_spark.plans import QUERIES

    r = QUERIES["run_source_roundtrip"].fn(spark, "/unused").collect()[0]
    assert r.r1_measures == 6
    assert r.r1_stations == 2 and r.r1_written == 2
    assert r.hwm1 == dt.datetime(2024, 6, 1, 14, 45)
    assert r.r2_measures == 0
    assert r.r2_written == 0 and r.r2_skipped == 2
    assert r.hwm2 == r.hwm1  # advance never regresses on an empty batch
    assert r.n_success == 2
    assert r.n_csv_rows == 5
    assert r.sum_micro == 441250


def test_scheduler_tick_roundtrip_hand_values(spark):
    """The scheduler-tick composition against values computed BY HAND:
    tick at minute 61 runs the two minute sources only (A succeeds, the
    missing-feed C errors, isolated); tick at minute 120 adds the hour
    source B; the inactive D never runs. A is incremental, so tick 2
    re-ingests nothing: A's sink holds exactly its 2 fixture values
    (0.4 + 0.012 ppm = 412_000 micro) and B's its one (8_250 micro)."""
    from openaq_lcs_fetch_spark.plans import QUERIES

    r = QUERIES["scheduler_tick_roundtrip"].fn(spark, "/unused").collect()[0]
    assert r.tick1_due == 2 and r.tick2_due == 3
    assert r.n_success == 3 and r.n_error == 2
    assert r.a_rows == 2 and r.a_sum_micro == 412_000
    assert r.b_rows == 1 and r.b_sum_micro == 8_250


def test_dry_run_preview_hand_values(spark):
    """K6 dry-run by hand: the preview reports the 2 fixture measures
    and 1 station WITHOUT creating the measures/station/runlog dirs or
    a checkpoint mark; the real run then delivers exactly the promised
    counts (0.4 + 0.012 ppm = 412_000 micro-units)."""
    from openaq_lcs_fetch_spark.plans import QUERIES

    r = QUERIES["dry_run_preview"].fn(spark, "/unused").collect()[0]
    assert r.dry_status == "dry-run"
    assert r.dry_measures == 2 and r.dry_stations == 1
    assert r.wrote_nothing is True
    assert r.real_measures == 2
    assert r.csv_rows == 2 and r.sum_micro == 412_000


def test_backfill_flow_hand_values(spark):
    """The S3 backfill proof by hand: 7 files survive the since bound
    (06-04..06-10), 3 hourly rows each = 21; value 10+h+d summed over
    h∈{0,1,2}, d∈{4..10} → 3·(10·7 + Σd) + 7·Σh = 3·119 + 21 = 378.0 →
    37_800 cents; greatest listing name becomes the next checkpoint."""
    from openaq_lcs_fetch_spark.plans import QUERIES

    r = QUERIES["backfill_flow"].fn(spark, "/unused").collect()[0]
    assert r.n_rows == 21 and r.n_days == 7
    assert r.sum_cents == 37_800
    assert r.first_ts == "2024-06-04T00:00:00"
    assert r.last_ts == "2024-06-10T02:00:00"
    assert r.greatest == "readings-2024-06-10"
