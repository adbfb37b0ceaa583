"""Physical-layout + skew levers (the 100 TB story, locally verifiable)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from openaq_lcs_fetch_spark.operators.skew import salted_agg, salted_join
from openaq_lcs_fetch_spark.storage import (
    bucketed_join,
    plan_has_exchange,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # (managed tables land in the session's default warehouse dir —
    # spark.sql.warehouse.dir is static config; dropped at the end)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    # clear table metadata AND any orphaned location from a failed run
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for tbl in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"{warehouse}/{tbl}", ignore_errors=True)
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        # co-located buckets: sort-merge join with no shuffle on either side
        assert not plan_has_exchange(joined)
        assert joined.count() == lineitem.count()
        # contrast: the plain path-based join shuffles both sides
        plain = orders.join(lineitem, "o_orderkey")
        assert plan_has_exchange(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_agg_matches_plain(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    salted = salted_agg(e, ["event_type"], {"value": "sum", "event_id": "count"})
    plain = e.groupBy("event_type").agg(
        F.sum("value").alias("sum_value"), F.count("event_id").alias("count_event_id")
    )
    s = {r.event_type: (r.sum_value, r.count_event_id) for r in salted.collect()}
    p = {r.event_type: (r.sum_value, r.count_event_id) for r in plain.collect()}
    assert s.keys() == p.keys()
    for k in p:
        assert s[k][0] == pytest.approx(p[k][0])
        assert s[k][1] == p[k][1]


def test_salted_ops_reject_salt_column_collision(spark):
    """A pre-existing '_salt' column would be silently shadowed (and
    dropped on the way out) — both salted ops refuse instead."""
    df = spark.range(4).selectExpr("id AS k", "id AS _salt")
    with pytest.raises(ValueError, match="_salt"):
        salted_agg(df, ["k"], {"_salt": "sum"})
    clean = spark.range(4).selectExpr("id AS k", "id AS v")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(df, clean, "k")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(clean, df, "k")


def test_salted_join_matches_plain(spark):
    facts = spark.createDataFrame(
        [(i % 3, f"v{i}") for i in range(100)], "k int, v string"
    )
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, name string")
    salted = salted_join(facts, dim, "k", salt_buckets=4)
    plain = facts.join(dim, "k")
    assert salted.count() == plain.count() == 100
    s = sorted((r.k, r.v, r.name) for r in salted.collect())
    p = sorted((r.k, r.v, r.name) for r in plain.collect())
    assert s == p


def test_salted_agg_rejects_non_reaggregable(spark):
    e = spark.createDataFrame([(1, 2.0)], "k int, v double")
    with pytest.raises(ValueError, match="non-re-aggregable"):
        salted_agg(e, ["k"], {"v": "avg"})


def test_zorder_write_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """write_zordered's per-file envelopes are bounded in EVERY clustered
    dimension; a time-sorted layout leaves the user dimension unpruned
    (full span in ~every file). This is the parquet min/max data-skipping
    argument measured, not asserted from prose."""
    from pyspark.sql import functions as F

    from openaq_lcs_fetch_spark import tables
    from openaq_lcs_fetch_spark.functions.timestamps import micros
    from openaq_lcs_fetch_spark.storage import write_zordered, zorder_column

    e = tables.load(spark, sf_dir, "events").select("user_id", "ts")
    h = (
        (micros(F.col("ts")) - micros(F.lit("2024-01-01").cast("timestamp")))
        / F.lit(3_600_000_000)
    ).cast("long")
    df = e.select("user_id", h.alias("h"))
    n_files = 16

    zpath, tpath = str(tmp_path / "zorder"), str(tmp_path / "timesort")
    z = zorder_column(
        [
            (F.col("user_id") * 5).bitwiseAND(F.lit(65535)),
            F.col("h").bitwiseAND(F.lit(65535)),
        ],
        bits=16,
    )
    write_zordered(df, zpath, z, n_files=n_files)
    df.repartitionByRange(n_files, F.col("h").asc()).write.mode(
        "overwrite"
    ).parquet(tpath)

    def mean_user_span(path: str) -> float:
        per_file = (
            spark.read.parquet(path)
            .withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg((F.max("user_id") - F.min("user_id")).alias("span"))
        )
        row = per_file.agg(F.avg("span").alias("m")).collect()[0]
        return float(row["m"])

    z_span, t_span = mean_user_span(zpath), mean_user_span(tpath)
    # time-sorted files see ~the full user range; z-ordered files must
    # cut the mean span at least in half
    assert z_span < 0.5 * t_span, (z_span, t_span)

    # row fidelity: clustering is a layout change only
    assert spark.read.parquet(zpath).count() == df.count()
