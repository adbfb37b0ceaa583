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
