"""Scheduler fan-out + engine error path + approx-sketch bounds."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from openaq_lcs_fetch_spark.engine import Engine
from openaq_lcs_fetch_spark.scheduler import (
    by_frequency,
    due_sources,
    load_source_configs,
    run_tick,
)


def test_load_and_group_configs():
    configs = load_source_configs()
    assert len(configs) == 16
    groups = by_frequency(configs)
    # inactive sources (cmu, purpleair) excluded from their groups
    names = {c["meta"]["source_name"] for g in groups.values() for c in g}
    assert "cmu" not in names and "purpleair" not in names
    assert len(groups["minute"]) >= 2 and len(groups["hour"]) >= 8


def test_due_sources_cadence():
    groups = {
        "minute": [{"p": "m"}],
        "hour": [{"p": "h"}],
        "day": [{"p": "d"}],
    }
    assert len(due_sources(groups, 37)) == 1      # minute only
    assert len(due_sources(groups, 120)) == 2     # minute + hour
    assert len(due_sources(groups, 0)) == 3       # all three


def test_run_tick_isolates_failures(spark, tmp_path):
    feed = tmp_path / "ok.jsonl"
    feed.write_text(json.dumps({
        "device_id": "d1", "ts": "2024-06-01T00:00:00", "lat": 1.0, "lon": 2.0,
        "readings": {"pm25": "15.0"}}))
    good = {"schema": "v1", "provider": "keyed_map", "frequency": "minute",
            "active": True, "meta": {"path": str(feed)}}
    bad = {"schema": "v1", "provider": "keyed_map", "frequency": "minute",
           "active": True, "meta": {"path": str(tmp_path / "missing.jsonl")}}
    engine = Engine(spark)
    logs = run_tick(engine, by_frequency([bad, good]), 5, str(tmp_path / "out"))
    statuses = sorted(log["status"] for log in logs)
    assert statuses == ["fetcher/error", "fetcher/success"]
    # the failure was logged to the runlog table too (K5 error path)
    runlog = spark.read.parquet(str(tmp_path / "out" / "runlog"))
    assert {r.status for r in runlog.collect()} == {"fetcher/error", "fetcher/success"}


def test_approx_count_distinct_bounds(spark, sf_dir):
    """A4 scale variant: HLL estimate within 5% of exact."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    row = e.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).first()
    assert row["approx"] == pytest.approx(row["exact"], rel=0.05)


def test_incremental_run_emits_nothing_twice(spark, tmp_path):
    """T2 end-to-end: second run over the same feed is bounded by the
    stored high-water mark and emits zero measures."""
    feed = tmp_path / "feed.jsonl"
    feed.write_text(json.dumps({
        "device_id": "d1", "ts": "2024-06-01T00:00:00", "lat": 1.0, "lon": 2.0,
        "readings": {"pm25": "15.0"}}))
    cfg = {"schema": "v1", "provider": "keyed_map", "frequency": "hour",
           "active": True, "meta": {"path": str(feed), "incremental": "true"}}
    engine = Engine(spark)
    out = str(tmp_path / "out")
    r1 = engine.run_source(cfg, out)
    assert r1["n_measures"] == 1
    r2 = engine.run_source(cfg, out)
    assert r2["n_measures"] == 0  # everything before the watermark
    assert r2["checkpoint"]["high_water_mark"] == r1["checkpoint"]["high_water_mark"]
    # new data past the watermark flows through a third run
    feed.write_text(json.dumps({
        "device_id": "d1", "ts": "2024-06-01T02:00:00", "lat": 1.0, "lon": 2.0,
        "readings": {"pm25": "16.0"}}))
    r3 = engine.run_source(cfg, out)
    assert r3["n_measures"] == 1
    assert r3["checkpoint"]["high_water_mark"].startswith("2024-06-01T02")
