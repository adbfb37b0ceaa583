"""CLI + engine facade: the reference's local entry path end-to-end."""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_fixture(tmp_path):
    lines = [
        {"device_id": "d1", "ts": "2024-06-01T00:00:00", "lat": 1.0, "lon": 2.0,
         "readings": {"pm25": "15.0", "temp": "21.0"}},
        {"device_id": "d2", "ts": "2024-06-01T01:00:00", "lat": 3.0, "lon": 4.0,
         "readings": {"pm25": "12.0"}},
    ]
    p = tmp_path / "feed.jsonl"
    p.write_text("\n".join(json.dumps(x) for x in lines))
    return str(p)


def _run_cli(args):
    return subprocess.run(
        [sys.executable, "-m", "openaq_lcs_fetch_spark", *args],
        capture_output=True, text=True, cwd=REPO, timeout=300,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )


def test_cli_end_to_end(tmp_path):
    feed = _write_fixture(tmp_path)
    cfg = {"schema": "v1", "provider": "keyed_map", "frequency": "hour",
           "active": True, "meta": {"path": feed}}
    cfg_path = tmp_path / "sources.json"
    cfg_path.write_text(json.dumps([cfg]))
    out = tmp_path / "out"

    res = _run_cli(["--config", str(cfg_path), "--source", "keyed_map", "--out", str(out)])
    assert res.returncode == 0, res.stderr[-2000:]
    log = json.loads(res.stdout.strip().splitlines()[-1])
    assert log["status"] == "fetcher/success"
    assert log["n_measures"] == 3
    assert log["stations"]["written"] == 2
    assert log["checkpoint"]["high_water_mark"].startswith("2024-06-01T01")
    assert glob.glob(f"{out}/measures/keyed_map/*.csv.gz")
    assert os.path.exists(f"{out}/meta/keyed_map.json")


def test_cli_dry_run_and_missing_source(tmp_path):
    feed = _write_fixture(tmp_path)
    cfg_path = tmp_path / "sources.json"
    cfg_path.write_text(json.dumps({"schema": "v1", "provider": "keyed_map",
                                    "frequency": "hour", "active": True,
                                    "meta": {"path": feed}}))
    out = tmp_path / "out"
    res = _run_cli(["--config", str(cfg_path), "--dry-run", "--out", str(out)])
    assert res.returncode == 0, res.stderr[-2000:]
    log = json.loads(res.stdout.strip().splitlines()[-1])
    assert log["status"] == "dry-run"
    assert not os.path.exists(f"{out}/measures")  # sinks skipped

    res2 = _run_cli(["--config", str(cfg_path), "--source", "nope", "--out", str(out)])
    assert res2.returncode == 2
    assert "no source named" in res2.stderr


def test_engine_sql_facade(spark, sf_dir):
    from openaq_lcs_fetch_spark.engine import Engine

    eng = Engine(spark)
    n = eng.sql("SELECT COUNT(*) AS n FROM lineitem", sf_dir).first()["n"]
    assert n > 0


def test_cli_package_configs_with_data_root(tmp_path):
    """The shipped source_configs are actually runnable: point
    --data-root at a directory holding the smartsense feed."""
    feed_dir = tmp_path / "data" / "smartsense"
    feed_dir.mkdir(parents=True)
    (feed_dir / "feed.jsonl").write_text(json.dumps({
        "device_id": "sm1", "ts": "2024-06-01T00:00:00", "lat": 1.0, "lon": 2.0,
        "readings": {"PM2.5": "11.0"}}))  # smartsense.js:21 key spelling
    cfg_dir = os.path.join(REPO, "openaq_lcs_fetch_spark", "source_configs")
    out = tmp_path / "out"
    res = _run_cli(["--config", cfg_dir, "--source", "smartsense",
                    "--out", str(out), "--data-root", str(tmp_path / "data")])
    assert res.returncode == 0, res.stderr[-2000:]
    log = json.loads(res.stdout.strip().splitlines()[-1])
    assert log["status"] == "fetcher/success"
    assert log["source"] == "smartsense"
    # sink layout keyed by source name, like {STACK}/measures/{provider}/
    assert glob.glob(f"{out}/measures/smartsense/*.csv.gz")
    assert os.path.exists(f"{out}/meta/smartsense.json")


def test_cli_inactive_source_errors(tmp_path):
    cfg_dir = os.path.join(REPO, "openaq_lcs_fetch_spark", "source_configs")
    res = _run_cli(["--config", cfg_dir, "--source", "cmu", "--out", str(tmp_path / "o")])
    assert res.returncode == 2
    assert "inactive" in res.stderr


def test_rotation_audit_accounting(tmp_path):
    """The staleness accountant: green = hash+schema (or rows-only when
    no hash key), newest round wins, red-last-window queries outrank
    stale-green ones in the suggested window, --max-age gates."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import rotation_audit as RA

    def write(rnd, rows):
        with open(tmp_path / f"CORRECTNESS_r{rnd:02d}.json", "w") as fh:
            json.dump(rows, fh)

    g = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    bad = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
    rows_only = {"rows_match": True, "err": None}
    write(1, {"a": g, "b": g})
    write(2, {"b": bad, "c": rows_only, "d": {"err": "boom", "rows_match": None}})

    last_green, last_seen, latest = RA.load_history(str(tmp_path))
    assert latest == 2
    assert last_green == {"a": 1, "b": 1, "c": 2}  # b's newest is red
    assert last_seen == {"a": 1, "b": 2, "c": 2, "d": 2}
    assert RA._green(g) and RA._green(rows_only)
    assert not RA._green(bad)
    assert not RA._green({"err": "boom", "rows_match": None})


def test_bench_history_round_inference(tmp_path, monkeypatch):
    """bench._history_path names the file after 1 + the max committed
    BENCH_r{N}.json round (the driver records round N's bench into a
    repo that already holds rounds 1..N-1), creating docs/BENCH_HISTORY
    on first use; with no BENCH files at all it starts at r01."""
    import importlib
    import os
    import sys

    sys.path.insert(0, "/root/repo")
    bench = importlib.import_module("bench")

    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: os.path.join(str(tmp_path), "bench.py")
    )
    assert bench._history_path().endswith(
        os.path.join("docs", "BENCH_HISTORY", "r01.json")
    )
    (tmp_path / "BENCH_r02.json").write_text("{}")
    (tmp_path / "BENCH_r10.json").write_text("{}")
    (tmp_path / "BENCH_r9.json").write_text("{}")  # unpadded also counts
    assert bench._history_path().endswith(os.path.join("BENCH_HISTORY", "r11.json"))
    assert os.path.isdir(tmp_path / "docs" / "BENCH_HISTORY")


def test_bench_compare_denoise(tmp_path, capsys):
    """bench_compare: per-run load levels from the fleet calibration
    (mean of start/end vs quietest sample), family-sensitive expected
    factors, flags only on residual movement, and the truncated
    driver-record loader."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import bench_compare as BC

    sens = BC.DEFAULT_SENSITIVITY
    # old run: quiet (fleet 2.0/2.0); new run: loaded (fleet 4.0/4.4)
    # → idle=2.0, L_old=0, L_new=(4.2/2.0-1)/1.165
    old = {
        "queries": {"q_plain": 1.0, "streaming_x": 2.0, "q_reg": 1.0},
        "calibration": {"fleet_start": 2.0, "fleet_end": 2.0},
    }
    l_new = (4.2 / 2.0 - 1.0) / (sens["fleet"] - 1.0)
    exp_fleet = 1.0 + l_new * (sens["fleet"] - 1.0)      # = 2.1
    exp_stream = 1.0 + l_new * (sens["streaming"] - 1.0)
    assert abs(exp_fleet - 2.1) < 1e-9
    assert exp_stream > exp_fleet  # streaming allowed more movement
    new = {
        "queries": {
            "q_plain": 1.0 * exp_fleet,        # exactly load-attributable
            "streaming_x": 2.0 * exp_stream,   # ditto, bigger raw ratio
            "q_reg": 1.0 * exp_fleet * 2.0,    # genuine 2x residual
        },
        "calibration": {"fleet_start": 4.0, "fleet_end": 4.4},
    }
    po, pn = str(tmp_path / "o.json"), str(tmp_path / "n.json")
    with open(po, "w") as fh:
        json.dump(old, fh)
    with open(pn, "w") as fh:
        json.dump(new, fh)

    argv = sys.argv
    try:
        sys.argv = ["bench_compare.py", po, pn, "--flag-ratio", "1.3"]
        rc = BC.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert rc == 1  # q_reg flagged
    assert "FLAG q_reg" in out
    assert "FLAG q_plain" not in out and "FLAG streaming_x" not in out

    # truncated driver-record shape: tail cut mid-queries
    full = json.dumps(new)
    trunc = {"n": 9, "parsed": None, "tail": full[len(full) // 3:]}
    pt = str(tmp_path / "t.json")
    with open(pt, "w") as fh:
        json.dump(trunc, fh)
    rec = BC.load_record(pt)
    assert rec["calibration"]["fleet_start"] == 4.0
    assert "q_reg" in rec["queries"] or "streaming_x" in rec["queries"]

def test_bench_compare_guards(tmp_path, capsys):
    """The round-11 anti-false-flag guards: (a) quiet-ward expected
    factors are damped halfway toward 1, so a flat raw wall after a
    loaded OLD run is NOT a regression; (b) the raw noise floor — only
    queries whose RAW ratio also regressed are flaggable; (c) the
    min-wall floor drops sub-half-second jitter; (d) the truncated-tail
    loader refuses record-level keys spliced in as query walls."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import bench_compare as BC

    sens = BC.DEFAULT_SENSITIVITY
    s = sens["fleet"]
    # OLD run loaded (fleet 4.0), NEW run quiet (fleet 2.0): idle=2.0,
    # L_old=1/(s-1) exactly, L_new=0 → undamped expected = 1/2, damped
    # (default 0.5) = 0.75. The r09→r10 false-flag shape.
    old = {
        "queries": {"q_flat": 1.0, "q_real": 1.0, "q_tiny": 0.3},
        "calibration": {"fleet_start": 4.0, "fleet_end": 4.0},
    }
    new = {
        "queries": {
            # flat raw wall: undamped model would read 1.0/0.5 = 2.0x
            # adjusted AND raw 1.0 is under the floor — never flagged
            "q_flat": 1.0,
            # genuine regression: raw 1.6 > floor, adjusted 1.6/0.75 ≈
            # 2.13 > 1.3 — flagged even under damping
            "q_real": 1.6,
            # same shape but a 0.3 s wall: dropped by --min-wall
            "q_tiny": 0.48,
        },
        "calibration": {"fleet_start": 2.0, "fleet_end": 2.0},
    }
    po, pn = str(tmp_path / "o.json"), str(tmp_path / "n.json")
    with open(po, "w") as fh:
        json.dump(old, fh)
    with open(pn, "w") as fh:
        json.dump(new, fh)

    argv = sys.argv
    try:
        sys.argv = ["bench_compare.py", po, pn]
        rc = BC.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert rc == 1
    assert "FLAG q_real" in out
    assert "FLAG q_flat" not in out and "FLAG q_tiny" not in out

    # undamped (--gain-damp 1.0) reproduces the old false flag on the
    # flat query ONLY once the raw floor is also disabled — pinning
    # that both guards are live
    try:
        sys.argv = ["bench_compare.py", po, pn,
                    "--gain-damp", "1.0", "--raw-floor", "0.0"]
        rc2 = BC.main()
    finally:
        sys.argv = argv
    out2 = capsys.readouterr().out
    assert rc2 == 1 and "FLAG q_flat" in out2

    # (d) truncation cut PAST the queries object: the surviving tail
    # holds only record-level keys — loader must fail, not compare
    # calibration values as walls
    full = json.dumps(new)
    cut = full.find('"calibration"')
    trunc = {"tail": full[cut - 2:]}  # starts at ', "calibration"...'
    pt = str(tmp_path / "t.json")
    with open(pt, "w") as fh:
        json.dump(trunc, fh)
    import pytest
    with pytest.raises(SystemExit, match="no per-query walls"):
        BC.load_record(pt)


def test_bench_compare_rerun_list(tmp_path, capsys):
    """--rerun-list prints ONLY the flagged query names, one per line
    (machine-consumable: feeds check_all --only for a targeted quiet
    re-run); exit code unchanged; empty output + rc 0 when nothing is
    flagged."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import bench_compare as BC

    old = {
        "queries": {"q_reg": 1.0, "q_flat": 1.0, "streaming_reg": 1.0},
        "calibration": {"fleet_start": 2.0, "fleet_end": 2.0},
    }
    new = {
        "queries": {"q_reg": 2.0, "q_flat": 1.0, "streaming_reg": 2.0},
        "calibration": {"fleet_start": 2.0, "fleet_end": 2.0},
    }
    po, pn = str(tmp_path / "o.json"), str(tmp_path / "n.json")
    with open(po, "w") as fh:
        json.dump(old, fh)
    with open(pn, "w") as fh:
        json.dump(new, fh)

    argv = sys.argv
    try:
        sys.argv = ["bench_compare.py", po, pn, "--rerun-list"]
        rc = BC.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    # bare names only, severity order (adjusted ratio desc), no
    # analysis lines — the whole contract a shell substitution needs
    assert rc == 1
    assert sorted(out.split()) == ["q_reg", "streaming_reg"]
    assert "FLAG" not in out and "calibration" not in out

    # nothing flagged → empty stdout, rc 0
    try:
        sys.argv = ["bench_compare.py", po, po, "--rerun-list"]
        rc0 = BC.main()
    finally:
        sys.argv = argv
    assert rc0 == 0 and capsys.readouterr().out == ""
