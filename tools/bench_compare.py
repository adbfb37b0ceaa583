#!/usr/bin/env python
"""Cross-round bench comparison with mechanical load de-noising.

    python tools/bench_compare.py OLD.json NEW.json [--flag-ratio 1.3]

Inputs are bench records (docs/BENCH_HISTORY/r{N}.json or the driver's
BENCH_r{N}.json — any JSON with ``queries`` and ``calibration``).

Raw per-query ratios across rounds are dominated by the box's co-tenant
load, not by plan changes (measured: the driver's r09 record ran 416 s
on a loadavg-5.6 box vs 210 s quiet, zero plan diffs). This script
removes that factor using the two things the bench already records:

* the FLEET calibration job (a fixed, data-independent 3-stage shuffle
  chain) — its cross-run ratio measures the box/JVM factor both runs
  actually saw;
* the ``load_sensitivity`` block (round-9 sandwich measurements) — the
  per-family slowdown at full load, because families do NOT slow
  uniformly: streaming's per-micro-batch scheduling is ~1.33× more
  load-sensitive than the fleet job, plain scans ~0.7× as sensitive.

Model: each run gets an absolute load level from its calibration cost
against the quietest calibration sample seen in EITHER record (the
best idle estimate available): L = (cost/idle - 1) / (S_cal - 1),
clamped at 0. A family with sensitivity S is then expected to move by
``(1 + L_new*(S-1)) / (1 + L_old*(S-1))`` and a query's adjusted ratio
is raw / expected. Near 1.0 means "the plan didn't move — the box
did". (A one-sided linear model in the cross-run ratio breaks when the
OLD run was the loaded one: expected factors go negative for the
high-sensitivity family.) One scalar per run cannot capture load that
varies DURING a run — treat flags as adjudication prompts, not
verdicts.

Two guards keep the flags actionable (round-10 lesson: the undamped
model flagged 45/136 bit-identical-plan queries comparing r09→r10,
because the quiet-ward extrapolation predicted a larger gain than the
quiet box delivered — measured against the round-10 calibration triple
builder-record/driver-record/solo-run, only ~half the predicted
movement materialized):

* **noise floor** (``--raw-floor``, default 1.2): a query is only
  flaggable when its RAW ratio also regressed past the floor — an
  adjusted-only "regression" on a flat raw wall is model error, not a
  plan change;
* **gain damping** (``--gain-damp``, default 0.5): when the expected
  factor is < 1 (the model predicts the new run should be FASTER
  because the old one was loaded), the prediction is damped halfway
  toward 1 before dividing. Slowdown predictions (expected > 1) stay
  undamped — the sandwich sensitivities were measured under load, so
  that direction is interpolation, not extrapolation.

Exit code: 0 if no query exceeds BOTH --raw-floor (raw) and
--flag-ratio (adjusted), else 1 (with the offenders listed) — the same
contract as check_all.py.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: fallback when neither record carries a load_sensitivity block
#: (pre-round-10 records) — imported from bench.py, the single source
#: of truth for the sandwich measurements (two hand-maintained copies
#: WILL drift when the sandwich is re-measured).
from bench import LOAD_SENSITIVITY as DEFAULT_SENSITIVITY  # noqa: E402


#: bench-record keys that are NOT per-query walls; used to reject
#: entries spliced into a reconstructed truncated record
_NON_QUERY_KEYS = frozenset(
    {"metric", "value", "unit", "sf", "total_wall", "calibration",
     "load_sensitivity", "queries"}
)


def family(name: str) -> str:
    return "streaming" if name.startswith("streaming_") else "fleet"


def _cal_samples(record: dict, keys: tuple[str, str]) -> list[float]:
    cal = record.get("calibration") or {}
    return [cal.get(k) for k in keys if isinstance(cal.get(k), (int, float))]


def cal_cost(record: dict, keys: tuple[str, str]) -> float | None:
    """The run's calibration cost: MEAN of start/end. The per-query
    walls were taken between the two calibration points, so the mean
    approximates the load the run actually saw; min would misread a run
    whose load spiked at one end (the driver's r09: fleet 9.20 at
    start, 2.24 at end — min says "quiet box", the queries say
    otherwise)."""
    vals = _cal_samples(record, keys)
    return sum(vals) / len(vals) if vals else None


def load_record(path: str) -> dict:
    """Load a bench record in either shape: the full bench.py JSON
    (docs/BENCH_HISTORY/*) or the driver's BENCH_r{N}.json, which
    archives only the LAST 2000 chars of the stdout line. For the
    truncated shape, re-wrap the surviving tail — it was cut
    mid-``queries``, so ``{"queries": {`` + (tail from its first clean
    key) parses back into queries/calibration/total_wall; the HEAD
    queries are lost, which is exactly why BENCH_HISTORY exists."""
    with open(path) as fh:
        rec = json.load(fh)
    if "queries" in rec:
        return rec
    parsed = rec.get("parsed")
    if isinstance(parsed, dict) and "queries" in parsed:
        return parsed
    tail = rec.get("tail")
    if isinstance(tail, str):
        i = tail.find(', "')
        if i >= 0:
            try:
                out = json.loads('{"queries": {' + tail[i + 2:])
            except json.JSONDecodeError:
                out = None
            if out is not None:
                # the ', "' anchor can land PAST the queries object
                # (truncation cut into calibration/total_wall), splicing
                # record-level keys in as "query walls" — keep only
                # plausible wall entries (scalar numbers, not record
                # metadata) and fail loudly when none survive
                walls = {
                    k: v
                    for k, v in out.get("queries", {}).items()
                    if k not in _NON_QUERY_KEYS
                    and isinstance(v, (int, float))
                    and not isinstance(v, bool)
                }
                if walls:
                    out["queries"] = walls
                    return out
    raise SystemExit(f"{path}: no per-query walls recoverable")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--flag-ratio", type=float, default=1.3,
                    help="adjusted ratio above which a query is flagged")
    ap.add_argument("--raw-floor", type=float, default=1.2,
                    help="raw ratio a query must ALSO exceed to be "
                         "flagged (noise floor: adjusted-only movement "
                         "on a flat raw wall is model error)")
    ap.add_argument("--gain-damp", type=float, default=0.5,
                    help="damping applied to expected factors < 1 "
                         "(quiet-ward extrapolation); 1.0 = undamped")
    ap.add_argument("--min-wall", type=float, default=0.5,
                    help="old-run wall (s) below which a query is "
                         "never flagged: sub-half-second walls are "
                         "session fixed-overhead jitter, not plan cost")
    ap.add_argument("--rerun-list", action="store_true",
                    help="print ONLY the flagged query names, one per "
                         "line (no analysis output) — feeds a targeted "
                         "quiet re-run: tools/check_all.py --only "
                         "$(tools/bench_compare.py old new --rerun-list)"
                         " confirms/denies a flag in seconds instead of"
                         " a full bench")
    args = ap.parse_args()

    old = load_record(args.old)
    new = load_record(args.new)

    sens = new.get("load_sensitivity") or old.get("load_sensitivity") \
        or DEFAULT_SENSITIVITY
    s_fleet = sens["fleet"]

    shared = sorted(set(old["queries"]) & set(new["queries"]))
    if not shared:
        print("no shared queries between the two records")
        return 1

    # pick the calibration job both records carry: fleet (round 9+),
    # else the scan job (weaker — it under-responds to load — but
    # better than raw)
    for keys, s_cal, label in (
        (("fleet_start", "fleet_end"), s_fleet, "fleet"),
        (("start", "end"), sens["scan"], "scan"),
    ):
        c_old, c_new = cal_cost(old, keys), cal_cost(new, keys)
        if c_old and c_new:
            idle = min(_cal_samples(old, keys) + _cal_samples(new, keys))
            l_old = max(0.0, (c_old / idle - 1.0) / (s_cal - 1.0))
            l_new = max(0.0, (c_new / idle - 1.0) / (s_cal - 1.0))
            if not args.rerun_list:
                print(f"{label} calibration: {c_old:.3f} -> {c_new:.3f} "
                      f"(idle est {idle:.3f}; load level "
                      f"{l_old:.3f} -> {l_new:.3f})")
            break
    else:
        l_old = l_new = 0.0
        if not args.rerun_list:
            print("calibration missing in a record: comparing RAW ratios")

    rows = []
    for name in shared:
        o, n = old["queries"][name], new["queries"][name]
        if not o or not n:
            continue
        raw = n / o
        s = sens[family(name)]
        expected = (1.0 + l_new * (s - 1.0)) / (1.0 + l_old * (s - 1.0))
        if expected < 1.0:
            # quiet-ward prediction: extrapolation past the sandwich
            # measurements — damp toward "no movement" (round-10
            # calibration triple: ~half the predicted gain materialized)
            expected = 1.0 + args.gain_damp * (expected - 1.0)
        rows.append((name, o, n, raw, raw / expected))

    adj = [r[4] for r in rows]
    tot_o = sum(r[1] for r in rows)
    tot_n = sum(r[2] for r in rows)
    if not args.rerun_list:
        print(f"{len(rows)} shared queries; total wall {tot_o:.1f} -> "
              f"{tot_n:.1f} s (raw {tot_n / tot_o:.3f}x); "
              f"median adjusted ratio {statistics.median(adj):.3f}")

    flagged = sorted(
        (
            r for r in rows
            if r[4] > args.flag_ratio
            and r[3] > args.raw_floor
            and r[1] >= args.min_wall
        ),
        key=lambda r: -r[4],
    )
    if args.rerun_list:
        for name, *_ in flagged:
            print(name)
        return 1 if flagged else 0
    for name, o, n, raw, a in flagged:
        print(f"  FLAG {name}: {o:.2f} -> {n:.2f} s "
              f"(raw {raw:.2f}x, adjusted {a:.2f}x, "
              f"family {family(name)})")
    if not flagged:
        print(f"no query exceeds raw {args.raw_floor}x AND adjusted "
              f"{args.flag_ratio}x — movement is load-attributable "
              f"or sub-floor")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
