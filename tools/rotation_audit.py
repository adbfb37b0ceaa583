#!/usr/bin/env python
"""Driver-rotation accounting: who was last driver-verified when, and
what should the NEXT round's promote() window be.

The correctness driver replays only the FIRST 50 registry entries per
round (CORRECTNESS_r{N}.json), so with 250 registered queries the
verification surface is a deliberate rotation (plans/__init__). Every
round's verdict audits the same two numbers this script computes:

* staleness — for each query, the newest round with a GREEN driver row
  (rows_match + schema_match + hash_match, or rows-only for oracle-less
  queries); "never" for queries that have not yet had a driver row;
* the next window — never-verified first (first-time signal outranks
  re-proof), then red-last-time, then least-recently-verified, capped
  at the 50-slot window.

Usage:
    python tools/rotation_audit.py            # report + suggested window
    python tools/rotation_audit.py --max-age 4   # exit 1 if any query's
        last green row is older than <current round − 4> (never-verified
        queries only count once a CORRECTNESS file exists after their
        registration — the driver can't have seen them earlier)

This is bookkeeping over committed artifacts — no Spark session.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def _green(row: dict) -> bool:
    if row.get("err"):
        return False
    if "hash_match" in row and row["hash_match"] is not None:
        return bool(row["hash_match"]) and bool(row.get("schema_match"))
    return bool(row.get("rows_match"))


def load_history(root: str) -> tuple[dict[str, int], dict[str, int], int]:
    """Returns (last_green, last_seen, latest_round)."""
    last_green: dict[str, int] = {}
    last_seen: dict[str, int] = {}
    latest = 0
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        for name, row in json.load(open(path)).items():
            last_seen[name] = max(last_seen.get(name, 0), rnd)
            if _green(row):
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green, last_seen, latest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument(
        "--max-age",
        type=int,
        default=0,
        help="fail (exit 1) if any verified query's newest green row is "
        "older than latest_round - MAX_AGE",
    )
    args = ap.parse_args()

    from openaq_lcs_fetch_spark.plans import QUERIES

    last_green, last_seen, latest = load_history(args.root)
    names = list(QUERIES)

    never = [n for n in names if n not in last_seen]
    red_last = [
        n
        for n in names
        if n in last_seen and last_green.get(n, 0) < last_seen[n]
    ]
    verified = [(last_green[n], n) for n in names if n in last_green]

    hist: dict[int, int] = {}
    for rnd, _ in verified:
        hist[rnd] = hist.get(rnd, 0) + 1
    print(f"registry: {len(names)} queries; driver rounds seen: 1..{latest}")
    print(f"never driver-verified: {len(never)}")
    for n in never:
        print(f"  never  {n}")
    if red_last:
        print(f"red in their newest window (re-prove!): {len(red_last)}")
        for n in red_last:
            print(f"  red@r{last_seen[n]:02d}  {n}")
    print("staleness histogram (newest green row per query):")
    for rnd in sorted(hist):
        print(f"  r{rnd:02d}: {hist[rnd]:3d} queries")

    # next window: never-verified (registry order), then red-last, then
    # stalest-green-first (ties broken by registry order for stability)
    order = {n: i for i, n in enumerate(names)}
    rest = sorted(
        (n for n in names if n in last_green and n not in red_last),
        key=lambda n: (last_green[n], order[n]),
    )
    window = (never + red_last + rest)[:WINDOW]
    print(f"\nsuggested next promote() window ({len(window)} slots):")
    for n in window:
        tag = (
            "never"
            if n in never
            else ("red" if n in red_last else f"r{last_green[n]:02d}")
        )
        print(f"  {tag:>5}  {n}")

    if args.max_age:
        floor = latest - args.max_age
        stale = [n for r, n in verified if r < floor]
        if stale:
            print(
                f"\nFAIL: {len(stale)} queries' newest green row predates "
                f"r{floor:02d}: {', '.join(stale[:10])}"
                + (" …" if len(stale) > 10 else "")
            )
            return 1
        print(f"\nOK: every verified query has a green row ≥ r{floor:02d}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
