#!/usr/bin/env python
"""Regenerate the registry-size counts embedded in README.md from the
live registry, so they can never drift again (the round-9 verdict
caught README saying 276 while the registry held 277).

    python tools/refresh_counts.py [--check]

Rewrites every ``N registered queries`` / ``N callables`` /
``N ANSI-SQL twins`` occurrence with ``len(plans.QUERIES)``. With
``--check`` it only verifies (exit 1 on drift) — suitable as a canary
alongside tools/check_all.py.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="verify only")
    args = ap.parse_args()

    from openaq_lcs_fetch_spark import plans

    n = len(plans.QUERIES)
    n_oracles = sum(1 for q in plans.QUERIES.values() if q.oracle is not None)

    readme = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md"
    )
    with open(readme) as fh:
        text = fh.read()
    new = re.sub(r"\d+ registered queries", f"{n} registered queries", text)
    new = re.sub(r"\d+ callables", f"{n} callables", new)
    new = re.sub(r"\d+ ANSI-SQL twins", f"{n_oracles} ANSI-SQL twins", new)

    if new == text:
        print(f"README counts current: {n} queries, {n_oracles} oracles")
        return 0
    if args.check:
        print(f"README counts STALE (registry: {n} queries, {n_oracles} oracles)")
        return 1
    with open(readme, "w") as fh:
        fh.write(new)
    print(f"README counts refreshed: {n} queries, {n_oracles} oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
