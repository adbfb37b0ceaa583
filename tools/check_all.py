#!/usr/bin/env python
"""Cross-round regression canary: run EVERY registered query against its
DuckDB oracle (the same comparison the driver performs for its 50-row
CORRECTNESS window) and fail loudly on any mismatch.

The driver only verifies the first 50 registry entries per round; with
>100 registered queries the other half would silently rot without this
(round 2's timestamp regression proved that rot is real, not
hypothetical). ``pytest tests/test_oracle_parity.py`` runs the same
check per-query; this script is the one-shot whole-registry form with a
compact scoreboard, suitable for a pre-commit sweep:

    python tools/check_all.py [--sf-dir /root/testdata/sf0.01] [--only name,...]

Exit code 0 iff every query matches (rows-only for oracle-less ones).
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        out = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                out.append("NULL")
            elif isinstance(v, float):
                out.append(repr(v))
            elif isinstance(v, pd.Timestamp):
                out.append(v.isoformat())
            else:
                out.append(str(v))
        rows.append(tuple(out))
    return sorted(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--only", default=[], nargs="*",
        help="query names — space- and/or comma-separated, so both "
             "--only a,b and --only $(bench_compare ... --rerun-list) "
             "(newline/space-split by the shell) work",
    )
    args = ap.parse_args()

    from openaq_lcs_fetch_spark.plans import QUERIES
    from openaq_lcs_fetch_spark.session import get_spark
    from openaq_lcs_fetch_spark.tables import TABLE_NAMES

    spark = get_spark("check-all")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    names = [n for tok in args.only for n in tok.split(",") if n] or list(QUERIES)
    failed: list[str] = []
    for i, name in enumerate(names, 1):
        q = QUERIES[name]
        t0 = time.perf_counter()
        try:
            sdf = q.fn(spark, args.sf_dir).toPandas()
            if q.oracle is None:
                # rows-only check, like the driver's — but the shape must
                # still canonicalize (sortable scalar columns)
                _canon(sdf)
                status = f"rows-only {len(sdf)}"
            else:
                odf = con.sql(q.oracle).df()
                if sorted(sdf.columns) != sorted(odf.columns):
                    raise AssertionError(
                        f"columns {sorted(sdf.columns)} != {sorted(odf.columns)}"
                    )
                if len(sdf) != len(odf):
                    raise AssertionError(f"rows {len(sdf)} != {len(odf)}")
                s_rows, o_rows = _canon(sdf), _canon(odf)
                bad = [
                    (a, b) for a, b in zip(s_rows, o_rows) if a != b
                ]
                if bad:
                    raise AssertionError(f"first value mismatch: {bad[0]}")
                status = f"match {len(sdf)}"
        except Exception as exc:  # noqa: BLE001 — scoreboard, keep going
            failed.append(name)
            status = f"FAIL {type(exc).__name__}: {str(exc)[:200]}"
        print(f"[{i:3}/{len(names)}] {name:32} {time.perf_counter() - t0:6.1f}s  {status}")

    print(f"\n{len(names) - len(failed)}/{len(names)} green" + (f"; FAILED: {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
