"""Simulates the driver's correctness gate: every registered query runs
in Spark AND in DuckDB (oracle SQL); results must match exactly after
column-name sort + row sort — the same order-insensitive comparison the
driver hashes.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from openaq_lcs_fetch_spark.plans import QUERIES
from openaq_lcs_fetch_spark.tables import TABLE_NAMES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


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


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only check, like the driver's
        return
    con = _duck(sf_dir)
    odf = con.sql(q.oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} != {len(odf)}"
    s_rows, o_rows = _canon(sdf), _canon(odf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"
