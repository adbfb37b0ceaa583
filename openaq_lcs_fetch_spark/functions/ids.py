"""Identifier / string scalar functions (SURVEY.md C3, C4, C10, C13)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sensor_id(source: Column | str, station: Column | str, parameter: Column | str) -> Column:
    """C3: ``{source}-{station}-{parameter}`` ingest id (cmu.js:309-311,
    cpcb.js:95-105) — the deterministic surrogate key that lets the
    station and measure sides equi-join later (J3, matching_method
    'ingest-id', clarity.js:181-185)."""
    cols = [c if isinstance(c, Column) else F.col(c) for c in (source, station, parameter)]
    return F.concat_ws("-", *cols)


def to_camel_case(col: Column) -> Column:
    """C4: 'some key name' → 'someKeyName' (utils.js:131-140,
    iqair.js:20-22) — pure regexp/initcap expression, metadata only."""
    title = F.regexp_replace(F.initcap(F.regexp_replace(col, r"[_\-]+", " ")), r"\s+", "")
    return F.concat(F.lower(title.substr(1, 1)), title.substr(F.lit(2), F.length(title)))


def zero_pad(col: Column, width: int = 2) -> Column:
    """C10: padStart(2,'0') (data354.js:149-153, iqair.js:171-172)."""
    return F.lpad(col.cast("string"), width, "0")


def url_path_segment(url: Column, index: int) -> Column:
    """C13: station id from URL path segment (iqair.js:75-78
    pathname.split('/')[2])."""
    return F.split(F.parse_url(url, F.lit("PATH")), "/").getItem(index)
