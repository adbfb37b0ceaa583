"""Value-cleaning scalar functions (SURVEY.md C2, F6, C11, C12).

Standardized semantics (SURVEY.md §2.11): sentinels become NULL plus an
optional flag entry, never magic numbers like the reference's 'inv'→-999
(smartsense.js:113-118).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.filters import SENTINEL_TOKENS


#: thousands-grouped number: commas ONLY in 3-digit groups — stripping
#: commas unconditionally would fabricate 123.0 from garbage like '1,2,3'
_GROUPED = r"^[+-]?\d{1,3}(,\d{3})+(\.\d*)?$"
_PLAIN = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"


def coerce_number(raw: Column) -> Column:
    """C2: string → double. Comma-grouped values ('1,234.5') have the
    grouping validated before the strip (airqoon.js:93 comma handling);
    anything else must already be numeric. Non-numeric → NULL
    (Number()/parseFloat semantics, iqair.js:193), including malformed
    groupings like '1,2,3'."""
    txt = raw.cast("string")
    return (
        F.when(txt.rlike(_GROUPED), F.regexp_replace(txt, ",", "").cast("double"))
        .when(txt.rlike(_PLAIN), txt.cast("double"))
        .otherwise(F.lit(None).cast("double"))
    )


def clean_measure(raw: Column) -> Column:
    """F6+C2 composed: sentinel tokens → NULL, then numeric coercion."""
    no_sentinel = F.when(
        raw.cast("string").isin(list(SENTINEL_TOKENS)), F.lit(None)
    ).otherwise(raw)
    return coerce_number(no_sentinel)


def sentinel_flag(raw: Column, flag_key: str = "qc/sentinel") -> Column:
    """Map column recording which sentinel was replaced (our analogue of
    the reference's flags map, clarity.js:163)."""
    return F.when(
        raw.cast("string").isin(list(SENTINEL_TOKENS)),
        F.create_map(F.lit(flag_key), raw.cast("string")),
    ).otherwise(F.lit(None).cast("map<string,string>"))


def json_get(col: Column, path: str) -> Column:
    """C11: JSON field extraction (JSON.parse, iqair.js:101)."""
    return F.get_json_object(col, f"$.{path}")


def to_json_no_nulls(struct: Column) -> Column:
    """C12: serialize dropping null fields (stripNulls,
    station.js:176-184) — Spark's to_json ignores nulls by default."""
    return F.to_json(struct, {"ignoreNullFields": "true"})
