"""Value-cleaning scalar functions (SURVEY.md C2, F6, C11, C12).

Standardized semantics (SURVEY.md §2.11): sentinels become NULL plus an
optional flag entry, never magic numbers like the reference's 'inv'→-999
(smartsense.js:113-118).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.filters import SENTINEL_TOKENS


def coerce_number(raw: Column) -> Column:
    """C2: string → double with comma-group stripping ('1,234.5' →
    1234.5; airqoon.js:93 parseFloat after comma strip). Non-numeric
    → NULL (Number()/parseFloat semantics, iqair.js:193)."""
    cleaned = F.regexp_replace(raw.cast("string"), ",", "")
    return F.when(
        cleaned.rlike(r"^-?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"), cleaned.cast("double")
    ).otherwise(F.lit(None).cast("double"))


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
