"""Exact integer/decimal arithmetic helpers shared by the statistics
plans (ANOVA, Cramér's V, and any future sum-of-squares identity).

Why this exists: Spark's ``div`` operator on DECIMAL operands always
returns BIGINT and SILENTLY WRAPS when the true quotient exceeds
2^63-1 (measured on Spark 4.1.2: a ~1.6e22 quotient came back as
6672888093818748928), while the DuckDB oracles compute the same
truncating division in HUGEINT — a silent cross-engine wrong answer
the moment a sufficient-statistic quotient crosses 2^63. The helpers
here keep the quotient in DECIMAL(38,0) space so the ceiling is the
(loud, ANSI-checked) DECIMAL(38) overflow of the *numerator*, not a
silent BIGINT wrap of the *quotient*.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


def exact_div(num: Column, den: Column) -> Column:
    """Truncating integer division of two non-negative DECIMAL(38,0)
    columns, computed entirely in decimal space.

    ``(num - num % den) / den`` is exactly divisible, so Spark's
    HALF_UP decimal division at the derived DECIMAL(38,6) result type
    is exact whenever the true quotient fits in 32 integral digits
    (1e32 — far past any sufficient statistic this repo computes); the
    final cast back to DECIMAL(38,0) is then lossless. Matches DuckDB
    HUGEINT ``//`` bit-for-bit on non-negative operands (both truncate
    toward zero; see docs/ORACLE_NOTES.md on ``div`` vs ``//``).

    Caller contract: ``num >= 0`` and ``den > 0`` (all the
    sum-of-squares identities satisfy this — s², deviation², and group
    counts are non-negative). For negative numerators Spark ``%``
    follows the dividend's sign, which still yields truncation toward
    zero, but no caller relies on that today.
    """
    num = num.cast(_D38)
    den = den.cast(_D38)
    return ((num - num % den) / den).cast(_D38)
