"""Cross-engine deterministic aggregation helpers.

Floating-point SUM/AVG are order-dependent: Spark's parallel partial
aggregation and DuckDB's sequential scan add doubles in different orders, so
raw ``SUM(double)`` differs in the last ulps between engines — enough to break
the driver's value-hash comparison.

Fix: the test data's money columns are 2-decimal doubles, so we aggregate in
**exact integer cents** and divide once at the end. Both engines then execute
the *same* IEEE expression tree per row (multiply, round — half-away-from-zero
in both for our positive values — cast), accumulate integers exactly, and
perform one identical final division. Bit-identical results by construction.

The Spark helpers here and the SQL emitters below must stay in lockstep —
each pair generates the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(c: Column | str, scale: int = 2) -> Column:
    """Exact integer representation of a fixed-point double column."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col * (10**scale)).cast("long")


def dsum(c: Column | str, scale: int = 2) -> Column:
    """Deterministic money sum -> DOUBLE (equals DuckDB's `sql_dsum`)."""
    return (F.sum(cents(c, scale)) / F.lit(float(10**scale)))


def davg(c: Column | str, scale: int = 2) -> Column:
    """Deterministic mean -> DOUBLE (sum of exact cents / (10^scale * n))."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(cents(col, scale)) / (F.lit(float(10**scale)) * F.count(col))


# --- SQL twins (DuckDB dialect == ANSI here) -------------------------------

def sql_cents(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(({expr}) * {10**scale}) AS BIGINT)"


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"(SUM({sql_cents(expr, scale)}) / {float(10**scale)})"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"(SUM({sql_cents(expr, scale)}) / ({float(10**scale)} * COUNT({expr})))"
