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
    """Exact integer representation of a fixed-point double column.

    Computed as ``sign-mirrored floor(|y| + 0.5)`` instead of
    ``round(y).cast(long)``: Spark's double ``round()`` allocates a
    ``BigDecimal`` from the value's shortest decimal string PER ROW, which
    made the cents conversion cost more than the aggregation it feeds
    (measured at sf0.1: the Q1-shape aggregate dropped 0.47 → 0.22 s, the
    whole cost of the 4 per-row rounds — guide §1.2 step 2 "per-task work").

    Value-identical to ``round()`` for every |y| < 2**51, proven not
    assumed: 0.5 is an exact multiple of ulp(y) there, so ``y + 0.5`` is
    EXACT in IEEE and ``floor`` reproduces round-half-away-from-zero on the
    binary value; the BigDecimal path rounds the shortest decimal STRING,
    which cannot sit on the other side of X.5 from the binary value because
    X.5 is itself representable (a string ≥ X.5 would re-parse to a double
    ≥ X.5). Above 2**51 doubles are spaced ≥ 0.5 apart and carry no cents —
    money columns are bounded far below (the test data's are < 10**7).
    Verified empirically: zero mismatches vs round() over every money column
    of every table at sf0.001/0.01/0.1, and the full oracle differential
    stays value-exact (DIFFCHECK_r11)."""
    col = F.col(c) if isinstance(c, str) else c
    return fround(col * (10**scale))


def fround(y: Column) -> Column:
    """Round-half-away-from-zero of a double expression as a LONG — the
    floor form ``cents`` is built on (equivalence proof above): identical
    to ``F.round(y).cast("long")`` for |y| < 2**51 without the per-row
    BigDecimal. Use for any oracle-ROUND-matched quantization whose scale
    is data-dependent (e.g. int8 quantization by 127/maxabs)."""
    return F.when(y >= 0, F.floor(y + F.lit(0.5))).otherwise(
        -F.floor(F.lit(0.5) - y)
    )


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
