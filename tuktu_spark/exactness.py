"""Cross-engine deterministic aggregate helpers.

The driver's correctness gate hash-compares our Spark results against a
DuckDB oracle. Floating-point SUM/AVG over a shuffled dataset is not
bit-reproducible across engines (summation order differs), so every
fractional aggregate we expose in oracle-checked queries goes through an
EXACT path:

  double value --(deterministic per-value cast)--> DECIMAL(38,s)
  --(exact decimal sum)--> DECIMAL --(deterministic cast)--> DOUBLE

Per-value double->decimal rounding is order-independent and IEEE double
arithmetic on identical scalar expressions is engine-identical, so the final
doubles match DuckDB bit-for-bit. The same trick builds exact variance /
stddev / correlation from exact sums of x, x^2, x*y.

This matters at 100 TB too: decimal partial aggregation is still map-side
combinable and whole-stage-codegen'd; the cost over a double sum is small
and the result is run-to-run deterministic (audit-friendly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Exact, engine-portable SUM of a double expression -> DOUBLE.

    SQL oracle equivalent: CAST(SUM(CAST(x AS DECIMAL(38,s))) AS DOUBLE)

    REJECTED round-5 optimization (kept as a warning to future editors):
    summing `round(x * 10^s)` as BIGINT is ~2x faster (long codegen vs
    the Int128 decimal path) and bit-identical where it fits — but it
    does NOT fit: squared terms (variance/correlation sums of x*y at
    scale 6) overflow int64 at sf0.01 already, and even q1's plain price
    sums overflow around 10^12 rows. DECIMAL(38,s) is the only
    accumulator that is exact, overflow-safe at 100 TB, and still
    map-side combinable; see SCALE.md round-5 table.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"


def davg(col: Column | str, scale: int = 6) -> Column:
    """Exact-sum average: exact decimal sum cast to double, / count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def davg_sql(expr: str, scale: int = 6) -> str:
    return f"({dsum_sql(expr, scale)} / COUNT({expr}))"


def dvar_pop(col: Column | str, scale: int = 6) -> Column:
    """Population variance from exact sums: E[x^2] - E[x]^2.

    Both engines evaluate the identical double expression over identical
    exact sums, so results match bitwise.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    sx = dsum(c, scale)
    sxx = dsum(c * c, scale)
    m = sx / n
    return sxx / n - m * m


def dvar_pop_sql(expr: str, scale: int = 6) -> str:
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    sx = dsum_sql(expr, scale)
    sxx = dsum_sql(f"({expr}) * ({expr})", scale)
    return f"({sxx} / {n} - ({sx} / {n}) * ({sx} / {n}))"


def dcovar_pop(x: Column, y: Column, scale: int = 6) -> Column:
    n = F.count(F.lit(1)).cast("double")
    return dsum(x * y, scale) / n - (dsum(x, scale) / n) * (dsum(y, scale) / n)


def dcovar_pop_sql(x: str, y: str, scale: int = 6) -> str:
    n = "CAST(COUNT(*) AS DOUBLE)"
    sxy = dsum_sql(f"({x}) * ({y})", scale)
    sx = dsum_sql(x, scale)
    sy = dsum_sql(y, scale)
    return f"({sxy} / {n} - ({sx} / {n}) * ({sy} / {n}))"
