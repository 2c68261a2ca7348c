"""Cross-engine-exact aggregation helpers.

Summing doubles is order-dependent (IEEE-754 addition doesn't associate), and
Spark's partial-aggregation order differs from any other engine's — so a
plain sum(double) can drift ~1e-12 between runs/engines and break value-hash
comparison, while also being nondeterministic across partition counts at
scale. The fix: route money/measure columns through DECIMAL for the additive
part (exact, order-independent, deterministic on ANY cluster size), then cast
the final result back to DOUBLE.

This mirrors what production TPC-H schemas do anyway (money is DECIMAL(15,2)
in the spec); the testdata stores doubles, so we cast at query time. The cast
is exact as long as `scale` covers the column's true decimal precision
(testdata columns carry 2dp; products of two 2dp values carry 4dp, etc.).

Oracle-side equivalent: CAST(SUM(CAST(x AS DECIMAL(30,s))) AS DOUBLE).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, scale: int = 2, precision: int = 30) -> Column:
    """Order-independent exact sum of a fixed-point-valued double column."""
    return F.sum(_as_col(col).cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 30) -> Column:
    """avg as exact-sum / count — deterministic anywhere, unlike avg(double)."""
    c = _as_col(col)
    return dsum(c, scale, precision) / F.count(c)


def dsum_sql(expr: str, scale: int = 2, precision: int = 30) -> str:
    """The DuckDB-oracle rendering of dsum(expr)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 2, precision: int = 30) -> str:
    return f"{dsum_sql(expr, scale, precision)} / COUNT({expr})"
