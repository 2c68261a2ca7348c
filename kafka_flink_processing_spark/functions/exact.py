"""Cross-engine-exact aggregation helpers.

Summing doubles is order-dependent (IEEE-754 addition doesn't associate), so
a plain sum(double) drifts between engines AND between cluster sizes /
partition counts — nondeterministic at scale and fatal for value-hash
comparison. Fix: the measures are fixed-point (2dp money, 4dp/6dp products
of 2dp values — TPC-H stores them as DECIMAL in the spec), so we sum them as
scaled int64 (`round(x * 10^s)`), which is exact, order-independent, and
FASTER than double sums (benchmarked 0.92s vs 1.13s double vs 2.1s
decimal(30) on 600k rows — long sums stay in whole-stage codegen).

Overflow bound: int64 holds +/-9.2e18; at scale 6 that is ~9.2e12 in measure
units per group — ample for 100 TB money-typed columns (sum of 6e11 rows x
1e5 avg = 6e16 x 100 = 6e18 at scale 2, near but under the bound; for
wider measures switch the cast to decimal(38,s), trading ~2x agg speed).
The engine runs under Spark 4's default ANSI mode (the full suite and
both-SF oracle gates pass with spark.sql.ansi.enabled=true), so a measure
that DOES outgrow the bound raises ARITHMETIC_OVERFLOW at run time
instead of silently wrapping — the sizing rule is enforced, not hoped.

Oracle-side equivalent: dsum_sql/davg_sql render the identical arithmetic
for DuckDB (SUM(BIGINT) is int128 there, then cast to double — identical
result for identical int sums).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent exact sum of a fixed-point-valued double column:
    sum(round(x*10^s)) / 10^s, all-integer in the aggregate."""
    factor = 10 ** scale
    scaled = F.sum(F.round(_as_col(col) * factor).cast("long"))
    return scaled.cast("double") / float(factor)


def davg(col: Column | str, scale: int = 2) -> Column:
    """avg as exact-sum / count — deterministic on any cluster size."""
    c = _as_col(col)
    return dsum(c, scale) / F.count(c)


def dsum_sql(expr: str, scale: int = 2) -> str:
    """The DuckDB-oracle rendering of dsum(expr, scale). Parenthesized so
    the fragment composes safely as a division operand (an unwrapped
    `a / 10^s` tail would re-associate under a following `/ x`)."""
    factor = 10 ** scale
    return (f"(CAST(SUM(CAST(ROUND(({expr}) * {factor}) AS BIGINT)) AS DOUBLE)"
            f" / {float(factor)})")


def davg_sql(expr: str, scale: int = 2) -> str:
    return f"({dsum_sql(expr, scale)} / COUNT({expr}))"


def dsum_wide(col: Column | str, scale: int = 2) -> Column:
    """dsum for SQUARED/product moment terms, whose scaled per-row
    magnitude can approach int64 on wide-domain inputs (dp² of
    1e6-priced rows is 1e18 at scale 6 — one row near the bound, and a
    sum over it raises ARITHMETIC_OVERFLOW under ANSI; found by the r8
    events fuzzer): identical arithmetic on decimal(38,0), exact and
    order-independent at ~2x the agg cost. The DuckDB oracle needs no
    twin — its SUM(BIGINT) already widens to int128, which is exactly
    the behavior this matches. Cross-engine exactness holds even past
    2^53 because the per-row scaled value is the same IEEE double on
    both engines before the exact integer cast."""
    factor = 10 ** scale
    scaled = F.sum(F.round(_as_col(col) * factor).cast("decimal(38,0)"))
    return scaled.cast("double") / float(factor)


def dsum_wide_sql(expr: str, scale: int = 2) -> str:
    """The DuckDB rendering of dsum_wide. DuckDB's int128->double (and
    decimal->double) conversion is NOT correctly rounded once the sum
    passes 2^53 (measured: 23999999320000006632 converts to ...004e19
    vs the correctly-rounded ...001e19 Spark's decimal cast produces —
    r8 events fuzzer). Render a conversion that IS correctly rounded on
    any IEEE engine: split |sum| as hi*2^32 + lo with both halves exact
    in double (hi < 2^53 up to |sum| < 2^85), then one double add —
    fl(hi*2^32 + lo) rounds the exact integer once, to nearest."""
    factor = 10 ** scale
    s = f"SUM(CAST(ROUND(({expr}) * {factor}) AS HUGEINT))"
    hi = f"CAST(ABS({s}) // 4294967296 AS DOUBLE) * 4294967296.0"
    lo = f"CAST(ABS({s}) % 4294967296 AS DOUBLE)"
    sign = f"(CASE WHEN {s} < 0 THEN -1.0 ELSE 1.0 END)"
    return f"({sign} * ({hi} + {lo}) / {float(factor)})"
