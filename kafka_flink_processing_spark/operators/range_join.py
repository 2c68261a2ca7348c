"""Bucketed range join — equi-join acceleration for time-range predicates.

The reference has no join operator at all (SURVEY.md §2.5); its only
two-input op is the stateful trade/price co-process (PnlAndExposureJob.java:
50-51). A *range* correlation ("events within a time window of each other")
is nonetheless the natural next query on its data — e.g. clicks within the
attribution window of a purchase — and the naive formulation

    left JOIN right ON key AND r.ts BETWEEN l.ts - W AND l.ts

gives Spark no equality on the range, so the planner falls back to a
nested-loop per key: O(n_left * n_right) per key group, fatal at 100 TB.

The scale-safe form is the classic bucketing rewrite (what Databricks'
range-join hints and KDB's window joins do under the hood):

1. bucket both sides by `floor(ts_us / W)` where W = span of the range;
2. each left row probes its own bucket and the adjacent one(s) — the range
   (l+lower, l+upper] can only intersect ceil(span/W)+1 = 2 buckets;
3. equi-join on (keys..., bucket) — a plain hash join Catalyst can
   shuffle-partition, AQE-skew-split, or broadcast;
4. re-check the exact range predicate on the (small) candidate set.

Cost: a 2x fan-out of the left side instead of a quadratic blow-up; the
join itself is whole-stage-codegen'd and shuffle-parallel. All arithmetic
is integer microseconds, so results are bit-exact across engines and
partition counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(left: DataFrame, right: DataFrame,
                        on: list[str], left_ts: str, right_ts: str,
                        lower_us: int, upper_us: int) -> DataFrame:
    """Inner-join rows where right.ts is in (left.ts+lower_us, left.ts+upper_us],
    matching on the `on` equi-keys. Returns left columns + right columns
    (minus the right join keys). Bucket width = the range span, so every
    left row probes exactly 2 buckets.
    """
    if upper_us <= lower_us:
        raise ValueError("empty range: upper_us must exceed lower_us")
    width = upper_us - lower_us
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    # integer `div` (truncating) == floor for post-epoch micros — all-long
    # arithmetic, so Spark and the DuckDB oracle (`//`) agree bit-for-bit
    lhs = (left.withColumn("__l_us", l_us)
               .withColumn("__bucket", F.explode(F.array_distinct(F.array(
                   F.expr(f"(__l_us + {lower_us}) div {width}"),
                   F.expr(f"(__l_us + {upper_us}) div {width}")))))
           )
    rhs = (right.withColumn("__r_us", r_us)
                .withColumn("__bucket", F.expr(f"__r_us div {width}")))
    cond = ((F.col("__r_us") > F.col("__l_us") + F.lit(lower_us))
            & (F.col("__r_us") <= F.col("__l_us") + F.lit(upper_us)))
    joined = lhs.join(rhs, on=on + ["__bucket"], how="inner").filter(cond)
    return joined.drop("__l_us", "__r_us", "__bucket")
