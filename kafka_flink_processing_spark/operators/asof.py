"""As-of join — the engine-native form of the reference's stateful
stream-stream correlation.

The reference's only two-input operator is `connect` + KeyedCoProcessFunction
(reference PnlAndExposureJob.java:50-51): each trade is enriched with the
last-known price on its hub. Batch-side that is exactly an AS-OF join. Spark
has no native ASOF, so we compose it from built-ins (SURVEY.md §2.5): tag
both sides, union, one window pass carrying the right side's values forward,
keep left rows.

Scale: ONE hash shuffle on the key + a sort within partitions — the same
cost as the keyed shuffle Flink performs; no O(n·m) range join, no skew
beyond the key's own distribution (AQE handles hot keys). This beats the
naive `left join right on key and right.ts <= left.ts` + max() formulation,
which explodes quadratically per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame,
              right: DataFrame,
              on: Sequence[str],
              order_col: str,
              value_cols: Sequence[str],
              right_order_tiebreak: str | None = None) -> DataFrame:
    """For each left row, attach right's `value_cols` from the latest right
    row with the same key and right.order_col <= left.order_col.

    Ties at equal order_col match (right sorts before left); among right
    rows with identical (key, order_col), the one with the greatest
    `right_order_tiebreak` wins (pass a unique column for determinism).
    Left rows with no earlier right row get nulls.
    """
    l_tag = left
    for v in value_cols:
        l_tag = l_tag.withColumn(v, F.lit(None).cast(right.schema[v].dataType))
    l_tag = l_tag.withColumn("__is_left", F.lit(1))

    # carry the tiebreak column through the right-side projection (it is
    # usually NOT a value column, and a select that drops it would silently
    # degrade equal-(key, ts) right rows to partition-order tie-breaking —
    # nondeterministic under repartitioning)
    r_keep = list(on) + [order_col] + list(value_cols)
    if right_order_tiebreak is not None and right_order_tiebreak not in r_keep:
        r_keep.append(right_order_tiebreak)
    r_tag = right.select(*[F.col(c) for c in r_keep])
    if right_order_tiebreak is not None:
        r_tag = r_tag.withColumn("__tb", F.col(right_order_tiebreak))
        if right_order_tiebreak not in set(on) | {order_col} | set(value_cols):
            r_tag = r_tag.drop(right_order_tiebreak)
    else:
        r_tag = r_tag.withColumn("__tb", F.lit(0))
    for c in left.columns:
        if c not in set(on) | {order_col} | set(value_cols):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r_tag = r_tag.withColumn("__is_left", F.lit(0))
    # typed NULL, not lit(0).cast(...): an int-to-date/timestamp/string
    # cast can yield NULL-or-error under ANSI mode; a typed NULL is always
    # castable and sorts consistently (left __tb never competes with right
    # rows anyway — ties split on __is_left first) (r5 advice)
    l_tag = l_tag.withColumn("__tb", F.lit(None).cast(
        r_tag.schema["__tb"].dataType))

    cols = l_tag.columns
    unioned = l_tag.select(cols).unionByName(r_tag.select(cols))

    w = (Window.partitionBy(*on)
         .orderBy(F.col(order_col), F.col("__is_left"), F.col("__tb"))
         .rowsBetween(Window.unboundedPreceding, 0))
    out = unioned
    for v in value_cols:
        out = out.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return out.filter(F.col("__is_left") == 1).drop("__is_left", "__tb")
