"""THE one copy of gap-based sessionization semantics.

Both session views — `session_window_stats` (plans/temporal.py) and
`session_funnel` (plans/analytics.py) — must agree on what a session IS:
the 30-minute inactivity gap, the STRICTLY-greater boundary rule, and the
(ts, event_id) total-order tie-break. Keeping the constant, the Spark
builder, and the oracle CTE here makes divergence impossible — the same
posture as operators/netting.py (PnL core) and verified_jaccard_pairs.

Algorithm: classic lag + running-sum-of-new-session-flags, integer
microsecond arithmetic (cross-engine exact). One shuffle on user_id; two
codegen'd window passes — the batch form of F.session_window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def with_session_id(events: DataFrame,
                    gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Adds a per-user `session_id` (long, 1-based) to an events frame.
    Requires user_id / ts / event_id columns; keeps everything else."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
         .cast("long"))


def session_cte_sql(cols: str, gap_us: int = SESSION_GAP_US) -> str:
    """Oracle CTE fragment ending in `sess` = (user_id, ts, event_id,
    {cols}, session_id) over the `events` view — the DuckDB rendering of
    with_session_id. `cols` = extra payload columns to carry through."""
    extra = f", {cols}" if cols else ""
    return f"""
  __sord AS (SELECT user_id, ts, event_id{extra},
                    CASE WHEN LAG(epoch_us(ts)) OVER sw IS NULL
                              OR epoch_us(ts) - LAG(epoch_us(ts)) OVER sw
                                 > {gap_us}
                         THEN 1 ELSE 0 END AS is_new
             FROM events
             WINDOW sw AS (PARTITION BY user_id ORDER BY ts, event_id)),
  sess AS (SELECT *, CAST(SUM(is_new) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_id
           FROM __sord)
"""
