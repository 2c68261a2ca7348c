"""Window-function operators — the reference's stateful analytics as
declarative row-frame windows.

Batch equivalents of the reference's keyed process functions:

- rolling_sma_forecast: ForecastFunction — per-hub rolling SMA(5)/SMA(20)
  ring buffers emitting on every tick (reference ForecastsJob.java:76-88).
  A count-based ring buffer that averages over fewer rows while warming up
  is exactly a ROWS BETWEEN (n-1) PRECEDING AND CURRENT ROW frame.
- last_value_carried_forward: the lastPrice ValueState
  (reference PnlAndExposureJob.java:107-109,130,134-136).
- latest_per_key: the read-side `SELECT DISTINCT ON (account,hub) ...
  ORDER BY ts DESC` snapshot query (reference README.md:92-96) in portable
  row_number form.
- top_k: `ORDER BY ts DESC LIMIT n` (reference README.md:86-100).

Scale notes: each Window.partitionBy is one hash-shuffle on the key — the
same exchange Flink's keyBy performs. Frames are bounded (<=20 rows), so
state per key is O(1); skewed keys are handled by AQE. No Python in the
hot path — everything stays inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order_by: Sequence[str | Column], desc: bool = False) -> list[Column]:
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    return [c.desc() for c in cols] if desc else cols


def rolling_sma_forecast(df: DataFrame,
                         partition_by: Sequence[str],
                         order_by: Sequence[str],
                         value_col: str,
                         short_window: int = 5,
                         long_window: int = 20) -> DataFrame:
    """Per-key rolling simple moving averages + naive forecast.

    Emits one row per input row with sma{short}, sma{long} computed over the
    trailing `short_window`/`long_window` rows (fewer during warm-up — the
    reference emits from the very first row, ForecastsJob.java:86-87) and
    `forecast_next = sma_short` (ForecastsJob.java:84).
    """
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
    sma_s = F.avg(value_col).over(w.rowsBetween(-(short_window - 1), 0))
    sma_l = F.avg(value_col).over(w.rowsBetween(-(long_window - 1), 0))
    return (df
            .withColumn(f"sma{short_window}", sma_s)
            .withColumn(f"sma{long_window}", sma_l)
            .withColumn("forecast_next", F.col(f"sma{short_window}")))


def last_value_carried_forward(df: DataFrame,
                               partition_by: Sequence[str],
                               order_by: Sequence[str],
                               value_col: str,
                               out_col: str = "last_value") -> DataFrame:
    """Running last non-null value per key (ValueState<Double> lastPrice,
    reference PnlAndExposureJob.java:130,134-136)."""
    w = (Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
         .rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))


def latest_per_key(df: DataFrame,
                   partition_by: Sequence[str],
                   order_by: Sequence[str]) -> DataFrame:
    """Latest row per key — portable DISTINCT ON (reference README.md:92-96).

    order_by columns are ranked DESC; include a unique tie-breaker for
    determinism. The ranking window shuffles once on the key; at scale this
    beats a self-join-on-max(ts) (one exchange instead of two).
    """
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by, desc=True))
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1)
              .drop("__rn"))


def top_k(df: DataFrame, order_by: Sequence[str], k: int,
          desc: bool = True) -> DataFrame:
    """Global top-k (reference README.md:86: ORDER BY ts DESC LIMIT 8).

    Spark plans this as TakeOrderedAndProject — per-partition heap of k then
    a k-row merge on the driver; no global sort even at 100 TB.
    """
    return df.orderBy(*_order_cols(order_by, desc=desc)).limit(k)
