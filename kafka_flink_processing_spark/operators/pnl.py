"""Distributed PnL/position fold (W2) — batch form.

The reference computes per-account positions and PnL in a
KeyedCoProcessFunction keyed by hub (PnlAndExposureJob.java:50-51,106-144).
The path-dependent netting (realized PnL depends on the running position's
sign) is not expressible in SQL window algebra (SURVEY.md §4.2), so this is
the one operator that runs Python: an Arrow-batched per-hub ordered fold via
applyInPandas, sharing its core (operators/netting.py) with the executable
spec.

Scale design:
- one hash shuffle on hub (exactly Flink's keyBy), fold parallelism = #hubs;
  per-hub state is O(#accounts on that hub), rows stream through pandas in
  Arrow batches.
- the price->every-account fan-out (reference :134-137) makes output
  superlinear (~ticks x accounts). `snapshot_only=True` gives the sane
  100 TB variant: only each account's final row per hub.
- input order within a group is NOT guaranteed by applyInPandas; the fold
  sorts each group by the documented total order itself.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_flink_processing_spark.operators.netting import (
    PRICE,
    TRADE,
    replay,
)

PNL_OUT_SCHEMA = ("ts timestamp, account string, hub string, "
                  "position_mw int, avg_price_mwh double, "
                  "last_price_mwh double, realized_pnl double, "
                  "unrealized_pnl double, total_pnl double")


def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "kind", "trade_id"], kind="mergesort")
    records = pdf.to_dict("records")
    rows = replay(records)
    if not rows:
        return pd.DataFrame(columns=["ts", "account", "hub", "position_mw",
                                     "avg_price_mwh", "last_price_mwh",
                                     "realized_pnl", "unrealized_pnl",
                                     "total_pnl"])
    return pd.DataFrame(rows)


def pnl_positions(trades: DataFrame, prices: DataFrame,
                  snapshot_only: bool = False) -> DataFrame:
    """Replay trades+prices into positions_pnl rows (reference semantics).

    trades: trade_id, ts, account, hub, side, mw, price_mwh
    prices: ts, hub, price_mwh
    """
    from kafka_flink_processing_spark.shipping import ensure_shipped
    ensure_shipped(trades.sparkSession)
    t = trades.select(
        F.col("ts"), F.col("hub"), F.col("account"), F.col("side"),
        F.col("mw").cast("long"), F.col("price_mwh"),
        F.col("trade_id").cast("long"), F.lit(TRADE).alias("kind"))
    p = prices.select(
        F.col("ts"), F.col("hub"),
        F.lit(None).cast("string").alias("account"),
        F.lit(None).cast("string").alias("side"),
        F.lit(None).cast("long").alias("mw"),
        F.col("price_mwh"),
        F.lit(0).cast("long").alias("trade_id"),
        F.lit(PRICE).alias("kind"))
    unioned = t.unionByName(p)
    out = unioned.groupBy("hub").applyInPandas(_fold, PNL_OUT_SCHEMA)
    if snapshot_only:
        from kafka_flink_processing_spark.operators.windows import latest_per_key
        out = latest_per_key(out, ["hub", "account"], ["ts", "position_mw"])
    return out


def price_exposure(pnl: DataFrame) -> DataFrame:
    """Exposure projection P4 (reference PnlAndExposureJob.java:65-69):
    pnl01 = $ PnL for a $1 move = position_mw; notional = position * last."""
    return pnl.select(
        "ts", "account", "hub", "position_mw", "last_price_mwh",
        F.col("position_mw").cast("double").alias("pnl01"),
        (F.col("position_mw") * F.col("last_price_mwh")).alias("notional_usd"))
