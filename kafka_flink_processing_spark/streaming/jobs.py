"""The four reference jobs re-expressed as Structured Streaming pipelines.

| reference job (flink-job/src/main/java/com/example/) | here |
|---|---|
| IngestPricesAndTradesJob (kafka->postgres passthrough)  | ingest_job |
| ForecastsJob (SMA5/20 per hub)                          | forecasts_job |
| PnlAndExposureJob (keyed co-process -> 2 tables)        | pnl_job |
| IngestDayAheadAndRealTimeJob                            | ingest_da_rt_job |

Each takes already-parsed streaming DataFrames (from sources.kafka.
topic_stream in production, file/rate sources in tests) and returns the
started StreamingQuery(s). Checkpointing mirrors K2 (10 s); sinks mirror K1
(see streaming/sinks.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from kafka_flink_processing_spark.operators.pnl import price_exposure
from kafka_flink_processing_spark.streaming.sinks import parquet_sink
from kafka_flink_processing_spark.streaming.stateful import (
    streaming_pnl,
    streaming_sma_forecast,
)


def ingest_job(parsed: DataFrame, out_dir: str, checkpoint_root: str,
               name: str):
    """Raw ingest passthrough (IngestPricesAndTradesJob / DA-RT variant):
    parsed topic stream -> append sink, no transformation beyond P1-P3."""
    return parquet_sink(parsed, os.path.join(out_dir, name),
                        os.path.join(checkpoint_root, name))


def forecasts_job(prices: DataFrame, out_dir: str, checkpoint_root: str,
                  seq_col: str | None = None):
    """ForecastsJob: keyed rolling SMA(5)/SMA(20) -> forecasts table."""
    fc = streaming_sma_forecast(prices, seq_col=seq_col)
    out = fc.select("ts", "hub", "sma5", "sma20", "forecast_next")
    return parquet_sink(out, os.path.join(out_dir, "forecasts"),
                        os.path.join(checkpoint_root, "forecasts"))


def pnl_job(trades: DataFrame, prices: DataFrame, out_dir: str,
            checkpoint_root: str):
    """PnlAndExposureJob: ONE stateful fold feeding BOTH positions_pnl and
    price_exposure, like the reference's single operator with two sinks
    (PnlAndExposureJob.java:62-76). A single foreachBatch fans the batch out
    so the fold runs once (two writeStreams would execute the state machine
    twice)."""
    pnl = streaming_pnl(trades, prices)

    def write_both(batch: DataFrame, epoch: int) -> None:
        batch.persist()
        batch.write.mode("overwrite").parquet(
            os.path.join(out_dir, "positions_pnl", f"epoch={epoch}"))
        price_exposure(batch).write.mode("overwrite").parquet(
            os.path.join(out_dir, "price_exposure", f"epoch={epoch}"))
        batch.unpersist()

    return (pnl.writeStream.foreachBatch(write_both)
               .option("checkpointLocation",
                       os.path.join(checkpoint_root, "pnl"))
               .start())
