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


def incremental_dedup_job(docs_stream: DataFrame, corpus: DataFrame,
                          out_dir: str, checkpoint_root: str,
                          n: int = 3, threshold: float = 0.6,
                          available_now: bool = False):
    """Streaming near-dup ingest guard: each arriving document micro-batch
    probes the STANDING corpus's MinHash-LSH index; matches land in
    `out_dir/dups` (doc_id, dup_of, jaccard) and clean documents append to
    `out_dir/accepted` — the streaming form of the batch
    `dedup_incremental_minhash` query, with identical per-pair semantics
    (same banding, same exact-Jaccard verification).

    Scale shape: the corpus signature/band tables are built ONCE (cached
    via the dedup memo — at 100 TB this is the persisted LSH index a daily
    pipeline maintains); per batch only the increment is shingled
    (memo=False — epoch plans must not accumulate cache entries), and
    candidates are O(batch x dup rate), never corpus x corpus.
    """
    import os as _os

    from pyspark.sql import functions as F

    from kafka_flink_processing_spark.operators.dedup import (
        _cached_signatures,
        _lsh_bands,
        minhash_signatures,
    )

    corpus_sig = _cached_signatures(corpus, n, "doc_id", "text")
    corpus_bands = _lsh_bands(corpus_sig)
    sh_c = corpus_sig.select(F.col("doc_id").alias("dup_of"),
                             F.col("sh").alias("sh_c"))

    def screen(batch: DataFrame, epoch: int) -> None:
        if batch.isEmpty():
            return
        sig_b = minhash_signatures(batch, n, memo=False)
        sig_b = sig_b.persist()
        bands_b = _lsh_bands(sig_b)
        cand = (bands_b.alias("b")
                .join(corpus_bands.alias("c"),
                      (F.col("b.band") == F.col("c.band"))
                      & (F.col("b.key") == F.col("c.key")))
                .select(F.col("b.doc_id").alias("doc_id"),
                        F.col("c.doc_id").alias("dup_of"))
                .distinct())
        sh_b = sig_b.select("doc_id", F.col("sh").alias("sh_b"))
        joined = cand.join(sh_b, "doc_id").join(sh_c, "dup_of")
        inter = F.size(F.array_intersect("sh_b", "sh_c"))
        jac = inter / (F.size("sh_b") + F.size("sh_c") - inter)
        dups = (joined.withColumn("jaccard", jac)
                .filter(F.col("jaccard") >= threshold)
                .select("doc_id", "dup_of", "jaccard"))
        dups = dups.persist()
        dups.write.mode("overwrite").parquet(
            _os.path.join(out_dir, "dups", f"epoch={epoch}"))
        accepted = batch.join(dups.select("doc_id").distinct(),
                              "doc_id", "left_anti")
        accepted.write.mode("overwrite").parquet(
            _os.path.join(out_dir, "accepted", f"epoch={epoch}"))
        dups.unpersist()
        sig_b.unpersist()

    w = (docs_stream.writeStream.foreachBatch(screen)
         .option("checkpointLocation",
                 _os.path.join(checkpoint_root, "incremental_dedup")))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
