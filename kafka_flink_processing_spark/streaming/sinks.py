"""Streaming sinks mirroring the reference's delivery contract (K1/K2).

The reference batch-inserts into Postgres via JDBC (500 rows / 200 ms / 3
retries — IngestPricesAndTradesJob.java:42-46) with 10 s checkpoints
(ForecastsJob.java:28), i.e. at-least-once. Spark equivalents:

- jdbc_batch_sink: foreachBatch -> DataFrameWriter.jdbc with batchsize=500.
  Same at-least-once caveat (plain INSERTs can duplicate on replay); for
  exactly-once use parquet_sink (idempotent per-batch overwrite) or an
  upsert-capable store.
- parquet_sink: epoch-partitioned parquet written idempotently
  (overwrite by batch-id directory), the engine's exactly-once path.
- memory sink helpers for tests/demos.

No Postgres exists in the build sandbox, but Spark bundles Apache Derby
(its Hive-metastore store), whose embedded driver is a real in-process
JDBC database — tests/test_jdbc_sink.py drives jdbc_batch_sink live
against `jdbc:derby:` end-to-end (write via foreachBatch, read back via
spark.read.jdbc, append-on-replay at-least-once semantics). Postgres
itself differs only by url/driver string.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

JDBC_BATCH_SIZE = 500   # reference JdbcExecutionOptions batchSize
CHECKPOINT_INTERVAL_MS = 10_000  # reference enableCheckpointing(10_000)


def jdbc_batch_sink(df: DataFrame, url: str, table: str,
                    properties: dict[str, str],
                    checkpoint_dir: str,
                    available_now: bool = False):
    """At-least-once JDBC append sink (K1 analogue). available_now=True
    drains what's currently readable and stops (the test/backfill
    trigger); the default is the production continuous micro-batch."""
    def write_batch(batch: DataFrame, _epoch: int) -> None:
        (batch.write.mode("append")
              .option("batchsize", JDBC_BATCH_SIZE)
              .jdbc(url, table, properties=properties))

    writer = (df.writeStream.foreachBatch(write_batch)
                .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def parquet_sink(df: DataFrame, out_dir: str, checkpoint_dir: str):
    """Exactly-once file sink: each epoch lands in its own directory, so a
    replayed batch overwrites its previous (possibly partial) output instead
    of duplicating it."""
    def write_batch(batch: DataFrame, epoch: int) -> None:
        batch.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch}"))

    return (df.writeStream.foreachBatch(write_batch)
              .option("checkpointLocation", checkpoint_dir)
              .start())


def drain_streaming_result(batch_df: DataFrame, build_stream, tag: str,
                           output_mode: str = "append") -> DataFrame:
    """TEST-HARNESS-ONLY batch->stream->drain: stage `batch_df` as a
    single-file parquet dir, apply `build_stream(stream_df)` and drain it
    availableNow into a memory sink; return the drained table.

    The registered streaming queries (streaming_ohlc_bars,
    streaming_forecast_sma, ...) use this to hash-match their streaming
    operators against batch oracles; a production job reads the Kafka
    sources (sources/kafka.py) instead — never lift the coalesce(1)
    staging write into a job shape, it funnels the whole table through one
    writer task (it exists here so the drain sees one deterministic
    micro-batch).

    Leak discipline (r4 advice): the scratch dir (full staging copy +
    checkpoint) is deleted before returning — the memory sink owns the
    drained rows, independent of the staging files — and the sink table
    name is FIXED per tag, so re-invoking a query replaces its previous
    view (and frees those rows) instead of pinning one uuid-named result
    table per invocation for the session's lifetime. Consequence: the
    returned DataFrame is only valid until the same tag is drained again —
    consume it before re-invoking, as every harness does.
    """
    return drain_streaming_multi({"only": batch_df},
                                 lambda s: build_stream(s["only"]),
                                 tag, output_mode=output_mode)


def drain_streaming_multi(batch_dfs: dict[str, "DataFrame"], build_streams,
                          tag: str, output_mode: str = "append") -> DataFrame:
    """Multi-source sibling of drain_streaming_result for queries that need
    SEVERAL independent streams (stream-stream joins): each batch_df is
    staged to its own single-file parquet dir and `build_streams` receives
    `{key: stream_df}`. Same test-harness-only caveats and same leak
    discipline (scratch tree removed, fixed sink table per tag)."""
    import shutil
    import tempfile

    spark = next(iter(batch_dfs.values())).sparkSession
    work = tempfile.mkdtemp(prefix=f"kfps_{tag}_")
    try:  # r5 advice: a failed stage/drain must not leak the scratch tree
        streams = {}
        for key, df in batch_dfs.items():
            src = f"{work}/src_{key}"
            df.coalesce(1).write.mode("overwrite").parquet(src)
            streams[key] = spark.readStream.schema(df.schema).parquet(src)
        name = f"{tag}_stream_result"
        spark.catalog.dropTempView(name)  # no-op when absent
        run_available_now(build_streams(streams), name, f"{work}/ckpt",
                          output_mode=output_mode)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.table(name)


def run_available_now(df: DataFrame, query_name: str, checkpoint_dir: str,
                      output_mode: str = "append"):
    """Drain everything currently available into an in-memory table and stop
    (the reference-parity test harness path). output_mode="complete" for
    streaming aggregations whose full result table should land (windowed
    stats without a watermark); "append" for row streams / stateful emits."""
    q = (df.writeStream.format("memory").queryName(query_name)
           .outputMode(output_mode)
           .option("checkpointLocation", checkpoint_dir)
           .trigger(availableNow=True)
           .start())
    q.awaitTermination()
    return q
