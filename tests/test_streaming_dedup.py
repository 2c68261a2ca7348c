"""Streaming deduplication: dropDuplicates / dropDuplicatesWithinWatermark
over a file stream — the exactly-once ingest guard for at-least-once
sources (the reference's plain-INSERT sinks can duplicate on replay,
SURVEY.md §2.6 'delivery'; trade_id is its only dedup key, init.sql:20).
"""

from __future__ import annotations

import pytest

import datetime as dt

pytestmark = pytest.mark.slow  # integration tier (see pytest.ini)


SCHEMA = "trade_id long, ts timestamp, hub string, mw int"


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _drop(spark, rows, src, n):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
         .write.mode("overwrite").parquet(f"{src}/b{n}")


def test_streaming_dedup_by_key_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    _drop(spark, [(1, _t(1), "H0", 5), (2, _t(2), "H0", 10),
                  (1, _t(1), "H0", 5)], src, 1)          # dup within batch

    stream = (spark.readStream.schema(SCHEMA).parquet(f"{src}/b*")
              .withWatermark("ts", "10 minutes")
              .dropDuplicatesWithinWatermark(["trade_id"]))
    q = (stream.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    try:
        q.processAllAvailable()
        # replayed trade 1 in a LATER batch (at-least-once redelivery):
        # state remembers the key within the watermark -> still dropped
        _drop(spark, [(1, _t(3), "H0", 5), (3, _t(4), "H0", 25)], src, 2)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.table("dedup_stream").collect()
    ids = sorted(r.trade_id for r in rows)
    assert ids == [1, 2, 3]                 # each trade exactly once
    assert {r.trade_id: r.mw for r in rows} == {1: 5, 2: 10, 3: 25}
