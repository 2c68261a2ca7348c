"""Watermark semantics for the streaming tumbling-window extension
(streaming/windows.py): append-mode emission on window close and late-data
drop beyond the allowed delay.

The reference has no watermarks at all (WatermarkStrategy.noWatermarks(),
SURVEY.md §2.6) — this is engine-extension behavior, so the spec being
pinned is Structured Streaming's: watermark = max(event time seen) - delay,
advanced at micro-batch boundaries; a window emits once its end <= watermark;
rows older than the watermark are dropped.
"""

from __future__ import annotations

import datetime as dt

import pytest

from kafka_flink_processing_spark.streaming.windows import (
    streaming_tumbling_stats,
)

pytestmark = pytest.mark.slow  # integration tier (see pytest.ini)

SCHEMA = "ts timestamp, hub string, price_mwh double"


def _t(hour: int, minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, hour, minute)


def _drop(spark, rows, src, n: int) -> None:
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
         .write.mode("overwrite").parquet(f"{src}/b{n}")


def test_append_mode_emits_closed_windows_and_drops_late(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: two ticks in window [00:00, 01:00) — watermark still behind
    _drop(spark, [(_t(0, 5), "H0", 10.0), (_t(0, 10), "H0", 20.0)], src, 1)

    stream = spark.readStream.schema(SCHEMA).parquet(f"{src}/b*")
    agg = streaming_tumbling_stats(stream, "1 hour",
                                   watermark_delay="10 minutes")
    q = (agg.writeStream.format("memory").queryName("wm_windows")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        # explicit micro-batch boundaries: drain between file drops so the
        # watermark advances batch-by-batch exactly as commented
        q.processAllAvailable()
        # batch 2: tick at 02:30 advances the watermark to 02:20 -> closes W0
        _drop(spark, [(_t(2, 30), "H0", 30.0)], src, 2)
        q.processAllAvailable()
        # batch 3: late tick for W0 at 00:15, beyond the 10-min delay -> DROP
        _drop(spark, [(_t(0, 15), "H0", 99.0)], src, 3)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.table("wm_windows").collect()
    w0 = [r for r in rows if r.window_start == _t(0, 0)]
    # W0 emitted exactly once, WITHOUT the late 99.0 tick
    assert len(w0) == 1
    assert w0[0].n_ticks == 2
    assert w0[0].sum_price == pytest.approx(30.0)
    assert w0[0].max_price == pytest.approx(20.0)
    # the 02:00 window is still open (watermark 02:20 < 03:00) -> not emitted
    assert not [r for r in rows if r.window_start == _t(2, 0)]


def test_no_watermark_complete_mode_keeps_all_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    _drop(spark, [(_t(0, 5), "H0", 10.0), (_t(5, 1), "H1", 20.0)], src, 1)
    stream = spark.readStream.schema(SCHEMA).parquet(f"{src}/b*")
    agg = streaming_tumbling_stats(stream, "1 hour")
    q = (agg.writeStream.format("memory").queryName("cm_windows")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    rows = {(r.window_start, r.hub): r.n_ticks
            for r in spark.table("cm_windows").collect()}
    assert rows == {(_t(0, 0), "H0"): 1, (_t(5, 0), "H1"): 1}


def test_session_window_append_mode_merges_then_emits_and_drops_late(
        spark, tmp_path):
    """Session windows under a watermark (r5): ticks 25 min apart MERGE
    into one session (gap 30 min); the session emits once the watermark
    passes its end (last_ts + gap); a tick older than the watermark is
    dropped, not retro-merged."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    # batch 1: two ticks 25 min apart -> ONE open session [00:00, 00:55)
    _drop(spark, [(_t(0, 0), "H0", 10.0), (_t(0, 25), "H0", 20.0)], src, 1)

    stream = spark.readStream.schema(SCHEMA).parquet(f"{src}/b*")
    agg = (stream.withWatermark("ts", "10 minutes")
           .groupBy(F.session_window("ts", "30 minutes").alias("w"), "hub")
           .agg(F.count("*").alias("n_ticks"),
                F.sum("price_mwh").alias("sum_price"))
           .select("hub", F.col("w.start").alias("session_start"),
                   F.col("w.end").alias("session_end"),
                   "n_ticks", "sum_price"))
    q = (agg.writeStream.format("memory").queryName("wm_sessions")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
        # batch 2: tick at 02:00 -> watermark 01:50 > 00:55 closes it
        _drop(spark, [(_t(2, 0), "H0", 30.0)], src, 2)
        q.processAllAvailable()
        # batch 3: late tick at 00:05 (behind the watermark) -> dropped
        _drop(spark, [(_t(0, 5), "H0", 99.0)], src, 3)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.table("wm_sessions").collect()
    s0 = [r for r in rows if r.session_start == _t(0, 0)]
    assert len(s0) == 1                       # merged, emitted exactly once
    assert s0[0].n_ticks == 2                 # late 99.0 NOT retro-merged
    assert s0[0].session_end == _t(0, 55)     # last_ts + gap
    assert s0[0].sum_price == pytest.approx(30.0)
    # the 02:00 session is still open -> not in append output
    assert not [r for r in rows if r.session_start == _t(2, 0)]
