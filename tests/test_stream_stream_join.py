"""Native stream-stream interval join (Structured Streaming two-stream
join with watermarks) — the Spark-idiomatic sibling of the reference's
connect+CoProcess correlation (PnlAndExposureJob.java:50-51).

Where W2 keeps explicit state, Spark's stream-stream join buffers both
sides under watermark bounds and emits pairs satisfying the event-time
constraint. Semantics are checked by parity with the identical batch
interval join (unified batch/streaming), and the time-bound is verified
directly on the output.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import DataFrame, functions as F

pytestmark = pytest.mark.slow  # integration tier (see pytest.ini)

JOIN_WINDOW_S = 600  # price valid for a trade within 10 min after the tick


def _interval_join(trades: DataFrame, prices: DataFrame) -> DataFrame:
    """All (trade, price) pairs on the same hub with the price tick at or
    before the trade and at most JOIN_WINDOW_S older (both sides
    watermarked when streaming)."""
    p = (prices.withColumnRenamed("ts", "price_ts")
               .withColumnRenamed("hub", "price_hub"))
    cond = ((F.col("hub") == F.col("price_hub"))
            & (F.col("price_ts") <= F.col("ts"))
            & (F.col("price_ts") >= F.col("ts") - F.expr(
                f"INTERVAL {JOIN_WINDOW_S} SECONDS")))
    return (trades.join(p, cond)
            .select("trade_id", "ts", "hub", "mw",
                    "price_ts", F.col("price_mwh").alias("ref_price")))


def _mk_trades(spark, rows):
    return spark.createDataFrame(
        rows, "trade_id long, ts timestamp, hub string, mw int")


def _mk_prices(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, hub string, price_mwh double")


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def fixture_data(spark):
    trades = _mk_trades(spark, [
        (1, _t(10), "H0", 5),     # @00:30/@05:00/@09:59 all within 600s
        (2, _t(20), "H0", 10),    # only @19:00 in window
        (3, _t(10), "H1", 25),    # other hub: no price at all
        (4, _t(2), "H0", 50),     # before any in-window price? @00:30 works
    ])
    prices = _mk_prices(spark, [
        (_t(0, 30), "H0", 100.0),
        (_t(5), "H0", 101.0),
        (_t(9, 59), "H0", 102.0),
        (_t(19), "H0", 103.0),
        (_t(21), "H0", 104.0),    # after trade 2: excluded (price_ts > ts)
        (_t(10), "H2", 999.0),
    ])
    return trades, prices


def test_stream_stream_join_matches_batch(spark, fixture_data, tmp_path):
    trades, prices = fixture_data
    expected = {tuple(r) for r in _interval_join(trades, prices).collect()}
    assert expected, "fixture must produce matches"

    tsrc, psrc = str(tmp_path / "t"), str(tmp_path / "p")
    trades.coalesce(1).write.parquet(tsrc)
    prices.coalesce(1).write.parquet(psrc)
    st = (spark.readStream.schema(trades.schema).parquet(tsrc)
          .withWatermark("ts", "1 minute"))
    sp = (spark.readStream.schema(prices.schema).parquet(psrc)
          .withWatermark("ts", "1 minute"))
    out = _interval_join(st, sp)
    q = (out.writeStream.format("memory").queryName("ssj")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {tuple(r) for r in spark.table("ssj").collect()}
    assert got == expected


def test_interval_bound_enforced(spark, fixture_data):
    trades, prices = fixture_data
    rows = _interval_join(trades, prices).collect()
    for r in rows:
        age = (r.ts - r.price_ts).total_seconds()
        assert 0 <= age <= JOIN_WINDOW_S
    # trade 3 (H1) and the H2 price never appear
    assert not [r for r in rows if r.hub in ("H1", "H2")]
    # trade 1 sees exactly the three in-window H0 prices
    t1 = sorted(r.ref_price for r in rows if r.trade_id == 1)
    assert t1 == [100.0, 101.0, 102.0]
