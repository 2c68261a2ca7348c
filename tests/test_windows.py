"""Warm-up edge cases for the window operators (SURVEY.md §5.2 item 4):
rows 1/4/5/6/20/21 per key must average over exactly min(i, n) trailing rows,
matching the reference's ring-buffer semantics (ForecastsJob.java:76-88)."""

from __future__ import annotations

import datetime as dt

import pytest

from kafka_flink_processing_spark.operators.windows import (
    last_value_carried_forward,
    latest_per_key,
    rolling_sma_forecast,
    top_k,
)


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


@pytest.fixture(scope="module")
def ticks(spark):
    rows = [(i, _ts(i), "HUB-A", float(i)) for i in range(1, 26)]
    rows += [(100 + i, _ts(i), "HUB-B", 10.0 * i) for i in range(1, 4)]
    return spark.createDataFrame(rows, "seq long, ts timestamp, hub string, price double")


def test_sma_warmup_and_steady_state(ticks):
    out = rolling_sma_forecast(ticks, ["hub"], ["ts", "seq"], "price") \
        .filter("hub = 'HUB-A'").orderBy("seq").collect()
    by_seq = {r.seq: r for r in out}
    assert by_seq[1].sma5 == 1.0 and by_seq[1].sma20 == 1.0          # first row emits
    assert by_seq[4].sma5 == pytest.approx((1 + 2 + 3 + 4) / 4)       # warming: 4 rows
    assert by_seq[5].sma5 == pytest.approx(3.0)                       # full 5-window
    assert by_seq[6].sma5 == pytest.approx(4.0)                       # oldest dropped
    assert by_seq[20].sma20 == pytest.approx(sum(range(1, 21)) / 20)
    assert by_seq[21].sma20 == pytest.approx(sum(range(2, 22)) / 20)
    assert all(r.forecast_next == r.sma5 for r in out)                # ForecastsJob.java:84


def test_sma_partitions_isolated(ticks):
    out = rolling_sma_forecast(ticks, ["hub"], ["ts", "seq"], "price") \
        .filter("hub = 'HUB-B'").orderBy("seq").collect()
    assert [r.sma5 for r in out] == [10.0, 15.0, 20.0]


def test_lvcf_ignores_nulls(spark):
    rows = [(1, _ts(1), "k", 5.0), (2, _ts(2), "k", None),
            (3, _ts(3), "k", 7.0), (4, _ts(4), "k", None)]
    df = spark.createDataFrame(rows, "seq long, ts timestamp, k string, v double")
    out = last_value_carried_forward(df, ["k"], ["ts", "seq"], "v").orderBy("seq").collect()
    assert [r.last_value for r in out] == [5.0, 5.0, 7.0, 7.0]


def test_latest_per_key(ticks):
    out = latest_per_key(ticks, ["hub"], ["ts", "seq"]).collect()
    got = {r.hub: r.seq for r in out}
    assert got == {"HUB-A": 25, "HUB-B": 103}


def test_top_k(ticks):
    out = top_k(ticks, ["ts", "seq"], 3, desc=True).collect()
    assert [r.seq for r in out] == [25, 24, 23]
