"""Fixture-level semantics for the market-analytics pack: tick-order
tie-breaks, the return winsorization/zero-price guards, hand-computed
drawdown and VWAP — plus the plan shapes the oracle can't see."""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest

from pyspark.sql import functions as F

from kafka_flink_processing_spark.plans.market import (
    max_drawdown_q,
    ohlc_bars_q,
    realized_variance_daily_q,
    trade_flow_net_q,
    vwap_hub_day_q,
)
from tests.test_plans import plan_of

T0 = dt.datetime(2024, 3, 1, 9, 0, 0)


def _event_table(spark, td, rows):
    """rows: (event_id, user_id, offset_us, event_type, value)."""
    data = [(eid, T0 + dt.timedelta(microseconds=int(off)), uid, et,
             float(v), "{}") for eid, uid, off, et, v in rows]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.write.mode("overwrite").parquet(f"{td}/events.parquet")


SEC = 1_000_000
# user_id 0 -> HUB0; view/click are ticks, purchase=BUY / error=SELL trades


def test_ohlc_tie_break_at_equal_ts(spark):
    # three ticks at the SAME (hub, ts): open must take the LOWEST
    # tick_id's price and close the HIGHEST tick_id's — without the
    # tie-break this would be partition-order roulette
    rows = [
        (10, 0, 0, "view", 50.0),
        (11, 0, 0, "view", 99.0),
        (12, 0, 0, "view", 10.0),
        (13, 0, 60 * SEC, "click", 70.0),
    ]
    with tempfile.TemporaryDirectory(prefix="kfps_ohlc_") as td:
        _event_table(spark, td, rows)
        out = ohlc_bars_q(spark, td).collect()
    assert len(out) == 1
    bar = out[0]
    assert bar.open == 50.0       # tick_id 10 at the tied ts
    assert bar.close == 70.0      # strictly later tick
    assert bar.high == 99.0 and bar.low == 10.0 and bar.n_ticks == 4


def test_ohlc_close_tie_break(spark):
    # ties at the LAST ts too: close = highest tick_id among them
    rows = [
        (1, 0, 0, "view", 20.0),
        (2, 0, 60 * SEC, "view", 30.0),
        (3, 0, 60 * SEC, "view", 40.0),
    ]
    with tempfile.TemporaryDirectory(prefix="kfps_ohlc2_") as td:
        _event_table(spark, td, rows)
        out = ohlc_bars_q(spark, td).collect()
    assert out[0].open == 20.0 and out[0].close == 40.0


def test_vwap_hand_check(spark):
    # trades: event_id%4 picks mw from (5,10,25,50); purchase=BUY
    # ids 4 (mw 5, px 100) and 5 (mw 10, px 40):
    # vwap = (5*100 + 10*40) / 15 = 900/15 = 60
    rows = [
        (4, 0, 0, "purchase", 100.0),
        (5, 0, 60 * SEC, "error", 40.0),
    ]
    with tempfile.TemporaryDirectory(prefix="kfps_vwap_") as td:
        _event_table(spark, td, rows)
        out = vwap_hub_day_q(spark, td).collect()
    assert len(out) == 1
    assert out[0].vwap == pytest.approx(60.0)
    assert out[0].total_mw == 15 and out[0].n_trades == 2


def test_trade_flow_signs(spark):
    rows = [
        (4, 0, 0, "purchase", 100.0),   # BUY mw 5
        (5, 0, 1 * SEC, "error", 40.0),  # SELL mw 10
        (6, 0, 2 * SEC, "signup", 10.0),  # BUY mw 25
    ]
    with tempfile.TemporaryDirectory(prefix="kfps_flow_") as td:
        _event_table(spark, td, rows)
        out = trade_flow_net_q(spark, td).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.buy_mw, r.sell_mw, r.net_mw, r.n_trades) == (30, 10, 20, 3)


def test_drawdown_hand_check(spark):
    # prices 10, 5, 8, 12, 6 -> running peaks 10,10,10,12,12
    # drawdowns 0, .5, .2, 0, .5 -> max 0.5; peak 12
    rows = [(i, 0, i * 60 * SEC, "view", p)
            for i, p in enumerate([10.0, 5.0, 8.0, 12.0, 6.0])]
    with tempfile.TemporaryDirectory(prefix="kfps_dd_") as td:
        _event_table(spark, td, rows)
        out = max_drawdown_q(spark, td).collect()
    assert len(out) == 1
    assert out[0].peak_price == 12.0
    assert out[0].max_drawdown == pytest.approx(0.5)


def test_variance_guards(spark):
    # tick sequence 0.0 -> 100.0 -> 50.0:
    #  - the return OFF the zero price is excluded (prev > 0 guard)
    #  - 100 -> 50 gives r = -0.5, squared 0.25
    # then a planted 0.01 -> 100 jump (r = 9999) must clamp to 10
    rows = [
        (1, 0, 0, "view", 0.0),
        (2, 0, 10 * SEC, "view", 100.0),
        (3, 0, 20 * SEC, "view", 50.0),
        (4, 0, 30 * SEC, "view", 0.01),
        (5, 0, 40 * SEC, "view", 100.0),
    ]
    with tempfile.TemporaryDirectory(prefix="kfps_var_") as td:
        _event_table(spark, td, rows)
        out = realized_variance_daily_q(spark, td).collect()
    assert len(out) == 1
    r = out[0]
    # returns kept: 100->50 (-0.5), 50->0.01 (clamped low end is fine,
    # r = -0.9998), 0.01->100 (clamps to 10)
    assert r.n_returns == 3
    assert r.sum_sq_returns == pytest.approx(
        0.25 + round((0.01 / 50 - 1) ** 2, 8) + 100.0, abs=1e-6)


def test_ohlc_is_single_exchange_no_join(spark):
    plan = plan_of(spark, "ohlc_bars")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    # min_by/max_by over an ORDER struct plan as partial+final
    # SortAggregate — the partial before the exchange is the map-side
    # combine that keeps the exchange one-row-per-bar-per-partition
    assert "partial_min_by" in plan


def test_drawdown_is_one_window_pass(spark):
    plan = plan_of(spark, "max_drawdown")
    assert plan.count("Exchange hashpartitioning") <= 2  # window + final agg
    assert "Window" in plan
    assert "Join" not in plan


def test_flow_and_vwap_are_hash_aggregates(spark):
    for name in ("vwap_hub_day", "trade_flow_net"):
        plan = plan_of(spark, name)
        assert "HashAggregate" in plan, name
        assert plan.count("Exchange hashpartitioning") == 1, name
