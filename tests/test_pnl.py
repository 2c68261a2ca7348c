"""W2/W3 verification (SURVEY.md §5.2 items 2-3):

- property tests for the netting core (position = sum of signed qty, flat =>
  avg 0, buy-then-sell-all realizes (sell-buy)*qty, same-direction-only =>
  realized 0)
- netting branch coverage on hand fixtures (cold start, add, partial close,
  full close, flip — reference PnlAndExposureJob.java:113-132)
- replay equality: the Spark applyInPandas fold must equal the straight-line
  Python spec fold row-for-row under the documented total order, on both a
  hand fixture and the sf0.001 events derivation
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_flink_processing_spark.operators.netting import (
    PRICE,
    TRADE,
    apply_fill,
    replay,
    sort_key,
)
from kafka_flink_processing_spark.operators.pnl import pnl_positions

# ---------------------------------------------------------------------------
# netting core properties
# ---------------------------------------------------------------------------

fills = st.lists(
    st.tuples(st.sampled_from([5, 10, 25, 50]), st.booleans(),
              st.floats(min_value=5.0, max_value=200.0, allow_nan=False)),
    min_size=1, max_size=50)


def _run(seq):
    pos, avg, realized = 0, 0.0, 0.0
    for mw, is_buy, px in seq:
        pos, avg, realized = apply_fill(pos, avg, realized,
                                        mw if is_buy else -mw, px)
    return pos, avg, realized


@settings(max_examples=200, deadline=None)
@given(fills)
def test_position_is_sum_of_signed_qty(seq):
    pos, _, _ = _run(seq)
    assert pos == sum(mw if b else -mw for mw, b, _ in seq)


@settings(max_examples=200, deadline=None)
@given(fills)
def test_flat_position_has_zero_avg(seq):
    pos, avg, _ = _run(seq)
    if pos == 0:
        assert avg == 0.0


@settings(max_examples=200, deadline=None)
@given(fills)
def test_same_direction_never_realizes(seq):
    same = [(mw, True, px) for mw, _, px in seq]
    _, _, realized = _run(same)
    assert realized == 0.0


@settings(max_examples=200, deadline=None)
@given(st.sampled_from([5, 10, 25, 50]),
       st.floats(min_value=5, max_value=200, allow_nan=False),
       st.floats(min_value=5, max_value=200, allow_nan=False))
def test_round_trip_realizes_spread(mw, buy_px, sell_px):
    pos, avg, realized = _run([(mw, True, buy_px), (mw, False, sell_px)])
    assert pos == 0 and avg == 0.0
    assert math.isclose(realized, mw * (sell_px - buy_px), abs_tol=1e-9)


def test_netting_branches():
    # add to flat (reference :117-120)
    assert apply_fill(0, 0.0, 0.0, 10, 50.0) == (10, 50.0, 0.0)
    # same-direction add: weighted average
    pos, avg, r = apply_fill(10, 50.0, 0.0, 10, 60.0)
    assert (pos, avg, r) == (20, 55.0, 0.0)
    # partial close: avg unchanged, realized = closing * (px - avg)
    pos, avg, r = apply_fill(20, 55.0, 0.0, -5, 65.0)
    assert (pos, avg, r) == (15, 55.0, 50.0)
    # full close: resets to (0, 0.0) (reference :124-125)
    pos, avg, r = apply_fill(15, 55.0, 50.0, -15, 60.0)
    assert (pos, avg, r) == (0, 0.0, 125.0)
    # flip: residual position at fill price (reference :126-128)
    pos, avg, r = apply_fill(10, 50.0, 0.0, -25, 40.0)
    assert (pos, avg, r) == (-15, 40.0, -100.0)
    # short side realized: avg - px (reference :123)
    pos, avg, r = apply_fill(-15, 40.0, 0.0, 5, 30.0)
    assert (pos, avg, r) == (-10, 40.0, 50.0)


# ---------------------------------------------------------------------------
# spec-fold replay semantics (fixture covers every FIXTURES.md §A case)
# ---------------------------------------------------------------------------

def _t(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


FIXTURE = [
    # cold start: trade before any price on its hub (reference :130)
    dict(kind=TRADE, ts=_t(1), hub="H1", trade_id=1, account="A1",
         side="BUY", mw=10, price_mwh=50.0),
    dict(kind=PRICE, ts=_t(2), hub="H1", price_mwh=52.0),
    # second account appears -> price fan-out becomes 2 rows
    dict(kind=TRADE, ts=_t(3), hub="H1", trade_id=2, account="A2",
         side="SELL", mw=5, price_mwh=52.5),
    dict(kind=PRICE, ts=_t(4), hub="H1", price_mwh=51.0),
    # partial close / flip / full close
    dict(kind=TRADE, ts=_t(5), hub="H1", trade_id=3, account="A1",
         side="SELL", mw=25, price_mwh=53.0),
    dict(kind=TRADE, ts=_t(6), hub="H1", trade_id=4, account="A2",
         side="BUY", mw=5, price_mwh=50.0),
    dict(kind=PRICE, ts=_t(7), hub="H1", price_mwh=49.0),
]


def test_spec_fold_semantics():
    rows = replay(sorted(FIXTURE, key=sort_key))
    # 4 trade rows + fan-outs: price@2 ->1 (A1), price@4 ->2, price@7 ->2
    assert len(rows) == 4 + 1 + 2 + 2
    first = rows[0]
    assert first["last_price_mwh"] == 50.0        # cold-start fallback
    assert first["position_mw"] == 10
    flip = [r for r in rows if r["ts"] == _t(5)][0]
    assert flip["position_mw"] == -15 and flip["avg_price_mwh"] == 53.0
    assert flip["realized_pnl"] == 10 * (53.0 - 50.0)
    closed = [r for r in rows if r["ts"] == _t(6)][0]
    assert closed["position_mw"] == 0 and closed["avg_price_mwh"] == 0.0


def test_spark_fold_equals_spec_on_fixture(spark):
    trades = spark.createDataFrame(
        [(r["trade_id"], r["ts"], r["account"], r["hub"], r["side"],
          r["mw"], r["price_mwh"]) for r in FIXTURE if r["kind"] == TRADE],
        "trade_id long, ts timestamp, account string, hub string, "
        "side string, mw int, price_mwh double")
    prices = spark.createDataFrame(
        [(r["ts"], r["hub"], r["price_mwh"]) for r in FIXTURE
         if r["kind"] == PRICE],
        "ts timestamp, hub string, price_mwh double")
    got = {tuple(sorted(r.asDict().items(), key=lambda kv: kv[0]))
           for r in pnl_positions(trades, prices).collect()}
    want = {tuple(sorted(r.items(), key=lambda kv: kv[0]))
            for r in replay(sorted(FIXTURE, key=sort_key))}
    assert got == want


def test_spark_fold_equals_spec_on_events_derivation(spark):
    from kafka_flink_processing_spark.plans.stateful import derive_market
    sf = "/root/testdata/sf0.001"
    trades, prices = derive_market(spark, sf)
    spark_rows = pnl_positions(trades, prices).collect()

    recs = []
    for r in trades.collect():
        recs.append(dict(kind=TRADE, ts=r.ts, hub=r.hub, trade_id=r.trade_id,
                         account=r.account, side=r.side, mw=r.mw,
                         price_mwh=r.price_mwh))
    for r in prices.collect():
        recs.append(dict(kind=PRICE, ts=r.ts, hub=r.hub, price_mwh=r.price_mwh))
    # spec fold is per-hub; group then sort
    by_hub: dict[str, list] = {}
    for rec in recs:
        by_hub.setdefault(rec["hub"], []).append(rec)
    want_rows = []
    for hub_recs in by_hub.values():
        want_rows.extend(replay(sorted(hub_recs, key=sort_key)))

    got = {tuple(sorted(r.asDict().items())) for r in spark_rows}
    want = {tuple(sorted(r.items())) for r in want_rows}
    assert len(spark_rows) == len(want_rows)
    assert got == want


def test_sliced_fold_bitwise_equals_single_fold(spark):
    """The (hub, day-slice) sharded fold with carried-in state must produce
    EXACTLY the single-fold output — same rows, bit-equal floats (state
    crosses the Arrow boundary as float64 round-trips, so the arithmetic
    path per record is identical). The derivation spans 30 days, so this
    genuinely exercises ~30 boundary carries per hub."""
    from kafka_flink_processing_spark.operators.pnl import pnl_positions_sliced
    from kafka_flink_processing_spark.plans.stateful import derive_market
    trades, prices = derive_market(spark, "/root/testdata/sf0.001")
    single = pnl_positions(trades, prices).collect()
    sliced = pnl_positions_sliced(trades, prices).collect()
    assert len(single) == len(sliced)
    key = lambda r: tuple(sorted(r.asDict().items()))  # noqa: E731
    assert {key(r) for r in single} == {key(r) for r in sliced}


def test_sliced_fold_boundary_fixture():
    """Hand fixture crossing a midnight boundary: position opened on day 1,
    price ticks on day 2 must emit fan-out rows for the carried account at
    the carried avg/realized, with last_price carried from day 1."""
    import pandas as pd
    from kafka_flink_processing_spark.operators.pnl import (
        STATE,
        _boundary_states,
        _fold_slice,
    )
    d1 = dt.datetime(2024, 1, 1, 23, 50)
    d2 = dt.datetime(2024, 1, 2, 0, 0)
    # phase A (one (hub, account) group): one trade on day 1, this
    # account's markers for both days — the day-1 marker precedes the trade
    # so no state is emitted for it (account not yet seen)
    pa = pd.DataFrame([
        dict(ts=d1, hub="H", account="A", side="BUY", mw=10.0,
             price_mwh=40.0, trade_id=1, kind=TRADE,
             slice=dt.date(2024, 1, 1)),
        dict(ts=dt.datetime(2024, 1, 1), hub="H", account="A", side=None,
             mw=None, price_mwh=None, trade_id=0, kind=STATE,
             slice=dt.date(2024, 1, 1)),
        dict(ts=d2, hub="H", account="A", side=None, mw=None,
             price_mwh=None, trade_id=0, kind=STATE,
             slice=dt.date(2024, 1, 2)),
    ])
    states = _boundary_states(pa).to_dict("records")
    assert states == [dict(hub="H", slice=dt.date(2024, 1, 2), account="A",
                           st_pos=10, st_avg=40.0, st_realized=0.0)]
    # phase C: day-2 shard = carried state + a price tick
    pc = pd.DataFrame([
        dict(ts=d2, hub="H", account="A", side=None, mw=None, price_mwh=None,
             trade_id=0, kind=STATE, slice=dt.date(2024, 1, 2),
             st_pos=10, st_avg=40.0, st_realized=0.0, st_lastpx=None),
        dict(ts=d2, hub="H", account=None, side=None, mw=None,
             price_mwh=None, trade_id=0, kind=STATE,
             slice=dt.date(2024, 1, 2), st_pos=None, st_avg=None,
             st_realized=None, st_lastpx=41.0),
        dict(ts=dt.datetime(2024, 1, 2, 0, 5), hub="H", account=None,
             side=None, mw=None, price_mwh=45.0, trade_id=0, kind=PRICE,
             slice=dt.date(2024, 1, 2), st_pos=None, st_avg=None,
             st_realized=None, st_lastpx=None),
    ])
    out = _fold_slice(pc).to_dict("records")
    assert len(out) == 1
    r = out[0]
    assert (r["account"], r["position_mw"], r["avg_price_mwh"],
            r["last_price_mwh"], r["unrealized_pnl"]) == ("A", 10, 40.0,
                                                          45.0, 50.0)


import pytest


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_hybrid_fold_bitwise_equals_single_fold(spark, sf_dir):
    """The hybrid decomposition (Python over sparse trades only + JVM
    window-algebra emission) must produce EXACTLY the single-fold output —
    same rows, bit-equal floats — at BOTH test SFs (sf0.01 spans enough
    days that the day-keyed last-price carry is genuinely exercised).
    This is the strongest check on the two as-of attachments: the
    day-keyed last-price pass must see ticks strictly before each trade
    (equal-ts ticks excluded, cross-day carry via the shared entry-price
    helper), and the per-(hub, account) state window must see same-ts
    trades (included) — one row differing in last_price or state breaks
    set equality."""
    from kafka_flink_processing_spark.operators.pnl import pnl_positions_hybrid
    from kafka_flink_processing_spark.plans.stateful import derive_market
    trades, prices = derive_market(spark, sf_dir)
    single = pnl_positions(trades, prices).collect()
    hybrid = pnl_positions_hybrid(trades, prices).collect()
    assert len(single) == len(hybrid)
    key = lambda r: tuple(sorted(r.asDict().items()))  # noqa: E731
    assert {key(r) for r in single} == {key(r) for r in hybrid}
