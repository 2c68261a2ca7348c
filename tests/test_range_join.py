"""Bucketed range join: exact boundary semantics and bucket-crossing
correctness (operators/range_join.py), plus the registered attribution
query's zero-match handling."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from kafka_flink_processing_spark.operators.range_join import (
    bucketed_range_join,
)

T0 = datetime(2026, 1, 1, 12, 0, 0)
MIN_US = 60 * 1_000_000


def _ts(minutes: float) -> datetime:
    return T0 + timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, "k1", _ts(60)), (2, "k1", _ts(95)), (3, "k2", _ts(60))],
        "l_id long, k string, lts timestamp")
    right = spark.createDataFrame(
        [("k1", _ts(30), 1.0),   # exactly at l1's lower bound: EXCLUDED
         ("k1", _ts(31), 2.0),   # inside l1's window
         ("k1", _ts(60), 3.0),   # exactly at l1's upper bound: INCLUDED
         ("k1", _ts(61), 4.0),   # after l1; inside l2's window
         ("k1", _ts(94), 5.0),   # inside l2's window, different bucket than l2
         ("k2", _ts(59), 6.0),   # other key
         ("k3", _ts(59), 7.0)],  # key with no left rows
        "k string, rts timestamp, v double")
    return left, right


def _matches(left, right):
    out = bucketed_range_join(left, right, on=["k"], left_ts="lts",
                              right_ts="rts", lower_us=-30 * MIN_US,
                              upper_us=0)
    return {(r.l_id, r.v) for r in out.collect()}


def test_boundaries_and_bucket_crossing(spark, sides):
    left, right = sides
    got = _matches(left, right)
    # l1 window (30m, 60m]: ts(30) on the open lower bound is excluded,
    # ts(60) on the closed upper bound included — and ts(31)=12:31 lies in
    # the 30-min bucket BEFORE l1's (l1=13:00 starts its own bucket), so
    # (1, 2.0) only matches through the adjacent-bucket probe.
    # l2 window (65m, 95m]: only ts(94).
    assert got == {(1, 2.0), (1, 3.0), (2, 5.0), (3, 6.0)}


def test_keys_never_cross(spark, sides):
    left, right = sides
    got = _matches(left, right)
    assert all(v != 7.0 for _, v in got)


def test_empty_range_rejected(spark, sides):
    left, right = sides
    with pytest.raises(ValueError):
        bucketed_range_join(left, right, on=["k"], left_ts="lts",
                            right_ts="rts", lower_us=0, upper_us=0)


def test_equals_naive_nested_loop(spark, sides):
    """The bucketed rewrite must equal the semantically obvious (but
    unscalable) raw non-equi join on random-ish data."""
    left, right = sides
    lo, hi = -30 * MIN_US, 0
    naive = (left.join(right, "k")
             .filter((F.unix_micros("rts") > F.unix_micros("lts") + lo)
                     & (F.unix_micros("rts") <= F.unix_micros("lts") + hi))
             .select("l_id", "v"))
    assert _matches(left, right) == {(r.l_id, r.v) for r in naive.collect()}


def test_attribution_zero_click_purchases_kept(spark):
    from kafka_flink_processing_spark.plans.registry import QUERIES, _ensure_loaded
    _ensure_loaded()
    out = QUERIES["range_join_attribution"].spark(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    n_purchases = len(rows)
    assert n_purchases > 0
    assert all(r.n_clicks >= 0 for r in rows)
    # every purchase appears exactly once, even with zero clicks
    assert len({r.purchase_id for r in rows}) == n_purchases
