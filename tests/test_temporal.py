"""Semantic unit tests for the time-windowed extensions (plans/temporal.py).

Oracle parity at sf0.001 is covered by test_oracle_parity (registry-driven);
these pin the window semantics on hand-built edge-case fixtures.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka_flink_processing_spark.plans import temporal


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(
        minutes=minute, seconds=second)


@pytest.fixture(scope="module")
def mini_events(spark):
    # user 1: three events with a 30-min gap edge — gap == 30min exactly
    # stays in-session (boundary is strict >), gap > 30min opens a new one.
    rows = [
        (1, _ts(0), 1, "view", 10.0, ""),
        (2, _ts(30), 1, "view", 20.0, ""),        # gap == 30min -> same session
        (3, _ts(61), 1, "view", 30.0, ""),        # gap 31min -> new session
        (4, _ts(0), 2, "view", 5.0, ""),          # other user isolated
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")


def test_session_gap_boundary(spark, mini_events, tmp_path, monkeypatch):
    monkeypatch.setattr(temporal, "load_table",
                        lambda _s, _t, _d: mini_events)
    out = temporal.session_window_stats(spark, "ignored").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r.session_id)
    assert [r.n_events for r in u1] == [2, 1]
    assert u1[0].session_start == _ts(0) and u1[0].session_end == _ts(30)
    assert u1[1].session_start == _ts(61)
    assert len(by_user[2]) == 1 and by_user[2][0].n_events == 1


def test_sliding_each_row_in_exactly_4_windows(spark, mini_events, monkeypatch):
    monkeypatch.setattr(temporal, "load_table",
                        lambda _s, _t, _d: mini_events)
    out = temporal.sliding_window_stats(spark, "ignored")
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == 4 * mini_events.count()
    # window arithmetic: every window is exactly 1h long, start % 15min == 0
    for r in out.collect():
        assert (r.window_end - r.window_start) == dt.timedelta(hours=1)
        assert r.window_start.minute % 15 == 0
        assert r.window_start.second == 0


def test_tumbling_partitions_events_once(spark, mini_events, monkeypatch):
    monkeypatch.setattr(temporal, "load_table",
                        lambda _s, _t, _d: mini_events)
    out = temporal.tumbling_window_stats(spark, "ignored")
    assert out.agg(F.sum("n_events")).collect()[0][0] == mini_events.count()


def test_grouping_sets_shapes(spark):
    out = temporal.grouping_sets_revenue(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    # exactly one grand-total row, flagged by both GROUPING() bits
    grand = [r for r in rows if r.g_priority == 1 and r.g_status == 1]
    assert len(grand) == 1
    assert grand[0].o_orderpriority is None and grand[0].o_orderstatus is None
    # grand total equals the sum over the (priority, status) leaf set
    leaves = [r for r in rows if r.g_priority == 0 and r.g_status == 0]
    assert sum(r.n_orders for r in leaves) == grand[0].n_orders


def test_da_rt_basis_cold_start_nulls(spark):
    out = temporal.da_rt_asof_basis(spark, "/root/testdata/sf0.001")
    rows = out.orderBy("hub", "ts").collect()
    assert len(rows) > 0
    # per hub: once lmp_da is non-null it stays non-null (last-value carry)
    seen = {}
    for r in rows:
        if seen.get(r.hub) and r.lmp_da is None:
            pytest.fail(f"lmp_da regressed to null on {r.hub}")
        if r.lmp_da is not None:
            seen[r.hub] = True
            assert r.basis == pytest.approx(r.lmp_rt - r.lmp_da)
