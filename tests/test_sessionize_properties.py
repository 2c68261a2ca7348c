"""Property-based check for the shared sessionizer: on arbitrary
per-user microsecond offset sequences, the distributed lag+cumsum
session numbering must agree with a straight-line Python fold (the
spec), including tie handling and the strictly-greater gap rule."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from kafka_flink_processing_spark.operators.sessionize import (
    SESSION_GAP_US,
    with_session_id,
)

_spark = None
T0 = dt.datetime(2024, 6, 1)


def _get_spark():
    global _spark
    if _spark is None:
        from kafka_flink_processing_spark.session import get_spark
        _spark = get_spark("sess_prop")
    return _spark


def session_spec(rows):
    """rows: (event_id, user_id, offset_us) -> {event_id: session_id}.
    Straight-line fold in (ts, event_id) order per user."""
    out = {}
    by_user: dict[int, list] = {}
    for eid, uid, off in rows:
        by_user.setdefault(uid, []).append((off, eid))
    for uid, evs in by_user.items():
        sid, prev = 0, None
        for off, eid in sorted(evs):
            if prev is None or off - prev > SESSION_GAP_US:
                sid += 1
            out[eid] = sid
            prev = off
    return out


# offsets cluster around multiples of the gap so boundary cases (exactly
# the gap, gap±1us) are actually generated, not astronomically unlikely
_offset = st.one_of(
    st.integers(min_value=0, max_value=4 * SESSION_GAP_US),
    st.builds(lambda k, d: k * SESSION_GAP_US + d,
              st.integers(min_value=0, max_value=3),
              st.integers(min_value=-1, max_value=1)),
)


@settings(max_examples=12, deadline=None)
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),  # user_id
              _offset),
    min_size=1, max_size=30))
def test_sessionizer_matches_python_spec(raw):
    spark = _get_spark()
    rows = [(eid, uid, max(0, off)) for eid, (uid, off) in enumerate(raw)]
    df = spark.createDataFrame(
        [(eid, uid, T0 + dt.timedelta(microseconds=off), "view")
         for eid, uid, off in rows],
        "event_id long, user_id long, ts timestamp, event_type string")
    got = {r.event_id: r.session_id
           for r in with_session_id(df).collect()}
    assert got == session_spec(rows)
