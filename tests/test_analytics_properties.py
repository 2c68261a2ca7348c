"""Differential checks for the round-5 analytics queries: the distributed
plans must agree with straight-line Python specs (transition matrix) and
with an independent least-squares implementation (Zipf fit) on arbitrary
inputs — the fixture-level evidence the corpus-scale oracle can't isolate.
"""

from __future__ import annotations

import datetime as dt
import math
import re
from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 6, 1)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from kafka_flink_processing_spark.session import get_spark
        _spark = get_spark("analytics_prop")
    return _spark


# ---------------------------------------------------------------------------
# event_transition_matrix vs a straight-line Python fold
# ---------------------------------------------------------------------------

def transition_spec(rows):
    """rows: (event_id, user_id, offset_us, event_type) ->
    {(from, to): count}. Per user, order by (ts, event_id), count adjacent
    pairs — the spec the LEAD window must reproduce."""
    by_user: dict[int, list] = {}
    for eid, uid, off, et in rows:
        by_user.setdefault(uid, []).append((off, eid, et))
    counts: Counter = Counter()
    for _, evs in by_user.items():
        seq = [et for _, _, et in sorted(evs)]
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] += 1
    return dict(counts)


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),        # user_id
              st.integers(min_value=0, max_value=10),       # offset (ties!)
              st.sampled_from(["view", "click", "purchase"])),
    min_size=1, max_size=40))
@pytest.mark.slow  # heavyweight (see pytest.ini tiers)
def test_transition_matrix_matches_spec(rows):
    spark = _get_spark()
    import unittest.mock as mock

    from kafka_flink_processing_spark.plans.analytics import (
        event_transition_matrix_q,
    )
    data = [(eid, T0 + dt.timedelta(seconds=off), uid, et, 0.0, "{}")
            for eid, (uid, off, et) in enumerate(rows)]
    ev = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    want = transition_spec(
        [(eid, uid, off * 1_000_000, et)
         for eid, (uid, off, et) in enumerate(rows)])
    with mock.patch(
            "kafka_flink_processing_spark.plans.analytics.load_table",
            return_value=ev):
        got_rows = event_transition_matrix_q(spark, "unused").collect()
    got = {(r.from_type, r.to_type): r.n for r in got_rows}
    assert got == want
    # probabilities: per from_type they normalize the counts exactly
    from_totals = Counter()
    for (a, _), n in want.items():
        from_totals[a] += n
    for r in got_rows:
        assert r.p == pytest.approx(r.n / from_totals[r.from_type],
                                    abs=1e-12)


# ---------------------------------------------------------------------------
# vocab_zipf_slope vs an independent Python least-squares on the same corpus
# ---------------------------------------------------------------------------

TOKEN_RE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 ]")


def test_zipf_slope_matches_python_least_squares(spark):
    """Tokenize sf0.001 in pure Python with the same regex, rank the top
    1000, and fit ln(freq) ~ ln(rank) two independent ways: (a) the exact
    rounded-sum formula the query uses, expected to match bit-for-bit;
    (b) an unrounded textbook least-squares, expected to agree to ~1e-4
    (the only difference is the 6dp rounding of each ln term)."""
    from kafka_flink_processing_spark.plans.registry import (
        QUERIES,
        _ensure_loaded,
    )
    from kafka_flink_processing_spark.sources.parquet import load_table

    sf = "/root/testdata/sf0.001"
    _ensure_loaded()
    got = QUERIES["vocab_zipf_slope"].spark(spark, sf).collect()[0]

    texts = [r.text for r in
             load_table(spark, "documents", sf).select("text").collect()]
    counts: Counter = Counter()
    for t in texts:
        counts.update(TOKEN_RE.findall(t.lower()))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(freq) for _, freq in ranked]

    # (a) the query's exact arithmetic: 6dp-rounded scaled-int sums
    def dsum6(vals):
        return sum(int(round(v * 10**6)) for v in vals) / 10.0**6

    n = len(ranked)
    sx, sy = dsum6(xs), dsum6(ys)
    sxy = dsum6(x * y for x, y in zip(xs, ys))
    sxx = dsum6(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    assert got.n_tokens == n
    assert got.zipf_slope == slope
    assert got.zipf_intercept == intercept

    # (b) unrounded least squares — rounding shifts the fit by <1e-4
    usx, usy = sum(xs), sum(ys)
    usxy = sum(x * y for x, y in zip(xs, ys))
    usxx = sum(x * x for x in xs)
    uslope = (n * usxy - usx * usy) / (n * usxx - usx * usx)
    assert got.zipf_slope == pytest.approx(uslope, abs=1e-4)
