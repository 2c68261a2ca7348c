"""Semantics tests for the round-4 analytics family: sessionization gap
edges, strict funnel ordering, quality-aware dedup tie rules, estimator
accuracy invariants — the fixture-level checks the corpus-scale oracle
can't isolate."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from kafka_flink_processing_spark.operators.sessionize import SESSION_GAP_US
from kafka_flink_processing_spark.plans.analytics import _sessionized
from kafka_flink_processing_spark.plans.registry import QUERIES, _ensure_loaded

SF = "/root/testdata/sf0.001"
T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def run(spark, name, sf=SF):
    _ensure_loaded()
    return QUERIES[name].spark(spark, sf)


def _events(spark, rows):
    """rows: (event_id, user_id, offset_seconds_or_us, event_type)."""
    data = [(eid, T0 + dt.timedelta(microseconds=int(off_us)), uid, et, 0.0,
             "{}")
            for eid, uid, off_us, et in rows]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


SEC = 1_000_000  # microseconds


def test_sessionization_gap_boundary(spark):
    # gaps: 10 min (same session), exactly 30 min (same — rule is
    # STRICTLY greater), 30 min + 1 us (new session)
    ev = _events(spark, [
        (1, 7, 0, "view"),
        (2, 7, 600 * SEC, "click"),                       # +10 min
        (3, 7, 600 * SEC + SESSION_GAP_US, "view"),       # exactly +30 min
        (4, 7, 600 * SEC + 2 * SESSION_GAP_US + 1, "view"),  # +30 min +1 us
    ])
    got = {r.event_id: r.session_id for r in _sessionized(ev).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == 2


def test_sessionization_per_user_independent(spark):
    ev = _events(spark, [
        (1, 1, 0, "view"),
        (2, 2, 0, "view"),
        (3, 1, 2 * SESSION_GAP_US, "view"),
    ])
    got = {r.event_id: (r.user_id, r.session_id)
           for r in _sessionized(ev).collect()}
    assert got[1] == (1, 1) and got[3] == (1, 2)
    assert got[2] == (2, 1)  # other user's first session unaffected


def _funnel_counts(spark, rows):
    import tempfile

    from kafka_flink_processing_spark.plans.analytics import session_funnel_q
    ev = _events(spark, rows)
    with tempfile.TemporaryDirectory(prefix="kfps_funnel_") as td:
        ev.write.mode("overwrite").parquet(f"{td}/events.parquet")
        out = session_funnel_q(spark, td)
        return {r.stage: r.n_sessions for r in out.collect()}


@pytest.mark.slow  # heavyweight (see pytest.ini tiers)
def test_funnel_strict_ordering(spark):
    rows = [
        # session A (user 1): view -> click -> purchase, properly ordered
        (1, 1, 0, "view"),
        (2, 1, 10 * SEC, "click"),
        (3, 1, 20 * SEC, "purchase"),
        # session B (user 2): click BEFORE the first view — no conversion
        (4, 2, 0, "click"),
        (5, 2, 10 * SEC, "view"),
        # session C (user 3): click at EXACTLY the view's ts — strict >
        # means it does not count
        (6, 3, 0, "view"),
        (7, 3, 0, "click"),
        # session D (user 4): view only
        (8, 4, 0, "view"),
        # session E (user 5): no view at all
        (9, 5, 0, "signup"),
    ]
    got = _funnel_counts(spark, rows)
    assert got == {"session": 5, "view": 4, "view_click": 1,
                   "view_click_purchase": 1}


def test_funnel_purchase_requires_click_first(spark):
    # view -> purchase -> click: purchase precedes the qualifying click,
    # so the session converts through view_click but NOT the full funnel
    rows = [
        (1, 1, 0, "view"),
        (2, 1, 10 * SEC, "purchase"),
        (3, 1, 20 * SEC, "click"),
    ]
    got = _funnel_counts(spark, rows)
    assert got == {"session": 1, "view": 1, "view_click": 1,
                   "view_click_purchase": 0}


def test_dedup_keep_best_prefers_quality_then_id(spark):
    import tempfile
    from kafka_flink_processing_spark.plans.analytics import (
        dedup_keep_best_q,
    )
    # docs 1/2 normalize to the same hash ("a  b" collapses to "a b") but
    # raw-text quality differs; docs 3/4 are byte-identical (quality tie)
    # so the LOWEST id must win. The 1/2 winner is derived from the
    # returned quality column itself (the doubled space perturbs the
    # score in a direction that is an implementation detail of
    # word_count's empty-token handling — the contract under test is
    # "higher quality wins", not which raw text scores higher):
    docs = spark.createDataFrame(
        [(1, "the quick  brown fox jumps", "en", "s", 26),
         (2, "the quick brown fox jumps", "en", "s", 25),
         (3, "an identical pair of docs here", "en", "s", 30),
         (4, "an identical pair of docs here", "en", "s", 30)],
        "doc_id long, text string, lang string, source string, n_chars long")
    with tempfile.TemporaryDirectory(prefix="kfps_keepbest_") as td:
        docs.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        rows = dedup_keep_best_q(spark, td).collect()
    out = {r.doc_id: r.keep for r in rows}
    q = {r.doc_id: r.quality for r in rows}
    # exactly one keeper in the 1/2 cluster, and it is the higher-quality
    # member per the scoring function itself
    winner_12 = 1 if q[1] > q[2] else 2
    assert out[winner_12] and not out[3 - winner_12]
    assert q[1] != q[2], "fixture must differentiate quality"
    assert out[3] and not out[4]  # quality tie -> lowest doc_id


@pytest.mark.slow  # heavyweight (see pytest.ini tiers)
def test_minhash_estimator_invariants(spark):
    out = run(spark, "minhash_jaccard_accuracy").collect()
    assert out, "candidate set empty — fixture corpus should have near-dups"
    for r in out:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert abs(r.abs_err - abs(r.est_jaccard - r.exact_jaccard)) < 1e-12
    # identical texts (exact == 1.0) must estimate exactly 1.0: every
    # minhash component agrees when the shingle sets are equal
    for r in out:
        if r.exact_jaccard == 1.0:
            assert r.est_jaccard == 1.0


@pytest.mark.slow  # heavyweight (see pytest.ini tiers)
def test_ivf_recall_bounds(spark):
    out = run(spark, "ivf_recall_eval").collect()
    assert len(out) == 5
    for r in out:
        assert r.n_true == 10
        assert 0 <= r.n_hit <= 10
        assert r.recall_at_10 == pytest.approx(r.n_hit / 10.0)


def test_packing_efficiency_conserves_docs(spark):
    from kafka_flink_processing_spark.sources.parquet import load_table
    out = run(spark, "packing_efficiency")
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    docs = load_table(spark, "documents", SF)
    assert total == docs.count()
    for r in out.collect():
        assert r.min_fill_1000 <= r.avg_fill_1000 <= r.max_fill_1000


def test_event_anomaly_flags_planted_spike(spark):
    import tempfile
    from kafka_flink_processing_spark.plans.analytics import (
        event_hourly_anomaly_q,
    )
    # 30 steady hours of 10 events, then one hour of 40: the spike hour
    # must flag with trailing_avg 10 and ratio 4
    rows = []
    eid = 0
    for h in range(30):
        for k in range(10):
            rows.append((eid, 1, (h * 3600 + k) * SEC, "click"))
            eid += 1
    for k in range(40):
        rows.append((eid, 1, (30 * 3600 + k) * SEC, "click"))
        eid += 1
    ev = _events(spark, rows)
    with tempfile.TemporaryDirectory(prefix="kfps_anom_") as td:
        ev.write.mode("overwrite").parquet(f"{td}/events.parquet")
        out = event_hourly_anomaly_q(spark, td).collect()
    spike = [r for r in out if r.n_events == 40]
    assert len(spike) == 1 and spike[0].is_anomaly
    assert spike[0].trailing_avg == pytest.approx(10.0)
    assert spike[0].rate_ratio == pytest.approx(4.0)
    steady = [r for r in out if r.n_events == 10]
    assert steady and not any(r.is_anomaly for r in steady)


def test_event_anomaly_flags_outage_hours(spark):
    import tempfile
    from kafka_flink_processing_spark.plans.analytics import (
        event_hourly_anomaly_q,
    )
    # 30 steady hours of 10 events, a 3-hour TOTAL outage, then recovery:
    # the gap hours must exist as zero rows (densified grid) and flag as
    # low anomalies — the drop-to-zero case a sparse hourly table misses
    rows = []
    eid = 0
    for h in list(range(30)) + [33, 34]:
        for k in range(10):
            rows.append((eid, 1, (h * 3600 + k) * SEC, "click"))
            eid += 1
    ev = _events(spark, rows)
    with tempfile.TemporaryDirectory(prefix="kfps_outage_") as td:
        ev.write.mode("overwrite").parquet(f"{td}/events.parquet")
        out = event_hourly_anomaly_q(spark, td).collect()
    zero_hours = [r for r in out if r.n_events == 0]
    assert len(zero_hours) == 3, "outage hours must surface as zero rows"
    assert all(r.is_anomaly for r in zero_hours)
    assert all(r.rate_ratio == 0.0 for r in zero_hours)
    # recovery hour compares against a trailing window that contains the
    # outage zeros (wall-clock frame), not week-old populated hours
    rec = [r for r in out if r.hour.hour == 9 and r.n_events == 10]
    assert rec, "recovery hour present"


def test_retention_cohort_fixture(spark):
    import tempfile
    from kafka_flink_processing_spark.plans.analytics import (
        retention_cohorts_q,
    )
    day = 24 * 3600 * SEC
    rows = [
        (1, 1, 0, "view"),           # user 1: day 0 cohort
        (2, 1, 2 * day, "view"),     # returns day 2
        (3, 2, 0, "view"),           # user 2: day 0 cohort, day-0 only
        (4, 3, day, "view"),         # user 3: day 1 cohort
        (5, 3, day + 3600 * SEC, "view"),  # same day — not double-counted
    ]
    ev = _events(spark, rows)
    with tempfile.TemporaryDirectory(prefix="kfps_cohort_") as td:
        ev.write.mode("overwrite").parquet(f"{td}/events.parquet")
        out = retention_cohorts_q(spark, td).collect()
    got = {(r.cohort_day.day, r.day_offset): r.n_users for r in out}
    assert got == {(1, 0): 2, (1, 2): 1, (2, 0): 1}


# --- round-5 additions ---

def test_event_transition_matrix_fixture(spark):
    # user 1: view -> click -> purchase; user 2: view -> view
    ev = _events(spark, [
        (1, 1, 0 * SEC, "view"), (2, 1, 5 * SEC, "click"),
        (3, 1, 9 * SEC, "purchase"),
        (4, 2, 0 * SEC, "view"), (5, 2, 3 * SEC, "view"),
    ])
    from kafka_flink_processing_spark.plans.analytics import (
        event_transition_matrix_q,
    )
    import unittest.mock as mock
    with mock.patch(
            "kafka_flink_processing_spark.plans.analytics.load_table",
            return_value=ev):
        out = {(r.from_type, r.to_type): (r.n, r.p)
               for r in event_transition_matrix_q(spark, SF).collect()}
    assert out == {("view", "click"): (1, 0.5),
                   ("view", "view"): (1, 0.5),
                   ("click", "purchase"): (1, 1.0)}


def test_event_transition_rows_are_conditional_distributions(spark):
    out = run(spark, "event_transition_matrix")
    sums = (out.groupBy("from_type").agg(F.sum("p").alias("s")).collect())
    for r in sums:
        assert r.s == pytest.approx(1.0, abs=1e-9)


def test_vocab_zipf_slope_invariants(spark):
    r = run(spark, "vocab_zipf_slope").collect()[0]
    assert 0 < r.n_tokens <= 1000
    # natural-ish corpus: frequency decays with rank, and the fitted line
    # at rank 1 predicts a positive log-frequency
    assert r.zipf_slope < 0
    assert r.zipf_intercept > 0


@pytest.mark.slow  # heavyweight (see pytest.ini tiers)
def test_ivf_probe_sweep_matches_recall_eval_at_default_nprobe(spark):
    # The sweep's cell-rank identity must agree with the actually-executed
    # retrieval: at nprobe=IVF_NPROBE the swept hit count equals the sum
    # of ivf_recall_eval's per-query hits (which runs ivf_cosine_topk for
    # real). Also recall must be monotone non-decreasing in nprobe.
    from kafka_flink_processing_spark.operators.similarity import IVF_NPROBE
    sweep = {r.nprobe: r for r in run(spark, "ivf_probe_sweep").collect()}
    assert sorted(sweep) == [1, 2, 4, 8]
    assert all(r.n_true == 50 for r in sweep.values())
    hits = [sweep[p].n_hit for p in (1, 2, 4, 8)]
    assert hits == sorted(hits)
    eval_hits = sum(r.n_hit
                    for r in run(spark, "ivf_recall_eval").collect())
    assert sweep[IVF_NPROBE].n_hit == eval_hits
