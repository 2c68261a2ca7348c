"""Fixture-level semantics for the r6 additions: Kyle's lambda and the
lead-lag beta against numpy's own OLS (independent re-derivation, not the
engine's moment-sum algebra), the column profiler against hand counts, the
chi-squared drift audit against a hashlib re-implementation of the salted
split, and n-gram novelty against hand-computed ratios."""

from __future__ import annotations

import datetime as dt
import hashlib
import tempfile

import numpy as np

from kafka_flink_processing_spark.plans.analytics import column_profile_q
from kafka_flink_processing_spark.plans.extensions import (
    ngram_novelty_by_source_q,
    token_drift_chi2_q,
)
from kafka_flink_processing_spark.plans.market import (
    kyle_lambda_q,
    lead_lag_hub_beta_q,
)
from tests.test_market import SEC, T0, _event_table


def _doc_table(spark, td, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long") \
        .write.mode("overwrite").parquet(f"{td}/documents.parquet")


# ------------------------------------------------------------ kyle lambda


def test_kyle_lambda_matches_numpy_ols(spark):
    # 13 trades, one hub; prices chosen 2dp so the 6dp moment rounding is
    # exact and the engine's sufficient-statistic slope must equal
    # numpy's polyfit to double precision.
    rng = np.random.RandomState(7)
    n = 13
    prices = np.round(50 + np.cumsum(rng.uniform(-1, 1, n)), 2)
    rows = []
    for i in range(n):
        eid = 100 + i                      # eid % 4 drives mw
        et = "purchase" if i % 3 else "error"   # BUY / SELL mix
        rows.append((eid, 0, i * 60 * SEC, et, prices[i]))
    with tempfile.TemporaryDirectory(prefix="kfps_kyle_") as td:
        _event_table(spark, td, rows)
        out = kyle_lambda_q(spark, td).collect()
    assert len(out) == 1 and out[0].hub == "HUB0"
    mw_of = {0: 5, 1: 10, 2: 25, 3: 50}
    x = np.array([mw_of[(100 + i) % 4] * (1 if i % 3 else -1)
                  for i in range(n)], dtype=float)[1:]
    y = np.diff(prices)
    slope = np.polyfit(x, y, 1)[0]
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    assert out[0].n_obs == n - 1
    assert abs(out[0].lambda_impact - slope) < 1e-9
    assert abs(out[0].r2 - r2) < 1e-9


def test_kyle_lambda_degenerate_flow_is_null(spark):
    # all trades same signed size -> var(x) = 0 -> slope undefined -> NULL
    rows = [(100, 0, i * 60 * SEC, "purchase", 50.0 + i) for i in range(5)]
    # event_id constant => same mw; all purchase => all BUY
    rows = [(100, 0, off, et, v) for (_, _, off, et, v) in rows]
    with tempfile.TemporaryDirectory(prefix="kfps_kyle0_") as td:
        _event_table(spark, td, rows)
        out = kyle_lambda_q(spark, td).collect()
    # identical event_id collapses nothing (ticks keyed by ts), rows stay
    assert len(out) == 1
    assert out[0].lambda_impact is None and out[0].r2 is None


# ------------------------------------------------------------ lead-lag


def test_lead_lag_beta_matches_numpy(spark):
    # HUB1's next-hour move = 0.5 * HUB0's move + noise, one tick per
    # (hub, hour) so hourly means equal the tick; beta(HUB0->HUB1) must
    # match numpy OLS over the aligned return pairs.
    rng = np.random.RandomState(11)
    hours = 10
    p0 = np.round(60 + np.cumsum(rng.uniform(-2, 2, hours)), 2)
    r0 = np.diff(p0)
    p1 = np.empty(hours)
    p1[0] = 40.0
    for h in range(1, hours):
        drift = 0.5 * (r0[h - 1] if h >= 1 else 0.0)
        p1[h] = p1[h - 1] + drift + rng.uniform(-0.05, 0.05)
    p1 = np.round(p1, 2)
    rows = []
    for h in range(hours):
        rows.append((200 + h, 0, h * 3600 * SEC, "view", float(p0[h])))
        rows.append((300 + h, 1, h * 3600 * SEC, "view", float(p1[h])))
    with tempfile.TemporaryDirectory(prefix="kfps_ll_") as td:
        _event_table(spark, td, rows)
        got = {(r.hub_lead, r.hub_lag): r
               for r in lead_lag_hub_beta_q(spark, td).collect()}
    r1 = np.diff(p1)
    # x = HUB0 ret at hour h (h=1..8), y = HUB1 ret at hour h+1
    x, y = r0[:-1], r1[1:]
    want = np.polyfit(x, y, 1)[0]
    row = got[("HUB0", "HUB1")]
    assert row.n_hours == hours - 2
    assert abs(row.beta - want) < 1e-9
    # and the reverse direction exists with its own (different) beta
    assert ("HUB1", "HUB0") in got


# ------------------------------------------------------------ profiler


def test_column_profile_hand_counts(spark):
    rows = [
        (1, 1, 1, 1, 5.0, 100.0, 0.1, 0.0, "N", "O",
         dt.datetime(2024, 1, 1)),
        (2, 1, 1, 1, 5.0, 200.0, None, 0.0, "N", "O",
         dt.datetime(2024, 6, 1)),
        (3, 1, 1, 1, 7.0, 300.0, 0.2, 0.0, "N", "O", None),
    ]
    schema = ("l_orderkey long, l_partkey long, l_suppkey long, "
              "l_linenumber int, l_quantity double, l_extendedprice double, "
              "l_discount double, l_tax double, l_returnflag string, "
              "l_linestatus string, l_shipdate timestamp")
    with tempfile.TemporaryDirectory(prefix="kfps_prof_") as td:
        spark.createDataFrame(rows, schema).write.mode("overwrite") \
            .parquet(f"{td}/lineitem.parquet")
        prof = {r.column_name: r for r in column_profile_q(spark, td).collect()}
    q = prof["l_quantity"]
    assert (q.n_rows, q.n_null, q.n_distinct) == (3, 0, 2)
    assert (q.min_val, q.max_val) == (5.0, 7.0)
    d = prof["l_discount"]
    assert (d.n_null, d.n_distinct) == (1, 2)
    s = prof["l_shipdate"]
    assert s.n_null == 1 and s.n_distinct == 2
    assert s.min_val == dt.datetime(2024, 1, 1,
                                    tzinfo=dt.timezone.utc).timestamp()


# ------------------------------------------------------------ drift chi2


def _split_of(doc_id: int) -> str:
    h = int(hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:15], 16)
    return "train" if h % 100 < 95 else "holdout"


def test_token_drift_chi2_matches_hand_computation(spark):
    # controlled corpus: two token types, enough docs that both splits
    # are non-empty; expected chi2 recomputed with hashlib + floats
    rows = []
    for d in range(200):
        tok = "aaa" if d % 2 == 0 else "bbb"
        rows.append((d, " ".join([tok] * 5), "en", "s", 5))
    with tempfile.TemporaryDirectory(prefix="kfps_drift_") as td:
        _doc_table(spark, td, rows)
        got = {r.token: r for r in token_drift_chi2_q(spark, td).collect()}
    counts = {"aaa": [0, 0], "bbb": [0, 0]}
    for d in range(200):
        tok = "aaa" if d % 2 == 0 else "bbb"
        counts[tok]["holdout" == _split_of(d)] += 5
    t_train = sum(v[0] for v in counts.values())
    t_hold = sum(v[1] for v in counts.values())
    assert t_hold > 0, "fixture must hit both splits"
    for tok, (o_t, o_h) in counts.items():
        e_t = (o_t + o_h) * t_train / (t_train + t_hold)
        e_h = (o_t + o_h) * t_hold / (t_train + t_hold)
        want = (o_t - e_t) ** 2 / e_t + (o_h - e_h) ** 2 / e_h
        assert got[tok].o_train == o_t and got[tok].o_holdout == o_h
        assert abs(got[tok].chi2_contrib - want) < 1e-9


# ------------------------------------------------------------ novelty


def test_ngram_novelty_hand_ratios(spark):
    rows = [
        (1, "a b c d", "en", "srcA", 7),    # grams abc,bcd: both novel
        (2, "a b c d", "en", "srcA", 7),    # exact dup: 0/2 novel
        (3, "b c d e f", "en", "srcB", 9),  # bcd seen, cde+def novel: 2/3
        (4, "x y", "en", "srcB", 3),        # <3 words: excluded
    ]
    with tempfile.TemporaryDirectory(prefix="kfps_nov_") as td:
        _doc_table(spark, td, rows)
        got = {r.source: r
               for r in ngram_novelty_by_source_q(spark, td).collect()}
    a = got["srcA"]
    assert a.n_docs == 2
    assert abs(a.avg_doc_novelty - (1.0 + 0.0) / 2) < 1e-9
    assert abs(a.novel_gram_share - 2 / 4) < 1e-9
    b = got["srcB"]
    assert b.n_docs == 1                    # the 2-word doc is excluded
    assert abs(b.avg_doc_novelty - 2 / 3) < 1e-6   # 6dp-fixed ratio
    assert abs(b.novel_gram_share - 2 / 3) < 1e-9


# ------------------------------------------------------------ rfm / lift


def test_rfm_segments_hand_scores(spark):
    # customer k: freq=k, monetary=100k, last order base+k days -> every
    # quintile cutoff and score computable by hand; scores = (k, k, k)
    rows = []
    okey = 0
    base = dt.datetime(2024, 1, 1)
    for k in range(1, 6):
        for i in range(k):
            okey += 1
            rows.append((okey, k, "O", 100.0 * k / k,
                         base + dt.timedelta(days=k if i == k - 1 else 0),
                         "1-URGENT"))
    schema = ("o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string")
    from kafka_flink_processing_spark.plans.analytics import (
        rfm_customer_segments_q,
    )
    with tempfile.TemporaryDirectory(prefix="kfps_rfm_") as td:
        spark.createDataFrame(rows, schema).write.mode("overwrite") \
            .parquet(f"{td}/orders.parquet")
        got = {(r.r_score, r.f_score, r.m_score): r
               for r in rfm_customer_segments_q(spark, td).collect()}
    # customer k spends 100.0 per order -> monetary = 100k, ascending in
    # k like freq; recency 5-k days, so all three scores equal k
    assert set(got) == {(k, k, k) for k in range(1, 6)}
    for k in range(1, 6):
        seg = got[(k, k, k)]
        assert seg.n_customers == 1
        assert abs(seg.avg_monetary - 100.0 * k) < 1e-9
        assert abs(seg.avg_recency_days - (5 - k)) < 1e-9


def test_bigram_lift_hand_counts(spark):
    # 30 docs "p q" (perfect collocation) + 40 docs "x x x" (self-pairs):
    # N=180 tokens; lift(p q) = 180*30/(30*30) = 6; lift(x x) =
    # 180*80/(120*120) = 1
    from kafka_flink_processing_spark.plans.extensions import (
        bigram_lift_top_q,
    )
    rows = [(i, "p q", "en", "s", 3) for i in range(30)]
    rows += [(100 + i, "x x x", "en", "s", 5) for i in range(40)]
    with tempfile.TemporaryDirectory(prefix="kfps_lift_") as td:
        _doc_table(spark, td, rows)
        got = [(r.bigram, r.n_pair, r.lift)
               for r in bigram_lift_top_q(spark, td).collect()]
    assert got == [("p q", 30, 6.0), ("x x", 80, 1.0)]


# ------------------------------------------------- determinism properties


def test_r6_queries_partition_and_order_invariant(spark):
    # The engine bans partition-order nondeterminism; the r6 regressions
    # must produce BIT-IDENTICAL results when the input arrives shuffled
    # and the shuffle width changes (the cross-cluster determinism claim
    # at fixture scale).
    import random

    rng = np.random.RandomState(3)
    rows = []
    for i in range(60):
        et = ["view", "click", "purchase", "error", "signup"][i % 5]
        rows.append((500 + i, i % 3, i * 37 * SEC, et,
                     round(float(40 + rng.uniform(-5, 5)), 2)))
    shuffled = rows[:]
    random.Random(9).shuffle(shuffled)

    def run(fixture_rows, parts):
        with tempfile.TemporaryDirectory(prefix="kfps_det_") as td:
            _event_table(spark, td, fixture_rows)
            old = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            try:
                k = sorted(map(tuple, kyle_lambda_q(spark, td).collect()))
                l = sorted(map(tuple,
                               lead_lag_hub_beta_q(spark, td).collect()))
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", old)
        return k, l

    base = run(rows, 32)
    assert run(shuffled, 32) == base     # row order must not matter
    assert run(rows, 3) == base          # shuffle width must not matter


# ------------------------------------------------------------ HLL


def _hll_estimate(row) -> float:
    """The standard downstream estimator over the emitted sufficient
    statistics: raw HLL, with the linear-counting small-range correction
    (applied HERE with Python math — ln() is deliberately not an oracle
    column, see the query doc)."""
    import math
    m = 256
    if row.hll_raw_estimate <= 2.5 * m and row.zero_buckets > 0:
        return m * math.log(m / row.zero_buckets)
    return row.hll_raw_estimate


def test_hll_error_bound_two_sfs(spark):
    from kafka_flink_processing_spark.plans.analytics import (
        hll_distinct_estimate_q,
    )
    # sf0.01: n=150 per type -> linear-counting regime (V > 0);
    # sf0.1: n=1500 -> n/m ~ 5.9, raw-HLL regime (SE = 1.04/16 ~ 6.5%)
    for sf_dir, tol in (("/root/testdata/sf0.01", 0.10),
                        ("/root/testdata/sf0.1", 0.20)):
        for row in hll_distinct_estimate_q(spark, sf_dir).collect():
            est = _hll_estimate(row)
            rel = abs(est - row.exact_users) / row.exact_users
            assert rel <= tol, (sf_dir, row.event_type, est,
                                row.exact_users, rel)


def test_hll_registers_partition_invariant(spark):
    # register MAXes are order-free: a different shuffle width must give
    # a bit-identical sketch
    from kafka_flink_processing_spark.plans.analytics import (
        hll_distinct_estimate_q,
    )
    sf = "/root/testdata/sf0.001"
    base = sorted(map(tuple, hll_distinct_estimate_q(spark, sf).collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        alt = sorted(map(tuple,
                         hll_distinct_estimate_q(spark, sf).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert alt == base
