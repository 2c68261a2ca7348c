"""Semantics tests for the correlated-subquery and approximate-distinct
queries (plans/relational.py) beyond oracle parity / rows-only checks."""

from __future__ import annotations

from kafka_flink_processing_spark.plans.relational import (
    approx_distinct_users,
    correlated_avg_threshold,
)

SF = "/root/testdata/sf0.001"


def test_approx_distinct_error_bound(spark):
    """HLL++ at rsd=0.02 should land within 5% of the exact distinct count
    for every group (cardinalities here are far above the sparse regime)."""
    rows = approx_distinct_users(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel_err <= 0.05, (r.event_type, r.approx_users, r.exact_users)


def test_correlated_threshold_is_strictly_below_half_avg(spark):
    """Every counted line sits strictly below half its part's average —
    re-derive the per-part averages independently and spot-check totals."""
    out = {r.p_brand: r.n_small_lines
           for r in correlated_avg_threshold(spark, SF).collect()}
    assert out and all(n > 0 for n in out.values())

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet")
    pdf = li.join(part, li.l_partkey == part.p_partkey) \
            .select("l_partkey", "p_brand", "l_quantity").toPandas()
    avg = pdf.groupby("l_partkey")["l_quantity"].mean()
    pdf["below"] = pdf.l_quantity < 0.5 * pdf.l_partkey.map(avg)
    expect = pdf[pdf.below].groupby("p_brand").size().to_dict()
    # pandas mean vs exact davg can flip rows sitting exactly on the
    # threshold; quantities are integers so ties are measure-zero here
    assert out == expect


def test_approx_quantiles_close_to_exact(spark):
    """percentile_approx at accuracy=10000 should land within a tight
    quantile-rank band of the exact percentile_disc values; compare by
    VALUE with a tolerance derived from the data spread."""
    from kafka_flink_processing_spark.plans.relational import (
        approx_quantiles_value,
    )
    rows = approx_quantiles_value(spark, SF).collect()
    assert rows
    for r in rows:
        exact = [r.exact_p50, r.exact_p95, r.exact_p99]
        spread = max(exact) - min(exact) or 1.0
        approxes = [r.approx_p50, r.approx_p95, r.approx_p99]
        for approx, ex in zip(approxes, exact):
            # value-space tolerance: 5% of the p50..p99 spread per group
            assert abs(approx - ex) <= 0.05 * spread, (r.event_type, approx, ex)


def test_exact_quantiles_match_numpy_rank_selection(spark):
    """p50/p95/p99 must equal the value at rank ceil(p*n) under
    (value, event_id) ordering — re-derived independently in pandas."""
    import math

    from kafka_flink_processing_spark.plans.relational import (
        exact_quantiles_value,
    )
    rows = {r.event_type: r for r in exact_quantiles_value(spark, SF).collect()}
    assert rows

    pdf = (spark.read.parquet(f"{SF}/events.parquet")
                .select("event_type", "value", "event_id").toPandas())
    for et, grp in pdf.groupby("event_type"):
        vals = grp.sort_values(["value", "event_id"]).value.to_numpy()
        n = len(vals)
        r = rows[et]
        assert r.n_rows == n
        for p, got in [(0.50, r.p50), (0.95, r.p95), (0.99, r.p99)]:
            assert got == vals[math.ceil(p * n) - 1], (et, p, got)
