"""Physical-plan pins for the late-r5 pack B — the scale contract.

Same charter as tests/test_plans.py: these queries' docstrings make
specific claims about the plan (one hub exchange end-to-end, no token
explode, grid-sized broadcast) and a refactor that keeps the answers
right but regresses the shape must fail HERE, not at 100 TB.
"""

from __future__ import annotations

from tests.test_plans import plan_of


def test_rolling_median_is_single_shuffle_window(spark):
    plan = plan_of(spark, "rolling_median_price")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1
    # the frame sort is in-row array algebra, never a range exchange
    assert "Exchange rangepartitioning" not in plan


def test_scd2_reuses_one_hub_exchange_across_all_windows(spark):
    # lag + running-sum + row_number + count-over-hub + the lead pass:
    # every window keys on hub, so the whole query must plan as ONE
    # hub-hash exchange (the docstring's reason for avoiding a
    # run-collapsing groupBy, which would add a (hub, island) shuffle)
    plan = plan_of(spark, "scd2_price_intervals")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") >= 4
    assert "HashAggregate" not in plan


def test_corr_matrix_pairs_only_the_daily_grid(spark):
    # ticks are touched once by a map-side-combined (hub, day) aggregate;
    # the self-join runs on that grid and must broadcast, never
    # sort-merge tick-sized data or degenerate to a cartesian product
    plan = plan_of(spark, "hub_price_corr_matrix")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_bm25_never_explodes_tokens_or_shuffles_docs(spark):
    # per-doc dl/tf are map-side array algebra: no Generate (explode),
    # no hash exchange on doc-sized data; the only join is the one-row
    # corpus-stats broadcast riding a nested-loop cross join
    plan = plan_of(spark, "bm25_rank")
    assert "Generate" not in plan
    assert plan.count("Exchange hashpartitioning") == 0
    assert plan.count("BroadcastNestedLoopJoin") == 1
    # column pruning: the scan must not read lang/source/n_chars
    assert "n_chars" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_containment_rides_the_inverted_index_not_a_cross_join(spark):
    # same machinery as dedup_ngram_jaccard: df-capped inverted-index
    # self-join (broadcast at this SF) and the doc-size joins on the
    # O(pairs) output — never an all-pairs product. No Generate count:
    # the shingle explode sits under the memoized cache, so whether it
    # prints inline or inside an InMemoryRelation depends on test order
    # (same warm/cold ambiguity test_plans.py documents for
    # dup_span_redact).
    plan = plan_of(spark, "dedup_containment_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_backtest_reuses_the_window_exchange_for_the_agg(spark):
    # the sma/lead window and the per-hub error aggregate share the hub
    # key: the whole backtest must plan as ONE hub-hash exchange
    plan = plan_of(spark, "forecast_backtest_sma")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1
    assert "HashAggregate" in plan


def test_execution_quality_broadcasts_the_vwap_grid(spark):
    # trades shuffle only for the two map-side-combined aggregates; the
    # (hub, day) VWAP grid joins back as a broadcast, never a sort-merge
    plan = plan_of(spark, "vwap_execution_quality")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 2
