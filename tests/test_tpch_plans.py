"""Physical-plan contracts for the round-4 TPC-H battery and analytics
queries — same posture as tests/test_plans.py: the small-SF answer is the
oracle's job, THESE pin the plan shapes that survive 100 TB."""

from __future__ import annotations

import pytest

from tests.test_plans import plan_of


def test_q4_exists_plans_as_semi_join_with_pushdown(spark):
    plan = plan_of(spark, "sql_q4_order_priority")
    assert "LeftSemi" in plan                       # EXISTS -> semi join
    assert "CartesianProduct" not in plan
    # the one-year predicate must reach the orders scan, not a post-filter
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q7_nation_legs_broadcast(spark):
    plan = plan_of(spark, "sql_q7_volume_shipping")
    # two aliased nation dims -> two broadcast joins minimum, never a
    # cartesian between them
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q10_top20_is_take_ordered(spark):
    plan = plan_of(spark, "sql_q10_returned_items")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort
    # returnflag filter pushes into the lineitem scan
    assert "EqualTo(l_returnflag,R)" in plan


def test_q18_aggregates_before_joining(spark):
    # the HAVING pre-aggregation must run on lineitem BEFORE any join —
    # at 100 TB this shrinks the fact table to qualifying orderkeys first.
    # Structural check: in the plan tree the first HashAggregate pair
    # (partial+final on l_orderkey) must appear BELOW the join with
    # orders, i.e. the aggregate's scan is lineitem alone.
    plan = plan_of(spark, "sql_q18_large_volume_customer")
    assert "HashAggregate" in plan
    assert "TakeOrderedAndProject" in plan
    # the quantity-sum filter exists as a post-aggregate Filter, NOT as a
    # join-side condition on raw rows
    assert "sum_qty" in plan


def test_q19_or_predicate_pushes_brand_disjunction(spark):
    plan = plan_of(spark, "sql_q19_bracketed_revenue")
    # the OR-of-brackets pushes into the part scan (Spark elides the
    # middle of long filter lists in the plan string, so assert on the
    # visible size-range leg + the pruned 3-column ReadSchema instead of
    # the full Or(...) spelling)
    assert "GreaterThanOrEqual(p_size,1)" in plan
    assert "ReadSchema: struct<p_partkey:bigint,p_brand:string,p_size:int>" \
        in plan
    assert "CartesianProduct" not in plan


def test_q22_anti_join_with_date_pushdown(spark):
    plan = plan_of(spark, "sql_q22_dormant_customers")
    assert "LeftAnti" in plan
    # dormancy cutoff pushed into the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in plan


@pytest.mark.parametrize("name", [
    "sql_q8_market_share", "sql_q12_late_lineitems",
    "sql_q14_promo_revenue", "sql_q15_top_supplier",
    "sql_q17_small_qty_revenue",
])
def test_tpch_battery_no_cartesian(spark, name):
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_ngram_freq_top_is_take_ordered(spark):
    plan = plan_of(spark, "ngram_freq_top")
    assert "TakeOrderedAndProject" in plan
    assert "HashAggregate" in plan                   # map-side partial count


def test_session_funnel_single_sessionization_key(spark):
    # sessionization + the three stage joins all key on user/session; the
    # plan must contain NO cartesian/BNL and the funnel's final counts are
    # tiny single-row aggregates
    plan = plan_of(spark, "session_funnel")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_event_anomaly_windows_over_preaggregate(spark):
    # the trailing window must run over the hourly AGGREGATE (hours x
    # types rows), i.e. a Window above a HashAggregate — never a window
    # over raw events
    plan = plan_of(spark, "event_hourly_anomaly")
    assert "HashAggregate" in plan
    assert "Window" in plan
    assert plan.index("Window") < plan.index("HashAggregate"), \
        "window must consume the aggregate (appear above it in the tree)"


def test_kmeans_assign_is_literal_codebook_pure_map(spark):
    # late-r9 rewrite: the codebook compiles into the projection as
    # literals and the argmax is a first-strict-max fold — no join, no
    # aggregation, ZERO exchanges (previously: broadcast crossJoin +
    # map-side max_by with one exchange on vec_id; the measured-tradeoff
    # notes live in operators/similarity.py::_argmax_cell)
    plan = plan_of(spark, "kmeans_assign_cells")
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_source_overlap_join_keys_on_gram(spark):
    plan = plan_of(spark, "source_overlap_matrix")
    assert "CartesianProduct" not in plan
    # the self-join must be an equi-join on the gram (hash-partitioned or
    # broadcast at this SF) — never a nested loop over pairs
    assert "BroadcastNestedLoopJoin" not in plan


def test_q5_region_pruned_broadcast_and_date_pushdown(spark):
    plan = plan_of(spark, "sql_q5_local_supplier")
    # nation⋈region pre-joined and broadcast; no cartesian anywhere
    assert plan.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan   # date filter at scan
    assert "EqualTo(r_name,ASIA)" in plan             # region filter at scan


def test_q6_is_pure_scan_aggregate(spark):
    plan = plan_of(spark, "sql_q6_forecast_revenue")
    assert "Join" not in plan                         # no join of any kind
    # pushdown reaches the scan (the PushedFilters list is TRUNCATED in
    # toString, so pin its head + the full predicates on the Filter node)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    for frag in (">= 0.05)", "<= 0.07)", "< 24.0)"):
        assert frag in plan, frag
    # column pruning: only the two measures + three filter columns are read
    assert ("ReadSchema: struct<l_quantity:double,l_extendedprice:double,"
            "l_discount:double,l_shipdate:timestamp_ntz>") in plan
    assert "l_tax" not in plan


def test_heavy_hitters_sketch_then_broadcast_recount(spark):
    # pin the COLD plan: a warm (materialized) shared gram cache renders
    # as an InMemoryRelation whose nested finalized-AQE body truncates
    # the rest of toString — the recount branch stops PRINTING (it still
    # executes), and suite-order warmth would flake this pin (r13)
    spark.catalog.clearCache()
    plan = plan_of(spark, "heavy_hitters_mg")
    # pass 1 is the Arrow-batched per-partition sketch; pass 2 filters the
    # stream through the BROADCAST candidate set before any exchange, and
    # the final top-k is a distributed partial top-k, not a global sort
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_weighted_sample_plans_group_limit(spark):
    plan = plan_of(spark, "weighted_sample_wor")
    # per-lang top-32 must push the rank limit below the exchange
    assert "WindowGroupLimit" in plan
    assert "Exchange rangepartitioning" not in plan


def test_asof_tolerance_single_hub_exchange(spark):
    plan = plan_of(spark, "da_rt_asof_tolerance")
    # tagged union + ONE window pass: exactly one hash exchange on hub
    assert plan.count("Exchange hashpartitioning(hub") == 1
    assert "Join" not in plan  # the as-of is a union+window, never a join


def test_key_skew_report_no_global_sort(spark):
    plan = plan_of(spark, "key_skew_report")
    # each keyspace reduces via map-side-combined count + single-row
    # max_by aggregate — the hottest-key pick must never be a global sort
    assert "Exchange rangepartitioning" not in plan
    assert "TakeOrderedAndProject" not in plan
    assert plan.count("HashAggregate") >= 6  # partial+final per keyspace


# --- partsupp-derived battery (r9) -----------------------------------------

def test_q2_min_cost_is_single_window_no_rejoin(spark):
    # the spec's correlated MIN subquery must plan as ONE window over the
    # filtered join — not a second partsupp scan joined back
    plan = plan_of(spark, "sql_q2_min_cost_supplier")
    assert "Window" in plan
    assert "TakeOrderedAndProject" in plan           # LIMIT 100, no global sort
    assert plan.count("Exchange rangepartitioning") == 0
    # size/type predicates push into the part scan
    assert "LessThanOrEqual(p_size,15)" in plan
    assert "CartesianProduct" not in plan


def test_q9_partsupp_join_no_cartesian_and_name_pushdown(spark):
    plan = plan_of(spark, "sql_q9_product_type_profit")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the part-name filter prunes before the fact join
    assert "Contains(p_name,bolt)" in plan or "bolt" in plan


def test_q11_single_partsupp_aggregate_plus_broadcast_scalar(spark):
    plan = plan_of(spark, "sql_q11_important_stock")
    # the threshold is a broadcast 1-row join, never a per-group subquery
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_q16_not_in_is_broadcast_anti(spark):
    plan = plan_of(spark, "sql_q16_supplier_part_counts")
    assert "LeftAnti" in plan
    assert "LessThan(s_acctbal,0.0)" in plan         # pushed to supplier scan
    assert "CartesianProduct" not in plan


def test_q20_decorrelates_to_grouped_aggregate(spark):
    plan = plan_of(spark, "sql_q20_promotion_suppliers")
    # the 1998 window pushes into the lineitem scan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
