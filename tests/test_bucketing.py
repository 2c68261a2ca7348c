"""Bucketed co-located joins — the pre-shuffle lever for repeated big joins.

At 100 TB, a fact-fact join that runs every day should not re-shuffle both
sides every day: write each side bucketed (and sorted) by the join key once,
and every subsequent equi-join on that key is exchange-free — each task
zips matching buckets. These tests prove the engine's tables actually get
that plan (bucket metadata survives the write, Catalyst elides both
exchanges), not just that bucketBy was called.
"""

from __future__ import annotations

import contextlib

import pytest

from pyspark.sql import functions as F

from kafka_flink_processing_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


@contextlib.contextmanager
def _no_broadcast(spark):
    """Force shuffle-join planning so the test observes bucket co-location
    (AQE would otherwise turn these small sides into broadcasts)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, "orders", SF)
    lineitem = load_table(spark, "lineitem", SF)
    for name in ("orders_bkt", "lineitem_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    (orders.write.bucketBy(N_BUCKETS, "o_orderkey")
           .sortBy("o_orderkey").mode("overwrite").saveAsTable("orders_bkt"))
    (lineitem.write.bucketBy(N_BUCKETS, "l_orderkey")
             .sortBy("l_orderkey").mode("overwrite")
             .saveAsTable("lineitem_bkt"))
    yield "orders_bkt", "lineitem_bkt"
    for name in ("orders_bkt", "lineitem_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    o_name, l_name = bucketed_tables
    with _no_broadcast(spark):
        j = (spark.table(l_name)
             .join(spark.table(o_name),
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("o_orderpriority")
             .agg(F.count("*").alias("n")))
        plan = j._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        # co-located buckets: NO exchange below the join — the only
        # exchange in the whole plan is the post-join groupBy
        assert "Exchange" not in join_part, join_part
        assert plan.count("Exchange") == 1


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    o_name, l_name = bucketed_tables
    orders = load_table(spark, "orders", SF)
    lineitem = load_table(spark, "lineitem", SF)
    expected = {r.o_orderpriority: r.n for r in
                (lineitem.join(orders,
                               F.col("l_orderkey") == F.col("o_orderkey"))
                 .groupBy("o_orderpriority")
                 .agg(F.count("*").alias("n")).collect())}
    with _no_broadcast(spark):
        got = {r.o_orderpriority: r.n for r in
               (spark.table(l_name)
                .join(spark.table(o_name),
                      F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderpriority")
                .agg(F.count("*").alias("n")).collect())}
    assert got == expected


def test_bucketed_join_rowset_matches_unbucketed(spark, bucketed_tables):
    """Full row-set integrity, not just aggregate counts: the bucketed
    write must preserve every (l_orderkey, l_linenumber, o_orderstatus)
    join row exactly."""
    o_name, l_name = bucketed_tables
    orders = load_table(spark, "orders", SF)
    lineitem = load_table(spark, "lineitem", SF)
    cols = ["l_orderkey", "l_linenumber", "o_orderstatus"]
    expected = sorted(tuple(r) for r in
                      lineitem.join(orders, F.col("l_orderkey")
                                    == F.col("o_orderkey"))
                      .select(*cols).collect())
    with _no_broadcast(spark):
        got = sorted(tuple(r) for r in
                     spark.table(l_name)
                     .join(spark.table(o_name),
                           F.col("l_orderkey") == F.col("o_orderkey"))
                     .select(*cols).collect())
    assert got == expected


def test_bucketed_aggregation_also_shuffle_free(spark, bucketed_tables):
    """groupBy on the bucket key reads pre-partitioned data — no Exchange
    at all in the plan."""
    _, l_name = bucketed_tables
    agg = (spark.table(l_name).groupBy("l_orderkey")
           .agg(F.count("*").alias("n")))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in plan, plan
