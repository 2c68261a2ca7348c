"""Bucketed co-located join (sources/bucketed.py): the scale claim is
"zero exchanges on the bucketed key", so assert exactly that, plus result
identity with the unbucketed join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_flink_processing_spark.sources.bucketed import write_bucketed
from kafka_flink_processing_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, "lineitem", SF)
    orders = load_table(spark, "orders", SF)
    write_bucketed(li, "t_li_bucketed", ["l_orderkey"], 8,
                   sort_by=["l_orderkey"])
    write_bucketed(orders, "t_ord_bucketed", ["o_orderkey"], 8,
                   sort_by=["o_orderkey"])
    yield "t_li_bucketed", "t_ord_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_ord_bucketed")


def _join(spark, li_name, ord_name):
    a, b = spark.table(li_name), spark.table(ord_name)
    return (a.join(b, a.l_orderkey == b.o_orderkey)
             .select("l_orderkey", "l_linenumber", "o_orderstatus"))


def test_bucketed_join_has_zero_exchanges(spark, bucketed_tables):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = _join(spark, *bucketed_tables)
        plan = j._jdf.queryExecution().executedPlan().toString() \
            .split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan       # co-located: no shuffle at all
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    bucketed = _join(spark, *bucketed_tables)
    li, orders = load_table(spark, "lineitem", SF), load_table(spark, "orders", SF)
    plain = (li.join(orders, li.l_orderkey == orders.o_orderkey)
               .select("l_orderkey", "l_linenumber", "o_orderstatus"))
    assert sorted(map(tuple, bucketed.collect())) == \
           sorted(map(tuple, plain.collect()))


def test_bucketed_aggregation_also_shuffle_free(spark, bucketed_tables):
    li_name, _ = bucketed_tables
    agg = (spark.table(li_name).groupBy("l_orderkey")
           .agg(F.count("*").alias("n")))
    plan = agg._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    assert "Exchange" not in plan           # groupBy on the bucket key
