"""Salting operators (operators/skew.py): result-identity under skew.

Oracle parity at sf0.001/sf0.01 covers the registered instantiations; these
pin the tricky invariants on adversarial fixtures: duplicate keys on BOTH
join sides (multiplicity m*n must survive salting) and a single hot key
holding most of the data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_flink_processing_spark.operators.skew import (
    salted_distinct_count,
    salted_join,
)
from kafka_flink_processing_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_salted_join_preserves_multiplicities(spark):
    # key "hot": 3 left rows x 2 right rows = 6 output rows, each pair once
    left = spark.createDataFrame(
        [("hot", 1), ("hot", 2), ("hot", 3), ("cold", 4)], "k string, lid int")
    right = spark.createDataFrame(
        [("hot", 10), ("hot", 20), ("miss", 30)], "k string, rid int")
    out = salted_join(left, right, on=["k"], tiebreak_col="lid", n_salt=4)
    got = {(r.k, r.lid, r.rid) for r in out.collect()}
    expect = {("hot", l, r) for l in (1, 2, 3) for r in (10, 20)}
    assert got == expect
    assert out.count() == 6  # no dup, no loss


def test_salted_join_matches_plain_join_on_events(spark):
    ev = load_table(spark, "events", SF).select("event_id", "user_id", "value")
    dim = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    plain = ev.join(dim, "user_id").select("event_id", "n")
    salted = salted_join(ev, dim, on=["user_id"], tiebreak_col="event_id",
                         n_salt=8).select("event_id", "n")
    assert sorted(map(tuple, plain.collect())) == \
           sorted(map(tuple, salted.collect()))


def test_salted_distinct_exact_on_hot_key(spark):
    # one key holds 1000 rows over 137 distinct values; salting must still
    # count exactly 137 (domain partitioning: per-salt counts are disjoint)
    rows = [("hot", i % 137) for i in range(1000)] + [("cold", 1), ("cold", 2)]
    df = spark.createDataFrame(rows, "k string, v int")
    out = {r.k: r.n_distinct
           for r in salted_distinct_count(df, ["k"], "v", n_salt=16).collect()}
    assert out == {"hot": 137, "cold": 2}


def test_salted_distinct_never_colocates_a_key(spark):
    # the whole point: every pre-final exchange carries __salt (or the full
    # value), so raw rows of a hot key never co-locate; only the tiny
    # per-salt partial counts meet at the final per-key exchange
    df = load_table(spark, "events", SF)
    out = salted_distinct_count(df, ["event_type"], "user_id", n_salt=16)
    plan = out._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    exchanges = [l for l in plan.splitlines()
                 if "Exchange hashpartitioning" in l]
    assert len(exchanges) == 3  # (k,salt,v) dedup; (k,salt) count; (k) sum
    salted = [l for l in exchanges if "__salt" in l]
    assert len(salted) == 2     # every raw-row exchange is salt-spread
