"""Runtime-filter (Bloom join) capability evidence — the 100 TB lever for
selective dim->fact joins.

When a join's build side is selectively filtered, Spark can inject a
bloom_filter_agg on the build side and a might_contain predicate into the
probe side's scan filter (SPARK-32268), turning a full fact-table shuffle
into a pre-shuffle semi-join reduction — the engine-native analogue of the
manual Bloom pass operators/dedup.py uses for decontamination.

The feature is COST-GATED: the probe scan must exceed
`...applicationSideScanSizeThreshold` (default 10 GB) for injection, so at
driver-testdata scale it stays off by default (correctly — the filter
would cost more than it saves). These tests scale the threshold down to
prove the plan rewrite fires, and pin the default-off behavior so the
production defaults stay understood. At 100 TB the 10 GB threshold is
trivially met and the rewrite happens with NO configuration.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"

_BLOOM_CONF = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # production default 10GB — scaled to 0 so the ~MB test scan qualifies
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold":
        "0",
    # broadcast would bypass the shuffle join the bloom filter protects
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def _conf(spark, overrides):
    old = {}
    for k, v in overrides.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _urgent_revenue(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = (spark.read.parquet(f"{SF}/orders.parquet")
         .filter(F.col("o_orderpriority") == "1-URGENT"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority").agg(F.count("*").alias("n")))


def test_bloom_filter_injected_when_scan_qualifies(spark):
    with _conf(spark, _BLOOM_CONF):
        q = _urgent_revenue(spark)
        plan = q._jdf.queryExecution().optimizedPlan().toString()
        # build side: bloom built from the filtered orders keys;
        # probe side: might_contain pushed into the lineitem filter
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
        # and the rewritten plan still computes the right answer
        rows = q.collect()
        assert rows and rows[0]["n"] > 0


def test_bloom_filter_cost_gated_off_at_small_scan(spark):
    # defaults: the probe scan is far below 10 GB, so no filter is
    # injected — the rewrite is cost-based, not unconditional
    with _conf(spark, {"spark.sql.optimizer.runtime.bloomFilter.enabled":
                       "true",
                       "spark.sql.autoBroadcastJoinThreshold": "-1",
                       "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1"}):
        plan = (_urgent_revenue(spark)
                ._jdf.queryExecution().optimizedPlan().toString())
        assert "might_contain" not in plan
