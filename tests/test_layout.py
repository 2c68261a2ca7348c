"""Partitioned-layout pruning (sources/bucketed.py::write_partitioned):
the plan must show the partition filter applied at the scan — whole
directories skipped, not row-filtered after reading."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_flink_processing_spark.sources.bucketed import write_partitioned
from kafka_flink_processing_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("layout") / "events_by_type")
    write_partitioned(load_table(spark, "events", SF), out, ["event_type"])
    return out


def test_partition_filter_prunes_directories(spark, partitioned_events):
    df = (spark.read.parquet(partitioned_events)
          .filter(F.col("event_type") == "click"))
    plan = df._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PartitionFilters: [" in scan
    assert "event_type" in scan.split("PartitionFilters:")[1].split("]")[0]
    # the data filter must NOT be re-applied row-wise after pruning
    assert "Filter (" not in plan.split("FileScan")[0]


def test_partitioned_read_matches_source(spark, partitioned_events):
    src = load_table(spark, "events", SF) \
        .filter(F.col("event_type") == "click")
    part = (spark.read.parquet(partitioned_events)
            .filter(F.col("event_type") == "click"))
    assert part.count() == src.count()
    assert sorted(r.event_id for r in part.select("event_id").collect()) == \
           sorted(r.event_id for r in src.select("event_id").collect())


def test_partition_values_survive_roundtrip(spark, partitioned_events):
    # partition column comes back typed from the directory name
    types = {r.event_type for r in
             spark.read.parquet(partitioned_events)
                  .select("event_type").distinct().collect()}
    src_types = {r.event_type for r in
                 load_table(spark, "events", SF)
                 .select("event_type").distinct().collect()}
    assert types == src_types
