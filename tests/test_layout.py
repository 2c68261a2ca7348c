"""Partitioned-layout pruning (sources/bucketed.py::write_partitioned):
the plan must show the partition filter applied at the scan — whole
directories skipped, not row-filtered after reading."""

from __future__ import annotations

import numpy as np
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


# ---------------------------------------------------------------------------
# Z-order layout (r8): multi-dimensional data skipping, measured
# ---------------------------------------------------------------------------

def _file_boxes(spark, path, cols):
    """Per-output-file bounding box over cols (the min/max footprint
    parquet stores as row-group statistics — what a reader prunes on)."""
    files = sorted(spark.read.parquet(path).inputFiles())
    boxes = []
    for f in files:
        r = spark.read.parquet(f).agg(
            *[fn(c).alias(f"{fn.__name__}_{c}")
              for c in cols for fn in (F.min, F.max)]).first()
        boxes.append({c: (r[f"min_{c}"], r[f"max_{c}"]) for c in cols})
    return boxes


def _norm_area(boxes, spans):
    return [
        float(np.prod([(b[c][1] - b[c][0]) / spans[c] for c in b]))
        for b in boxes
    ]


def test_zorder_rejects_keys_wider_than_signed_long(spark):
    """r9 advisor fix: bits*len(cols) > 63 must raise — bit 63 is the
    long sign bit (high-Z rows would flip negative and break the
    repartitionByRange order), and past 64 Spark's shiftleft wraps the
    shift mod 64, silently corrupting the key."""
    import pytest

    from kafka_flink_processing_spark.sources.bucketed import zorder_column

    ev = (load_table(spark, "events", SF)
          .select("user_id", "value", "event_id",
                  F.length("event_type").alias("etype_len")))
    with pytest.raises(ValueError, match="63"):
        zorder_column(ev, ["user_id", "value", "event_id", "etype_len"],
                      bits=16)
    # 4 cols at bits=15 tops out at bit 59 — fine
    _, key = zorder_column(
        ev, ["user_id", "value", "event_id", "etype_len"], bits=15)
    assert key == "__z"


@pytest.mark.slow  # heavyweight (see pytest.ini tiers)
def test_zorder_layout_shrinks_file_footprints_and_prunes(spark, tmp_path):
    from kafka_flink_processing_spark.sources.bucketed import write_zordered

    ev = load_table(spark, "events", SF).select("user_id", "value", "ts")
    cols = ["user_id", "value"]
    stats = ev.agg(F.min("user_id"), F.max("user_id"),
                   F.min("value"), F.max("value")).first()
    spans = {"user_id": float(stats[1] - stats[0]) or 1.0,
             "value": float(stats[3] - stats[2]) or 1.0}
    n_files = 16

    # baseline: same data, same file count, hash-scattered (the layout a
    # plain shuffle write produces — every file spans ~the full domain)
    base = f"{tmp_path}/plain"
    ev.repartition(n_files).write.parquet(base)
    zpath = f"{tmp_path}/zorder"
    write_zordered(ev, zpath, cols, n_files=n_files)

    # row fidelity first: layout must not lose or duplicate anything
    assert spark.read.parquet(zpath).count() == ev.count()

    plain_area = _norm_area(_file_boxes(spark, base, cols), spans)
    z_area = _norm_area(_file_boxes(spark, zpath, cols), spans)
    # every plain file spans nearly the whole (user_id, value) domain;
    # the z-ordered files' average footprint must be a small fraction
    assert np.mean(plain_area) > 0.5
    assert np.mean(z_area) < 0.5 * np.mean(plain_area)

    # the pruning consequence: a small box query intersects only a few
    # z-ordered file footprints, but EVERY hash-scattered one
    lo_u = stats[0] + 0.4 * spans["user_id"]
    hi_u = stats[0] + 0.6 * spans["user_id"]
    lo_v = stats[2] + 0.4 * spans["value"]
    hi_v = stats[2] + 0.6 * spans["value"]

    def hits(boxes):
        return sum(1 for b in boxes
                   if b["user_id"][0] <= hi_u and b["user_id"][1] >= lo_u
                   and b["value"][0] <= hi_v and b["value"][1] >= lo_v)

    plain_hits = hits(_file_boxes(spark, base, cols))
    z_hits = hits(_file_boxes(spark, zpath, cols))
    assert plain_hits == n_files          # no skipping possible
    assert z_hits <= n_files // 2         # most files skippable
