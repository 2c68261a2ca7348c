"""Streaming CCNet quality filter: batch<->streaming parity + routing.

The parity claim (the one the ingest guard established for dedup): with
the frozen artifacts trained on a corpus, draining that SAME corpus
through the streaming scorer reproduces the batch
`ccnet_perplexity_buckets` rows bit-for-bit — scoring is one shared
implementation, so the paths cannot diverge.
"""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from kafka_flink_processing_spark.plans.registry import QUERIES, _ensure_loaded
from kafka_flink_processing_spark.streaming.jobs import (
    ccnet_quality_filter_job,
)

pytestmark = pytest.mark.slow  # integration tier (see pytest.ini)

SCHEMA = ("doc_id long, text string, lang string, source string, "
          "n_chars long")


def _corpus():
    rows = []
    for i in range(12):  # trusted en slice: common bigrams
        rows.append((i, "aa bb cc dd " * 3, "en", "s", 36))
    for i in range(12, 18):  # mixed: half common, half rare
        rows.append((i, "aa bb " + f"r{i}x r{i}y r{i}z", "en", "s", 20))
    for i in range(18, 24):  # rare-only: tail candidates
        rows.append((i, f"q{i}a q{i}b q{i}c q{i}d", "de", "s", 16))
    rows += [(24, "solo", "en", "s", 4), (25, "", "en", "s", 0)]  # unscorable
    return rows


def _read_epochs(spark, out_dir, sub):
    path = os.path.join(out_dir, sub)
    if not os.path.isdir(path) or not os.listdir(path):
        return []
    return spark.read.parquet(os.path.join(path, "epoch=*")).collect()


def test_ccnet_stream_parity_and_routing(spark, tmp_path):
    _ensure_loaded()
    rows = _corpus()
    src = str(tmp_path / "src")
    # three micro-batches: the filter must score each batch against the
    # FROZEN artifacts, independent of batch composition
    spark.createDataFrame(rows[:10], SCHEMA).coalesce(1) \
         .write.parquet(f"{src}/b1")
    spark.createDataFrame(rows[10:20], SCHEMA).coalesce(1) \
         .write.parquet(f"{src}/b2")
    spark.createDataFrame(rows[20:], SCHEMA).coalesce(1) \
         .write.parquet(f"{src}/b3")

    # the batch-query ground truth on the same staged corpus
    sf = str(tmp_path / "sf")
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
         .write.parquet(f"{sf}/documents.parquet")
    batch = {r.doc_id: (r.n_bigrams, r.xent_nats, r.ppl_tercile)
             for r in QUERIES["ccnet_perplexity_buckets"]
             .spark(spark, sf).collect()}

    reference = spark.read.schema(SCHEMA).parquet(f"{src}/b*")
    stream = spark.readStream.schema(SCHEMA).parquet(f"{src}/b*")
    out = str(tmp_path / "out")
    q, (lm, ter) = ccnet_quality_filter_job(
        stream, reference, out, str(tmp_path / "ck"), available_now=True)
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
        lm.unpersist()
        ter.unpersist()

    acc = _read_epochs(spark, out, "accepted")
    rej = _read_epochs(spark, out, "rejected")
    uns = _read_epochs(spark, out, "unscorable")

    # routing: accepted = terciles 1-2, rejected = 3, unscorable = NULL
    assert all(r.ppl_tercile in (1, 2) for r in acc)
    assert all(r.ppl_tercile == 3 for r in rej)
    assert all(r.ppl_tercile is None for r in uns)
    assert {r.doc_id for r in uns} == {24, 25}

    # parity: every doc routed exactly once, scores/terciles bit-equal
    # to the batch query (unscorable n_bigrams surfaces as NULL in the
    # stream's raw rows, 0 in the batch projection — coalesce to compare)
    got = {r.doc_id: (r.n_bigrams if r.n_bigrams is not None else 0,
                      r.xent_nats, r.ppl_tercile)
           for r in acc + rej + uns}
    assert len(got) == len(acc) + len(rej) + len(uns) == len(rows)
    assert got == batch


def test_ccnet_stream_artifacts_frozen_across_batches(spark, tmp_path):
    """A doc with identical text must get the IDENTICAL score whichever
    micro-batch it arrives in — the artifact is frozen, the stream never
    re-derives boundaries from itself."""
    _ensure_loaded()
    rows = _corpus()
    src = str(tmp_path / "src")
    # same text, two different batches
    probe_a = (100, "aa bb cc dd aa bb", "en", "s", 17)
    probe_b = (101, "aa bb cc dd aa bb", "en", "s", 17)
    spark.createDataFrame(rows + [probe_a], SCHEMA).coalesce(1) \
         .write.parquet(f"{src}/b1")
    spark.createDataFrame([probe_b], SCHEMA).coalesce(1) \
         .write.parquet(f"{src}/b2")

    reference = spark.read.schema(SCHEMA).parquet(f"{src}/b*")
    stream = spark.readStream.schema(SCHEMA).parquet(f"{src}/b*")
    out = str(tmp_path / "out")
    q, (lm, ter) = ccnet_quality_filter_job(
        stream, reference, out, str(tmp_path / "ck"), available_now=True)
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
        lm.unpersist()
        ter.unpersist()

    every = (_read_epochs(spark, out, "accepted")
             + _read_epochs(spark, out, "rejected"))
    by_id = {r.doc_id: (r.xent_nats, r.ppl_tercile) for r in every}
    assert by_id[100] == by_id[101]


def test_ccnet_stream_oov_content_scores(spark, tmp_path):
    """Frozen-artifact coverage (r12 advisory fix): a streamed doc whose
    bigrams (or whose ce_c bin) never occurred in the REFERENCE corpus
    must still be scored and routed head/middle/tail — 'unscorable' is
    reserved for <2-token docs. The sparse-LM + exact-bin formulation
    silently dropped such docs; the dense LM scores OOV bigrams at the
    smoothing floor and the boundary thresholds cover every ce_c."""
    _ensure_loaded()
    src = str(tmp_path / "src")
    ref_dir = str(tmp_path / "ref")
    # reference corpus (vocabulary disjoint from the stream's), with a
    # head/middle/tail spread so all three tercile boundaries exist
    ref_rows = [(i, "aa bb cc dd " * 3, "en", "s", 36) for i in range(8)]
    ref_rows += [(i, f"m{i}a m{i}b aa bb", "en", "s", 16)
                 for i in range(8, 12)]
    ref_rows += [(i, f"r{i}w r{i}x r{i}y r{i}z", "en", "s", 16)
                 for i in range(12, 16)]
    spark.createDataFrame(ref_rows, SCHEMA).coalesce(1).write.parquet(ref_dir)
    # streamed corpus: entirely OOV words, plus one true unscorable
    stream_rows = [(100 + i, f"z{i}p z{i}q z{i}r z{i}s", "en", "s", 16)
                   for i in range(6)]
    stream_rows.append((990, "solo", "en", "s", 4))
    spark.createDataFrame(stream_rows, SCHEMA).coalesce(1) \
         .write.parquet(f"{src}/b1")

    reference = spark.read.schema(SCHEMA).parquet(ref_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(f"{src}/b*")
    out = str(tmp_path / "out")
    q, (lm, ter) = ccnet_quality_filter_job(
        stream, reference, out, str(tmp_path / "ck"), available_now=True)
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
        lm.unpersist()
        ter.unpersist()

    acc = _read_epochs(spark, out, "accepted")
    rej = _read_epochs(spark, out, "rejected")
    uns = _read_epochs(spark, out, "unscorable")
    # every >=2-token OOV doc scored and routed; only the 1-token doc is
    # unscorable
    assert {r.doc_id for r in uns} == {990}
    assert {r.doc_id for r in acc + rej} == {100 + i for i in range(6)}
    for r in acc + rej:
        assert r.n_bigrams == 3 and r.xent_nats is not None
        assert r.ppl_tercile in (1, 2, 3)
    # all-OOV text scores at the uniform smoothing floor, which is the
    # worst (highest) cross-entropy the frozen LM can assign — CCNet
    # routes such content to the tail
    assert all(r.ppl_tercile == 3 for r in rej) and rej


def test_ccnet_stream_keep_tercile_knob(spark, tmp_path):
    """keep_terciles=(1,) keeps only the head — the CCNet strictness
    knob routes the middle tercile to rejected."""
    _ensure_loaded()
    rows = _corpus()
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(f"{src}/b1")
    reference = spark.read.schema(SCHEMA).parquet(f"{src}/b*")
    stream = spark.readStream.schema(SCHEMA).parquet(f"{src}/b*")
    out = str(tmp_path / "out")
    q, (lm, ter) = ccnet_quality_filter_job(
        stream, reference, out, str(tmp_path / "ck"),
        keep_terciles=(1,), available_now=True)
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
        lm.unpersist()
        ter.unpersist()
    acc = _read_epochs(spark, out, "accepted")
    rej = _read_epochs(spark, out, "rejected")
    assert acc and all(r.ppl_tercile == 1 for r in acc)
    assert {r.ppl_tercile for r in rej} == {2, 3}
