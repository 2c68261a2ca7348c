"""DSIR importance weights (plans/extensions.py::dsir_importance_weights_q):
semantics ground truth on a hand corpus — target-characteristic bigrams
must score positive, raw-only bigrams negative, short/empty docs total."""

from __future__ import annotations

import pytest

import tempfile

from kafka_flink_processing_spark.plans.registry import QUERIES, _ensure_loaded


def _stage(spark, rows):
    d = tempfile.mkdtemp(prefix="kfps_dsir_")
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


@pytest.mark.slow  # heavyweight (see pytest.ini tiers)
def test_dsir_weight_orders_target_vs_raw(spark):
    _ensure_loaded()
    # 'en' docs speak in "aa bb"; 'de' docs in "cc dd"; doc 100 is pure
    # target-speak, doc 101 pure raw-only-speak, doc 102 one token (no
    # bigrams), doc 103 empty text
    rows = []
    for i in range(10):
        rows.append((i, "aa bb aa bb aa bb", "en", "s", 17))
    for i in range(10, 20):
        rows.append((i, "cc dd cc dd cc dd", "de", "s", 17))
    rows += [(100, "aa bb aa bb", "de", "s", 11),
             (101, "cc dd cc dd", "en", "s", 11),
             (102, "aa", "en", "s", 2),
             (103, "", "en", "s", 0)]
    sf = _stage(spark, rows)
    got = {r.doc_id: (r.n_bigrams, r.dsir_weight)
           for r in QUERIES["dsir_importance_weights"].spark(spark, sf)
           .collect()}
    assert len(got) == 24
    # target-speak scores strictly above raw-speak, regardless of the
    # speaking doc's own lang (the weight reads the TEXT, not the label).
    # Absolute signs are not asserted: with B=1024 smoothing buckets and
    # a ~100-bigram corpus, Laplace smoothing dominates and shifts all
    # weights toward ln((R+B)/(T+B)) — an honest small-corpus property,
    # irrelevant at real corpus sizes where counts >> B.
    assert got[100][1] > got[101][1]
    # target-enriched text also outranks every pure-raw-speak doc
    assert all(got[100][1] > got[i][1] for i in range(10, 20))
    assert all(got[101][1] < got[i][1] for i in range(10))
    # totality: no bigrams -> weight exactly 0
    assert got[102] == (0, 0.0)
    assert got[103] == (0, 0.0)
