"""Semantics ground truth for ExactSubstr span mining
(operators/dedup.py::exactsubstr_spans — Lee et al. 2022, the
suffix-array ExactSubstr variant as anchored diagonal run-merging).

The load-bearing test is the DISAGREEMENT WITNESS: a word run whose
overlapping duplicated grams have DIFFERENT partner documents is
redacted whole by the gram-membership approximation (dup_span_redact)
but is NOT a shared span — no single document contains it contiguously
— and exactsubstr_spans must refuse to merge it.

Engine agreement with the DuckDB oracle is certified separately by
tools/oracle_check.py; these tests pin the SEMANTICS on hand corpora.
"""

from __future__ import annotations

import tempfile

from kafka_flink_processing_spark.operators.dedup import (
    dup_span_redact,
    exactsubstr_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in rows], "doc_id long, text string")


def _stage(spark, rows):
    d = tempfile.mkdtemp(prefix="kfps_exsub_")
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


def _spans(spark, rows, min_len, max_df=64):
    out = exactsubstr_spans(_docs(spark, rows), min_len=min_len,
                            max_df=max_df)
    return sorted((r.doc_a, r.doc_b, r.a_start, r.b_start, r.span_len)
                  for r in out.collect())


def test_single_shared_span_exact_bounds(spark):
    # a 10-word run shared at different offsets, distinct filler around it
    shared = " ".join(f"s{i}" for i in range(10))
    a = "fa1 fa2 " + shared + " fa3"          # span starts at word 3
    b = "fb1 " + shared                        # span starts at word 2
    got = _spans(spark, [(0, a), (1, b)], min_len=8)
    assert got == [(0, 1, 3, 2, 10)]


def test_run_merging_extends_past_anchor_size(spark):
    # 9 shared words with k=8 -> two seeds on one diagonal merge to len 9
    shared = " ".join(f"m{i}" for i in range(9))
    got = _spans(spark, [(0, shared + " xa"), (1, "yb " + shared)],
                 min_len=8)
    assert got == [(0, 1, 1, 2, 9)]


def test_below_threshold_span_not_reported(spark):
    shared = " ".join(f"t{i}" for i in range(7))  # 7 < min_len=8
    got = _spans(spark, [(0, shared + " ua1"), (1, shared + " ub1")],
                 min_len=8)
    assert got == []


def test_repeated_span_two_diagonals(spark):
    # doc 0 contains the shared run TWICE -> two maximal spans vs doc 1,
    # one per diagonal
    shared = " ".join(f"r{i}" for i in range(8))
    a = shared + " gap1 gap2 " + shared
    got = _spans(spark, [(0, a), (1, shared)], min_len=8)
    assert got == [(0, 1, 1, 1, 8), (0, 1, 11, 1, 8)]


def test_witness_disagrees_with_gram_membership(spark):
    """THE WITNESS: doc A holds 'c1 c2 c3 c4'; B shares only 'c1 c2 c3',
    C shares only 'c2 c3 c4'. Every 3-gram of A's run is corpus-
    duplicated, so gram-membership (dup_span_redact, n=3) redacts all
    FOUR words — implying one 4-word duplicated span. But no document
    shares the 4-word run contiguously: ExactSubstr reports two maximal
    spans of length 3 and NONE of length 4."""
    a = "za1 za2 c1 c2 c3 c4 za3"
    b = "zb1 c1 c2 c3 zb2"
    c = "zc1 c2 c3 c4 zc2"
    rows = [(0, a), (1, b), (2, c)]
    got = _spans(spark, rows, min_len=3)
    assert got == [(0, 1, 3, 2, 3), (0, 2, 4, 2, 3)]
    assert all(s[4] < 4 for s in got), "no 4-word span exists in any pair"
    # the gram-membership form redacts A's whole run (4 words) — the two
    # forms genuinely disagree on this corpus
    red = {r.doc_id: r.n_removed_words
           for r in dup_span_redact(_docs(spark, rows), n=3).collect()}
    assert red[0] == 4


def test_max_df_cap_excludes_hub_grams(spark):
    # the same 8-word run in 5 docs: with max_df=4 its anchors are
    # hub-screened out entirely (contract: >max_df grams never anchor)
    shared = " ".join(f"h{i}" for i in range(8))
    rows = [(i, f"f{i}a " + shared) for i in range(5)]
    assert _spans(spark, rows, min_len=8, max_df=4) == []
    # with the cap lifted all 10 ordered pairs report the span
    got = _spans(spark, rows, min_len=8, max_df=64)
    assert len(got) == 10 and all(s[4] == 8 for s in got)


def test_redact_keep_one_minimal_doc_id(spark):
    """ExactSubstr APPLY: docs {1, 5, 9} share an 8-word span — the
    minimal doc_id (1) keeps its copy, 5 and 9 lose exactly the span."""
    from kafka_flink_processing_spark.operators.dedup import (
        exactsubstr_redact,
    )
    shared = " ".join(f"k{i}" for i in range(8))
    rows = [(1, shared + " ua1 ua2"), (5, "ub1 " + shared),
            (9, shared), (3, "no duplication in this one at all ok")]
    got = {r.doc_id: (r.clean_text, r.n_words, r.n_removed_words)
           for r in exactsubstr_redact(_docs(spark, rows),
                                       min_len=8).collect()}
    assert got[1] == (shared + " ua1 ua2", 10, 0)   # keeper: untouched
    assert got[5] == ("ub1", 9, 8)                   # span excised
    assert got[9] == ("", 8, 8)                      # fully redacted
    assert got[3][2] == 0 and got[3][0] == rows[3][1]


def test_redact_contrast_with_gram_form(spark):
    """The gram form (dup_span_redact) removes EVERY occurrence of a
    duplicated gram; the ExactSubstr apply keeps one copy."""
    shared = " ".join(f"c{i}" for i in range(8))
    rows = [(0, shared), (1, shared)]
    span = {r.doc_id: r.n_removed_words
            for r in __import__(
                "kafka_flink_processing_spark.operators.dedup",
                fromlist=["exactsubstr_redact"])
            .exactsubstr_redact(_docs(spark, rows), min_len=8).collect()}
    gram = {r.doc_id: r.n_removed_words
            for r in dup_span_redact(_docs(spark, rows), n=3).collect()}
    assert span == {0: 0, 1: 8}      # keep-one
    assert gram == {0: 8, 1: 8}      # remove-everywhere


def test_registered_query_on_staged_corpus(spark):
    from kafka_flink_processing_spark.plans.registry import (
        QUERIES,
        _ensure_loaded,
    )
    _ensure_loaded()
    shared = " ".join(f"q{i}" for i in range(12))
    rows = [(0, "pa1 pa2 " + shared), (1, shared + " pb1"),
            (2, "lone doc with nothing shared at all xyz")]
    sf = _stage(spark, rows)
    got = [(r.doc_a, r.doc_b, r.a_start, r.b_start, r.span_len)
           for r in QUERIES["exactsubstr_spans"].spark(spark, sf).collect()]
    assert got == [(0, 1, 3, 1, 12)]
