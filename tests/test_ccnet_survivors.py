"""Semantics ground truth for the two r10 post-freeze registrations:

- ccnet_perplexity_buckets (plans/extensions.py): common-bigram docs must
  score LOWER cross-entropy than rare-bigram docs, terciles must be
  monotone in the score, and <2-token docs must surface as unscorable
  (n_bigrams=0, NULL score/tercile) rather than silently head or tail.
- dedup_cluster_survivors (plans/extensions.py): one survivor per
  MinHash-LSH connected component, the longest member (doc_id tie-break);
  singletons survive themselves.

Engine agreement is certified separately by tools/oracle_check.py parity
at three SFs; these tests pin the SEMANTICS on hand corpora.
"""

from __future__ import annotations

import pytest

import tempfile

from kafka_flink_processing_spark.plans.registry import QUERIES, _ensure_loaded


def _stage(spark, rows):
    d = tempfile.mkdtemp(prefix="kfps_ccnet_")
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


def test_ccnet_xent_orders_common_vs_rare(spark):
    _ensure_loaded()
    # 20 'en' docs all speak "aa bb" — their bigrams dominate the LM, so
    # docs made of them score LOW cross-entropy. Doc 100 repeats the
    # common phrase; doc 101 is all never-seen-again bigrams; docs
    # 102/103 are unscorable (<2 tokens).
    rows = []
    for i in range(20):
        rows.append((i, "aa bb aa bb aa bb aa bb", "en", "s", 23))
    rows += [(100, "aa bb aa bb aa bb", "en", "s", 17),
             (101, "q1 q2 q3 q4 q5 q6 q7", "en", "s", 20),
             (102, "aa", "en", "s", 2),
             (103, "", "en", "s", 0)]
    sf = _stage(spark, rows)
    got = {r.doc_id: (r.n_bigrams, r.xent_nats, r.ppl_tercile)
           for r in QUERIES["ccnet_perplexity_buckets"].spark(spark, sf)
           .collect()}
    assert len(got) == 24
    # common-phrase doc scores strictly below the rare-bigram doc
    assert got[100][1] < got[101][1]
    # ... and the rare doc scores above EVERY common-speak doc
    assert all(got[101][1] > got[i][1] for i in range(20))
    # terciles are monotone in the score (same centinat bin => same
    # tercile; higher score => same-or-higher tercile)
    scored = sorted((v[1], v[2]) for v in got.values() if v[1] is not None)
    for (x1, t1), (x2, t2) in zip(scored, scored[1:]):
        assert t1 <= t2
    assert {t for _, t in scored} <= {1, 2, 3}
    # the rare-bigram doc lands in the tail tercile, never the head
    assert got[101][2] == 3
    # unscorable docs: visible, not bucketed
    assert got[102] == (0, None, None)
    assert got[103] == (0, None, None)


def test_ccnet_tercile_balance_on_spread_scores(spark):
    _ensure_loaded()
    # 30 probe docs at 30 distinct score levels (increasingly rare
    # vocabulary). Pinned properties: scores strictly increase with
    # rarity, the extremes land in terciles 1 and 3, all three terciles
    # are populated, and the split is NEAR-balanced (the trainer doc 999
    # may share a centinat bin with doc 0, so an exact 10/10/10 is not
    # guaranteed by the histogram-CDF rule — we assert a +/-2 band).
    rows = []
    common = "aa bb " * 20  # trains the LM
    rows.append((999, common.strip(), "en", "s", len(common)))
    for i in range(30):
        # i rare bigrams mixed with (29 - i) common ones -> 30 distinct
        # cross-entropy levels, strictly increasing with i
        words = (["aa", "bb"] * (30 - i) + [f"r{i}_{j}" for j in range(2 * i)])
        text = " ".join(words)
        rows.append((i, text, "en", "s", len(text)))
    sf = _stage(spark, rows)
    out = {r.doc_id: (r.xent_nats, r.ppl_tercile)
           for r in QUERIES["ccnet_perplexity_buckets"].spark(spark, sf)
           .collect()}
    xs = [out[i][0] for i in range(30)]
    assert all(a < b for a, b in zip(xs, xs[1:])), "scores not increasing"
    from collections import Counter
    c = Counter(out[i][1] for i in range(30))
    # 31 scored docs (incl. the trainer doc, lowest score) -> roughly
    # 11/10/10 in score order; the 30 probe docs split with the lowest-i
    # docs in tercile 1 and highest-i in tercile 3, each tercile within
    # +/-2 of a third.
    assert out[0][1] == 1 and out[29][1] == 3
    assert sum(c.values()) == 30 and set(c) == {1, 2, 3}
    assert all(8 <= c[t] <= 12 for t in (1, 2, 3)), c


@pytest.mark.slow  # heavyweight (see pytest.ini tiers)
def test_cluster_survivors_longest_wins(spark):
    _ensure_loaded()
    base = " ".join(f"w{i}" for i in range(20))
    near = base + " extraword"  # 19/18 shared 3-shingles, jaccard ~0.95
    rows = [
        (0, base, "en", "s", len(base)),
        (1, near, "en", "s", len(near)),   # longest member of the cluster
        (2, base, "en", "s", len(base)),   # exact dup of 0
        (7, "zz yy xx totally different words here", "en", "s", 38),
        (8, "another lone document", "en", "s", 21),
    ]
    sf = _stage(spark, rows)
    got = {r.doc_id: (r.canonical_id, r.survivor_id, r.is_survivor)
           for r in QUERIES["dedup_cluster_survivors"].spark(spark, sf)
           .collect()}
    assert len(got) == 5
    # 0, 1, 2 form one component; the LONGEST (doc 1) survives
    assert got[0][0] == got[1][0] == got[2][0] == 0
    assert got[0][1] == got[1][1] == got[2][1] == 1
    assert [got[i][2] for i in (0, 1, 2)] == [False, True, False]
    # singletons survive themselves
    for i in (7, 8):
        assert got[i] == (i, i, True)
    # exactly one survivor per cluster
    from collections import Counter
    surv = Counter(c for c, _, is_s in got.values() if is_s)
    clusters = {c for c, _, _ in got.values()}
    assert surv == Counter({c: 1 for c in clusters})


def test_cluster_survivors_tie_breaks_on_doc_id(spark):
    _ensure_loaded()
    base = " ".join(f"t{i}" for i in range(15))
    rows = [
        (5, base, "en", "s", 100),  # same length: lowest doc_id wins
        (3, base, "en", "s", 100),
        (9, base, "en", "s", 50),
    ]
    sf = _stage(spark, rows)
    got = {r.doc_id: (r.survivor_id, r.is_survivor)
           for r in QUERIES["dedup_cluster_survivors"].spark(spark, sf)
           .collect()}
    assert got[3] == (3, True)
    assert got[5] == (3, False)
    assert got[9] == (3, False)
