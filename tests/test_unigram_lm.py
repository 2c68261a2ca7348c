"""Differential + semantics tests for the unigram-LM tokenizer trainer
(operators/unigram_lm.py — Kudo 2018 hard-EM, the SentencePiece unigram
model).

The differential is a PURE-PYTHON reimplementation of the identical
algorithm (same seed cap, same integer scoring, same tie-break, same
smoothing) compared piece-for-piece including the 6dp log-probs — the
k-means-style independent-implementation check. Engine-vs-DuckDB
agreement is certified separately by tools/oracle_check.py.
"""

from __future__ import annotations

import math
from collections import Counter

from kafka_flink_processing_spark.operators.unigram_lm import (
    compositions,
    unigram_lm_vocab,
)


def _round6(x: float) -> int:
    # round-half-away-from-zero, the Spark/DuckDB ROUND semantics
    return int(math.copysign(math.floor(abs(x) * 1e6 + 0.5), x))


def _py_unigram(texts, max_piece=4, max_word=12, vocab_cap=512, iters=2):
    words: Counter[str] = Counter()
    for t in texts:
        for w in (t or "").split(" "):
            if 1 <= len(w) <= max_word:
                words[w] += 1
    subs: Counter[str] = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_piece) + 1):
                subs[w[i:j]] += f
    ranked = sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = {p: c for k, (p, c) in enumerate(ranked)
            if k < vocab_cap or len(p) == 1}
    total = sum(kept.values())
    vocab = {p: (c, _round6(math.log(c) - math.log(total)))
             for p, c in kept.items()}

    comps_by_len: dict[int, list[tuple[int, ...]]] = {}
    for parts in compositions(max_word, max_piece):
        comps_by_len.setdefault(sum(parts), []).append(parts)

    for _ in range(iters):
        counts: Counter[str] = Counter()
        for w, f in words.items():
            best = None  # (-score, seg_str, pieces)
            for parts in comps_by_len.get(len(w), []):
                pieces, s = [], 0
                for p in parts:
                    pieces.append(w[s:s + p])
                    s += p
                if any(p not in vocab for p in pieces):
                    continue
                score = sum(vocab[p][1] for p in pieces)
                key = (-score, " ".join(pieces))
                if best is None or key < best[:2]:
                    best = (*key, pieces)
            assert best is not None, f"word {w!r} unsegmentable"
            for p in best[2]:
                counts[p] += f
        sm = {p: c + (1 if len(p) == 1 else 0) for p, c in counts.items()}
        total = sum(sm.values())
        vocab = {p: (c, _round6(math.log(c) - math.log(total)))
                 for p, c in sm.items()}
    return {p: (c, lp6) for p, (c, lp6) in vocab.items()}


def _spark_vocab(spark, texts, **kw):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    out = unigram_lm_vocab(docs, **kw)
    return {r.piece: (r.cnt, _round6(r.logp)) for r in out.collect()}


def test_differential_small_corpus(spark):
    texts = ["abab abab cd", "abcd cd cd ab", "dcba abab x", "", None,
             "aa bb abab dcba"]
    assert _spark_vocab(spark, texts) == _py_unigram(texts)


def test_differential_zipfish_corpus(spark):
    # deterministic Zipf-ish corpus: repeated stems with suffix variety
    texts = []
    stems = ["data", "table", "scan", "agg", "row"]
    for k in range(30):
        stem = stems[k % len(stems)]
        texts.append(" ".join([stem, stem + "s", stem + "ed",
                               f"w{k}", stem]))
    assert _spark_vocab(spark, texts) == _py_unigram(texts)


def test_differential_cap_binds(spark):
    # tiny cap forces the top-k tie-break path; singles always survive
    texts = ["abcde edcba abc cde", "ab cd ce ab abc"]
    got = _spark_vocab(spark, texts, vocab_cap=5)
    assert got == _py_unigram(texts, vocab_cap=5)
    for ch in "abcde":
        assert ch in got, "single characters must always stay in vocab"


def test_common_word_kept_whole(spark):
    # a 4-char word dominating the corpus must be its own piece with a
    # dominant count; rare words fall back to shorter pieces
    texts = ["data data data data data qz"] * 5
    got = _spark_vocab(spark, texts)
    assert "data" in got
    assert got["data"][0] >= 25  # every occurrence segments as [data]
    # 'q' and 'z' survive only via the single-char smoothing or 'qz' use
    assert "q" in got or "qz" in got


def test_word_length_cap_excludes(spark):
    long_word = "x" * 13  # > max_word=12: excluded from training
    got = _spark_vocab(spark, ["ab ab " + long_word])
    assert all(len(p) <= 4 for p in got)
    assert "ab" in got
