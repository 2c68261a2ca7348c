"""BPE vocabulary induction: differential tests against an independent
pure-Python reference implementation (greedy left-to-right merge
application, frequency-then-lexicographic pair selection), plus the
delimiter-encoding edge cases that make the SQL oracle exact."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from kafka_flink_processing_spark.operators.bpe import (
    bpe_oracle_sql,
    bpe_vocab_merges,
)


def _reference_bpe(texts: list[str], n_merges: int):
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            words[w] += 1
    seq_list = [[list(w), f] for w, f in words.items()]
    out = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for syms, f in seq_list:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (lsym, rsym), freq = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        out.append((rank, lsym, rsym, lsym + rsym, freq))
        for entry in seq_list:
            syms, merged, i = entry[0], [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == lsym
                        and syms[i + 1] == rsym):
                    merged.append(lsym + rsym)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            entry[0] = merged
    return out


CORPORA = [
    ["the cat sat on the mat the cat", "a cat ate the hat"],
    ["aaa aaaa aa a", "aaaa aaa"],          # self-merge KwKwK shape
    ["ab ab ab abab", "b a ab"],            # adjacent-occurrence shape
    ["x", "y z"],                           # near-degenerate
]


@pytest.mark.parametrize("texts", CORPORA)
def test_spark_bpe_matches_reference(spark, texts):
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [tuple(r) for r in
           bpe_vocab_merges(docs, 6).orderBy("merge_rank").collect()]
    assert got == _reference_bpe(texts, 6)


@pytest.mark.parametrize("texts", CORPORA)
def test_oracle_sql_matches_reference(texts):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)",
                    [(t,) for t in texts])
    got = [tuple(r) for r in con.execute(bpe_oracle_sql(6)).fetchall()]
    assert got == _reference_bpe(texts, 6)


def test_self_merge_is_left_to_right_greedy(spark):
    # merge (a,a) over "aaaaa": greedy L2R gives aa,aa,a — round 2 then
    # ties (aa,aa):2 with (aa,a):2 and the lexicographic tie-break picks
    # (aa,a) ("a" < "aa"). An overlapping (non-greedy) application would
    # instead leave 4 phantom (a,a) pairs and a different round-2 pick.
    docs = spark.createDataFrame([("aaaaa aaaaa",)], "text string")
    got = [tuple(r) for r in
           bpe_vocab_merges(docs, 2).orderBy("merge_rank").collect()]
    assert got == _reference_bpe(["aaaaa aaaaa"], 2)
    assert got[0][1:4] == ("a", "a", "aa")
    assert got[1][1:4] == ("aa", "a", "aaa")
