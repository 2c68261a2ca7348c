"""BPE vocabulary induction: differential tests against an independent
pure-Python reference implementation (greedy left-to-right merge
application, frequency-then-lexicographic pair selection), plus the
delimiter-encoding edge cases that make the SQL oracle exact."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from kafka_flink_processing_spark.operators.bpe import (
    bpe_encode_oracle_sql,
    bpe_encode_tokens,
    bpe_encode_words,
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


@pytest.mark.slow  # heavyweight (see pytest.ini tiers)
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


def _reference_encode(texts: list[str], merges):
    """Independent greedy applier: segment each word by applying the
    learned merges in rank order, greedy left-to-right per merge."""
    segs = {}
    for t in texts:
        for w in t.split(" "):
            if w == "" or w in segs:
                continue
            syms = list(w)
            for _rank, lsym, rsym, _m, _f in merges:
                out, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == lsym
                            and syms[i + 1] == rsym):
                        out.append(lsym + rsym)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            segs[w] = syms
    return segs


@pytest.mark.parametrize("texts", CORPORA)
def test_encode_words_roundtrips_trainer_final_seqs(spark, texts):
    """Encoding with the learned merges must reproduce each word's final
    symbol sequence from the trainer's last iteration (the r8 verdict's
    round-trip criterion)."""
    from kafka_flink_processing_spark.operators.bpe import D, DD

    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = _reference_bpe(texts, 6)
    got = {r["w"]: r["seq"]
           for r in bpe_encode_words(docs, merges).collect()}
    ref = _reference_encode(texts, merges)
    for w, syms in ref.items():
        assert got[w] == D + DD.join(syms) + D, w
        # and n_sub is the symbol count
    nsub = {r["w"]: r["n_sub"]
            for r in bpe_encode_words(docs, merges).collect()}
    for w, syms in ref.items():
        assert nsub[w] == len(syms)


@pytest.mark.parametrize("texts", CORPORA)
def test_encode_tokens_matches_reference_counts(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges = _reference_bpe(texts, 6)
    segs = _reference_encode(texts, merges)
    got = {r["doc_id"]: (r["n_words"], r["n_tokens"], r["max_word_tokens"])
           for r in bpe_encode_tokens(docs, 6).collect()}
    for i, t in enumerate(texts):
        ws = [w for w in t.split(" ") if w != ""]
        exp = (len(ws), sum(len(segs[w]) for w in ws),
               max(len(segs[w]) for w in ws))
        assert got[i] == exp


@pytest.mark.parametrize("texts", CORPORA)
def test_encode_oracle_sql_matches_reference(texts):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(texts)))
    merges = _reference_bpe(texts, 6)
    segs = _reference_encode(texts, merges)
    got = {r[0]: r[1:] for r in
           con.execute(bpe_encode_oracle_sql(6)).fetchall()}
    for i, t in enumerate(texts):
        ws = [w for w in t.split(" ") if w != ""]
        exp = (len(ws), sum(len(segs[w]) for w in ws),
               max(len(segs[w]) for w in ws))
        assert got[i] == exp


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


def _reference_bpe_batched(texts: list[str], n_iters: int, batch: int,
                           cand: int):
    """Independent pure-Python batched trainer: rank pairs by
    (freq DESC, lsym, rsym), scan the top `cand` in rank order taking up
    to `batch` symbol-disjoint pairs, apply them greedily L2R in
    selection order, recount."""
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            words[w] += 1
    seq_list = [[list(w), f] for w, f in words.items()]
    out = []
    for it in range(1, n_iters + 1):
        pc = Counter()
        for syms, f in seq_list:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        ranked = sorted(pc.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:cand]
        used: set[str] = set()
        taken = []
        for (lsym, rsym), freq in ranked:
            if len(taken) >= batch:
                break
            if lsym in used or rsym in used:
                continue
            used.update((lsym, rsym))
            taken.append((lsym, rsym, freq))
        for j, (lsym, rsym, freq) in enumerate(taken, 1):
            out.append((it, j, lsym, rsym, lsym + rsym, freq))
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


@pytest.mark.parametrize("texts", CORPORA)
def test_spark_batched_matches_reference(spark, texts):
    from kafka_flink_processing_spark.operators.bpe import (
        bpe_vocab_merges_batched,
    )

    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [tuple(r) for r in
           bpe_vocab_merges_batched(docs, n_iters=3, batch=3, cand=8)
           .orderBy("iteration", "sel_order").collect()]
    assert got == _reference_bpe_batched(texts, 3, 3, 8)


@pytest.mark.parametrize("texts", CORPORA)
def test_batched_oracle_sql_matches_reference(texts):
    from kafka_flink_processing_spark.operators.bpe import (
        bpe_batched_oracle_sql,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)",
                    [(t,) for t in texts])
    got = [tuple(r) for r in
           con.execute(bpe_batched_oracle_sql(3, 3, 8)
                       + " ORDER BY iteration, sel_order").fetchall()]
    assert got == _reference_bpe_batched(texts, 3, 3, 8)


def test_batch_one_degenerates_to_classic(spark):
    """With batch=1 the batched trainer IS the classic trainer: the greedy
    scan takes exactly the argmax pair each iteration."""
    from kafka_flink_processing_spark.operators.bpe import (
        _train_merges,
        _train_merges_batched,
    )

    texts = CORPORA[0]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    b1 = _train_merges_batched(docs, n_iters=6, batch=1, cand=4,
                               text_col="text")
    classic = _train_merges(docs, 6, "text")
    assert [(r[2], r[3], r[4], r[5]) for r in b1] == \
        [(r[1], r[2], r[3], r[4]) for r in classic]


def test_batched_selection_is_symbol_disjoint(spark):
    """No two pairs taken in the same iteration share a side symbol."""
    from kafka_flink_processing_spark.operators.bpe import (
        _train_merges_batched,
    )

    docs = spark.createDataFrame(
        [(t,) for t in CORPORA[0] + CORPORA[1]], "text string")
    rows = _train_merges_batched(docs, n_iters=3, batch=4, cand=12,
                                 text_col="text")
    by_iter: dict[int, list] = {}
    for it, _j, lsym, rsym, _m, _f in rows:
        by_iter.setdefault(it, []).append((lsym, rsym))
    for pairs in by_iter.values():
        seen: set[str] = set()
        for lsym, rsym in pairs:
            assert lsym not in seen and rsym not in seen
            seen.update((lsym, rsym))


LANG_CORPUS = [
    ("the cat sat on the mat", "en"),
    ("a cat ate the hat", "en"),
    ("der hut tut gut", "de"),
    ("aaa aaaa aa a", "de"),
    ("x  y", "fr"),                 # double space -> empty word dropped
]


def test_fertility_by_lang_matches_reference(spark):
    from kafka_flink_processing_spark.operators.bpe import (
        bpe_fertility_by_lang,
    )

    texts = [t for t, _l in LANG_CORPUS]
    merges = _reference_bpe(texts, 6)
    segs = _reference_encode(texts, merges)
    exp: dict[str, list] = {}
    for t, lang in LANG_CORPUS:
        for w in t.split(" "):
            if w != "":
                exp.setdefault(lang, []).append(w)
    docs = spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(LANG_CORPUS)],
        "doc_id long, text string, lang string")
    got = {r["lang"]: r for r in bpe_fertility_by_lang(docs, 6).collect()}
    assert set(got) == set(exp)
    for lang, ws in exp.items():
        r = got[lang]
        n_tok = sum(len(segs[w]) for w in ws)
        assert r["n_word_occ"] == len(ws)
        assert r["n_tokens"] == n_tok
        assert r["n_distinct_words"] == len(set(ws))
        assert r["n_unmerged_occ"] == sum(
            1 for w in ws if len(segs[w]) == len(w))
        assert r["fertility"] == n_tok / len(ws)


def test_fertility_oracle_matches_reference():
    from kafka_flink_processing_spark.operators.bpe import (
        bpe_fertility_oracle_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)",
                    [(i, t, l) for i, (t, l) in enumerate(LANG_CORPUS)])
    texts = [t for t, _l in LANG_CORPUS]
    merges = _reference_bpe(texts, 6)
    segs = _reference_encode(texts, merges)
    exp: dict[str, list] = {}
    for t, lang in LANG_CORPUS:
        for w in t.split(" "):
            if w != "":
                exp.setdefault(lang, []).append(w)
    got = {r[0]: r for r in
           con.execute(bpe_fertility_oracle_sql(6)).fetchall()}
    assert set(got) == set(exp)
    for lang, ws in exp.items():
        _l, occ, ntok, ndist, nunm, fert = got[lang]
        assert occ == len(ws)
        assert ntok == sum(len(segs[w]) for w in ws)
        assert ndist == len(set(ws))
        assert nunm == sum(1 for w in ws if len(segs[w]) == len(w))
        assert fert == ntok / occ


# --- r10: encode from a PERSISTED merge-table artifact -------------------

@pytest.mark.parametrize("texts", CORPORA)
def test_encode_from_artifact_equals_train_then_encode(spark, texts):
    """encode(persisted merges) == encode(train-then-encode) when the
    artifact was trained on the same corpus — the equality the r9 verdict
    asked to pin (task 4)."""
    from kafka_flink_processing_spark.operators.bpe import (
        bpe_encode_tokens_with,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges = _reference_bpe(texts, 6)   # the "persisted" artifact
    via_artifact = sorted(
        tuple(r) for r in bpe_encode_tokens_with(docs, merges).collect())
    via_train = sorted(
        tuple(r) for r in bpe_encode_tokens(docs, 6).collect())
    assert via_artifact == via_train


@pytest.mark.parametrize("texts", CORPORA + [
    ["don't can't won't don't", "it's a don't"],   # quote in symbols
])
def test_encode_artifact_oracle_matches_spark(spark, texts):
    """The generated nested-replace oracle must replay the Spark encode
    exactly — including SQL-quote escaping when a learned symbol contains
    an apostrophe."""
    from kafka_flink_processing_spark.operators.bpe import (
        bpe_encode_artifact_oracle_sql,
        bpe_encode_tokens_with,
    )

    merges = _reference_bpe(texts, 6)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got_spark = sorted(
        tuple(r) for r in bpe_encode_tokens_with(docs, merges).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(texts)))
    got_duck = sorted(
        tuple(r)
        for r in con.execute(
            bpe_encode_artifact_oracle_sql(merges)).fetchall())
    assert got_spark == got_duck


def test_artifact_module_merges_are_wellformed():
    """The pinned artifact parses, ranks are 1..n, and no symbol contains
    the \x1f delimiter (the property the oracle's exactness relies on)."""
    from kafka_flink_processing_spark.functions.bpe_merges import BPE_MERGES
    from kafka_flink_processing_spark.operators.bpe import D

    assert [m[0] for m in BPE_MERGES] == list(range(1, len(BPE_MERGES) + 1))
    for _rank, lsym, rsym, merged, freq in BPE_MERGES:
        assert merged == lsym + rsym
        assert D not in lsym and D not in rsym
        assert freq > 0
