"""Distributed BPE vocabulary induction (Sennrich et al. 2016), fully
oracle-gated.

The classic subword-tokenizer trainer: start from characters, repeatedly
merge the most frequent adjacent symbol pair. Trains on the WORD-FREQUENCY
table, not the corpus — the Zipf concentration means the distinct-word
relation is tiny relative to corpus rows, which IS the scale story: the
only corpus-sized operation is one groupBy(word), after which every merge
iteration runs over the (cached) vocabulary relation. Per iteration: one
map-side-combined pair-count aggregate + a 1-row argmax collect (the
k-means O(K)-scalars driver pattern), then a pure-JVM string replace
applies the merge — no Python touches row data at any point.

Exact cross-engine semantics (what makes the DuckDB oracle possible):
symbol sequences are stored as delimiter-wrapped strings
("\\x1fa\\x1f\\x1fb\\x1f" for symbols a,b), so applying merge (a,b) is
replace(seq, D+a+D+D+b+D, D+ab+D) — string replace is left-to-right
non-overlapping in BOTH engines, which is exactly BPE's greedy
application order ("aaa" + merge(a,a) -> "aa","a"), and the full
delimiters make boundary collisions impossible (verified both engines:
adjacent occurrences share no characters, so "abab" merges both pairs).
Ties on pair frequency break by (lsym, rsym) byte order, identical under
ASCII in both engines. The oracle is GENERATED with one CTE stage per
merge by bpe_oracle_sql(), so both engines run the same deterministic
algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

D = "\x1f"          # symbol delimiter (unit separator; absent from corpus)
DD = D + D
N_MERGES = 10


def _loop_width(cached: DataFrame, docs: DataFrame) -> DataFrame:
    """Scale-adaptive width for the trainers' iteration loops (r12,
    guide §2: derive partitioning from data volume, never a local-mode
    constant — the cluster.py::connected_components pattern): the
    count() doubles as the cache prime, then the loop runs over the
    cached relation coalesced to ~1M vocab rows per task. At sandbox
    vocab sizes that is ONE partition, which lets EnsureRequirements
    drop the per-iteration pair-count exchange outright (a
    single-partition child satisfies any ClusteredDistribution), so
    every argmax job runs one stage instead of two — measured 2.0 s ->
    1.35 s for the 10-merge loop at sf0.1. At production vocab sizes
    (hundreds of millions of distinct words) the width saturates at the
    session default and coalesce() is a no-op (it only ever narrows).
    Results are partitioning-independent: the pair-count aggregate and
    the (freq DESC, lsym, rsym) argmax are total-order deterministic."""
    n_words = cached.count()
    default_parts = docs.sparkSession.sparkContext.defaultParallelism
    return cached.coalesce(max(1, min(default_parts,
                                      1 + n_words // 1_000_000)))


def _word_seqs(docs: DataFrame, text_col: str) -> DataFrame:
    """The word-frequency relation as delimiter-wrapped symbol sequences:
    (w, freq, seq) — the tiny (Zipf) training/apply surface; the only
    corpus-sized operation either direction is the one groupBy(word)."""
    words = (docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
                 .groupBy("w").agg(F.count("*").alias("freq")))
    return words.select(
        "w", "freq",
        F.concat(F.lit(D), F.array_join(F.split("w", ""), DD),
                 F.lit(D)).alias("seq"))


def _train_merges(docs: DataFrame, n_merges: int, text_col: str,
                  seqs_cached: DataFrame | None = None) -> list[tuple]:
    """The merge-learning loop shared by the trainer and the encoder;
    returns [(rank, lsym, rsym, merged, freq), ...] (a <= n_merges-row
    driver list — the k-means O(K)-scalars pattern).

    seqs_cached, when given, is a caller-persisted _word_seqs relation
    the loop trains from WITHOUT re-deriving (and without unpersisting —
    the caller owns the handle): bpe_encode_tokens passes its own so the
    corpus groupBy(word) runs once for train AND encode (r12, guide §5:
    cache what is reused and expensive)."""
    owns = seqs_cached is None
    if owns:
        # the vocabulary relation is tiny (Zipf); cache it so the
        # n_merges argmax actions do not rescan the corpus (production:
        # persist the word-freq table once, train from it). Keep the
        # persisted HANDLE separate: `seqs` is rebound every iteration,
        # and unpersisting the final derived frame would leave the
        # original cache entry alive for the session (the r8 review's
        # persist-leak finding).
        seqs_cached = _word_seqs(docs, text_col).select("freq", "seq") \
                                                .persist()
    cached = seqs_cached
    seqs = _loop_width(cached, docs)
    try:
        merges = []
        for rank in range(1, n_merges + 1):
            pairs = (seqs
                     .withColumn("syms", F.expr(
                         f"split(substring(seq, 2, length(seq) - 2), "
                         f"'{DD}')"))
                     .select("freq", F.explode(F.expr(
                         "zip_with(slice(syms, 1, size(syms) - 1), "
                         "          slice(syms, 2, size(syms) - 1), "
                         "          (a, b) -> struct(a AS lsym, b AS rsym))"
                     )).alias("pr")))
            best = (pairs.groupBy("pr.lsym", "pr.rsym")
                    .agg(F.sum("freq").alias("freq"))
                    .orderBy(F.desc("freq"), "lsym", "rsym")
                    .first())
            if best is None:       # degenerate corpus: nothing left to merge
                break
            merges.append((rank, best.lsym, best.rsym,
                           best.lsym + best.rsym, int(best.freq)))
            seqs = seqs.withColumn("seq", F.replace(
                "seq",
                F.lit(D + best.lsym + DD + best.rsym + D),
                F.lit(D + best.lsym + best.rsym + D)))
    finally:
        if owns:
            cached.unpersist()
    return merges


def bpe_vocab_merges(docs: DataFrame, n_merges: int = N_MERGES,
                     text_col: str = "text") -> DataFrame:
    """Learn the first n_merges BPE merges over whitespace words of
    text_col; returns (merge_rank, lsym, rsym, merged, freq)."""
    return docs.sparkSession.createDataFrame(
        _train_merges(docs, n_merges, text_col),
        "merge_rank long, lsym string, rsym string, "
        "merged string, freq long")


def apply_merges(seq_col, merges: list[tuple]):
    """Column expression applying learned merges to a delimiter-wrapped
    symbol-sequence column IN RANK ORDER — each merge is one pure-JVM
    string replace (left-to-right non-overlapping == BPE's greedy
    application order; see module docstring), so the whole encode stays
    inside whole-stage codegen with no Python on row data."""
    out = seq_col
    for _rank, lsym, rsym, _merged, _freq in merges:
        out = F.replace(out, F.lit(D + lsym + DD + rsym + D),
                        F.lit(D + lsym + rsym + D))
    return out


def bpe_encode_words(docs: DataFrame, merges: list[tuple],
                     text_col: str = "text",
                     seqs: DataFrame | None = None) -> DataFrame:
    """Encode the DISTINCT-WORD relation with a learned merge table:
    (w, freq, seq, n_sub) where seq is the final symbol sequence and
    n_sub its symbol count. This is the scale pivot of the encoder: the
    corpus never re-materializes as subwords — Zipf keeps this relation
    tiny, and per-doc token counts come from joining it back onto the
    word stream (bpe_encode_tokens)."""
    seqs = _word_seqs(docs, text_col) if seqs is None else seqs
    return (seqs.withColumn("seq", apply_merges(F.col("seq"), merges))
            .withColumn(
                "n_sub",
                F.size(F.split(F.expr("substring(seq, 2, length(seq) - 2)"),
                               DD)).cast("long")))


def bpe_encode_tokens_with(docs: DataFrame, merges: list[tuple],
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           seqs: DataFrame | None = None) -> DataFrame:
    """Encode from a PERSISTED merge table — the production shape (train
    once offline, ship the artifact, encode many corpora): segment every
    corpus word with the given merges in rank order and return per-doc
    subword statistics (doc_id, n_words, n_tokens, max_word_tokens).

    Identical output contract to bpe_encode_tokens, minus the training
    jobs: no argmax collect ever runs, so the whole encode is ONE corpus
    groupBy(word) + n_merges pure-JVM replaces over the Zipf-tiny word
    relation + one broadcast join + one map-side-combined per-doc
    aggregate. Equality with train-then-encode (same merges) is pinned in
    tests/test_bpe.py::test_encode_from_artifact_equals_train_then_encode.
    """
    wtok = (bpe_encode_words(docs, merges, text_col, seqs=seqs)
            .where(F.col("w") != "").select("w", "n_sub"))
    ex = docs.select(F.col(id_col),
                     F.explode(F.split(F.col(text_col), " ")).alias("w"))
    return (ex.join(F.broadcast(wtok), "w")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_words"),
                 F.sum("n_sub").alias("n_tokens"),
                 F.max("n_sub").alias("max_word_tokens")))


def bpe_encode_tokens(docs: DataFrame, n_merges: int = N_MERGES,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Train-then-encode: learn n_merges BPE merges, segment every word,
    and return per-doc subword statistics (doc_id, n_words, n_tokens,
    max_word_tokens) — the REAL token budget for mixing/packing stages
    (data_mix_summary/packing_efficiency run on whitespace tokens; this
    is the subword-accurate counterpart).

    Shape at 100 TB: training touches the corpus once (groupBy(word)),
    the merge table is an O(n_merges) driver list, the encoded vocab is
    the Zipf-tiny word relation (broadcast into the final join), and the
    per-doc aggregate is one map-side-combined shuffle over the exploded
    word stream. Empty words ('' from consecutive delimiters) carry no
    symbols and are excluded in BOTH engines.

    r12: train and encode share ONE persisted word relation — the corpus
    groupBy(word) ran twice before (once for the trainer's cache, once
    re-derived by the encoder). The handle is retained deliberately:
    the final encode reads it lazily at action time, and re-invocations
    re-persist the same plan, which the CacheManager dedupes ("already
    cached"), so the footprint stays one Zipf-tiny relation."""
    ws = _word_seqs(docs, text_col).persist()
    merges = _train_merges(docs, n_merges, text_col, seqs_cached=ws)
    return bpe_encode_tokens_with(docs, merges, text_col, id_col, seqs=ws)


def _oracle_stages(n_merges: int, keep_word: bool) -> list[str]:
    """Shared CTE-stage generator: with keep_word the s-chain carries the
    word alongside (freq, seq) so an encoder query can read the FINAL
    word->seq mapping from s{n_merges}. The apply stage LEFT JOINs its
    merge row so a corpus that runs dry before n_merges (p{k} empty —
    every word already a single symbol) passes seqs through unchanged
    instead of annihilating the chain (mirrors the engine's break)."""
    wcol = "w, " if keep_word else ""
    wkeep = f"s{{k}}.w, " if keep_word else ""
    stages = []
    stages.append(f"""
    w AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
          FROM (SELECT unnest(string_split(text, ' ')) AS w
                FROM documents)
          GROUP BY w),
    s0 AS MATERIALIZED (SELECT {wcol}freq,
                  '{D}' || list_aggregate(string_split(w, ''),
                                          'string_agg', '{DD}') || '{D}'
                    AS seq
           FROM w)""")
    for k in range(n_merges):
        stages.append(f"""
    p{k} AS MATERIALIZED (SELECT pr[1] AS lsym, pr[2] AS rsym, SUM(freq) AS freq
             FROM (SELECT freq,
                          [[syms[i], syms[i+1]] FOR i IN
                           range(1, len(syms))] AS prs
                   FROM (SELECT freq,
                                string_split(seq[2:-2], '{DD}') AS syms
                         FROM s{k})),
                  unnest(prs) AS u(pr)
             GROUP BY pr[1], pr[2]
             ORDER BY SUM(freq) DESC, pr[1], pr[2]
             LIMIT 1),
    s{k + 1} AS MATERIALIZED (SELECT {wkeep.format(k=k)}s{k}.freq,
                        CASE WHEN p{k}.lsym IS NULL THEN s{k}.seq
                             ELSE replace(s{k}.seq,
                                '{D}' || p{k}.lsym || '{DD}'
                                      || p{k}.rsym || '{D}',
                                '{D}' || p{k}.lsym || p{k}.rsym || '{D}')
                        END AS seq
                 FROM s{k} LEFT JOIN p{k} ON TRUE)""")
    return stages


def bpe_oracle_sql(n_merges: int = N_MERGES) -> str:
    """The DuckDB rendering: one (pair-argmax, apply-merge) CTE stage per
    merge, generated from the same constants the Spark operator uses."""
    stages = _oracle_stages(n_merges, keep_word=False)
    selects = " UNION ALL ".join(
        f"SELECT CAST({k + 1} AS BIGINT) AS merge_rank, lsym, rsym, "
        f"lsym || rsym AS merged, CAST(freq AS BIGINT) AS freq FROM p{k}"
        for k in range(n_merges))
    return "WITH" + ",".join(stages) + "\n    " + selects


def bpe_encode_oracle_sql(n_merges: int = N_MERGES) -> str:
    """DuckDB rendering of bpe_encode_tokens: the same generated
    train stages (carrying the word through the merge chain), then the
    word->symbol-count relation joined back onto the per-doc word stream
    — both engines run train-then-encode end to end."""
    stages = _oracle_stages(n_merges, keep_word=True)
    stages.append(f"""
    wt AS MATERIALIZED (SELECT w,
                  CAST(len(string_split(seq[2:-2], '{DD}')) AS BIGINT)
                    AS n_sub
           FROM s{n_merges}
           WHERE w <> ''),
    ex AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
           FROM documents)""")
    final = ("SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,\n"
             "           CAST(SUM(n_sub) AS BIGINT) AS n_tokens,\n"
             "           CAST(MAX(n_sub) AS BIGINT) AS max_word_tokens\n"
             "    FROM ex JOIN wt USING (w) GROUP BY doc_id")
    return "WITH" + ",".join(stages) + "\n    " + final


def _sql_str(s: str) -> str:
    """SQL string literal for a symbol (quotes doubled; the delimiter is
    the raw \\x1f byte, embedded directly like every other oracle here)."""
    return "'" + s.replace("'", "''") + "'"


def bpe_encode_artifact_oracle_sql(merges: list[tuple]) -> str:
    """DuckDB rendering of bpe_encode_tokens_with for a FIXED persisted
    merge table: no training CTEs at all — the merge list is baked in as
    one nested-replace expression (innermost = rank 1, exactly the order
    apply_merges chains F.replace), applied to the word-frequency
    relation, then the same broadcast-join/aggregate tail as the
    train-then-encode oracle."""
    expr = (f"'{D}' || list_aggregate(string_split(w, ''), "
            f"'string_agg', '{DD}') || '{D}'")
    for _rank, lsym, rsym, _merged, _freq in merges:
        expr = (f"replace({expr}, {_sql_str(D + lsym + DD + rsym + D)}, "
                f"{_sql_str(D + lsym + rsym + D)})")
    return f"""WITH
    w AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
          FROM (SELECT unnest(string_split(text, ' ')) AS w
                FROM documents)
          GROUP BY w),
    wt AS MATERIALIZED (SELECT w,
                  CAST(len(string_split(seq[2:-2], '{DD}')) AS BIGINT)
                    AS n_sub
           FROM (SELECT w, {expr} AS seq FROM w)
           WHERE w <> ''),
    ex AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
           FROM documents)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_sub) AS BIGINT) AS n_tokens,
           CAST(MAX(n_sub) AS BIGINT) AS max_word_tokens
    FROM ex JOIN wt USING (w) GROUP BY doc_id"""


N_BATCH_ITERS = 4      # batched-trainer defaults: 4 iterations x
BATCH = 4              # up to 4 disjoint merges each = up to 16 merges
CAND = 16              # ranked candidates scanned per iteration


def _train_merges_batched(docs: DataFrame, n_iters: int, batch: int,
                          cand: int, text_col: str) -> list[tuple]:
    """Batched BPE: per iteration, rank pairs by (freq DESC, lsym, rsym),
    scan the top `cand` candidates IN RANK ORDER, and greedily take up to
    `batch` pairs that are SYMBOL-DISJOINT from every pair already taken
    this iteration (neither side appears as a side of an earlier taken
    pair); apply the taken merges in selection order, then recount.

    This is the scale answer to the classic trainer's per-merge driver
    round-trip (the r8 verdict's 'What's wrong #1'): a 30k-merge vocab
    costs 30k sequential argmax jobs classically, but only 30k/batch
    pair-count jobs batched — disjointness keeps the stale-count error
    contained: applying one taken merge never destroys occurrences of a
    later taken pair (its sides are untouched symbols), and the only new
    adjacencies it creates involve the freshly merged symbol (which can
    coincide with a later pair's side only when that side's string equals
    lsym+rsym — still deterministic, applied in the same order by both
    engines, just counted pre-apply like every batched trainer). The
    selection is deterministic (total candidate order + greedy scan), so
    the DuckDB oracle replays it exactly with one recursive-CTE greedy
    scan per iteration (bpe_batched_oracle_sql).

    Driver-side work stays O(cand) rows per iteration (the k-means
    O(K)-scalars pattern); row data is touched only by pure-JVM replaces.
    Returns [(iteration, sel_order, lsym, rsym, merged, freq), ...].
    """
    seqs = _word_seqs(docs, text_col).select("freq", "seq")
    cached = seqs.persist()
    seqs = _loop_width(cached, docs)
    try:
        out = []
        for it in range(1, n_iters + 1):
            pairs = (seqs
                     .withColumn("syms", F.expr(
                         f"split(substring(seq, 2, length(seq) - 2), "
                         f"'{DD}')"))
                     .select("freq", F.explode(F.expr(
                         "zip_with(slice(syms, 1, size(syms) - 1), "
                         "          slice(syms, 2, size(syms) - 1), "
                         "          (a, b) -> struct(a AS lsym, b AS rsym))"
                     )).alias("pr")))
            top = (pairs.groupBy("pr.lsym", "pr.rsym")
                   .agg(F.sum("freq").alias("freq"))
                   .orderBy(F.desc("freq"), "lsym", "rsym")
                   .limit(cand).collect())     # O(cand) scalars to driver
            used: set[str] = set()
            taken = []
            for row in top:
                if len(taken) >= batch:
                    break
                if row.lsym in used or row.rsym in used:
                    continue
                used.update((row.lsym, row.rsym))
                taken.append(row)
            for j, row in enumerate(taken, 1):
                out.append((it, j, row.lsym, row.rsym,
                            row.lsym + row.rsym, int(row.freq)))
                seqs = seqs.withColumn("seq", F.replace(
                    "seq",
                    F.lit(D + row.lsym + DD + row.rsym + D),
                    F.lit(D + row.lsym + row.rsym + D)))
    finally:
        cached.unpersist()
    return out


def bpe_vocab_merges_batched(docs: DataFrame,
                             n_iters: int = N_BATCH_ITERS,
                             batch: int = BATCH, cand: int = CAND,
                             text_col: str = "text") -> DataFrame:
    """Batched BPE vocabulary induction: up to n_iters*batch merges in
    n_iters pair-count jobs. Returns (iteration, sel_order, lsym, rsym,
    merged, freq); with batch=1 this degenerates to the classic trainer
    (property-tested in tests/test_bpe.py)."""
    return docs.sparkSession.createDataFrame(
        _train_merges_batched(docs, n_iters, batch, cand, text_col),
        "iteration long, sel_order long, lsym string, rsym string, "
        "merged string, freq long")


def bpe_batched_oracle_sql(n_iters: int = N_BATCH_ITERS,
                           batch: int = BATCH, cand: int = CAND) -> str:
    """DuckDB rendering of the batched trainer. Per iteration: the same
    pair-count stage as the classic oracle, a ROW_NUMBER total ranking
    capped at `cand`, a RECURSIVE greedy scan that walks the candidates
    in rank order carrying the taken-symbol set as a delimiter-wrapped
    string (contains(used, D||sym||D) is exact because symbols never
    contain D), and `batch` static apply sub-stages each LEFT-JOINing the
    j-th taken pair (NULL => pass-through, mirroring iterations that run
    dry). WITH RECURSIVE + generated stages — both engines replay the
    identical deterministic algorithm."""
    stages = []
    stages.append(f"""
    w AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
          FROM (SELECT unnest(string_split(text, ' ')) AS w
                FROM documents)
          GROUP BY w),
    b0 AS MATERIALIZED (SELECT freq,
                  '{D}' || list_aggregate(string_split(w, ''),
                                          'string_agg', '{DD}') || '{D}'
                    AS seq
           FROM w)""")
    for k in range(n_iters):
        take = (f"(g.n_taken < {batch}"
                f" AND NOT contains(g.used, '{D}' || r.lsym || '{D}')"
                f" AND NOT contains(g.used, '{D}' || r.rsym || '{D}'))")
        stages.append(f"""
    bp{k} AS MATERIALIZED (SELECT pr[1] AS lsym, pr[2] AS rsym, SUM(freq) AS freq
              FROM (SELECT freq,
                           [[syms[i], syms[i+1]] FOR i IN
                            range(1, len(syms))] AS prs
                    FROM (SELECT freq,
                                 string_split(seq[2:-2], '{DD}') AS syms
                          FROM b{k})),
                   unnest(prs) AS u(pr)
              GROUP BY pr[1], pr[2]),
    br{k} AS MATERIALIZED (SELECT lsym, rsym, freq,
                     ROW_NUMBER() OVER (ORDER BY freq DESC, lsym, rsym)
                       AS rn
              FROM bp{k}
              QUALIFY rn <= {cand}),
    bg{k} AS (
        SELECT CAST(0 AS BIGINT) AS rn, CAST(NULL AS VARCHAR) AS lsym,
               CAST(NULL AS VARCHAR) AS rsym, CAST(NULL AS BIGINT) AS freq,
               '' AS used, 0 AS n_taken, FALSE AS taken
        UNION ALL
        SELECT r.rn, r.lsym, r.rsym, r.freq,
               CASE WHEN {take}
                    THEN g.used || '{D}' || r.lsym || '{D}{D}'
                                || r.rsym || '{D}'
                    ELSE g.used END,
               g.n_taken + CASE WHEN {take} THEN 1 ELSE 0 END,
               {take}
        FROM bg{k} g JOIN br{k} r ON r.rn = g.rn + 1),
    bsel{k} AS MATERIALIZED (SELECT lsym, rsym, freq,
                       ROW_NUMBER() OVER (ORDER BY rn) AS j
                FROM bg{k} WHERE taken)""")
        prev = f"b{k}"
        for i in range(1, batch + 1):
            stages.append(f"""
    ba{k}_{i} AS (SELECT s.freq,
                         CASE WHEN m.lsym IS NULL THEN s.seq
                              ELSE replace(s.seq,
                                 '{D}' || m.lsym || '{D}{D}'
                                       || m.rsym || '{D}',
                                 '{D}' || m.lsym || m.rsym || '{D}')
                         END AS seq
                  FROM {prev} s
                  LEFT JOIN (SELECT lsym, rsym FROM bsel{k}
                             WHERE j = {i}) m ON TRUE)""")
            prev = f"ba{k}_{i}"
        stages.append(f"""
    b{k + 1} AS MATERIALIZED (SELECT freq, seq FROM {prev})""")
    selects = " UNION ALL ".join(
        f"SELECT CAST({k + 1} AS BIGINT) AS iteration, "
        f"CAST(j AS BIGINT) AS sel_order, lsym, rsym, "
        f"lsym || rsym AS merged, CAST(freq AS BIGINT) AS freq "
        f"FROM bsel{k}"
        for k in range(n_iters))
    return "WITH RECURSIVE" + ",".join(stages) + "\n    " + selects


def bpe_fertility_by_lang(docs: DataFrame, n_merges: int = N_MERGES,
                          text_col: str = "text",
                          lang_col: str = "lang") -> DataFrame:
    """Tokenizer FERTILITY by language — the standard
    tokens-per-word tokenizer-quality view (a vocab trained on a mixed
    corpus over-segments under-represented languages; fertility is the
    gauge): train n_merges BPE merges on the whole corpus, encode the
    distinct-word relation once, then aggregate subword counts over the
    per-language word stream. Returns (lang, n_word_occ, n_tokens,
    n_distinct_words, n_unmerged_occ, fertility) where n_unmerged_occ
    counts occurrences of words no merge touched (n_sub == char length —
    the 'tokenizer does not help this language' signal) and fertility =
    n_tokens / n_word_occ as one exact double division of two exact
    BIGINTs (bit-identical cross-engine; no float summation anywhere).

    Scale shape: identical to bpe_encode_tokens — corpus touched once by
    the train groupBy(word) and once by the final explode, with the
    Zipf-tiny word->n_sub map broadcast into the join; the output is
    O(#languages)."""
    merges = _train_merges(docs, n_merges, text_col)
    wtok = (bpe_encode_words(docs, merges, text_col)
            .where(F.col("w") != "").select("w", "n_sub"))
    ex = docs.select(F.col(lang_col).alias("lang"),
                     F.explode(F.split(F.col(text_col), " ")).alias("w"))
    return (ex.join(F.broadcast(wtok), "w")
            .groupBy("lang")
            .agg(F.count("*").alias("n_word_occ"),
                 F.sum("n_sub").alias("n_tokens"),
                 F.countDistinct("w").alias("n_distinct_words"),
                 F.sum(F.when(F.col("n_sub") == F.length("w"), 1)
                       .otherwise(0)).cast("long").alias("n_unmerged_occ"),
                 (F.sum("n_sub").cast("double") / F.count("*"))
                 .alias("fertility")))


def bpe_fertility_oracle_sql(n_merges: int = N_MERGES) -> str:
    """DuckDB rendering of bpe_fertility_by_lang: the trainer's generated
    per-merge CTE chain carrying the word through, then the same
    per-language join/aggregate."""
    stages = _oracle_stages(n_merges, keep_word=True)
    stages.append(f"""
    wt AS MATERIALIZED (SELECT w,
                  CAST(len(string_split(seq[2:-2], '{DD}')) AS BIGINT)
                    AS n_sub
           FROM s{n_merges}
           WHERE w <> ''),
    ex AS (SELECT lang, unnest(string_split(text, ' ')) AS w
           FROM documents)""")
    final = (
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_word_occ,\n"
        "           CAST(SUM(n_sub) AS BIGINT) AS n_tokens,\n"
        "           CAST(COUNT(DISTINCT ex.w) AS BIGINT)"
        " AS n_distinct_words,\n"
        "           CAST(SUM(CASE WHEN n_sub = length(ex.w) THEN 1"
        " ELSE 0 END) AS BIGINT) AS n_unmerged_occ,\n"
        "           CAST(SUM(n_sub) AS DOUBLE) / COUNT(*) AS fertility\n"
        "    FROM ex JOIN wt USING (w) GROUP BY lang")
    return "WITH" + ",".join(stages) + "\n    " + final


def bpe_vocab_coverage(docs: DataFrame, n_merges: int = N_MERGES,
                       text_col: str = "text") -> DataFrame:
    """The eval tying the two tokenizer views together: for each learned
    merge, how much of the corpus vocabulary it covers — is the merged
    symbol itself a full corpus word (the merge "graduated" to a word),
    and how many distinct words / word occurrences contain it as a
    substring. High-rank merges with low coverage signal an over-fit
    merge table; coverage near the top whitespace tokens
    (vocab_top_tokens) is the health signal. All work runs on the
    Zipf-tiny word relation with the O(n_merges)-row merge list
    broadcast into a substring-contains join."""
    spark = docs.sparkSession
    merges = _train_merges(docs, n_merges, text_col)
    mdf = spark.createDataFrame(
        [(r, m) for r, _l, _r, m, _f in merges],
        "merge_rank long, merged string")
    words = (docs.select(F.explode(F.split(F.col(text_col), " "))
                         .alias("w"))
                 .groupBy("w").agg(F.count("*").alias("freq")))
    hit = F.instr(F.col("w"), F.col("merged")) > 0
    j = words.join(F.broadcast(mdf), hit)
    return (j.groupBy("merge_rank", "merged")
            .agg(F.countDistinct("w").alias("n_words_containing"),
                 F.sum("freq").alias("occurrences_covered"),
                 F.max(F.when(F.col("w") == F.col("merged"), 1)
                       .otherwise(0)).cast("long").alias("is_full_word")))


def bpe_vocab_coverage_oracle_sql(n_merges: int = N_MERGES) -> str:
    """DuckDB rendering of bpe_vocab_coverage: the trainer stages, the
    merge list re-selected from p{k}, then the same substring-contains
    join against the word-frequency relation."""
    stages = _oracle_stages(n_merges, keep_word=False)
    merges = " UNION ALL ".join(
        f"SELECT CAST({k + 1} AS BIGINT) AS merge_rank, "
        f"lsym || rsym AS merged FROM p{k}"
        for k in range(n_merges))
    stages.append(f"""
    m AS MATERIALIZED ({merges})""")
    final = ("SELECT merge_rank, merged,\n"
             "           CAST(COUNT(DISTINCT w.w) AS BIGINT)"
             " AS n_words_containing,\n"
             "           CAST(SUM(w.freq) AS BIGINT)"
             " AS occurrences_covered,\n"
             "           CAST(MAX(CASE WHEN w.w = m.merged THEN 1 ELSE 0"
             " END) AS BIGINT) AS is_full_word\n"
             "    FROM m JOIN w ON contains(w.w, m.merged)\n"
             "    GROUP BY merge_rank, merged")
    return "WITH" + ",".join(stages) + "\n    " + final
