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


def bpe_vocab_merges(docs: DataFrame, n_merges: int = N_MERGES,
                     text_col: str = "text") -> DataFrame:
    """Learn the first n_merges BPE merges over whitespace words of
    text_col; returns (merge_rank, lsym, rsym, merged, freq)."""
    spark = docs.sparkSession
    words = (docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
                 .groupBy("w").agg(F.count("*").alias("freq")))
    seqs = words.select(
        "freq",
        F.concat(F.lit(D), F.array_join(F.split("w", ""), DD),
                 F.lit(D)).alias("seq"))
    # the vocabulary relation is tiny (Zipf); cache it so the n_merges
    # argmax actions do not rescan the corpus (production: persist the
    # word-freq table once, train from it). Keep the persisted HANDLE
    # separate: `seqs` is rebound every iteration, and unpersisting the
    # final derived frame would leave the original cache entry alive for
    # the session (the r8 review's persist-leak finding).
    cached = seqs.persist()
    seqs = cached
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
        cached.unpersist()
    return spark.createDataFrame(
        merges, "merge_rank long, lsym string, rsym string, "
                "merged string, freq long")


def bpe_oracle_sql(n_merges: int = N_MERGES) -> str:
    """The DuckDB rendering: one (pair-argmax, apply-merge) CTE stage per
    merge, generated from the same constants the Spark operator uses."""
    stages = []
    stages.append(f"""
    w AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
          FROM (SELECT unnest(string_split(text, ' ')) AS w
                FROM documents)
          GROUP BY w),
    s0 AS (SELECT freq,
                  '{D}' || list_aggregate(string_split(w, ''),
                                          'string_agg', '{DD}') || '{D}'
                    AS seq
           FROM w)""")
    for k in range(n_merges):
        stages.append(f"""
    p{k} AS (SELECT pr[1] AS lsym, pr[2] AS rsym, SUM(freq) AS freq
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
    s{k + 1} AS (SELECT s{k}.freq,
                        replace(s{k}.seq,
                                '{D}' || p{k}.lsym || '{DD}'
                                      || p{k}.rsym || '{D}',
                                '{D}' || p{k}.lsym || p{k}.rsym || '{D}')
                          AS seq
                 FROM s{k}, p{k})""")
    selects = " UNION ALL ".join(
        f"SELECT CAST({k + 1} AS BIGINT) AS merge_rank, lsym, rsym, "
        f"lsym || rsym AS merged, CAST(freq AS BIGINT) AS freq FROM p{k}"
        for k in range(n_merges))
    return "WITH" + ",".join(stages) + "\n    " + selects
