"""Deduplication operators for large-scale training-data pipelines.

Four families, all declarative DataFrame plans (no Python in the hot path):

- exact_dedup: normalize -> md5 -> groupBy. One shuffle on the hash; at
  100 TB this is the cheapest pass and runs first.
- ngram_jaccard_pairs: exact near-dup mining via an inverted shingle index
  (explode distinct n-grams, self-join on shingle, count intersections).
  Shuffle on shingle; frequent-shingle skew is the hazard at scale — cap via
  LSH below, or drop ultra-frequent shingles (stop-shingles) upstream.
- minhash_lsh_pairs: MinHash signatures (universal hashing over a 60-bit
  md5-derived shingle hash) + banded LSH; only same-band candidates get the
  exact Jaccard verification. The scale path: candidate count ~ O(dups), not
  O(n^2).
- simhash_pairs: 32-bit SimHash over word-bigram features + banded hamming
  join (4 bytes; Pigeonhole: hamming<=6 pairs share >=1 exact byte... with
  32/4 bands exact-match holds for hamming<=3 guaranteed recall per band
  logic) + bit_count(xor) verification.

All arithmetic is integer/md5-based so the DuckDB oracles in
plans/extensions.py reproduce results bit-for-bit.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_flink_processing_spark.functions.constants import (
    MINHASH_COEFFS,
    MINHASH_P,
    N_BANDS,
    SIMHASH_BITS,
)
from kafka_flink_processing_spark.functions.text import md5_hash60


def normalize_text(col):
    # NULL text ≡ empty text, the corpus-wide convention (r8 fuzzer):
    # every oracle twin coalesces identically
    return F.trim(F.regexp_replace(F.lower(F.coalesce(col, F.lit(""))),
                                   " +", " "))


def _shingle_udf(n: int):
    """Distinct word n-grams as an Arrow-batched pandas UDF.

    The declarative form (functions.text.shingles: split + sequence +
    transform(concat_ws) + array_distinct) is semantically identical but
    runs interpreted — Spark's higher-order array lambdas are NOT part of
    whole-stage codegen. Measured at sf0.1 (5000 docs): 3.4s built-in vs
    0.5s warm pandas UDF, so this is one of the cases where the Arrow path
    beats the "built-in" path. First-occurrence order matches
    array_distinct; the DuckDB oracle's list_distinct comprehension matches
    both (order never affects downstream set arithmetic)."""

    @F.pandas_udf("array<string>")
    def f(s: pd.Series) -> pd.Series:
        def grams(text: str | None) -> list[str]:
            if text is None:     # NULL text ≡ empty text (no shingles)
                return []
            ws = text.split(" ")
            if len(ws) < n:
                return []
            return list(dict.fromkeys(
                " ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)))
        return s.map(grams)

    return f


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact duplicate groups over normalized text: (text_hash, n_docs,
    canonical_id = min id). Works at any scale: shuffle on the 128-bit hash,
    never on the text itself."""
    norm = normalize_text(F.col(text_col))
    return (docs.select(F.col(id_col), F.md5(norm).alias("text_hash"))
                .groupBy("text_hash")
                .agg(F.count("*").alias("n_docs"),
                     F.min(id_col).alias("canonical_id")))


# Shingle-index memo: every dedup family (jaccard, minhash, simhash) starts
# from the same distinct-n-gram arrays, so compute them once per (input plan,
# n) and share the cached DataFrame. This is the local-mode analogue of
# persisting the shingle index as a table, which is what a 100 TB pipeline
# does between dedup passes (the index is the expensive artifact; every
# consumer after that is cheap). Inputs here are immutable parquet, so the
# memo cannot go stale. semanticHash is 32-bit, so a hit is confirmed with
# sameSemantics against the stored source plan before reuse — a cross-plan
# collision recomputes instead of returning another input's shingles.
# Entries hold (source_df, derived_df); clear_dedup_caches() unpersists.
_SHINGLE_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}
_SIG_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}
_INV_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}
_ESS_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def clear_dedup_caches() -> None:
    """Unpersist and drop the dedup memo tables (frees executor storage;
    safe any time — consumers recompute lazily on next use)."""
    for memo in (_SIG_CACHE, _SHINGLE_CACHE, _INV_CACHE, _ESS_CACHE):
        for _, derived in memo.values():
            try:
                derived.unpersist()
            except Exception:
                pass
        memo.clear()


def _memo_lookup(memo, docs: DataFrame, parts: tuple):
    """(key, hit) for a memoized derivation of `docs`; collision-checked."""
    try:
        key = (docs.sparkSession, docs.semanticHash(), *parts)
    except Exception:
        return None, None
    hit = memo.get(key)
    if hit is not None:
        source, derived = hit
        try:
            if docs.sameSemantics(source):
                return key, derived
        except Exception:
            pass
        return None, None  # 32-bit collision: recompute, don't evict or cache
    return key, None


def _doc_shingles(docs: DataFrame, id_col: str, text_col: str,
                  n: int, memo: bool = True) -> DataFrame:
    from kafka_flink_processing_spark.shipping import ensure_shipped
    ensure_shipped(docs.sparkSession)
    if not memo:
        # streaming micro-batches pass memo=False: each epoch is a new
        # plan, so memoizing would grow one cache entry per epoch forever
        return docs.select(F.col(id_col).alias("doc_id"),
                           _shingle_udf(n)(F.col(text_col)).alias("sh"))
    key, hit = _memo_lookup(_SHINGLE_CACHE, docs, (id_col, text_col, n))
    if hit is not None:
        return hit
    ds = docs.select(F.col(id_col).alias("doc_id"),
                     _shingle_udf(n)(F.col(text_col)).alias("sh"))
    if key is not None:
        ds = ds.cache()
        ds.count()  # prime once; every dedup family reuses the materialization
        _SHINGLE_CACHE[key] = (docs, ds)
    return ds


# Stop-shingle document-frequency cap, on by default: a shingle occurring in
# more than NGRAM_MAX_DF documents is boilerplate (license headers, site
# chrome, templates), carries no near-dup signal, and — critically for
# scale — would contribute O(df^2) candidate rows to the inverted-index
# self-join. One viral 3-gram at corpus scale otherwise produces a
# quadratic blowup no executor sizing survives. 1000 keeps the worst
# shingle's candidate block under ~500k rows while pruning nothing on
# corpora without true boilerplate (testdata max df << 1000).
NGRAM_MAX_DF = 1000


def _filtered_inverted_index(ds: DataFrame, min_df: int,
                             max_df: int | None) -> DataFrame:
    """(doc_id, sh) inverted shingle index keeping shingles with document
    frequency in [min_df, max_df] (see NGRAM_MAX_DF). Memoized per
    (shingle plan, bounds): the index feeds BOTH sides of the candidate
    self-join, so without a cache the df groupBy + semi-join runs twice
    per action — and the r2 bench showed dedup_ngram_jaccard paying
    exactly that (+178%). Cached + primed, the df pass runs once and both
    join sides read the materialization (the 100 TB analogue: the
    df-capped index is persisted as a table once per corpus snapshot,
    every dedup pass reads it)."""
    lo = min_df
    hi = max_df if max_df is not None else None
    key, hit = _memo_lookup(_INV_CACHE, ds, (lo, hi))
    if hit is not None:
        return hit
    inv = ds.select("doc_id", F.explode("sh").alias("sh"))
    if lo > 1 or hi is not None:
        cond = F.col("df") >= lo
        if hi is not None:
            cond = cond & (F.col("df") <= hi)
        kept = (inv.groupBy("sh").agg(F.count("*").alias("df"))
                   .filter(cond).select("sh"))
        inv = inv.join(kept, "sh")
    if key is not None:
        inv = inv.cache()
        inv.count()  # prime: both self-join sides must hit the same build
        _INV_CACHE[key] = (ds, inv)
    return inv


def _jaccard_intersections(ds: DataFrame, prune_singletons: bool,
                           max_df: int | None) -> DataFrame:
    """(doc_a, doc_b, n_common) candidate intersections from the shingle
    index, with the df-bounded inverted index (see NGRAM_MAX_DF)."""
    inv = _filtered_inverted_index(ds, 2 if prune_singletons else 1, max_df)
    a, b = inv.alias("a"), inv.alias("b")
    return (a.join(b, (F.col("a.sh") == F.col("b.sh"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("n_common")))


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.6,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        prune_singletons: bool = False,
                        max_df: int | None = NGRAM_MAX_DF) -> DataFrame:
    """All pairs with distinct-word-n-gram Jaccard >= threshold, via an
    inverted index join (each shared shingle contributes one pre-aggregated
    intersection count — no quadratic cross join).

    The shingle arrays feed four plan branches (sizes + both join sides);
    they are cached AND primed so the string-heavy shingle generation runs
    once, not per branch.

    prune_singletons drops shingles with document frequency 1 before the
    self-join — semantics-preserving (singletons contribute no pairs) and a
    large win on heavy-tailed real corpora where most shingles are unique;
    OFF by default because on dense small-vocab corpora (like the testdata,
    mean df ~10) it prunes nothing and costs an extra shuffle.

    max_df (ON by default, see NGRAM_MAX_DF) drops shingles with df above
    the cap from the index: intersection counts then ignore boilerplate
    shingles, so a pair's Jaccard can only decrease vs the uncapped form —
    a deliberate refinement (boilerplate overlap is not near-duplication),
    and the bound that keeps the self-join O(sum df^2 over kept shingles)
    instead of quadratic in the hottest shingle. Pass max_df=None for the
    exact uncapped semantics.
    """
    ds = _doc_shingles(docs, id_col, text_col, n)  # cached + primed by memo
    sizes = ds.select("doc_id", F.size("sh").alias("n_sh"))
    inter = _jaccard_intersections(ds, prune_singletons, max_df)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
                 .withColumn("jaccard", F.col("n_common")
                             / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
                 .filter(F.col("jaccard") >= threshold)
                 .select("doc_a", "doc_b", "jaccard"))


def signatures_from_shingles(ds: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh{k-1}, sh) from a (doc_id, sh) shingle table. The
    table feeds BOTH the min-agg branch and the final join; callers on the
    non-memoized path (streaming micro-batches) must persist `ds` first or
    the shingle UDF evaluates twice."""
    exploded = ds.select("doc_id", F.explode("sh").alias("sh"))
    x = md5_hash60(F.col("sh")) % MINHASH_P
    aggs = [F.min((F.lit(a) * x + F.lit(b)) % MINHASH_P).alias(f"mh{i}")
            for i, (a, b) in enumerate(MINHASH_COEFFS)]
    sig = exploded.groupBy("doc_id").agg(*aggs)
    return sig.join(ds, "doc_id")


def minhash_signatures(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                       text_col: str = "text", memo: bool = True) -> DataFrame:
    """One row per doc with mh0..mh{k-1} minhash values + the shingle set."""
    ds = _doc_shingles(docs, id_col, text_col, n, memo=memo)
    return signatures_from_shingles(ds)


def jaccard_expr(sh_left, sh_right):
    """THE one copy of the exact-Jaccard expression over distinct shingle
    sets: |A∩B| / (|A|+|B|-|A∩B|). Shared by verified_jaccard_pairs and
    the estimator-accuracy / threshold-sweep evals (plans/analytics.py),
    so the evals always measure exactly the semantics the dedup
    operators apply."""
    inter = F.size(F.array_intersect(sh_left, sh_right))
    return inter / (F.size(sh_left) + F.size(sh_right) - inter)


def verified_jaccard_pairs(cand: DataFrame, sig_left: DataFrame,
                           sig_right: DataFrame, left_col: str,
                           right_col: str, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of LSH candidates — the one copy of the
    per-pair THRESHOLD semantics (jaccard_expr >= threshold), shared by
    minhash_lsh_pairs, incremental_minhash_dups, and the streaming
    incremental dedup job so the paths cannot silently diverge.

    cand: (left_col, right_col) candidate id pairs; sig_left/sig_right:
    signature tables whose doc_id matches the respective column. Returns
    (left_col, right_col, jaccard)."""
    sh_l = sig_left.select(F.col("doc_id").alias(left_col),
                           F.col("sh").alias("__sh_l"))
    sh_r = sig_right.select(F.col("doc_id").alias(right_col),
                            F.col("sh").alias("__sh_r"))
    joined = cand.join(sh_l, left_col).join(sh_r, right_col)
    jac = jaccard_expr(F.col("__sh_l"), F.col("__sh_r"))
    return (joined.withColumn("jaccard", jac)
                  .filter(F.col("jaccard") >= threshold)
                  .select(left_col, right_col, "jaccard"))


def lsh_self_candidates(bands: DataFrame, left_col: str = "doc_a",
                        right_col: str = "doc_b") -> DataFrame:
    """Distinct unordered candidate pairs (left < right) agreeing on at
    least one LSH band — the one copy of the self-join candidate builder,
    shared by minhash_lsh_pairs and the index evals
    (minhash_jaccard_accuracy / lsh_threshold_sweep)."""
    a, b = bands.alias("a"), bands.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias(left_col),
                     F.col("b.doc_id").alias(right_col))
             .distinct())


# Signature memo, same rationale, keying, and collision handling as the
# shingle memo above: the MinHash signature table is the second expensive
# dedup artifact (a 16-way min-agg over the exploded shingle index), and
# both the pair query and the clustering query start from it.
def _cached_signatures(docs: DataFrame, n: int, id_col: str,
                       text_col: str) -> DataFrame:
    key, hit = _memo_lookup(_SIG_CACHE, docs, (id_col, text_col, n))
    if hit is not None:
        return hit
    sig = minhash_signatures(docs, n, id_col, text_col)
    if key is not None:
        sig = sig.cache()
        # Eager prime, restored after the r2 bench regression: without it
        # the four plan branches reading sig (bands a/b + sh_a/sh_b) race
        # the cold cache inside one job and the 16-way min-agg can run up
        # to 4x before the cache fills (BENCH_r02: 6.403s vs 0.761s primed
        # in r1). One count() guarantees a single build.
        sig.count()
        _SIG_CACHE[key] = (docs, sig)
    return sig


def _lsh_bands(sig: DataFrame) -> DataFrame:
    """Explode a signature table into (doc_id, band, key) LSH bucket rows
    (bands of 2 minhashes). In a production pipeline this table, built over
    the standing corpus, IS the persisted near-dup index."""
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("band"),
                     F.concat_ws("_", F.col(f"mh{2*k}"), F.col(f"mh{2*k+1}"))
                      .alias("key"))
            for k in range(N_BANDS)])).alias("bk"))
    return bands.select("doc_id", "bk.band", "bk.key")


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.6,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """LSH candidates (bands of 2 minhashes) verified with exact Jaccard.

    P(candidate | j) = 1 - (1 - j^2)^8 — >=0.999 at j=0.8. Candidate
    verification uses array_intersect on the (distinct) shingle sets, which
    only runs on same-band pairs.
    """
    sig = _cached_signatures(docs, n, id_col, text_col)
    cand = lsh_self_candidates(_lsh_bands(sig))
    return verified_jaccard_pairs(cand, sig, sig, "doc_a", "doc_b", threshold)


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """32-bit SimHash over distinct word-bigram features."""
    feats = _doc_shingles(docs, id_col, text_col, 2)
    exploded = feats.select("doc_id", F.explode("sh").alias("sh"))
    h32 = md5_hash60(F.col("sh")) % F.lit(2 ** SIMHASH_BITS)
    exploded = exploded.select("doc_id", h32.alias("h"))
    bit_sums = [
        F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1)
               .otherwise(-1)).alias(f"s{j}")
        for j in range(SIMHASH_BITS)]
    agg = exploded.groupBy("doc_id").agg(*bit_sums)
    sh_val = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(2 ** j).cast("long")) \
                .otherwise(F.lit(0).cast("long"))
        sh_val = term if sh_val is None else sh_val + term
    return agg.select("doc_id", sh_val.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via 4-byte banding
    (pigeonhole: <=3 differing bits can't touch all 4 bytes) + exact
    bit_count verification."""
    key, hit = _memo_lookup(_SIG_CACHE, docs, ("simhash", id_col, text_col))
    if hit is not None:
        sh = hit
    else:
        sh = simhash(docs, id_col, text_col).cache()
        sh.count()  # prime: the 32-way bit aggregation feeds both join sides
        if key is not None:
            _SIG_CACHE[key] = (docs, sh)
    bands = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("band"),
                     F.shiftright(F.col("simhash"), 8 * k).bitwiseAND(255)
                      .alias("key"))
            for k in range(4)])).alias("bk"))
    bands = bands.select("doc_id", "simhash", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    # filter BEFORE distinct: the hamming predicate is cheap per joined row,
    # while distinct on the un-filtered candidate set is a huge shuffle when
    # the corpus shares vocabulary (band bytes collide across many docs)
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .filter(ham <= max_hamming)
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     ham.alias("hamming"))
             .distinct())


def dup_span_redact(docs: DataFrame, n: int = 3, min_df: int = 2,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Span-level exact-substring dedup — the APPLY step of the dup-span
    family: rebuild each document with every corpus-duplicated word n-gram
    run excised (Lee et al. 2022 exact-substring dedup at n-gram
    granularity; dup_span_stats is the matching signal/ranking pass).

    A word is removed iff ANY n-gram covering it occurs in >= min_df
    documents. Returns (doc_id, clean_text, n_words, n_removed_words,
    removed_fraction) for every document.

    Scale shape: LINEAR in corpus words end-to-end. The duplicated-gram
    screen is the memoized df-filtered inverted index (the artifact
    dup_span_stats reads); positional gram starts semi-join it on the gram
    string, flagged starts explode to their covered word positions, an
    anti-join on (doc, position) drops covered words, and one doc-keyed
    aggregation reassembles the text in position order. The rebuild
    shuffles word rows — unavoidable, the operator's OUTPUT is the
    rewritten corpus — but there is deliberately no per-row
    array-membership scan, which would be O(doc_grams x doc_dup_grams)
    per document and stall an executor core on exactly the
    boilerplate-heavy long documents this operator targets.
    String/integer-only, so the DuckDB oracle (list-comprehension form)
    matches bit-for-bit."""
    ds = _doc_shingles(docs, id_col, text_col, n)
    # one memoized df screen for any min_df (shared with dup_span_stats
    # at the default 2: one corpus-wide df pass per session, not one per
    # operator)
    dup_index = _filtered_inverted_index(ds, min_df, None).select("sh")
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.split(F.col(text_col), " ").alias("words"))

    def gram_at(i):  # i is the 1-based start position of the n-gram
        return F.concat_ws(" ", *[F.element_at(F.col("words"), i + k)
                                  for k in range(n)])

    grams = F.when(
        F.size("words") < n, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), F.size("words") - (n - 1)), gram_at))
    pg = base.select("doc_id", F.posexplode(grams).alias("i0", "sh"))
    flagged = pg.join(dup_index, "sh", "leftsemi")
    # r12 (guide §3.1: pick the strategy deliberately): the rebuild tail
    # must never BROADCAST a corpus-scaled relation. Statically the
    # planner estimated `covered` and `rebuilt` under the auto-broadcast
    # threshold (their sizes hide behind Generate/aggregate estimates)
    # and planned BuildRight broadcasts of BOTH — `covered` is every
    # duplicated word position and `rebuilt` the full rewritten corpus;
    # at a 256x replication the covered broadcast was measured to
    # actually build 8.2 GiB and die on the 8 GiB broadcast cap. Shape
    # now: co-partition words and covered positions by doc_id ONCE (the
    # one corpus-text exchange the rebuild aggregation was going to pay
    # anyway — it now rides this partitioning), dedup covered within the
    # same partitioning, and bind the anti-join to a per-partition hash
    # build (shuffle_hash: build side = this partition's covered
    # positions, bounded by per-doc length — no sort, no broadcast, no
    # second corpus exchange at ANY scale).
    covered = (flagged.select(
        "doc_id",
        F.explode(F.sequence(F.col("i0") + 1,
                             F.col("i0") + n)).alias("j"))
        .repartition(F.col("doc_id"))
        .dropDuplicates(["doc_id", "j"]))
    pw = base.select("doc_id", F.posexplode("words").alias("j0", "w")) \
             .select("doc_id", (F.col("j0") + 1).alias("j"), "w") \
             .repartition(F.col("doc_id"))
    kept = pw.join(covered.hint("shuffle_hash"), ["doc_id", "j"],
                   "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(" ", F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("j").alias("j"),
                                                 F.col("w").alias("w")))),
            lambda s: s["w"])).alias("clean_text"),
        F.count("*").cast("long").alias("n_kept"))
    # project word COUNTS before the attach join — joining `base` directly
    # would ship every document's full words array through the exchange a
    # second time (O(corpus text)) when one long per doc suffices
    sizes = base.select("doc_id", F.size("words").cast("long")
                        .alias("n_words"))
    n_removed = F.col("n_words") - F.coalesce("n_kept",
                                              F.lit(0).cast("long"))
    # merge, not broadcast: `rebuilt` (the preserved-side payload) rides
    # its own doc_id partitioning, `sizes` is one narrow long per doc —
    # SMJ streams the text rows instead of holding the corpus in a hash
    # relation (the static plan used to broadcast the WHOLE rebuilt
    # corpus here)
    return (sizes.join(rebuilt.hint("merge"), "doc_id", "left")
            .select("doc_id",
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    "n_words",
                    n_removed.alias("n_removed_words"),
                    (n_removed.cast("double")
                     / F.greatest("n_words", F.lit(1).cast("long")))
                    .alias("removed_fraction")))


def _ess_anchor_index(docs: DataFrame, k: int, max_df: int,
                      id_col: str, text_col: str) -> DataFrame:
    """(doc_id, pos, g, gh) anchor index for ExactSubstr: positional
    k-grams surviving the hash df>=2 screen AND the exact-gram
    [2, max_df] cap — O(duplicated content) by construction. Memoized
    per (input plan, k, max_df) like the shingle index above: the
    relation feeds BOTH sides of the seed self-join plus the redact
    apply step, and without a cache every consumer re-runs the
    corpus-sized gram explode (the r12 executed plan showed the explode
    3-4x per action). Cached + primed, the explode runs exactly twice
    (once under the anchor aggregate, once materializing the
    survivors), which is the minimum for a screen-then-attach shape
    that never shuffles the corpus-sized gram-string relation — the
    100 TB analogue is persisting the duplicated-content anchor table
    once per corpus snapshot."""

    def gram_at(i):  # i is the 1-based start position of the k-gram
        return F.concat_ws(" ", *[F.element_at(F.col("words"), i + t)
                                  for t in range(k)])

    key, hit = _memo_lookup(_ESS_CACHE, docs,
                            ("ess", id_col, text_col, k, max_df))
    if hit is not None:
        return hit
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.split(F.col(text_col), " ").alias("words"))
    grams = F.when(
        F.size("words") < k, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), F.size("words") - (k - 1)),
                    gram_at))
    pg = (base.select("doc_id", F.posexplode(grams).alias("i0", "g"))
              .select("doc_id", (F.col("i0") + 1).alias("pos"), "g",
                      F.xxhash64("g").alias("gh")))
    # anchor screen on the 8-byte hash: ONLY the df >= 2 lower bound
    # (collision-safe in this direction; see docstring)
    anchors = (pg.groupBy("gh")
                 .agg(F.count_distinct("doc_id").alias("df"))
                 .filter(F.col("df") >= 2)
                 .select("gh"))
    ag = pg.join(anchors, "gh", "leftsemi")
    if key is not None:
        ag = ag.cache()
        ag.count()  # prime: the cap screen and the final attach both read it
    # r12: the <= max_df cap binds on EXACT grams over the surviving
    # relation (O(duplicated content)) — a hash-pooled df could exceed
    # the cap and silently drop both colliding grams' spans at scale.
    # The exact df >= 2 bound rides along for free: it drops grams that
    # only survived the hash screen via a collision (they would die in
    # the exact-string pair join anyway, but this keeps their rows out
    # of the self-join entirely).
    capped = (ag.groupBy("gh", "g")
                .agg(F.count_distinct("doc_id").alias("gdf"))
                .filter((F.col("gdf") >= 2) & (F.col("gdf") <= max_df))
                .select("gh", "g"))
    out = ag.join(capped, ["gh", "g"], "leftsemi")
    if key is not None:
        out = out.cache()
        out.count()  # prime once; both self-join sides + redact reuse it
        ag.unpersist()  # superseded by the capped relation
        _ESS_CACHE[key] = (docs, out)
    return out


def exactsubstr_spans(docs: DataFrame, min_len: int = 8, max_df: int = 64,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """ExactSubstr duplicated-substring mining (Lee et al. 2022,
    'Deduplicating Training Data Makes Language Models Better' — the
    suffix-array ExactSubstr variant, re-expressed as anchored diagonal
    run-merging): every MAXIMAL word span of length >= min_len shared
    verbatim between two documents, reported per ordered pair as
    (doc_a, doc_b, a_start, b_start, span_len) with 1-based word starts.

    This is SPAN semantics, not gram membership (dup_span_redact): a
    word run whose overlapping grams are duplicated against DIFFERENT
    partner documents is NOT one shared span — no single document
    contains it contiguously — and this operator correctly reports only
    the per-pair maximal spans (tests/test_exactsubstr.py pins the
    disagreement witness).

    Exactness: with anchor size k = min_len, a shared span of length
    L >= k at offsets (i, j) yields k-gram seeds matching at every
    (i+t, j+t), t = 0..L-k — a contiguous run on the diagonal i-j — and
    conversely a maximal run of m contiguous seeds is a maximal shared
    span of m+k-1 words (the seed one left of the run matches iff the
    word one left matches). Gaps-and-islands over (pair, diagonal)
    therefore recovers the exact maximal spans; no suffix array needed.

    Scale shape, stage by stage:
    - positional k-grams explode map-side; the anchor screen groupBys
      xxhash64(gram) — an 8-byte shuffle key, never the k-word string
      (at k=50 the string relation is ~50x corpus text; the hash screen
      keeps that expansion out of the exchange). The screen applies
      ONLY the df >= 2 lower bound, where collisions are one-sided: a
      collision can only LIFT a pooled count, so every truly-shared
      gram survives and the extras are discarded by the exact-string
      pair join. The collision story is NOT symmetric — a pooled count
      can also push past an upper cap and drop BOTH colliding grams'
      anchors (the r11 verdict's contract gap: unobservable at sandbox
      gram counts, a real recall leak at ~10^12 grams) — so the upper
      cap deliberately does NOT bind here.
    - anchors keep 2 <= distinct-doc df, then the <= max_df cap binds
      on EXACT grams via one narrow re-screen over the hash-surviving
      relation — already O(duplicated content), so the extra aggregate
      never sees a corpus-sized exchange, and the cap now matches the
      string-grouped oracle at ANY scale. The upper cap bounds the
      O(df^2) seed fan-out per gram: boilerplate that saturates
      >max_df documents is dedup-by-frequency territory (stop-gram
      screens, heavy_hitters_*), not pairwise span mining. The cap is
      part of the CONTRACT (the oracle applies the same cap on exact
      grams), so the result stays exact w.r.t. its spec.
    - only hash-surviving grams (O(duplicated content), not O(corpus))
      carry their strings into the self-join; the diagonal window and
      the island aggregation both cluster on (doc_a, doc_b, diag), so
      the final groupBy rides the window's exchange — partitions are
      per-pair-per-diagonal, i.e. tiny, skew-free by construction.
    Within-document repeats are out of scope (cross-document pairs
    only, doc_a < doc_b); word-granular, like the rest of the dup-span
    family. Integer/string-only arithmetic, bit-exact oracle."""
    k = min_len
    ag = _ess_anchor_index(docs, k, max_df, id_col, text_col)
    a, b = ag.alias("a"), ag.alias("b")
    # join on the hash, verify the exact string (collision-proof), and
    # orient pairs doc_a < doc_b
    seeds = (a.join(b, (F.col("a.gh") == F.col("b.gh"))
                    & (F.col("a.g") == F.col("b.g"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
              .select(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"),
                      F.col("a.pos").alias("pos_a"),
                      F.col("b.pos").alias("pos_b")))
    seeds = seeds.withColumn("diag", F.col("pos_a") - F.col("pos_b"))
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    isl = seeds.withColumn("island",
                           F.col("pos_a") - F.row_number().over(w))
    return (isl.groupBy("doc_a", "doc_b", "diag", "island")
               .agg(F.min("pos_a").cast("long").alias("a_start"),
                    F.min("pos_b").cast("long").alias("b_start"),
                    (F.count("*") + (k - 1)).cast("long").alias("span_len"))
               .select("doc_a", "doc_b", "a_start", "b_start", "span_len"))


def exactsubstr_redact(docs: DataFrame, min_len: int = 8,
                       max_df: int = 64, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """The APPLY step of ExactSubstr dedup (Lee et al. 2022): rebuild
    each document with every duplicated span occurrence excised EXCEPT
    the copy in the smallest doc_id that shares it — the paper's
    remove-all-but-one rule made deterministic. Returns (doc_id,
    clean_text, n_words, n_removed_words, removed_fraction), the
    dup_span_redact output contract, so the two apply steps read
    side-by-side.

    Semantics: exactsubstr_spans reports maximal shared spans per
    ordered pair (doc_a < doc_b); a word position is removed iff it is
    covered by the doc_b side of ANY reported span — i.e. every
    occurrence is redacted except in the minimal doc_id sharing that
    content (docs {1,5,9} sharing a span: pairs (1,5),(1,9),(5,9) put 5
    and 9 on the b side; doc 1 keeps its copy). Contrast with
    dup_span_redact, which removes EVERY occurrence of any duplicated
    gram in every doc — keep-one is the form that preserves one
    trainable copy of boilerplate instead of deleting it corpus-wide.

    Scale shape: the span relation is O(duplicated content)
    (exactsubstr_spans above); covered positions explode per-span
    (span_len rows each), the anti-join and position-ordered rebuild
    are the dup_span_redact pattern — the only corpus-sized exchange is
    the doc-keyed reassembly, which IS the output."""
    spans = exactsubstr_spans(docs, min_len=min_len, max_df=max_df,
                              id_col=id_col, text_col=text_col)
    # same scale-safe rebuild tail as dup_span_redact (r12, guide §3.1):
    # co-partition words + covered positions by doc_id once, per-partition
    # hash anti-join (never a broadcast of the covered relation), and a
    # merge attach that streams the rebuilt text instead of broadcasting
    # the whole rewritten corpus — see dup_span_redact for the measured
    # 256x broadcast-cap failure this shape prevents.
    covered = (spans.select(
        F.col("doc_b").alias("doc_id"),
        F.explode(F.sequence(
            F.col("b_start"),
            F.col("b_start") + F.col("span_len") - 1)).alias("j"))
        .repartition(F.col("doc_id"))
        .dropDuplicates(["doc_id", "j"]))
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.split(F.col(text_col), " ").alias("words"))
    pw = (base.select("doc_id", F.posexplode("words").alias("j0", "w"))
              .select("doc_id", (F.col("j0") + 1).alias("j"), "w")
              .repartition(F.col("doc_id")))
    kept = pw.join(covered.hint("shuffle_hash"), ["doc_id", "j"],
                   "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(" ", F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("j").alias("j"),
                                                 F.col("w").alias("w")))),
            lambda s: s["w"])).alias("clean_text"),
        F.count("*").cast("long").alias("n_kept"))
    sizes = base.select("doc_id", F.size("words").cast("long")
                        .alias("n_words"))
    n_removed = F.col("n_words") - F.coalesce("n_kept",
                                              F.lit(0).cast("long"))
    return (sizes.join(rebuilt.hint("merge"), "doc_id", "left")
            .select("doc_id",
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    "n_words",
                    n_removed.alias("n_removed_words"),
                    (n_removed.cast("double")
                     / F.greatest("n_words", F.lit(1).cast("long")))
                    .alias("removed_fraction")))


def incremental_minhash_dups(docs: DataFrame, batch_cond,
                             n: int = 3, threshold: float = 0.6,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """Near-dup screen of an arriving batch against the standing corpus:
    (doc_id [batch], dup_of [corpus], jaccard) for every cross pair with
    Jaccard >= threshold.

    batch_cond is a boolean Column splitting docs into batch (true) and
    corpus (false). Only batch bands probe corpus bands — candidate volume
    is O(batch x dup rate), never corpus x corpus; at 100 TB the corpus
    band table is the persisted LSH index and this is a bucketed lookup
    join the size of the day's increment.
    """
    sig = _cached_signatures(docs, n, id_col, text_col)
    batch_bands = _lsh_bands(sig.filter(batch_cond))
    corpus_bands = _lsh_bands(sig.filter(~batch_cond))
    b, c = batch_bands.alias("b"), corpus_bands.alias("c")
    cand = (b.join(c, (F.col("b.band") == F.col("c.band"))
                   & (F.col("b.key") == F.col("c.key")))
             .select(F.col("b.doc_id").alias("doc_id"),
                     F.col("c.doc_id").alias("dup_of"))
             .distinct())
    return verified_jaccard_pairs(cand, sig, sig, "doc_id", "dup_of",
                                  threshold)


# Bloom decontamination parameters. m = 2^20 bits packs into 16384 longs
# (128 KiB) — broadcastable at any corpus size; k = 3 double-hashed probes.
# At 100 TB the raw eval-gram string set can reach GBs (too big for the
# broadcast the exact screen relies on) while the bitmap stays FIXED-size:
# size m to the EVAL-gram count, never the corpus (m ~ 10-20 bits/gram
# keeps the false-positive rate <1% at k=3; 2^20 covers ~100k eval grams
# — an undersized bitmap saturates and flags everything, observed at 2^17
# against the sf0.1 eval slice).
BLOOM_M_BITS = 1 << 20
BLOOM_K = 3


def _bloom_positions(h, m_bits: int, k: int):
    """k double-hashed bit positions for a 60-bit gram hash. h1 reads the
    low log2(m) hash bits, the stride reads the NEXT log2(m) bits (disjoint
    — no h1/h2 correlation) and is forced odd so it is coprime with the
    power-of-two m_bits: the k positions are pairwise distinct for
    k < m_bits. Integer-only — DuckDB reproduces it exactly
    (plans/extensions.py::decontaminate_bloom)."""
    log2m = m_bits.bit_length() - 1
    h1 = h % m_bits
    h2 = (F.shiftright(h, log2m) % m_bits).bitwiseOR(F.lit(1))
    return [(h1 + F.lit(j) * h2) % m_bits for j in range(k)]


def contamination_screen_bloom(docs: DataFrame, eval_cond, n: int = 4,
                               m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K,
                               id_col: str = "doc_id",
                               text_col: str = "text") -> DataFrame:
    """Decontamination screen via a Bloom bitmap of the eval n-grams — the
    scale path when the eval-gram set outgrows a raw-string broadcast.

    Same contract as contamination_screen but with bounded memory: eval
    grams are folded into an m_bits Bloom bitmap packed as (word_idx,
    bits) longs — at most m_bits/64 rows regardless of eval size — which
    broadcasts onto the training-gram scan. A gram is flagged iff all k
    probe bits are set: a SUPERSET of the exact screen's shared grams (no
    false negatives; false-positive rate ~(1-e^{-kN/m})^k). Flagged docs
    feed the same quarantine/review step, so bloom false positives cost
    review time, never silent contamination.

    Returns (doc_id, n_flagged_grams, n_grams, flag_ratio) for training
    docs with at least one bloom-positive gram. Deterministic (md5-derived
    double hashing, no seeds), so the DuckDB oracle models the bitmap as
    the equivalent distinct-position set and matches exactly.

    Plan shape at 100 TB: one tiny aggregation builds the bitmap (explode
    eval grams -> k positions -> bit_or per word); the corpus side is
    screened with a broadcast hash join on word_idx (map-side, no corpus
    shuffle). Probe rows are filtered to bloom-POSITIVE bits BEFORE the
    (doc, gram) aggregation, so the corpus-keyed exchanges carry only
    contaminated-or-false-positive grams (~the hit rate of the corpus),
    never one row per corpus gram; a gram has k pairwise-distinct probe
    positions (odd stride, power-of-two m), so count(*) == k over its
    surviving rows is exactly the all-bits-set test."""
    _validate_bloom_params(m_bits, k)
    ds = _doc_shingles(docs, id_col, text_col, n)
    # shingle ONCE over all docs (one memoized UDF pass), then split the
    # shingle table by the tag — shingling eval/train separately would run
    # the string-heavy UDF twice. When eval_cond resolves against the
    # shingle table itself (it references only the id column, e.g. the
    # registered doc_id % 13 split), filter it directly — no doc-table
    # re-scan and no broadcast join on either branch (r12, guide §2.4);
    # a cond over other doc columns falls back to the tag join.
    try:
        evds, trds = ds.filter(eval_cond), ds.filter(~eval_cond)
    except Exception:
        eval_ids = docs.select(F.col(id_col).alias("doc_id"),
                               eval_cond.alias("ev"))
        dst = ds.join(eval_ids, "doc_id")
        evds, trds = dst.filter(F.col("ev")), dst.filter(~F.col("ev"))
    bloom = bloom_bitmap(evds, m_bits, k)
    return bloom_screen(trds, bloom, m_bits, k)


def _validate_bloom_params(m_bits: int, k: int) -> None:
    if m_bits & (m_bits - 1) or k < 1 or k >= m_bits:
        # the no-false-negative guarantee rests on the probe positions
        # being pairwise distinct, which the odd-stride argument only
        # gives for power-of-two m_bits
        raise ValueError(f"m_bits must be a power of two and 1 <= k < "
                         f"m_bits (got m_bits={m_bits}, k={k})")


# variable-distance shift needs the SQL form (F.shiftleft only takes a
# literal count); 1L << 63 wraps to the sign bit in Java semantics, which
# bit_or / & handle bitwise — sign never leaks into the output. Lazy:
# Column construction needs an active SparkContext, so these cannot be
# module-level constants (import would fail before the session exists).
def _bloom_word_idx():
    return F.shiftright(F.col("p"), 6)


def _bloom_mask():
    return F.expr("shiftleft(cast(1 as bigint), cast(p & 63 as int))")


def _bloom_pos_rows(ds: DataFrame, m_bits: int, k: int) -> DataFrame:
    """(doc_id, sh, p) probe-position rows from a (doc_id, sh) shingle
    table: each gram contributes its k pairwise-distinct bit positions."""
    ex = ds.select("doc_id", F.explode("sh").alias("sh"))
    return ex.select(
        "doc_id", "sh",
        F.explode(F.array(*_bloom_positions(
            md5_hash60(F.col("sh")), m_bits, k))).alias("p"))


def bloom_bitmap(ds: DataFrame, m_bits: int = BLOOM_M_BITS,
                 k: int = BLOOM_K) -> DataFrame:
    """(word_idx, bits) packed Bloom bitmap of every n-gram in a (doc_id,
    sh) shingle table — at most m_bits/64 rows regardless of input size.
    This is the persisted artifact of the decontamination family: built
    once per eval-corpus snapshot, broadcast to every screen."""
    _validate_bloom_params(m_bits, k)
    return (_bloom_pos_rows(ds, m_bits, k)
            .select(_bloom_word_idx().alias("word_idx"),
                    _bloom_mask().alias("mask"))
            .groupBy("word_idx")
            .agg(F.bit_or("mask").alias("bits")))


def _bloom_dense(bloom: DataFrame, m_bits: int) -> DataFrame:
    """One-row (arr: array<bigint>) densification of a packed (word_idx,
    bits) bitmap: arr[word_idx] = bits, absent words = 0. m_bits/64
    elements (16384 longs = 128 KiB at the default m) whatever the eval
    corpus size — the same bounded-artifact guarantee as the packed form,
    in a shape the screen can probe with O(1) array indexing instead of a
    per-position hash join."""
    n_words = m_bits // 64
    # collect_list order is partition-dependent; the struct sort restores
    # word_idx order, then one linear gap-fill pass writes arr[i] = word
    # i's bits with zeros between set words. Linear on purpose: a
    # map_from_arrays + per-index lookup is O(set bits) PER index —
    # quadratic — and a range-join fill costs two extra stages per build.
    one = (bloom.groupBy()
           .agg(F.array_sort(F.collect_list(F.struct("word_idx", "bits")))
                .alias("s")))
    s = F.col("s")
    zero = F.lit(0).cast("long")

    def entry(e, i):
        prev = (F.when(i == 0, F.lit(-1).cast("long"))
                .otherwise(F.element_at(s, i)["word_idx"]))
        return F.concat(
            F.array_repeat(zero, (e["word_idx"] - prev - 1).cast("int")),
            F.array(e["bits"]))

    tail = F.array_repeat(
        zero,
        (F.lit(n_words) - 1 - F.element_at(s, -1)["word_idx"]).cast("int"))
    arr = (F.when(F.size(s) == 0, F.array_repeat(zero, n_words))
           .otherwise(F.concat(F.flatten(F.transform(s, entry)), tail)))
    return one.select(arr.alias("arr"))


def bloom_screen(ds: DataFrame, bloom: DataFrame,
                 m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> DataFrame:
    """Screen a (doc_id, sh) shingle table against a packed Bloom bitmap:
    (doc_id, n_flagged_grams, n_grams, flag_ratio) for docs with at least
    one bloom-positive gram.

    r12 shape (guide §2.4/§2.3): the bitmap is densified to a one-row
    128 KiB array and attached with a single-row broadcast nested-loop
    join, so the all-k-bits test is pure map-side projection arithmetic
    (array index + bit AND per probe, whole-stage codegen) — no k-way
    row explosion, no probe-side hash join, and no (doc_id, gram)
    exchange: a gram either passes all k tests in-row or is dropped
    before anything shuffles. n_grams rides the same rows, so the
    per-doc flag count is ONE corpus-keyed exchange of pre-aggregated
    (doc_id, n_grams) partials and the old corpus-sized sizes join is
    gone. Replaced plan (r11): explode x k positions -> broadcast hash
    join on word_idx -> (doc_id, sh) exchange + count==k -> doc_id
    exchange -> sort-merge join against a per-doc sizes scan. Grams are
    distinct per doc (_shingle_udf), so counting passing gram rows per
    doc is exactly the old count of all-bits-set grams."""
    _validate_bloom_params(m_bits, k)
    # positions are projected on the stream side BEFORE the dense attach:
    # the filter then enters the BNLJ condition as plain _p column
    # references, and the md5 runs once per gram in a codegen Project
    # (projected after the join, the optimizer inlines the aliases into
    # the join condition — k*4 md5 evaluations per row, measured ~2x the
    # whole screen)
    probe = (ds.select("doc_id",
                       F.size("sh").cast("long").alias("n_grams"),
                       F.explode("sh").alias("sh"))
             .select("doc_id", "n_grams",
                     *[F.coalesce(p, F.lit(0).cast("long"))
                       .alias(f"_p{j}") for j, p in enumerate(
                         # the coalesce (never hit: sh is non-null) makes
                         # each position provably non-null, so the join
                         # infers no isnotnull pre-filter — which would
                         # re-expand all k position exprs into a second
                         # md5 pass per row
                         _bloom_positions(md5_hash60(F.col("sh")),
                                          m_bits, k))])
             .crossJoin(F.broadcast(_bloom_dense(bloom, m_bits))))
    cond = None
    for j in range(k):
        word = F.element_at(
            "arr", (F.shiftright(F.col(f"_p{j}"), 6) + 1).cast("int"))
        mask = F.expr(f"shiftleft(cast(1 as bigint), "
                      f"cast(_p{j} & 63 as int))")
        test = word.bitwiseAND(mask) != 0
        cond = test if cond is None else cond & test
    return (probe.filter(cond)
            .groupBy("doc_id", "n_grams")
            .agg(F.count("*").alias("n_flagged_grams"))
            .select("doc_id", "n_flagged_grams", "n_grams",
                    (F.col("n_flagged_grams").cast("double")
                     / F.col("n_grams")).alias("flag_ratio")))


def contamination_screen(docs: DataFrame, eval_cond, n: int = 4,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Benchmark-decontamination screen: for every training doc, count the
    distinct word n-grams it shares with ANY doc in the held-out eval set
    (eval_cond true => eval member). Returns only contaminated docs:
    (doc_id, n_shared_grams, n_grams, contamination_ratio).

    Scale shape: the eval side (benchmarks) is tiny relative to a 100 TB
    corpus, so its distinct-gram set broadcasts — the corpus n-grams are
    screened map-side with no shuffle of the training data; the only
    exchange is the per-doc hit count on doc_id. Shares the cached shingle
    index with the dedup families (same (plan, n) memo)."""
    ds = _doc_shingles(docs, id_col, text_col, n)
    ex = ds.select("doc_id", F.explode("sh").alias("sh"))
    eval_ids = docs.select(F.col(id_col).alias("doc_id"), eval_cond.alias("ev"))
    tagged = ex.join(eval_ids, "doc_id")
    ev_grams = tagged.filter(F.col("ev")).select("sh").distinct()
    hits = (tagged.filter(~F.col("ev"))
            .join(F.broadcast(ev_grams), "sh")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_shared_grams")))
    sizes = (ds.join(eval_ids, "doc_id").filter(~F.col("ev"))
             .select("doc_id", F.size("sh").cast("long").alias("n_grams")))
    return (hits.join(sizes, "doc_id")
            .select("doc_id", "n_shared_grams", "n_grams",
                    (F.col("n_shared_grams").cast("double")
                     / F.col("n_grams")).alias("contamination_ratio")))


def containment_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                      id_col: str = "doc_id", text_col: str = "text",
                      max_df: int | None = NGRAM_MAX_DF) -> DataFrame:
    """All pairs whose n-gram CONTAINMENT — |A∩B| / min(|A|, |B|) — meets
    the threshold, alongside their Jaccard for contrast.

    Containment is the asymmetric near-dup measure Jaccard misses: a short
    document pasted verbatim inside a long one has tiny Jaccard (the union
    is dominated by the long doc) but containment ~1.0 — exactly the
    quote/boilerplate/sub-document duplication a training-corpus dedup
    pass must catch (the reference has no dedup at all; this extends the
    ngram_jaccard_pairs family it would need at scale).

    Same machinery and cost shape as ngram_jaccard_pairs: the memoized
    shingle index, the df-capped inverted-index self-join, pre-aggregated
    intersection counts — no O(n^2) cross join anywhere.
    """
    ds = _doc_shingles(docs, id_col, text_col, n)  # cached + primed by memo
    sizes = ds.select("doc_id", F.size("sh").alias("n_sh"))
    inter = _jaccard_intersections(ds, False, max_df)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
                 .withColumn("containment", F.col("n_common")
                             / F.least(F.col("n_a"), F.col("n_b")))
                 .withColumn("jaccard", F.col("n_common")
                             / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
                 .filter(F.col("containment") >= threshold)
                 .select("doc_a", "doc_b", "containment", "jaccard"))
