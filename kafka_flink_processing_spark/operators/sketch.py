"""Bounded-memory heavy hitters: per-partition Misra-Gries sketch +
exact candidate recount (the classic two-pass top-k for universes too
large to shuffle).

Why it exists: `vocab_top_tokens` / `ngram_freq_top` aggregate the FULL
token universe — the shuffle carries one row per (partition, distinct
gram), fine while vocabularies fit, but at 100 TB a trigram universe runs
to trillions of distinct keys and that exchange becomes the job. The
two-pass form never shuffles the universe:

  pass 1: each partition folds its gram stream into a Misra-Gries summary
          of at most CAPACITY counters (mapInPandas, state in a dict; the
          mergeable-summaries decrement — subtract the (C+1)-th largest
          count when the dict overflows — keeps the per-batch merge
          vectorized). Emits <= CAPACITY candidate grams per partition.
  pass 2: exact recount of ONLY the candidate grams (broadcast semi-join
          into the stream before any exchange), then top-k.

Correctness bound (why the top-k is EXACT, not approximate): MG with C
counters under-counts any gram by at most n_p/(C+1) within a partition,
so a gram with partition frequency > n_p/(C+1) always survives. Summed
over partitions (pigeonhole): every gram with GLOBAL frequency
> N/(C+1) is a candidate in at least one partition — independent of how
rows are partitioned. Therefore the recounted top-k is exact whenever
freq(k-th item) > N/(C+1). Sizing rule: C > N / freq_k — for the driver
corpora N/freq_100 peaks at ~13k (sf0.1 trigrams), so CAPACITY=16384
guarantees exactness at every SF; at 100 TB you size C from the corpus
profile (or fall back to count-min + heap when freq_k is unknowable,
trading exactness for fixed memory).

The precondition is additionally VALIDATED AT RUN TIME (r5 advice,
tightened by the r6 review): the fold tracks its exact decrement total
d_p (any gram absent from a partition's summary has true partition count
<= d_p) AND its row count n_p; the merge sums D = Σ_p d_p and N = Σ_p
n_p, and the final projection raises through `F.raise_error` unless the
result set is certified exact — at least k candidates recount above D
(so nothing dropped can hold a top-k rank), or the candidates cover all
N rows (nothing was dropped at all). The original per-row freq > D check
proved each returned row but let a fewer-than-k result pass silently
truncated. A mis-sized capacity therefore fails the job loudly at
collect time instead of silently returning a wrong top-k that would only
surface later as a driver hash mismatch.

Reference parity: the reference has no sketch operators at all (its
read-side top-k is Postgres `ORDER BY ... LIMIT`, README.md:83-101);
this is engine-native scale infrastructure.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MG_CAPACITY = 16384


def _mg_fold_series(batches: Iterator[pd.DataFrame], col: str,
                    capacity: int) -> tuple[pd.Series, int]:
    """Vectorized core of the Misra-Gries fold (r12, guide §4.2: hand
    whole batches to native code instead of looping rows in Python).
    Per batch: value_counts (C) merged into the running summary with
    Series.add (C-level index alignment) — the scalar form walked every
    distinct key of every batch through a Python dict loop. The overflow
    step is unchanged arithmetic: subtract the (capacity+1)-th largest
    count from all and drop the non-positive (Agarwal et al., Mergeable
    Summaries), so the n_p/(C+1) error bound and the decrement total d_p
    are bit-identical to the scalar form. Counts ride float64 between
    overflows (exact below 2^53 — a partition cannot hold that many
    rows) and return int64. Any key ABSENT from the returned summary has
    a true partition count <= the returned d_p (each overflow lowered
    every counter, present or virtual, by exactly `thresh`)."""
    acc: pd.Series | None = None
    dropped = 0
    for pdf in batches:
        vc = pdf[col].value_counts(sort=False)
        acc = vc.astype("float64") if acc is None \
            else acc.add(vc, fill_value=0.0)
        if len(acc) > capacity:
            vals = acc.to_numpy()
            # (capacity+1)-th largest = index len-capacity-1 ascending
            thresh = np.partition(vals, len(vals) - capacity - 1)[
                len(vals) - capacity - 1]
            dropped += int(thresh)
            acc = (acc - thresh)[vals > thresh]
    if acc is None:
        return pd.Series(dtype="int64"), dropped
    return acc.astype("int64"), dropped


def _mg_fold(batches: Iterator[pd.DataFrame], col: str,
             capacity: int) -> tuple[dict[str, int], int]:
    """Dict-facing Misra-Gries fold (<= capacity entries) plus the
    partition's exact decrement total d_p — a thin wrapper over
    _mg_fold_series (the property tests and downstream docstrings speak
    dicts; the hot path, _mg_scan, reads the Series directly and never
    pays this conversion)."""
    acc, dropped = _mg_fold_series(batches, col, capacity)
    return dict(zip(acc.index.tolist(), acc.tolist())), dropped


def _mg_scan(grams: DataFrame, col: str = "g",
             capacity: int = MG_CAPACITY,
             hashed: DataFrame | None = None) -> DataFrame:
    """Pass 1 with the exactness evidence attached: per input partition,
    <= capacity candidate rows (`gh`, NULL) plus exactly ONE marker row
    (NULL, d_p) carrying the partition's decrement total — emitted even
    when the overflow step dropped every candidate, so the merged bound
    D = Σ_p d_p never under-counts a partition.

    r12 (guide §4 — shuffle/ship keys, not payloads): the fold runs on
    xxhash64(col), computed JVM-side, so the Python boundary ships ONE
    int64 per gram instead of the gram string (at 3-word grams that is
    ~4x fewer bytes through Arrow, and value_counts on int64 beats the
    object-dtype path), and the candidate set that merges/broadcasts is
    8 bytes per entry. Exactness is unaffected: a hash collision only
    POOLS counts upward, so every gram whose true frequency clears the
    MG bound still surfaces (its hash count >= its own count), the
    decrement totals d_p are computed identically, and the absent-key
    bound still holds (a gram whose hash is absent has hash count — a
    fortiori its own count — <= d_p). Pass 2 recounts exact STRINGS of
    the rows matching candidate hashes, so collisions cost a few extra
    recount rows, never a wrong count.

    `hashed`, when given, must be a relation carrying an int64 `gh`
    column (the caller's precomputed xxhash64) — heavy_hitters_topk
    passes its persisted (gram, gh) relation so both passes share ONE
    gram explode (r13)."""
    hashed = (grams.select(F.xxhash64(F.col(col)).alias("gh"))
              if hashed is None else hashed.select("gh"))

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_rows = 0

        def counted_batches():
            nonlocal n_rows
            for pdf in batches:
                n_rows += len(pdf)
                yield pdf

        counts, dropped = _mg_fold_series(counted_batches(), "gh", capacity)
        if len(counts) or dropped:  # empty partition yields nothing
            # candidate rows then ONE marker row, built as masked int
            # arrays (no Python list per candidate — guide §4.2)
            m = len(counts)
            gh = np.zeros(m + 1, dtype=np.int64)
            gh[:m] = counts.index.to_numpy(dtype=np.int64, copy=False)
            gh_mask = np.zeros(m + 1, dtype=bool)
            gh_mask[m] = True  # marker carries NULL gh
            marker = np.zeros(m + 1, dtype=np.int64)
            marker_mask = np.ones(m + 1, dtype=bool)  # candidates NULL
            marker_mask[m] = False
            d = marker.copy()
            d[m] = dropped
            nn = marker.copy()
            nn[m] = n_rows
            yield pd.DataFrame(
                {"gh": pd.arrays.IntegerArray(gh, gh_mask),
                 "__mg_d": pd.arrays.IntegerArray(d, marker_mask.copy()),
                 "__mg_n": pd.arrays.IntegerArray(nn, marker_mask)})

    return hashed.mapInPandas(
        fold, schema="gh long, __mg_d long, __mg_n long")


def mg_candidates(grams: DataFrame, col: str = "g",
                  capacity: int = MG_CAPACITY) -> DataFrame:
    """Per-partition Misra-Gries candidate gram HASHES (pass 1). Output:
    one `gh` column (xxhash64 of `col`), <= capacity rows per input
    partition, duplicates across partitions possible (dedup happens in
    the recount's build side)."""
    return (_mg_scan(grams, col, capacity)
            .filter(F.col("gh").isNotNull()).select("gh"))


def heavy_hitters_topk(grams: DataFrame, k: int = 100,
                       col: str = "g",
                       capacity: int = MG_CAPACITY) -> DataFrame:
    """Exact top-k (gram, freq) without shuffling the gram universe:
    MG candidates -> broadcast the merged candidate set -> recount only
    candidate rows (the one exchange carries candidates x partitions
    partial counts, never the universe) -> TakeOrderedAndProject.

    The returned plan embeds the exactness guard (module docstring): the
    result is certified exact iff at least k candidates recount above the
    merged MG bound D (every non-candidate's true freq is <= D, so k
    above-D rows dominate everything dropped), OR the candidate set
    covers the whole stream (Σ candidate freqs == Σ partition row counts
    — nothing was dropped anywhere, so the recount IS the full
    aggregation and the result is exact regardless of D; the markers
    carry per-partition row counts to make that check free). Otherwise
    the projection raises at collect time — a too-small capacity fails
    loudly instead of returning a silently truncated or mis-ranked
    top-k.

    r13 (guide §5; r12 verdict task 4): the two passes share ONE gram
    explode — the (gram, gh) relation persists and pass 1's sketch fold
    materializes it while folding, so the recount reads the cache
    instead of re-running the corpus split+explode. The retention is the
    ccnet/dedup posture (the CacheManager dedupes per-plan re-persists;
    bench.py clears it at attempt start so the cold number is visible in
    `first_pass_sec`). At 100 TB the cached stream spills to disk and a
    re-scan may beat the read-back — size it from the corpus profile and
    skip the persist when the gram stream outruns cluster storage (the
    operator stays correct either way; the sharing is an optimization
    only)."""
    shared = (grams.select(F.col(col),
                           F.xxhash64(F.col(col)).alias("gh"))
              .persist())
    # single JVM aggregate merges the tiny pass-1 output: collect_set
    # unions the candidates (markers carry NULL g, so they're skipped)
    # while sum() folds the markers' d_p into the global bound D and
    # their n_p into the stream total N (the candidates' NULL __mg_d /
    # __mg_n are skipped symmetrically). Map-side partial aggregation
    # means the SinglePartition exchange carries <= (C+1) rows' worth
    # per input partition — the same candidates-x-partitions cost the
    # recount exchange already pays; the gram universe itself never
    # moves and no extra Python stage runs.
    raw = _mg_scan(grams, col, capacity, hashed=shared)
    one = raw.agg(F.collect_set(F.col("gh")).alias("cs"),
                  F.sum("__mg_d").alias("d"),
                  F.sum("__mg_n").alias("n"))
    # rows folded but the overflow dropped EVERY counter (near-uniform
    # stream, capacity far too small): an empty top-k would be a silent
    # wrong answer — raise instead, at collect time
    guarded_cs = F.when(
        (F.size("cs") == 0) & (F.coalesce(F.col("d"), F.lit(0)) > 0),
        F.raise_error(F.concat(
            F.lit("heavy_hitters_topk exactness precondition violated: "
                  "no candidates survived the MG fold (decrement bound "),
            F.col("d"),
            F.lit(f") — raise capacity (current {capacity})")))
        .cast("array<bigint>")).otherwise(F.col("cs"))
    merged = one.select(F.explode(guarded_cs).alias("gh"),
                        F.col("d").alias("__mg_bound"),
                        F.col("n").alias("__mg_total"))
    # filter BEFORE the exchange, on the 8-byte candidate-hash broadcast;
    # the recount itself groups the exact STRING, so a hash collision
    # only adds a few non-candidate rows that lose at the limit
    counted = (shared
               .join(F.broadcast(merged), "gh")
               # bound/total are constants: free riders through the agg
               .groupBy(col, "__mg_bound", "__mg_total")
               .agg(F.count("*").alias("freq")))
    # Set-level exactness check, evaluated entirely on the POST-LIMIT
    # relation (<= k rows, so the window below is trivial and the
    # expensive recount join runs exactly once — r6 review closed the
    # old per-row guard's silent-truncation hole, where a < k-row result
    # passed even though dropped grams with freq <= D could hold the
    # missing ranks):
    #  - limit binding (k rows returned): exact iff EVERY returned freq
    #    > D — then nothing dropped can out-rank rank k.
    #  - limit not binding (< k rows): the returned rows ARE the whole
    #    candidate set, so exact iff their freqs sum to the stream total
    #    N (nothing was dropped anywhere; the marker-carried row counts
    #    make N free). Conservative in one corner — full coverage with a
    #    binding limit is certified via the freq > D arm only — so the
    #    guard can over-raise, never under-raise.
    from pyspark.sql import Window

    top = counted.orderBy(F.desc("freq"), col).limit(k)
    w = Window.partitionBy()
    chk = (top
           .withColumn("__nrows", F.count(F.lit(1)).over(w))
           .withColumn("__covered", F.sum("freq").over(w))
           .withColumn("__minfreq", F.min("freq").over(w)))
    exact = (((F.col("__nrows") == k)
              & (F.col("__minfreq") > F.col("__mg_bound")))
             | (F.col("__covered") == F.col("__mg_total")))
    # orderBy after the guard projection restores the documented ordered
    # top-k contract (the guard window collapsed the plan to a single
    # partition whose pass-through order was only incidental); it is free
    # on <= k rows.
    return chk.select(
        col,
        F.when(~exact, F.raise_error(F.concat(
            F.lit("heavy_hitters_topk exactness precondition violated: "),
            F.col("__nrows"), F.lit(f" rows returned (k={k}), min "
                                    "returned freq "),
            F.col("__minfreq"), F.lit(" vs MG decrement bound "),
            F.col("__mg_bound"), F.lit(", candidate coverage "),
            F.col("__covered"), F.lit(" of "), F.col("__mg_total"),
            F.lit(f" stream rows — raise capacity (current {capacity})"))))
         .otherwise(F.col("freq")).alias("freq")).orderBy(
            F.desc("freq"), col)


def heavy_hitters_auto(grams: DataFrame, k: int = 100, col: str = "g",
                       capacity: int = MG_CAPACITY,
                       universe_ndv: int | None = None) -> DataFrame:
    """Mechanical top-k plan choice (SCALE.md's scaling-curve finding made
    executable): below the universe-size crossover the plain one-shuffle
    aggregation beats the two-pass MG sketch (the sketch's second scan is
    pure overhead when the exchange can carry the whole universe); above
    it the plain aggregation's exchange grows with the universe while the
    MG path stays fixed at candidates x partitions. Both branches return
    the identical exact ordered top-k — this operator only picks which
    physical plan computes it, so a 100 TB user gets the right plan
    without reading SCALE.md.

    Decision rule (cost-model, not heuristics): the plain aggregation's
    exchange carries at most n_partitions x min(ndv, partition_rows)
    partial rows; the MG path pays two candidate-bounded exchanges of at
    most n_partitions x capacity each, plus a second full scan. So the
    plain plan is never worse when ndv <= 2 x capacity, and above that
    threshold its exchange keeps growing while MG's is flat — choose MG
    iff ndv > 2 x capacity.

    ndv comes from `universe_ndv` when the caller has a corpus profile
    (the zero-cost path a production pipeline uses: NDV is a standard
    profile statistic, cf. column_profile), else from one eager
    approx_count_distinct probe — a single map-side-combined pass whose
    exchange carries one HLL register set per partition, i.e. cheaper
    than either candidate plan's cheapest stage. The probe is exactly
    the runtime-statistics pattern AQE applies to join strategy, lifted
    to operator choice.
    """
    if universe_ndv is None:
        universe_ndv = int(grams.agg(
            F.approx_count_distinct(col).alias("ndv")).first()["ndv"])
    if universe_ndv <= 2 * capacity:
        # TakeOrderedAndProject over a map-side-combined aggregate: the
        # exchange is bounded by the (small, proven by the probe) universe
        return (grams.groupBy(col).agg(F.count("*").alias("freq"))
                .orderBy(F.desc("freq"), col).limit(k))
    return heavy_hitters_topk(grams, k=k, col=col, capacity=capacity)
