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


def _mg_fold(batches: Iterator[pd.DataFrame], col: str,
             capacity: int) -> dict[str, int]:
    """Fold a partition's batches into one Misra-Gries dict (<= capacity
    entries). Per batch: vectorized value_counts, then the mergeable-MG
    overflow step — subtract the (capacity+1)-th largest count from all
    and drop the non-positive — which preserves the n_p/(C+1) error
    bound (Agarwal et al., Mergeable Summaries)."""
    counts: dict[str, int] = {}
    for pdf in batches:
        for g, c in pdf[col].value_counts().items():
            counts[g] = counts.get(g, 0) + int(c)
        if len(counts) > capacity:
            vals = np.fromiter(counts.values(), dtype=np.int64,
                               count=len(counts))
            # (capacity+1)-th largest = index len-capacity-1 ascending
            thresh = np.partition(vals, len(vals) - capacity - 1)[
                len(vals) - capacity - 1]
            counts = {g: c - thresh for g, c in counts.items() if c > thresh}
    return counts


def mg_candidates(grams: DataFrame, col: str = "g",
                  capacity: int = MG_CAPACITY) -> DataFrame:
    """Per-partition Misra-Gries candidate grams (pass 1). Output: one
    `g` column, <= capacity rows per input partition, duplicates across
    partitions possible (dedup happens in the recount's build side)."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = _mg_fold(batches, col, capacity)
        if counts:
            yield pd.DataFrame({col: list(counts.keys())})

    return grams.mapInPandas(fold, schema=f"{col} string")


def heavy_hitters_topk(grams: DataFrame, k: int = 100,
                       col: str = "g",
                       capacity: int = MG_CAPACITY) -> DataFrame:
    """Exact top-k (gram, freq) without shuffling the gram universe:
    MG candidates -> broadcast the distinct candidate set -> recount only
    candidate rows (the one exchange carries candidates x partitions
    partial counts, never the universe) -> TakeOrderedAndProject."""
    cands = mg_candidates(grams, col, capacity).distinct()
    return (grams.join(F.broadcast(cands), col)  # filter BEFORE exchange
            .groupBy(col)
            .agg(F.count("*").alias("freq"))
            .orderBy(F.desc("freq"), col)
            .limit(k))
