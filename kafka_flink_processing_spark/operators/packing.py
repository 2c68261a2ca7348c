"""Sequence packing — shard a document corpus into contiguous token-budget
packs (training-sequence assembly for LLM data pipelines).

Semantics (deterministic, engine-portable): within each shard (default: the
`source` column), documents are laid out in `order_col` order and a running
EXCLUSIVE token prefix-sum assigns each document to pack
``seq_id = floor(prefix_tokens / budget)``. Documents are never split; a
document that straddles a budget boundary belongs to the pack its *start*
falls in, so every pack holds >= 1 document and pack overflow is bounded by
one document's tokens. This is the contiguous-packing variant (what you use
to cut a corpus into ~budget-sized training shards); best-fit bin packing is
deliberately not offered — it is order-dependent and inherently sequential,
while this form is one window prefix-sum.

Scale shape (100 TB): parallelism = number of shards — the prefix-sum is a
per-shard window (`Window.partitionBy(shard).orderBy(order)`), so the shard
key is the scale lever. `source` gives natural locality; for corpora with
giant single sources re-key to (source, date-bucket) exactly like
plans/temporal.py's day-keyed RANGE window. No joins, a single shuffle on
the shard key, integer arithmetic only (exact cross-engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_flink_processing_spark.functions.text import token_count

DEFAULT_BUDGET = 2048


def pack_sequences(docs: DataFrame, budget: int = DEFAULT_BUDGET,
                   tokens: Column | None = None, shard_col: str = "source",
                   order_col: str = "doc_id") -> DataFrame:
    """Per-document pack assignment: adds `n_tokens`, `prefix_tokens`
    (exclusive running sum) and `seq_id` columns.

    `tokens` defaults to the engine's BPE-ish `token_count(text)` (JVM
    regexp, no Python). The window frame is ROWS UNBOUNDED PRECEDING ..
    1 PRECEDING — the exclusive sum, so the first document of every shard
    lands in pack 0 with prefix 0.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    tok = tokens if tokens is not None else token_count(F.col("text"))
    w = (Window.partitionBy(shard_col).orderBy(order_col)
               .rowsBetween(Window.unboundedPreceding, -1))
    out = (docs.withColumn("n_tokens", tok)
               .withColumn("prefix_tokens",
                           F.coalesce(F.sum("n_tokens").over(w),
                                      F.lit(0).cast("long")))
               .withColumn("seq_id",
                           F.expr(f"prefix_tokens div {int(budget)}")))
    return out


def pack_summary(docs: DataFrame, budget: int = DEFAULT_BUDGET,
                 shard_col: str = "source",
                 order_col: str = "doc_id") -> DataFrame:
    """Per-pack rollup: doc count, token total, doc-id span, fill ratio.

    `fill_1000` is the budget-fill ratio in integer permille (exact
    cross-engine; a double ratio would hash-drift on the final digit).
    """
    packed = pack_sequences(docs, budget, shard_col=shard_col,
                            order_col=order_col)
    return (packed.groupBy(shard_col, "seq_id")
                  .agg(F.count("*").alias("n_docs"),
                       F.sum("n_tokens").cast("long").alias("seq_tokens"),
                       F.min(order_col).alias("first_doc_id"),
                       F.max(order_col).alias("last_doc_id"))
                  .withColumn("fill_1000",
                              F.expr(f"seq_tokens * 1000 div {int(budget)}")))
