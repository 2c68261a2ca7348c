"""Streaming-job throughput micro-bench (r4 verdict task 5).

Measures per-epoch wall time and rows/s for the two foreachBatch pipeline
jobs (incremental_dedup_job, decontamination_job) at TWO standing-corpus
sizes with the SAME increment, using StreamingQueryProgress as the timing
source. The claim under test: per-epoch cost scales with the increment,
not the corpus — the corpus artifact (LSH index / Bloom bitmap) is built
once and probed per batch, so a ~10x corpus should shift only the one-off
build, not the per-epoch slope.

Usage: python tools/stream_bench.py   (prints one JSON line per run)
Numbers land in SCALE.md with the shared-box caveat.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from kafka_flink_processing_spark.session import get_spark  # noqa: E402
from kafka_flink_processing_spark.sources.parquet import load_table  # noqa: E402
from kafka_flink_processing_spark.streaming.jobs import (  # noqa: E402
    decontamination_job,
    incremental_dedup_job,
)

N_EPOCHS = 4


def stream_epochs(spark, df, tmpdir, n_files):
    """Split df into n ordered parquet files and open a 1-file-per-trigger
    stream (same construction as tests/test_streaming.py::_stream_from)."""
    src = f"{tmpdir}/src"
    os.makedirs(src, exist_ok=True)
    df = df.withColumn("__ord", F.col("doc_id").cast("double"))
    cuts = df.approxQuantile("__ord",
                             [i / n_files for i in range(1, n_files)], 0.0)
    lo = None
    for i, hi in enumerate(list(cuts) + [None]):
        part = df
        if lo is not None:
            part = part.filter(F.col("__ord") > lo)
        if hi is not None:
            part = part.filter(F.col("__ord") <= hi)
        part.drop("__ord").coalesce(1).write.mode("overwrite") \
            .parquet(f"{src}/f{i}")
        lo = hi
    return spark.readStream.schema(df.drop("__ord").schema).option(
        "maxFilesPerTrigger", 1).parquet(f"{src}/f*")


def run_job(spark, job, corpus, increment, label):
    n_increment = increment.count()
    with tempfile.TemporaryDirectory(prefix=f"kfps_sbench_{label}_") as td:
        stream = stream_epochs(spark, increment, td, N_EPOCHS)
        t0 = time.time()
        q = job(stream, corpus, f"{td}/out", f"{td}/ckpt",
                available_now=True)
        q.awaitTermination()
        wall = time.time() - t0
        prog = [json.loads(p.json) for p in q.recentProgress]
        if getattr(q, "bloom", None) is not None:
            q.bloom.unpersist()
        # numInputRows per trigger counts SOURCE SCANS, not distinct docs:
        # the foreachBatch bodies run several actions over the batch (dup
        # write + accepted anti-join), each re-scanning the file source, so
        # a 125-doc epoch reports ~375 input rows. Throughput is therefore
        # derived from the TRUE doc counts (increment.count() split evenly
        # by the quantile cut), never from numInputRows.
        epochs = [{"source_rows_read": p["numInputRows"],
                   "sec": round(p["durationMs"]["triggerExecution"] / 1e3, 3)}
                  for p in prog if p["numInputRows"] > 0]
        docs_per_epoch = n_increment / max(len(epochs), 1)
        # first non-empty epoch carries the one-off corpus-artifact build +
        # python worker spin-up; steady state = the later epochs
        steady = epochs[1:] if len(epochs) > 1 else epochs
        steady_sec = sum(e["sec"] for e in steady)
        print(json.dumps({
            "job": label,
            "corpus_rows": corpus.count(),
            "increment_docs": n_increment,
            "docs_per_epoch": docs_per_epoch,
            "epochs": epochs,
            "wall_sec": round(wall, 3),
            "steady_docs_per_sec": round(
                docs_per_epoch * len(steady) / steady_sec, 1)
            if steady_sec else None,
        }))


def main():
    spark = get_spark("stream-bench")
    sf01 = "/root/testdata/sf0.1"
    sf001 = "/root/testdata/sf0.01"
    docs_big = load_table(spark, "documents", sf01).select("doc_id", "text")
    docs_small = load_table(spark, "documents", sf001).select("doc_id", "text")

    n_big = docs_big.count()
    cut = int(n_big * 0.9)
    increment = docs_big.filter(F.col("doc_id") >= cut).cache()
    increment.count()
    corpus_small = docs_small.cache()
    corpus_small.count()
    corpus_big = docs_big.filter(F.col("doc_id") < cut).cache()
    corpus_big.count()

    for corpus, tag in ((corpus_small, "small_corpus"),
                        (corpus_big, "big_corpus")):
        run_job(spark, incremental_dedup_job, corpus, increment,
                f"incremental_dedup_{tag}")
    for eval_docs, tag in ((corpus_small, "small_eval"),
                           (corpus_big, "big_eval")):
        run_job(spark,
                lambda s, c, o, k, available_now: decontamination_job(
                    s, c, o, k, n=4, available_now=available_now),
                eval_docs, increment, f"decontamination_{tag}")


if __name__ == "__main__":
    main()
