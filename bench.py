"""Benchmark harness (driver contract): runs the headline query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation, no
driver-side collect). Timings are per-query wall clock on a warm session.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kafka_flink_processing_spark.plans.registry import QUERIES, _ensure_loaded
from kafka_flink_processing_spark.session import get_spark


# Frozen comparison sets (r4 verdict: cross-round totals stopped being
# comparable once the headline set grew; emit fixed-set subtotals so a
# regression is readable straight off BENCH_r{N}.json without re-deriving
# set intersections). CORE16 = the r1 headline set, the de-facto floor the
# 2x gate measures against; R4_22 = the r4 set (adds the pipeline operators
# benched since). NEVER edit these: add a new frozen set if the gate needs
# a new baseline. main() errors if a frozen-set query leaves the headline.
CORE16 = frozenset({
    "asof_join_events", "curation_pipeline", "dedup_clusters",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "forecast_sma",
    "groupby_agg_q1", "join_revenue_by_nation", "join_topk_orders",
    "latest_per_key", "pnl_positions_fold", "range_join_attribution",
    "session_window_stats", "similarity_bruteforce_topk",
    "similarity_ivf_topk", "tumbling_window_stats",
})
R4_22 = CORE16 | frozenset({
    "adaptive_quality_filter", "decontaminate_bloom",
    "dedup_incremental_minhash", "dup_span_redact", "ohlc_bars",
    "pnl_positions_hybrid",
})
# R5_25 = the set benched through most of r5 (BENCH_r05's floor set);
# frozen when the late-r5 pack (ewma/bollinger/CMS) joined the headline.
R5_25 = R4_22 | frozenset({
    "sql_q5_local_supplier", "sql_q6_forecast_revenue", "heavy_hitters_mg",
})
# R6_28 = the full r5-final headline (BENCH_r05 = its floor); frozen when
# the r6 pack (kyle_lambda / column_profile / token_drift) joined.
R6_28 = R5_25 | frozenset({
    "ewma_price", "bollinger_bands", "cms_freq_estimate",
})
# R9_41 = the full r9-final headline (BENCH_r09 = its floor, total
# 43.376 s); frozen at the start of r10 BEFORE this round's additions
# join, per the standing BASELINE.md rule — new entries never blur the
# drift gates of an already-floored set.
R9_41 = R6_28 | frozenset({
    "heavy_hitters_adaptive", "kyle_lambda_price_impact", "column_profile",
    "token_drift_chi2", "roll_spread_estimator", "multimodal_png_decode",
    "multimodal_gif_decode", "audio_zcr_features", "feature_hashing",
    "bpe_vocab_merges", "bpe_encode_tokens", "bpe_vocab_merges_batched",
    "similarity_pq_topk",
})

# Box-contention controls (r10 verdict task: two consecutive official BENCH
# artifacts were hostile-box samples — r9 mildly, r10 at 2.8× — and a raw
# subtotal read mechanically against its floor misleads). These two queries
# are pure-JVM plans untouched since r1; their min-vs-floor ratio measured
# IN THE SAME RUN is the box factor, so every BENCH artifact now carries
# its own adjudication: read `control_ratios` first, and divide any
# subtotal ratio by the control band before calling a regression. The
# floors are the historical official minimum (BENCH_r03); they NEVER
# change — a faster box just reads <1.0.
CONTROL_FLOORS = {"latest_per_key": 0.299, "groupby_agg_q1": 0.847}


def sf_from_dir(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def gated_attempts(measure, max_attempts: int, threshold: float = 1.2,
                   control_floors: dict[str, float] | None = None,
                   ) -> tuple[dict[str, float], list[dict[str, float]], object]:
    """Controls-gated retry (r11 verdict task 3).

    The official bench has repeatedly sampled hostile box windows —
    BENCH_r09/r10/r11 all carry control ratios 1.3-2.8 — and a raw subtotal
    read against its floor then misleads a mechanical reader. Re-run the
    full measurement (`measure` returns one attempt's per-query min times)
    until the SAME-RUN control ratio reads quiet (max ratio < `threshold`),
    capped at `max_attempts`; the official record is the attempt with the
    LOWEST box factor, and every attempt's controls are returned so the
    JSON hides nothing. This floors the official artifact at the best
    observed window mechanically instead of by narrative. Timings never mix
    across attempts — each attempt's per-query numbers and its controls
    come from the same window, which is what makes the adjudication valid
    (a cross-attempt per-query min would pair quiet-window numbers with a
    contended window's controls).

    r13 (verdict task 1): `measure` may return either a plain per-query
    times dict (the r12 contract, kept for the pure-logic tests) or a
    (times, extra) tuple; `extra` — in the real bench, the attempt's
    pass-1 cold times — rides along and the KEPT attempt's extra is
    returned as the third element, so cold numbers and the official min
    always come from the same window.
    """
    floors = CONTROL_FLOORS if control_floors is None else control_floors
    attempt_controls: list[dict[str, float]] = []
    best_times: dict[str, float] = {}
    best_extra: object = None
    best_factor = float("inf")
    for attempt in range(max_attempts):
        cand = measure()
        extra = None
        if isinstance(cand, tuple):
            cand, extra = cand
        attempt_controls.append(
            {q: round(cand[q] / floor, 3) for q, floor in floors.items()})
        factor = max(cand[q] / floor for q, floor in floors.items())
        if factor < best_factor:
            best_factor, best_times, best_extra = factor, cand, extra
        if best_factor < threshold:
            break
        print(f"bench attempt {attempt + 1}/{max_attempts}: contended box "
              f"(control factor {factor:.3f} >= {threshold}); "
              + ("retrying" if attempt + 1 < max_attempts
                 else "attempts exhausted, keeping best"),
              file=sys.stderr)
    return best_times, attempt_controls, best_extra


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    _ensure_loaded()
    headline = {name: spec for name, spec in QUERIES.items() if spec.bench}
    # check the frozen comparison sets BEFORE spending bench passes, and
    # with an explicit raise (a bare assert would vanish under python -O
    # and let a subtotal silently shrink — the exact failure these sets
    # exist to catch)
    for frozen_name, frozen in (("CORE16", CORE16), ("R4_22", R4_22),
                                ("R5_25", R5_25), ("R6_28", R6_28),
                                ("R9_41", R9_41)):
        missing = frozen - set(headline)
        if missing:
            raise SystemExit(
                f"{frozen_name} queries dropped from the bench headline "
                f"(comparison subtotals would silently shrink): "
                f"{sorted(missing)}")

    # warm the JVM + file listings once with the cheapest query, and spin up
    # the Python UDF workers (steady-state on a cluster; otherwise their
    # one-time fork cost lands on whichever Arrow-UDF query runs first)
    force(headline["latest_per_key"].spark(spark, sf_dir))
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _noop(s: pd.Series) -> pd.Series:
        return s

    warm = spark.range(0, 32 * 1024, 1, 32)
    force(warm.select(_noop("id")))
    # applyInPandas / mapInPandas run in their own worker pool (different
    # eval type than scalar pandas_udf) — warm those too so the fold-family
    # queries measure the operator, not the one-time Python fork.
    force(warm.groupBy((F.col("id") % 32).alias("g"))
              .applyInPandas(lambda pdf: pdf, schema="id long"))
    force(warm.mapInPandas(lambda it: it, schema="id long"))

    # Best-of-N per query, taken across FULL-SUITE passes rather than
    # back-to-back repeats: this box shares cores with the build driver and
    # shows contention spikes lasting tens of seconds (observed: one query
    # at 26s in a run where the same code measures 2.9s minutes later).
    # Back-to-back repeats of a single query sit inside one spike window and
    # both absorb it; separating the repeats by a whole suite pass (~1 min)
    # decorrelates them, so the per-query min is a far better quiet-box
    # estimator. (Default 3 passes vs the old 2 repeats costs one extra
    # suite pass — accepted for the extra decorrelated sample; the recorded
    # metric is the min, never the total harness wall clock.) Work per pass
    # is still end-to-end
    # (full plan, noop sink, no collect). Caches that memoize *artifacts*
    # (shingle/signature tables) stay warm across passes — deliberate: the
    # production analogue is a persisted index. Since r13 the pass-1 cold
    # numbers are REPORTED (`first_pass_sec`, cleared-memo pass 1 of the
    # kept attempt), so warm-min and cold-build are separable per query.
    raw_passes = os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")
    try:
        n_passes = max(1, int(raw_passes))
    except ValueError:
        print(f"warning: SPARK_GRAFT_BENCH_PASSES={raw_passes!r} is not an "
              f"int; falling back to 3", file=sys.stderr)
        n_passes = 3

    def clear_warm_state() -> None:
        # r13 (verdict task 1): every attempt starts COLD. The in-process
        # artifact memos (dedup shingle/signature/inverted/ExactSubstr
        # anchor, the CC edge table) and every per-call persist (ccnet
        # score relation, BPE word relation, pnl state table) survive
        # across passes by design — the production analogue is a
        # persisted index — but they made pass-2/3 mins warm-memo times
        # a reader could not separate from per-run wins. Clearing them
        # at attempt start makes pass 1 a true cold build, reported
        # below as `first_pass_sec`, while the official per-query min
        # keeps the unchanged warm best-of-N methodology.
        from kafka_flink_processing_spark.operators.cluster import (
            clear_cluster_caches,
        )
        from kafka_flink_processing_spark.operators.dedup import (
            clear_dedup_caches,
        )
        clear_dedup_caches()
        clear_cluster_caches()
        spark.catalog.clearCache()  # per-call persists (CacheManager-deduped)

    def measure_attempt() -> tuple[dict[str, float], dict[str, float]]:
        # keep the RAW best per query; round once when emitting
        # (round-then-min could drift the stored time below any actual
        # measurement)
        clear_warm_state()
        times: dict[str, float] = {}
        first_pass: dict[str, float] = {}
        for pass_i in range(n_passes):
            for name, spec in headline.items():
                t0 = time.time()
                force(spec.spark(spark, sf_dir))
                dt = time.time() - t0
                times[name] = min(times.get(name, float("inf")), dt)
                if pass_i == 0:
                    first_pass[name] = dt

        # The two applyInPandas fold queries converge over ~8 reps (Python
        # worker reuse + Arrow path warm-up), not the ~2 the suite passes
        # provide — their 3-pass min samples a shallow warm-up depth and
        # wobbled +/-45% across rounds (r5 verdict; isolated 10-rep evidence
        # in SCALE.md §PnL-fold variance). Extra BACK-TO-BACK reps are
        # correct here, unlike for contention noise: the noise source is
        # warm-up depth, which back-to-back repetition monotonically burns
        # down.
        for name in ("pnl_positions_fold", "pnl_positions_hybrid"):
            if name in headline:
                for _ in range(5):
                    t0 = time.time()
                    force(headline[name].spark(spark, sf_dir))
                    times[name] = min(times[name], time.time() - t0)
        return times, first_pass

    # The control floors were recorded at 32 cores; at any other core
    # count the ratios read high for PARALLELISM reasons, not contention,
    # and the gate would burn 3 full attempts every run (the driver
    # deliberately re-benches at lower core counts to measure scaling).
    # Default the retry to the floors' core count only; an explicit
    # $SPARK_GRAFT_BENCH_ATTEMPTS still overrides either way.
    try:  # resolve exactly like session.py so unset means the real core count
        at_floor_cores = int(os.environ.get(
            "SPARK_GRAFT_CPUS", os.cpu_count() or 4)) == 32
    except ValueError:
        at_floor_cores = False
    raw_attempts = os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS",
                                  "3" if at_floor_cores else "1")
    try:
        max_attempts = max(1, int(raw_attempts))
    except ValueError:
        print(f"warning: SPARK_GRAFT_BENCH_ATTEMPTS={raw_attempts!r} is not "
              f"an int; falling back to 3", file=sys.stderr)
        max_attempts = 3
    times, attempt_controls, first_pass = gated_attempts(
        measure_attempt, max_attempts)

    rounded = {name: round(t, 3) for name, t in times.items()}
    print(json.dumps({
        "metric": "headline_query_wall_time",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": rounded,
        # frozen-set subtotals: compare these across rounds, not `value`
        "core16_subtotal": round(sum(times[q] for q in CORE16), 3),
        "r4_22_subtotal": round(sum(times[q] for q in R4_22), 3),
        "r5_25_subtotal": round(sum(times[q] for q in R5_25), 3),
        "r6_28_subtotal": round(sum(times[q] for q in R6_28), 3),
        "r9_41_subtotal": round(sum(times[q] for q in R9_41), 3),
        # same-run box adjudication: JVM-control min vs its frozen floor.
        # ~1.0 = quiet box, subtotals comparable to their floors; >1.3 =
        # contended box, divide subtotal ratios by this band before
        # reading drift (BASELINE.md "control ratio" rule).
        "control_ratios": {
            q: round(times[q] / floor, 3)
            for q, floor in CONTROL_FLOORS.items()
        },
        # every attempt's controls, in order (len 1 on a quiet box): the
        # retry gate's full audit trail — the official numbers above come
        # from the attempt whose factor is the minimum of these.
        "attempt_controls": attempt_controls,
        # per-query COLD time (r12 verdict task 1): pass 1 of the kept
        # attempt, with every in-process memo and Spark cache cleared at
        # attempt start — the index/artifact build cost the warm min
        # amortizes away. Read `queries` for the per-run steady state and
        # this key for the cold build; both come from the same window.
        "first_pass_sec": {n: round(t, 3)
                           for n, t in (first_pass or {}).items()},
        "sf": sf_from_dir(sf_dir),
    }))


if __name__ == "__main__":
    main()
