"""Adversarial-corpus fuzzer for the DuckDB oracle gate.

The driver's correctness gate runs on FIXED testdata — clean, ASCII,
never empty — so a Spark/oracle divergence on an edge the generator
never emits (empty text, NULL, whitespace runs, unicode, pathological
duplication) stays latent until a corpus change trips it (the r8 review
found exactly this class in the WAV/PNG/GIF oracles). This tool closes
that hole mechanically: generate seeded adversarial `documents` corpora,
swap them under the same sf-dir layout (other tables symlinked from a
real SF so every query remains runnable), and run the documents-only
registered queries through the SAME compare as tools/oracle_check.py.

Corpora:
  edge_ascii   hand-built edge rows: empty text, NULL text, single char,
               whitespace runs, very long words, repeated tokens,
               1-token docs, punctuation-only, digit-only
  random_ascii seeded random printable-ASCII docs (words of mixed len)
  zipf_dup     Zipf vocabulary + exact/near duplicate docs (dedup stress)
  unicode      mixed-script words — run only for queries whose oracle is
               declared TOTAL over any text (the codec/feature queries
               hardened in r8); the byte-arithmetic stub family is
               explicitly ASCII-scoped in its registration docs.

r8b extension — adversarial EVENTS corpora for the market/temporal/PnL
family (the reference's core): tie-heavy timestamps (total-order
tie-break stress), sparse corpora with entire event types absent (empty
trades -> PnL over nothing; empty windows), constant-value runs (zero
variance -> corr/beta/VR denominators), negative prices (real in power
markets), and a 95%-one-hub skew. Same swap-one-table staging, same
compare; streaming drains run their full availableNow cycle per corpus.

Usage: python tools/oracle_fuzz.py [--seed N] [--corpus name ...]
                                   [query ...]
Exit 1 on any mismatch. Each failure prints the oracle_check diff.
"""

from __future__ import annotations

import argparse
import os
import random
import shutil
import string
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from oracle_check import compare, duck_connection  # noqa: E402

from kafka_flink_processing_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.001"

# Documents-only queries (auto-derived set, pinned here so a fuzz run is
# reproducible; tools/oracle_fuzz.py --list prints the live derivation)
DOC_QUERIES = [
    "adaptive_quality_filter", "audio_zcr_features", "bigram_lift_top",
    "bm25_rank", "bpe_vocab_merges", "cluster_aware_folds",
    "corpus_entropy_by_source", "corpus_partitioned_roundtrip",
    "curation_funnel", "curation_pipeline", "curriculum_stages",
    "data_mix_summary", "decontaminate_bloom", "decontaminate_ngram",
    "decontamination_n_sweep", "dedup_clusters", "dedup_containment_pairs",
    "dedup_exact", "dedup_fuzzy_corpus", "dedup_incremental",
    "dedup_incremental_minhash", "dedup_keep_best", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_rate_by_source", "dedup_simhash",
    "doc_fingerprint", "dup_span_redact", "dup_span_stats",
    "feature_hashing", "jsonl_roundtrip", "lang_confusion_matrix",
    "lang_id_quality", "lsh_band_stats", "lsh_threshold_sweep",
    "minhash_jaccard_accuracy", "mix_temperature_sample",
    "multimodal_decode_features", "multimodal_frame_sample",
    "multimodal_gif_decode", "multimodal_metadata", "multimodal_png_decode",
    "multimodal_resize", "ngram_freq_top", "ngram_novelty_by_source",
    "packing_efficiency", "per_source_cap", "pii_redaction",
    "repetition_stats", "sequence_packing", "source_overlap_matrix",
    "split_leakage_audit", "stratified_sample", "text_stats",
    "tfidf_top_terms", "token_drift_chi2", "token_length_histogram",
    "token_rarity_score", "train_test_split", "vocab_top_tokens",
    "vocab_zipf_slope", "weighted_sample_wor",
]

# Oracles declared TOTAL over any text (r8 codec/feature hardening) —
# the only ones the `unicode` corpus exercises. Everything else's oracle
# is ASCII-scoped by its registration doc (byte-arithmetic stubs, Java-
# vs-RE2 regex class differences on non-ASCII).
TOTAL_TEXT = [
    "multimodal_png_decode", "multimodal_gif_decode", "audio_zcr_features",
    "feature_hashing", "curriculum_stages", "token_length_histogram",
]

LANGS = ["en", "de", "fr", "es"]
SOURCES = [f"src{i}" for i in range(4)]

# events-derived queries (market / temporal / PnL / streaming drains)
EVENT_QUERIES = [
    "amihud_illiquidity", "asof_join_events", "bollinger_bands",
    "da_rt_asof_basis", "da_rt_asof_tolerance", "da_rt_daily_corr",
    "distinct_count_by", "event_hourly_anomaly",
    "event_rate_mad_outliers", "event_transition_matrix", "ewma_price",
    "exact_quantiles_value", "forecast_backtest_sma", "forecast_sma",
    "funnel_time_to_convert", "hourly_load_profile",
    "hub_price_corr_matrix", "hub_spread_hourly", "json_props_stats",
    "kyle_lambda_price_impact", "last_value_carried_forward",
    "latest_per_key", "lead_lag_hub_beta", "max_drawdown",
    "median_value_by_type", "ohlc_bars", "pnl_exposure",
    "pnl_positions_fold", "pnl_positions_hybrid", "pnl_snapshot",
    "range_join_attribution", "realized_variance_daily",
    "retention_cohorts", "roll_spread_estimator", "rolling_median_price",
    "running_position", "scalar_battery", "scd2_price_intervals",
    "session_funnel", "session_window_stats", "skew_salted_distinct",
    "sliding_window_stats", "streaming_forecast_sma",
    "streaming_ohlc_bars", "streaming_session_stats",
    "streaming_slippage_join", "streaming_tumbling_stats",
    "time_range_moving_avg", "time_rollup_multigrain", "topk_recent",
    "trade_flow_net", "tumbling_window_stats", "variance_ratio",
    "vwap_execution_quality", "vwap_hub_day", "window_ntile_battery",
    "window_rank_lag", "winsorized_stats",
]

EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def _event_rows(rows: list[tuple]) -> list[tuple]:
    """rows: (event_id, ts_micros_offset, user_id, event_type, value).
    props mirrors the real corpus shape ({'k': int})."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    return [(eid, base + dt.timedelta(microseconds=us), uid, et, val,
             '{"k": %d}' % (eid % 100))
            for eid, us, uid, et, val in rows]


def events_ties(rng: random.Random) -> list[tuple]:
    """Many events share IDENTICAL timestamps: every window/asof/fold
    result depends on the documented (ts, id) total-order tie-break."""
    rows = []
    eid = 0
    for day in range(3):
        for slot in range(40):
            us = (day * 24 * 3600 + slot * 600) * 1_000_000
            for _ in range(rng.randint(1, 6)):   # 1-6 events, same ts
                rows.append((eid, us, rng.randrange(8),
                             rng.choice(EVENT_TYPES),
                             round(rng.uniform(1, 300), 2)))
                eid += 1
    return _event_rows(rows)


def events_sparse(rng: random.Random) -> list[tuple]:
    """Entire event types absent (no purchase/signup -> EMPTY trades ->
    PnL/VWAP over nothing), single user, a 1-event day."""
    rows = [(0, 0, 0, "view", 100.0),
            (1, 3600 * 1_000_000, 0, "view", 101.0),
            (2, (49 * 3600) * 1_000_000, 0, "click", 99.5)]
    return _event_rows(rows)


def events_extreme(rng: random.Random) -> list[tuple]:
    """Constant-value runs (zero variance -> corr/beta/VR/Roll
    denominators), NEGATIVE prices (real in power markets), values at
    the dsum-documented bounds."""
    rows = []
    eid = 0
    for slot in range(120):
        us = slot * 900 * 1_000_000
        # hub 0 (user 0/4): constant price -> zero variance everywhere
        rows.append((eid, us, 0, rng.choice(EVENT_TYPES), 50.0)); eid += 1
        # hub 1: negative prices
        rows.append((eid, us, 1, rng.choice(EVENT_TYPES),
                     round(rng.uniform(-80, -1), 2))); eid += 1
        # hub 2: extremes within the scaled-int64 budget
        rows.append((eid, us, 2, rng.choice(EVENT_TYPES),
                     rng.choice([0.0, 0.01, 999999.99]))); eid += 1
    return _event_rows(rows)


def events_skew(rng: random.Random) -> list[tuple]:
    """95% of events on one hub — the hot-key shape."""
    rows = []
    for eid in range(400):
        uid = 0 if rng.random() < 0.95 else rng.randrange(1, 8)
        rows.append((eid, eid * 137 * 1_000_000, uid,
                     rng.choice(EVENT_TYPES),
                     round(rng.uniform(1, 300), 2)))
    return _event_rows(rows)


def _doc_rows(texts: list[str | None]) -> list[tuple]:
    return [(i, t, LANGS[i % len(LANGS)], SOURCES[i % len(SOURCES)],
             len(t) if t is not None else None)
            for i, t in enumerate(texts)]


def corpus_edge_ascii(rng: random.Random) -> list[tuple]:
    word = "".join(rng.choices(string.ascii_lowercase, k=5))
    texts: list[str | None] = [
        "", None, "a", "  ", "x " * 200, "   leading and  double  spaces",
        "trailing spaces   ", word, (word + " ") * 50, "a" * 5000,
        "123 456 789", "!!! ??? ... ,,,", "one two", "solo",
        "the the the the the the", "\t tab \t separated",
        word * 400,                       # one 2000-char token
        " ".join(f"w{i}" for i in range(500)),
    ]
    # a few normal docs so group-by queries have real groups
    for _ in range(20):
        texts.append(" ".join(
            "".join(rng.choices(string.ascii_lowercase, k=rng.randint(1, 8)))
            for _ in range(rng.randint(3, 40))))
    return _doc_rows(texts)


def corpus_random_ascii(rng: random.Random) -> list[tuple]:
    printable = string.ascii_letters + string.digits + ".,;:!?'-()"
    texts = [" ".join("".join(rng.choices(printable, k=rng.randint(1, 12)))
                      for _ in range(rng.randint(1, 60)))
             for _ in range(80)]
    return _doc_rows(texts)


def corpus_zipf_dup(rng: random.Random) -> list[tuple]:
    vocab = ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 9)))
             for _ in range(60)]
    weights = [1.0 / (i + 1) for i in range(len(vocab))]

    def doc():
        return " ".join(rng.choices(vocab, weights=weights,
                                    k=rng.randint(5, 60)))

    texts = [doc() for _ in range(40)]
    texts += texts[:10]                   # exact duplicates
    for t in texts[:10]:                  # near duplicates
        toks = t.split(" ")
        toks[rng.randrange(len(toks))] = "CHANGED"
        texts.append(" ".join(toks))
    return _doc_rows(texts)


def corpus_unicode(rng: random.Random) -> list[tuple]:
    pools = ["héllo wörld über naïve", "日本語 テキスト 処理",
             "привет мир данные", "χαίρετε κόσμος", "emoji 🙂 test",
             "mixed ascii ünïcode 日本"]
    texts: list[str | None] = ["", None]
    for _ in range(30):
        base = rng.choice(pools).split(" ")
        texts.append(" ".join(rng.choices(base, k=rng.randint(1, 25))))
    return _doc_rows(texts)


CORPORA = {
    "edge_ascii": corpus_edge_ascii,
    "random_ascii": corpus_random_ascii,
    "zipf_dup": corpus_zipf_dup,
    "unicode": corpus_unicode,
}

EVENT_CORPORA = {
    "events_ties": events_ties,
    "events_sparse": events_sparse,
    "events_extreme": events_extreme,
    "events_skew": events_skew,
}
CORPORA.update(EVENT_CORPORA)


def stage_sf_dir(spark, rows: list[tuple], workdir: str,
                 table: str = "documents") -> str:
    sf = os.path.join(workdir, "sf_fuzz")
    os.makedirs(sf, exist_ok=True)
    for t in os.listdir(BASE_SF):
        if t != f"{table}.parquet":
            os.symlink(os.path.join(BASE_SF, t), os.path.join(sf, t))
    schema = ("doc_id long, text string, lang string, source string, "
              "n_chars long") if table == "documents" else \
             ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    docs = spark.createDataFrame(rows, schema)
    # the real testdata ships single parquet FILES, not directories —
    # match that layout so both engines read it the same way
    tmp_out = os.path.join(workdir, "docs_out")
    docs.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    part = next(f for f in os.listdir(tmp_out)
                if f.startswith("part-") and f.endswith(".parquet"))
    shutil.move(os.path.join(tmp_out, part),
                os.path.join(sf, f"{table}.parquet"))
    return sf


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--corpus", action="append", choices=sorted(CORPORA))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    corpora = args.corpus or list(CORPORA)
    spark = get_spark("oracle_fuzz")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    failures: list[str] = []
    for cname in corpora:
        rng = random.Random(args.seed)
        rows = CORPORA[cname](rng)
        table = "events" if cname in EVENT_CORPORA else "documents"
        if args.queries:
            names = args.queries
        elif cname == "unicode":
            names = TOTAL_TEXT
        elif table == "events":
            names = EVENT_QUERIES
        else:
            names = DOC_QUERIES
        work = tempfile.mkdtemp(prefix=f"kfps_fuzz_{cname}_")
        try:
            sf = stage_sf_dir(spark, rows, work, table=table)
            con = duck_connection(sf)
            for name in names:
                if name not in oracles:
                    continue
                try:
                    sdf = qs[name](spark, sf).toPandas()
                    ddf = con.execute(oracles[name]).fetchdf()
                    ok = compare(name, sdf, ddf)
                except Exception as e:  # noqa: BLE001 — report, keep going
                    print(f"[{cname}] {name}: ERROR {type(e).__name__}: "
                          f"{str(e).splitlines()[0][:200]}")
                    ok = False
                if ok:
                    n_pass += 1
                else:
                    print(f"[{cname}] {name}: FAIL")
                    failures.append(f"{cname}/{name}")
                    n_fail += 1
            con.close()
        finally:
            shutil.rmtree(work, ignore_errors=True)
        print(f"[{cname}] done", flush=True)
    print(f"\nfuzz pass={n_pass} fail={n_fail}"
          + (f" failures: {failures}" if failures else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
