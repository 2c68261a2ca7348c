"""Stateful-analytics queries (SURVEY.md §2.3) instantiated on `events`.

`events(event_id, ts, user_id, event_type, value, props)` stands in for the
reference's keyed price stream: user_id ~ hub key, value ~ price_mwh, ts the
event time, event_id the deterministic tie-breaker (the reference has no
watermarks — SURVEY.md §2.6 — so a documented total order replaces its
arrival-order nondeterminism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_processing_spark.operators.windows import (
    last_value_carried_forward,
    latest_per_key,
    rolling_sma_forecast,
    top_k,
)
from kafka_flink_processing_spark.plans.registry import register
from kafka_flink_processing_spark.sources.parquet import load_table


def _lag_chain_avg(n: int) -> str:
    """Trailing-n moving average as an explicit oldest->newest lag chain.

    Reproduces Spark's SlidingWindowFunctionFrame fold order bitwise (DuckDB's
    own AVG OVER a 20-row frame uses a segment tree whose combine order drifts
    from Spark's by ~1e-14 — enough to break the driver's value hash).
    """
    terms = [f"COALESCE(LAG(value, {k}) OVER w, 0.0)" for k in range(n - 1, 0, -1)]
    terms.append("value")
    return f"({' + '.join(terms)}) / CAST(LEAST(ROW_NUMBER() OVER w, {n}) AS DOUBLE)"


# --- W1: rolling SMA(5)/SMA(20) forecast (reference ForecastsJob.java:76-88)
@register(
    "forecast_sma",
    oracle=f"""
    SELECT event_id, ts, user_id, value,
           {_lag_chain_avg(5)}  AS sma5,
           {_lag_chain_avg(20)} AS sma20,
           {_lag_chain_avg(5)}  AS forecast_next
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="W1 rolling SMA(5)/SMA(20) + forecast_next per key; emits every row, "
        "warm-up averages over fewer rows (ForecastsJob.java:86-87).",
    bench=True,
)
def forecast_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    out = rolling_sma_forecast(events, ["user_id"], ["ts", "event_id"], "value")
    return out.select("event_id", "ts", "user_id", "value",
                      "sma5", "sma20", "forecast_next")


# --- W4: last-value carried forward (reference PnlAndExposureJob.java:130,134-136)
@register(
    "last_value_carried_forward",
    oracle="""
    SELECT event_id, ts, event_type, value,
           LAST_VALUE(value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_value
    FROM events
    """,
    doc="W4 running last value per key (ValueState lastPrice analogue).",
)
def lvcf(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    out = last_value_carried_forward(events, ["event_type"], ["ts", "event_id"],
                                     "value")
    return out.select("event_id", "ts", "event_type", "value", "last_value")


# --- read-side: latest snapshot per key (reference README.md:92-96 DISTINCT ON)
@register(
    "latest_per_key",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM (
      SELECT event_id, ts, user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="read-side latest-per-key snapshot (DISTINCT ON, README.md:92-96).",
    bench=True,
)
def latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    out = latest_per_key(events, ["user_id"], ["ts", "event_id"])
    return out.select("event_id", "ts", "user_id", "event_type", "value")


# --- read-side: top-k most recent (reference README.md:86 ORDER BY ts DESC LIMIT 8)
@register(
    "topk_recent",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 8
    """,
    doc="read-side latest-n rows (README.md:86); TakeOrderedAndProject plan.",
)
def topk_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    out = top_k(events, ["ts", "event_id"], 8, desc=True)
    return out.select("event_id", "ts", "user_id", "event_type", "value")
