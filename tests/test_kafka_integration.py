"""End-to-end Kafka smoke (reference S1-S4 + ForecastsJob.java:30-58).

Runs ONLY when both the spark-sql-kafka connector jar is on the classpath
and a broker answers on localhost:9092 — neither ships in this container,
so the suite skips cleanly here; on a real deployment it certifies that
the Kafka ingest path produces byte-identical parsed rows — and therefore
an identical forecast stream — to the file-source stand-ins every other
test drives.

Flow: batch-write fixture JSON to the `prices` topic via Spark's own Kafka
sink -> topic_stream("prices") consumed with an availableNow trigger ->
compare rows against parse_topic over the same JSON lines from a file
source, then run the SMA forecast over both and compare again.
"""

from __future__ import annotations

import json
import os
import socket

import pytest

from pyspark.sql import functions as F

from kafka_flink_processing_spark.sources.kafka import (
    kafka_available,
    parse_topic,
    topic_stream,
)

# overridable so a remote broker can run this test without edits
# (README "Running on a real cluster" section)
BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "localhost:9092")

FIXTURE = [
    {"ts": f"2024-01-01T00:00:{s:02d}", "hub": hub, "price_mwh": px}
    for s, (hub, px) in enumerate(
        [("HUB0", 40.0), ("HUB1", 41.5), ("HUB0", 40.25), ("HUB1", 41.0),
         ("HUB0", 39.75), ("HUB1", 42.0), ("HUB0", 40.5), ("HUB1", 41.25)])
]


def _broker_up() -> bool:
    host, _, port = BOOTSTRAP.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=1):
            return True
    except OSError:
        return False


@pytest.fixture()
def kafka_env(spark):
    if not kafka_available(spark):
        pytest.skip("spark-sql-kafka connector jar not on classpath")
    if not _broker_up():
        pytest.skip("no Kafka broker on localhost:9092")
    return spark


def test_kafka_prices_roundtrip_matches_file_source(kafka_env, tmp_path):
    spark = kafka_env
    topic = f"prices_it_{tmp_path.name}"  # fresh topic per run

    payloads = [json.dumps(m) for m in FIXTURE]
    (spark.createDataFrame([(p,) for p in payloads], "value string")
          .write.format("kafka")
          .option("kafka.bootstrap.servers", BOOTSTRAP)
          .option("topic", topic).save())

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    (parse_topic(topic_stream(spark, topic, BOOTSTRAP)
                 .withColumnRenamed("topic", "_topic"), "prices")
        if False else
     parse_topic(
         spark.readStream.format("kafka")
              .option("kafka.bootstrap.servers", BOOTSTRAP)
              .option("subscribe", topic)
              .option("startingOffsets", "earliest").load(), "prices")) \
        .writeStream.format("parquet") \
        .option("path", out_dir).option("checkpointLocation", ckpt) \
        .trigger(availableNow=True).start().awaitTermination(120)

    got = spark.read.parquet(out_dir)

    # file-source stand-in over the SAME json lines
    jl = tmp_path / "prices.jsonl"
    jl.write_text("\n".join(payloads))
    want = parse_topic(
        spark.read.text(str(jl)).select(F.col("value")), "prices")

    key = lambda r: tuple(sorted(r.asDict().items()))  # noqa: E731
    assert {key(r) for r in got.collect()} == {key(r) for r in want.collect()}

    # forecast parity over both ingest paths (the reference's W1 job)
    from kafka_flink_processing_spark.operators.windows import sma_forecast
    fg = sma_forecast(got, key_col="hub", order_cols=["ts"],
                      value_col="price_mwh")
    fw = sma_forecast(want, key_col="hub", order_cols=["ts"],
                      value_col="price_mwh")
    assert {key(r) for r in fg.collect()} == {key(r) for r in fw.collect()}
