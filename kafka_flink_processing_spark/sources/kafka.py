"""Kafka sources (reference S1-S4) and JSON payload parsing (P1-P3).

The reference consumes four JSON topics from earliest offset with no
watermarks (IngestPricesAndTradesJob.java:23-37, ForecastsJob.java:30-36,
PnlAndExposureJob.java:31-45, IngestDayAheadAndRealTimeJob.java:23-37).
Spark equivalent: readStream format("kafka") + from_json over one canonical
schema per topic (schemas.TOPIC_JSON_SCHEMAS — the reference defines each
shape three times; here once).

The spark-sql-kafka connector jar is not bundled with plain pyspark; builds
are gated behind kafka_available() and every downstream operator accepts any
DataFrame with the parsed shape (file/rate/memory sources in tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_processing_spark.schemas import TOPIC_JSON_SCHEMAS


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:
        return False


def kafka_stream(spark: SparkSession, topic: str,
                 bootstrap: str = "localhost:9092",
                 starting_offsets: str = "earliest") -> DataFrame:
    """Raw Kafka stream for one reference topic (value bytes + metadata)."""
    return (spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load())


def parse_topic(raw: DataFrame, topic: str) -> DataFrame:
    """JSON payload -> typed columns (P1-P3). ISO-8601 ts strings parse once
    at this boundary (SURVEY.md §1.4 decision: TimestampType from ingest);
    both the naive-UTC (producer.py:89) and +00:00 (producer_da_rt.py:11-12)
    forms are accepted by to_timestamp under the UTC session timezone."""
    schema = TOPIC_JSON_SCHEMAS[topic]
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r"))
    cols = [F.to_timestamp("r.ts").alias("ts") if f.name == "ts"
            else F.col(f"r.{f.name}").alias(f.name) for f in schema.fields]
    return parsed.select(*cols)


def topic_stream(spark: SparkSession, topic: str,
                 bootstrap: str = "localhost:9092") -> DataFrame:
    return parse_topic(kafka_stream(spark, topic, bootstrap), topic)
