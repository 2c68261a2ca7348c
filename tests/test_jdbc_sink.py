"""Live end-to-end test of the K1 JDBC batch sink against embedded Derby.

The reference batch-inserts into Postgres over JDBC (500 rows / 200 ms /
3 retries — IngestPricesAndTradesJob.java:42-73). The build sandbox has
no Postgres, but Spark bundles Apache Derby (its Hive-metastore store)
whose EmbeddedDriver is a real in-process JDBC database: these tests
drive `streaming/sinks.py::jdbc_batch_sink` through an actual streaming
query into an actual SQL table and read the rows back over JDBC —
exercising everything the Postgres path would (DataFrameWriter.jdbc
batching, concurrent per-partition inserts, append-on-replay
at-least-once semantics) except the url/driver string.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_flink_processing_spark.sources.generators import gen_prices
from kafka_flink_processing_spark.streaming.sinks import jdbc_batch_sink

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DERBY_DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture()
def derby(spark):
    if not _derby_available(spark):
        pytest.skip("Derby EmbeddedDriver not on the Spark classpath")
    db = tempfile.mkdtemp(prefix="kfps_derby_") + "/db"
    return f"jdbc:derby:{db};create=true", {"driver": DERBY_DRIVER}


def _stage_stream(spark, df, work):
    src = f"{work}/src"
    df.coalesce(1).write.mode("overwrite").parquet(src)
    return spark.readStream.schema(df.schema).parquet(src)


def test_jdbc_sink_roundtrip_exact_rows(spark, derby):
    url, props = derby
    prices = gen_prices(spark, n_rounds=300, seed=7).cache()
    n = prices.count()
    assert n == 1200  # 4 hubs x 300 rounds
    with tempfile.TemporaryDirectory(prefix="kfps_jdbc_") as work:
        stream = _stage_stream(spark, prices, work)
        q = jdbc_batch_sink(stream, url, "prices", props,
                            f"{work}/ckpt", available_now=True)
        q.awaitTermination(120)
    back = spark.read.jdbc(url, "prices", properties=props)
    assert back.count() == n
    # value-exact: every (ts, hub, price) row survives the SQL round-trip
    key = [F.col("ts").cast("double"), "hub", "price_mwh"]
    assert prices.select(*key).exceptAll(back.select(*key)).count() == 0
    assert back.select(*key).exceptAll(prices.select(*key)).count() == 0


def test_jdbc_sink_appends_on_replay(spark, derby):
    # the reference's plain INSERTs are at-least-once: a replayed epoch
    # duplicates rows rather than failing — the sink must APPEND, and a
    # second drain of the same source (fresh checkpoint = replay) doubles
    # the table
    url, props = derby
    prices = gen_prices(spark, n_rounds=50, seed=11).cache()
    n = prices.count()
    for ckpt_tag in ("ckpt_a", "ckpt_b"):
        with tempfile.TemporaryDirectory(prefix="kfps_jdbc_") as work:
            stream = _stage_stream(spark, prices, work)
            q = jdbc_batch_sink(stream, url, "trades_replay", props,
                                f"{work}/{ckpt_tag}", available_now=True)
            q.awaitTermination(120)
    back = spark.read.jdbc(url, "trades_replay", properties=props)
    assert back.count() == 2 * n
