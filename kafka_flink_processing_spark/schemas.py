"""Canonical schemas — the single definition point.

The reference defines every record shape three times (producer JSON dicts,
per-job Jackson deserializers, Postgres DDL — e.g. prices at
reference producer/producer.py:92, flink-job/.../IngestPricesAndTradesJob.java:78-96,
postgres/init.sql:12-16). Here each entity has exactly one StructType.

Design decision (SURVEY.md §1.4): timestamps are TimestampType from ingest
onward; ISO-8601 strings are parsed once at the source boundary.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Reference stream entities (Kafka topics / Postgres tables)
# --------------------------------------------------------------------------

# topic `prices` — reference producer.py:92, init.sql:12-16
PRICE_TICK = T.StructType([
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("hub", T.StringType(), False),
    T.StructField("price_mwh", T.DoubleType(), False),
])

# topic `trades` — reference producer.py:60-68, init.sql:19-27
TRADE = T.StructType([
    T.StructField("trade_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("account", T.StringType(), False),
    T.StructField("hub", T.StringType(), False),
    T.StructField("side", T.StringType(), False),     # BUY / SELL
    T.StructField("mw", T.IntegerType(), False),
    T.StructField("price_mwh", T.DoubleType(), False),
])

# topic `dayahead_prices` — reference producer_da_rt.py:80-87, init.sql:74-81
DAYAHEAD_PRICE = T.StructType([
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("hub", T.StringType(), False),
    T.StructField("lmp_da", T.DoubleType(), False),
    T.StructField("energy_da", T.DoubleType(), False),
    T.StructField("congestion_da", T.DoubleType(), False),
    T.StructField("loss_da", T.DoubleType(), False),
])

# topic `realtime_prices` — reference producer_da_rt.py:94-101, init.sql:84-92
REALTIME_PRICE = T.StructType([
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("hub", T.StringType(), False),
    T.StructField("lmp_rt", T.DoubleType(), False),
    T.StructField("energy_rt", T.DoubleType(), False),
    T.StructField("congestion_rt", T.DoubleType(), False),
    T.StructField("loss_rt", T.DoubleType(), False),
])

# derived `forecasts` — reference ForecastsJob.java:62, init.sql:43-49
FORECAST = T.StructType([
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("hub", T.StringType(), False),
    T.StructField("sma5", T.DoubleType(), False),
    T.StructField("sma20", T.DoubleType(), False),
    T.StructField("forecast_next", T.DoubleType(), False),
])

# derived `positions_pnl` — reference PnlAndExposureJob.java:84, init.sql:30-40
POSITIONS_PNL = T.StructType([
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("account", T.StringType(), False),
    T.StructField("hub", T.StringType(), False),
    T.StructField("position_mw", T.IntegerType(), False),
    T.StructField("avg_price_mwh", T.DoubleType(), False),
    T.StructField("last_price_mwh", T.DoubleType(), False),
    T.StructField("realized_pnl", T.DoubleType(), False),
    T.StructField("unrealized_pnl", T.DoubleType(), False),
    T.StructField("total_pnl", T.DoubleType(), False),
])

# derived `price_exposure` — reference PnlAndExposureJob.java:85, init.sql:53-61
PRICE_EXPOSURE = T.StructType([
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("account", T.StringType(), False),
    T.StructField("hub", T.StringType(), False),
    T.StructField("position_mw", T.IntegerType(), False),
    T.StructField("last_price_mwh", T.DoubleType(), False),
    T.StructField("pnl01", T.DoubleType(), False),
    T.StructField("notional_usd", T.DoubleType(), False),
])

# Kafka JSON payload schemas keyed by topic, for from_json at the source
# boundary (ts arrives as an ISO-8601 string — producer.py:89).
TOPIC_JSON_SCHEMAS: dict[str, T.StructType] = {}
for _name, _schema in [("prices", PRICE_TICK), ("trades", TRADE),
                       ("dayahead_prices", DAYAHEAD_PRICE),
                       ("realtime_prices", REALTIME_PRICE)]:
    TOPIC_JSON_SCHEMAS[_name] = T.StructType([
        T.StructField(f.name, T.StringType() if f.name == "ts" else f.dataType, True)
        for f in _schema.fields
    ])

# --------------------------------------------------------------------------
# Driver-provided testdata tables (/root/testdata/sf*/ — TESTDATA.md)
# --------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
