from kafka_flink_processing_spark.streaming.stateful import (  # noqa: F401
    streaming_pnl,
    streaming_sma_forecast,
)
