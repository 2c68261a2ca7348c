from kafka_flink_processing_spark.operators.windows import (  # noqa: F401
    rolling_sma_forecast,
    last_value_carried_forward,
    latest_per_key,
    top_k,
)
