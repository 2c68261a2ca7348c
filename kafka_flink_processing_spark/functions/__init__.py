from kafka_flink_processing_spark.functions.exact import dsum, davg  # noqa: F401
