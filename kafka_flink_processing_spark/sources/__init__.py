from kafka_flink_processing_spark.sources.parquet import load_table, load_tables, register_views  # noqa: F401
