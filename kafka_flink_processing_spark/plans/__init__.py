from kafka_flink_processing_spark.plans.registry import QUERIES, QuerySpec, queries, oracle_sql  # noqa: F401
