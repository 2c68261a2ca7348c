"""kafka_flink_processing_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference energy-trading streaming PoC (garyamorris/kafka-flink-processing,
read-only snapshot at /root/reference) on idiomatic Spark:

- batch relational core: DataFrame/SQL over parquet (scans, projections,
  filters, joins, aggregations, window functions, sorts, set ops)
- stateful analytics: rolling SMA forecasts (reference ForecastsJob.java:76-88),
  last-value-carried-forward, per-account position/PnL netting fold
  (reference PnlAndExposureJob.java:106-144)
- streaming layer: Structured Streaming sources/sinks mirroring the
  reference's Kafka->Flink->Postgres pipeline shape
- large-scale data-pipeline extensions: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), embedding similarity search, text analysis, multimodal
  column plumbing

Everything is declared via the DataFrame/SQL API so Catalyst/Tungsten pick
the physical strategy; Python only enters via Arrow-batched pandas UDFs for
the genuinely non-relational folds.
"""

__version__ = "0.1.0"

from kafka_flink_processing_spark.session import get_spark  # noqa: F401
