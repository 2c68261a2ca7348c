"""Text-format connectors: JSONL and CSV with explicit schemas.

Parquet is the engine's native store; real corpora arrive as JSON-lines
and CSV. Rules that keep these safe at 100 TB, applied here:

- ALWAYS pass an explicit schema: schema inference reads the data twice
  and silently widens types. The canonical StructTypes live in schemas.py
  (one definition — the reference defines each shape three times,
  SURVEY.md §1.2).
- JSONL: one object per line => splittable, parallel scan. Corrupt lines
  land in _corrupt_record (PERMISSIVE) instead of failing the job.
- CSV: quoted/escaped by the writer symmetric with the reader; header off
  (schema is explicit), so files stay splittable.

Lossless round-trip for every driver-table type is asserted in
tests/test_formats.py and oracle-gated via the registered roundtrip
queries (read-back content hash == parquet content hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType) -> DataFrame:
    return (spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
            .json(path))


def write_csv(df: DataFrame, path: str) -> None:
    (df.write.mode("overwrite")
       .option("header", "false")
       .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
       .csv(path))


def read_csv(spark: SparkSession, path: str,
             schema: T.StructType) -> DataFrame:
    return (spark.read.schema(schema)
            .option("header", "false")
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
            .csv(path))
