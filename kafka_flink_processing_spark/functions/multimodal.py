"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (for a real 100 TB corpus): image/audio/video travel as parquet
`binary` columns next to typed metadata (mime, width, height, duration...).
Decode / feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas stages so bytes never round-trip through Python row-at-a-time.
Partition by content hash or source shard; decoded features are columnar
outputs, the raw bytes are dropped as early as possible (column pruning).

The actual codec calls are STUBBED in this container (no PIL/ffmpeg): decode
raises NotImplementedError unless `fake=True`, which derives deterministic
pseudo-features from the bytes — the Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested either
way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = ("doc_id long, mime string, n_bytes long, "
                 "width int, height int, mean_byte double, entropy_bucket int")


def decode_image(payload: bytes):  # pragma: no cover - real codec absent
    """Real decoder entry point. Container has no image libs; see fake path."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use fake_decode_features (deterministic stand-in) or install a codec")


def _fake_features(payload: bytes) -> tuple[int, int, float, int]:
    """Deterministic pseudo-decode: byte-statistics standing in for
    width/height/pixel stats so the pipeline shape is exercised end-to-end."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    mean_byte = (sum(payload) / n) if n else 0.0
    entropy_bucket = len(set(payload)) // 32
    return width, height, mean_byte, entropy_bucket


def decode_features(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "doc_id", fake: bool = True) -> DataFrame:
    """mapInPandas decode stage: binary payload -> typed feature columns.

    Arrow ships the binary column in batches; each batch is decoded in bulk
    and only the (small) feature columns come back — the pattern for real
    image decode at scale.
    """
    if not fake:  # pragma: no cover
        decode_image(b"")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_fake_features(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(feats, columns=["width", "height", "mean_byte",
                                               "entropy_bucket"])
            out.insert(0, "doc_id", pdf[id_col].to_numpy())
            out.insert(1, "mime", "application/octet-stream")
            out.insert(2, "n_bytes", [len(bytes(p)) for p in pdf[payload_col]])
            yield out

    from kafka_flink_processing_spark.shipping import ensure_shipped
    ensure_shipped(df.sparkSession)
    return df.mapInPandas(batches, DECODE_SCHEMA)


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive an opaque binary payload column from text (the testdata has no
    real media; utf-8 bytes stand in as the payload)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))
