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


RESIZE_SCHEMA = ("doc_id long, target_w int, target_h int, "
                 "src_w int, src_h int, scale double, thumb_hash string")


def resize_features(df: DataFrame, target_w: int = 64, target_h: int = 64,
                    payload_col: str = "payload",
                    id_col: str = "doc_id") -> DataFrame:
    """mapInPandas resize stage (1 row -> 1 row, bytes stay executor-side).

    Real pipeline: decode, resample to (target_w, target_h), re-encode or
    emit pixel tensors. Stubbed resample = keep every k-th byte (k chosen
    from the fake source dims), hash the result — deterministic, and the
    batch shape (binary in, small typed columns out) is the real one.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p)
                src_w, src_h, _, _ = _fake_features(b)
                scale = min(target_w / src_w, target_h / src_h)
                k = max(1, int(1 / scale)) if scale < 1 else 1
                thumb = b[::k]
                rows.append((doc_id, target_w, target_h, src_w, src_h,
                             scale, hashlib.md5(thumb).hexdigest()))
            yield pd.DataFrame(rows, columns=["doc_id", "target_w", "target_h",
                                              "src_w", "src_h", "scale",
                                              "thumb_hash"])

    from kafka_flink_processing_spark.shipping import ensure_shipped
    ensure_shipped(df.sparkSession)
    return df.mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = ("doc_id long, frame_idx int, frame_offset long, "
                "frame_bytes long, frame_hash string")

FRAME_SIZE = 256        # stub "video": fixed-size byte chunks as frames
FRAME_STRIDE = 4        # sample every 4th frame


def sample_frames(df: DataFrame, frame_size: int = FRAME_SIZE,
                  stride: int = FRAME_STRIDE,
                  payload_col: str = "payload",
                  id_col: str = "doc_id") -> DataFrame:
    """mapInPandas frame-sampling stage (1 row -> N rows).

    Real pipeline: demux video, decode every stride-th frame, emit one row
    per sampled frame for downstream embedding. Stub: the payload is cut
    into fixed-size chunks ("frames"); every stride-th chunk yields a row
    with its offset and hash. The fan-out shape (one input batch producing
    a larger output batch) is exactly the real stage's.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(p)
                n_frames = max(1, (len(b) + frame_size - 1) // frame_size)
                for i in range(0, n_frames, stride):
                    chunk = b[i * frame_size:(i + 1) * frame_size]
                    rows.append((doc_id, i, i * frame_size, len(chunk),
                                 hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx",
                                              "frame_offset", "frame_bytes",
                                              "frame_hash"])

    from kafka_flink_processing_spark.shipping import ensure_shipped
    ensure_shipped(df.sparkSession)
    return df.mapInPandas(batches, FRAME_SCHEMA)
