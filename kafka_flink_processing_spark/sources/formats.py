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

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def roundtrip_scratch_dir(tag: str) -> str:
    """Fixed per-tag scratch dir for the registered roundtrip queries.

    A roundtrip query's RESULT reads lazily from its staged files, so the
    staging cannot be deleted before the caller consumes the DataFrame.
    Fixing the path (instead of mkdtemp per call) means every writer here
    — all mode("overwrite") — replaces the previous invocation's staging,
    capping scratch usage at one copy per tag for the session instead of
    leaking a new dir per driver/bench run (r4 advice). The root is
    uid-suffixed so another user's pre-existing /tmp entry can't wedge the
    write with a permission error. Deliberately NOT safe for concurrent
    invocations of the SAME tag in two processes of one user (the second
    overwrite would pull staged files out from under the first's lazy
    read-back) — the round harnesses run phases sequentially; a setup
    that genuinely overlaps them should switch this to mkdtemp + atexit
    cleanup and accept leak-on-SIGKILL.

    Hostile-/tmp hardening (r5 advice): the uid suffix only prevents
    ACCIDENTAL collisions — on a shared box another local user could
    pre-create the root (or plant a symlink) and capture or wedge the
    staged writes. The root is therefore created 0o700 and verified to be
    a non-symlink directory OWNED BY US; on any mismatch we fall back to
    a fresh mkdtemp root for the session (losing only the one-copy-per-tag
    reuse, never correctness).
    """
    uid = os.getuid() if hasattr(os, "getuid") else "na"
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        root = os.path.join(tempfile.gettempdir(), f"kfps_scratch_{uid}")
        try:
            os.makedirs(root, mode=0o700, exist_ok=True)
            st = os.lstat(root)
            import stat as _stat
            if not _stat.S_ISDIR(st.st_mode) or (
                    hasattr(os, "getuid") and st.st_uid != os.getuid()):
                raise OSError("scratch root not an owned directory")
            os.chmod(root, 0o700)  # pre-existing dir: close it down too
        except OSError:
            root = tempfile.mkdtemp(prefix=f"kfps_scratch_{uid}_")
        _SCRATCH_ROOT = root
    d = os.path.join(_SCRATCH_ROOT, tag)
    os.makedirs(d, exist_ok=True)
    return d


_SCRATCH_ROOT: str | None = None


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


def write_corpus(df: DataFrame, path: str,
                 partition_cols: tuple[str, ...] = (),
                 target_rows_per_file: int | None = None,
                 fmt: str = "parquet",
                 writers_per_partition: int = 8) -> None:
    """Write a curated corpus the way a 100 TB pipeline ships one:

    - `partition_cols` (e.g. ("lang", "source")) become directory
      partitions, so downstream reads get partition PRUNING for free —
      a lang='en' scan never opens other languages' files.
    - `target_rows_per_file` caps file size via maxRecordsPerFile: Spark
      splits oversized task outputs WITHOUT an extra shuffle (a
      repartition-to-size would add one). Too-large files hurt read
      parallelism; too-small files melt the namenode — this is the knob.
    - rows are routed by a hash shuffle on (partition_cols, sub-bucket):
      without the shuffle, every task appends a sliver-file to every cell
      (the small-files explosion that kills object stores); with the
      partition columns ALONE, one task writes each whole cell and a
      dominant cell (lang='en' is half the corpus) serializes the write.
      The deterministic sub-bucket — a row hash mod
      `writers_per_partition` — spreads each cell over up to that many
      writers, bounding files per cell while keeping hot cells parallel.
    """
    out = df
    if partition_cols:
        from pyspark.sql import functions as F
        bucket = F.abs(F.hash(*[F.col(c) for c in df.columns])) \
            % writers_per_partition
        out = out.repartition(*[F.col(c) for c in partition_cols], bucket)
    w = out.write.mode("overwrite")
    if target_rows_per_file:
        w = w.option("maxRecordsPerFile", target_rows_per_file)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    getattr(w, fmt)(path)
