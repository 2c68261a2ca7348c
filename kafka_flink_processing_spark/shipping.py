"""Ship this package to Spark executors at runtime.

Python-UDF operators (the PnL fold, dedup/text pandas UDFs) are pickled by
module reference; executor workers must be able to import
`kafka_flink_processing_spark` even when the driving process launched Spark
from an unrelated cwd (the spark-graft driver does exactly that). On a real
cluster you'd pass --py-files; for a session we don't own, addPyFile is the
runtime equivalent: zip the package once and register it on the context.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_shipped(spark: SparkSession) -> None:
    """Idempotently addPyFile a zip of this package to spark's context."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(),
                         f"kafka_flink_processing_spark_{os.getpid()}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if fname.endswith(".py"):
                        full = os.path.join(root, fname)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
