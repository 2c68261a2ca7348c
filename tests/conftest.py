from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafka_flink_processing_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests")
    yield spark


SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
