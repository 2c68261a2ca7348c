"""SURVEY.md §5.2 item 1 — DuckDB-oracle equivalence for every registered
query, run at sf0.001 for speed (the driver gate runs sf0.01; tools/
oracle_check.py replicates that exactly)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.oracle_check import compare, duck_connection

pytestmark = pytest.mark.slow  # integration tier (see pytest.ini)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_DIR)


def _cases():
    oracles = entrymod.oracle_sql()
    return [name for name in entrymod.queries() if name in oracles]


@pytest.mark.parametrize("name", _cases())
def test_query_matches_oracle(spark, duck, name):
    spark_pdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert compare(name, spark_pdf, duck_pdf), f"{name} diverged from oracle"
