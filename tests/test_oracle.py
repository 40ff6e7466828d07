"""Duckdb-oracle tests for every declared query — the local mirror of the
driver's CORRECTNESS gate (run at sf0.001 for speed; the driver runs
sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from .conftest import SF_DIR
from .oracle_harness import compare, duck_con

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, con, name):
    q = QUERIES[name]
    result = compare(q(spark, SF_DIR), con.sql(ORACLES[name]).df())
    assert result["count_match"], f"{name}: row count {result}"
    assert result["schema_match"], f"{name}: schema {result}"
    assert result["value_match"], f"{name}: values {str(result)[:2000]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
