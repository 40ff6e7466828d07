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


def test_pii_scan_null_text_parity(spark, tmp_path):
    """Adversarial NULL-text fixture for q_pii_scan: the corpus shipped
    with zero NULL texts, which hid an engine/oracle divergence (ADVICE
    r7: F.concat null-propagates, the oracle coalesces). Both sides must
    coalesce at the SAME point — inside the substring — so planted PII
    survives NULL text identically. This test plants NULLs so the case
    can never go latent again."""
    import duckdb

    src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    import pyspark.sql.functions as F

    nulled = src.withColumn(
        "text",
        F.when(F.col("doc_id") % 2 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("text")),
    )
    d = str(tmp_path / "nullsf")
    nulled.coalesce(1).write.parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    res = compare(
        QUERIES["pii_scan"](spark, d),
        con.sql(ORACLES["pii_scan"]).df(),
    )
    con.close()
    assert res["count_match"] and res["schema_match"], res
    assert res["value_match"], str(res)[:2000]
    # and the engine really does count planted PII on NULL-text docs
    got = QUERIES["pii_scan"](spark, d)
    n = got.filter("doc_id % 2 = 0 AND doc_id % 3 <> 0 AND n_email = 1").count()
    assert n > 0


def test_equi_width_clamp_parity_on_rounding_min(spark, tmp_path):
    """Adversarial fixture for the r7 equi_width clamp: a true min that
    ROUNDS UP at round_to=6 makes (x - _mn) negative for the min row, so
    an unclamped floor() emits bin -1. Both the engine operator and the
    driver's DuckDB oracle carry the clamp — this runs them on the same
    fixture so neither side can silently drop it."""
    import duckdb

    # min 1.0000009 rounds UP to 1.000001; max 9.0000001 rounds DOWN to 9
    vals = [1.0000009, 9.0000001] + [1.0 + i for i in range(2, 8)]
    spark.createDataFrame(
        [(float(v),) for v in vals], "o_totalprice double"
    ).coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    con.sql(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
    )
    res = compare(
        QUERIES["equi_width"](spark, str(tmp_path)),
        con.sql(ORACLES["equi_width"]).df(),
    )
    con.close()
    assert res["count_match"] and res["schema_match"], res
    assert res["value_match"], str(res)[:2000]
    rows = QUERIES["equi_width"](spark, str(tmp_path)).collect()
    bins = {r["bin"] for r in rows}
    assert min(bins) >= 0 and max(bins) <= 7, bins  # clamped to 0..nbins-1
    assert sum(r["n"] for r in rows) == len(vals)
