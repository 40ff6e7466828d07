"""JDBC source/sink end-to-end against the Derby jars Spark ships with
(embedded, same-JVM — no network), plus a DBAPI upsert e2e via sqlite3.

The reference's DB surface is PDO extract + batched lookup + row upsert
(``/root/reference/src/Extractors/PdoExtractor.php``,
``src/Laravel/Loaders/DbLoader.php``); here the same surface is
``spark.read.jdbc`` with bound-partitioned parallel reads and batched
writes — the 100 TB design is N executors each pulling its own key range.
"""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F

from yaetl_spark import Pipeline
from yaetl_spark.sinks import JdbcSink
from yaetl_spark.sources import JdbcSource

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


@pytest.fixture(scope="module")
def seeded(spark, derby_url):
    """Write 100 orders-like rows through JdbcSink(append)."""
    df = spark.range(100).select(
        F.col("id").alias("okey"),
        (F.col("id") % 7).alias("bucket"),
        (F.col("id") * 1.5).alias("amount"),
    )
    JdbcSink(
        url=derby_url, table="orders_t",
        properties={"driver": DRIVER},
    ).write(df)
    return derby_url


def test_jdbc_roundtrip(spark, seeded):
    got = JdbcSource(
        seeded, table="orders_t", properties={"driver": DRIVER}
    ).read(spark)
    assert got.count() == 100
    assert {r["OKEY"] if "OKEY" in r else r["okey"]
            for r in got.collect()} == set(range(100))


def test_jdbc_partitioned_read_splits_bounds(spark, seeded):
    """partitionColumn bounds must become N parallel range scans — the
    distributed replacement for the reference's limit/offset pagination
    (ExtractorBatchLimitAbstract)."""
    src = JdbcSource(
        seeded, table="orders_t",
        partition_column="okey", lower_bound=0, upper_bound=100,
        num_partitions=4, properties={"driver": DRIVER},
    )
    df = src.read(spark)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    # partition pruning sanity: each partition holds a disjoint key range
    sizes = df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    assert sum(sizes) == 100 and all(s > 0 for s in sizes)


def test_jdbc_query_pushdown(spark, seeded):
    """query= mode ships the SQL to the database — the PdoExtractor
    free-form-query analogue; the filter runs DB-side, not in Spark."""
    got = JdbcSource(
        seeded,
        # Spark creates the table name unquoted (Derby uppercases it) but
        # quotes column names (case-sensitive lowercase); match both.
        query='SELECT "okey", "amount" FROM orders_t WHERE "bucket" = 3',
        properties={"driver": DRIVER},
    ).read(spark)
    rows = got.collect()
    assert len(rows) == len([i for i in range(100) if i % 7 == 3])
    assert len(rows[0]) == 2


def test_jdbc_filter_pushdown_in_plan(spark, seeded):
    """A Spark-side filter on a JDBC relation must be pushed into the
    generated SQL (PushedFilters on the JDBC scan)."""
    df = JdbcSource(
        seeded, table="orders_t", properties={"driver": DRIVER}
    ).read(spark).filter(F.col("bucket") == 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "bucket" in plan.split(
        "PushedFilters")[1].splitlines()[0].lower()
    assert df.count() == len([i for i in range(100) if i % 7 == 2])


def test_jdbc_upsert_dbapi_e2e(spark, tmp_path):
    """Upsert path end-to-end through a DBAPI factory (sqlite3): second
    load with overlapping keys must update, not duplicate."""
    db = str(tmp_path / "upsert.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
        c.execute("INSERT INTO t VALUES (1, 'old'), (2, 'old')")

    df = spark.createDataFrame(
        [(2, "new"), (3, "new")], "id bigint, v string"
    ).coalesce(1)  # single writer: file-based sqlite has no row locks
    sink = JdbcSink(
        table="t", mode="upsert", key_columns=["id"], dialect="sqlite",
        connection_factory=lambda: sqlite3.connect(db),
    )
    Pipeline(spark).from_(df).to(sink).run()

    with sqlite3.connect(db) as c:
        assert sorted(c.execute("SELECT id, v FROM t").fetchall()) == [
            (1, "old"), (2, "new"), (3, "new")]
