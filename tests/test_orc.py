"""ORC source/sink: round-trip, partition pruning, predicate pushdown.

Same columnar contract as parquet (the reference has no columnar formats
at all — ``SURVEY.md`` §2.2's file surface is CSV/lines; ORC and parquet
are the scale-path equivalents)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yaetl_spark import Pipeline
from yaetl_spark.sinks import CollectSink, OrcSink
from yaetl_spark.sources import OrcSource

from .conftest import SF_DIR


def test_orc_roundtrip_through_pipeline(spark, tmp_path):
    out = str(tmp_path / "orders_orc")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    Pipeline(spark).from_(orders).to(OrcSink(out)).run()

    back = OrcSource(out).read(spark)
    assert back.count() == orders.count()
    a = orders.agg(F.sum("o_totalprice").alias("s")).first()["s"]
    b = back.agg(F.sum("o_totalprice").alias("s")).first()["s"]
    assert abs(a - b) < 1e-6


def test_orc_partitioned_write_prunes(spark, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    OrcSink(out, partition_by=["o_orderstatus"]).write(orders)

    df = OrcSource(out).read(spark).filter(F.col("o_orderstatus") == "F")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune directories, not appear as a data filter
    assert "PartitionFilters: [" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters:")[1].splitlines()[0]
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert df.count() == expected


def test_orc_filter_pushdown_reaches_scan(spark, tmp_path):
    out = str(tmp_path / "orders_plain")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    OrcSink(out).write(orders)

    sink = CollectSink()
    (
        Pipeline(spark)
        .from_(OrcSource(out, columns=["o_orderkey", "o_totalprice"]))
        .qualify(F.col("o_totalprice") > 100_000)
        .to(sink)
        .run()
    )
    df = OrcSource(out, columns=["o_orderkey", "o_totalprice"]).read(
        spark).filter(F.col("o_totalprice") > 100_000)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "o_totalprice" in plan.split("PushedFilters:")[1].splitlines()[0]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" not in read_schema  # column pruning
    assert all(r["o_totalprice"] > 100_000 for r in sink.rows)
