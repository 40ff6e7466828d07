"""Bloom-filter join pruning (operators/bloom.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yaetl_spark.operators import bloom_build, bloom_prune, bloom_semi_join
from tests.conftest import table_path


def test_bloom_has_no_false_negatives(spark):
    small = spark.range(0, 100).withColumn("k", F.concat(F.lit("key"), F.col("id")))
    bloom = bloom_build(small, "k", expected_items=100, fpp=0.01)
    kept = bloom_prune(small, "k", bloom)
    assert kept.count() == 100  # every inserted key must survive


def test_bloom_prunes_most_non_members(spark):
    small = spark.range(0, 100).withColumn("k", F.concat(F.lit("in"), F.col("id")))
    big = spark.range(0, 20_000).withColumn("k", F.concat(F.lit("out"), F.col("id")))
    bloom = bloom_build(small, "k", expected_items=100, fpp=0.01)
    survivors = bloom_prune(big, "k", bloom).count()
    # none are members; at fpp=1% expect ~200 survivors of 20k — allow 5x
    assert survivors < 1000


def test_bloom_semi_join_equals_plain_semi_join(spark):
    li = spark.read.parquet(table_path("lineitem")).select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(table_path("orders")).filter(
        F.col("o_totalprice") > 400000
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    want = li.join(orders.distinct(), "l_orderkey", "left_semi")
    for strategy in ("native", "explicit"):
        got = bloom_semi_join(li, orders, "l_orderkey", fpp=0.05,
                              strategy=strategy)
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0


def test_bloom_semi_join_native_has_no_python_in_plan(spark):
    """The default (same-plan) strategy must keep the hot path JVM-side:
    no mapInPandas/Arrow round-trip in the executed plan, just the semi
    join Spark can wrap with its injected runtime bloom filter."""
    li = spark.read.parquet(table_path("lineitem")).select("l_orderkey")
    orders = spark.read.parquet(table_path("orders")).filter(
        F.col("o_totalprice") > 400000
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    native = bloom_semi_join(li, orders, "l_orderkey")
    plan = native._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan and "ArrowEvalPython" not in plan
    explicit = bloom_semi_join(li, orders, "l_orderkey", strategy="explicit")
    eplan = explicit._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in eplan  # the portable path does pay the probe


def test_bloom_semi_join_rejects_unknown_strategy(spark):
    li = spark.range(3).withColumn("k", F.col("id"))
    try:
        bloom_semi_join(li, li, "k", strategy="what")
        raise AssertionError("expected ValueError")
    except ValueError as err:
        assert "native|explicit" in str(err)


def test_bloom_build_shuffles_blocks_not_keys(spark):
    # the build aggregation groups by 64-bit block id: the bitmap block
    # map must stay <= num_bits/64 entries no matter how many keys go in
    small = spark.range(0, 5000).withColumn("k", F.col("id"))
    bloom = bloom_build(small, "k", expected_items=5000, fpp=0.01)
    assert bloom.words.size == bloom.num_bits // 64
    assert bloom.size_bytes < 64 * 1024  # ~6 KB bitmap for 5k keys at 1%


def test_bloom_survives_ansi_session(spark):
    """The driver hands the engine its own SparkSession, which may run
    with ANSI mode on (Spark 4 default) — there int64 overflow THROWS, so
    every hash intermediate must stay in range rather than rely on
    wraparound."""
    _prior_ansi = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        small = spark.range(0, 500).withColumn(
            "k", F.concat(F.lit("key"), F.col("id")))
        bloom = bloom_build(small, "k", expected_items=500, fpp=0.01)
        assert bloom_prune(small, "k", bloom).count() == 500
        big = spark.range(0, 5000).withColumn(
            "k", F.concat(F.lit("other"), F.col("id")))
        assert bloom_prune(big, "k", bloom).count() < 500
    finally:
        spark.conf.set("spark.sql.ansi.enabled", _prior_ansi)
