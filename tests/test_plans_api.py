"""Public plan-diagnostics API (yaetl_spark.plans)."""
import pytest
from pyspark.sql import functions as F

from yaetl_spark.plans import assert_scales, plan_summary

from .conftest import table_path


def test_plan_summary_counts(spark):
    li = spark.read.parquet(table_path("lineitem"))
    orders = spark.read.parquet(table_path("orders"))
    df = (li.join(orders, li.l_orderkey == orders.o_orderkey)
          .groupBy("o_orderpriority").count())
    s = plan_summary(df)
    assert s.scans == 2
    assert s.hash_aggregates >= 2
    assert s.broadcast_hash_joins + s.sort_merge_joins >= 1
    assert s.cartesian_products == 0
    assert "shuffles=" in str(s)


def test_assert_scales_rejects_cartesian(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    bad = a.crossJoin(b)
    with pytest.raises(ValueError, match="scale gate"):
        assert_scales(bad, allow_nested_loop=False)
    ok = a.join(b, a.id == b.id2)
    s = assert_scales(ok, max_shuffles=4)
    assert s.cartesian_products == 0


def test_assert_scales_python_and_shuffle_limits(spark):
    df = spark.read.parquet(table_path("region"))
    s = assert_scales(df.select("r_name"), max_shuffles=0)
    assert s.shuffles == 0 and s.python_evals == 0
    shuffly = df.groupBy("r_name").count()
    with pytest.raises(ValueError, match="shuffles"):
        assert_scales(shuffly, max_shuffles=0)


def test_pipeline_scale_gate(spark):
    from yaetl_spark.pipeline import Pipeline
    from yaetl_spark.sources import ParquetSource

    p = (Pipeline(spark)
         .from_(ParquetSource(table_path("lineitem")))
         .transform(lambda df: df.groupBy("l_returnflag").count()))
    rep = p.run(scale_gate={"max_shuffles": 2})
    assert rep["status"] == "clean" and "shuffles=" in rep["plan"]

    q = (Pipeline(spark)
         .from_(ParquetSource(table_path("lineitem")))
         .transform(lambda df: df.groupBy("l_returnflag").count()))
    with pytest.raises(ValueError, match="scale gate"):
        q.run(scale_gate={"max_shuffles": 0})


def test_pipeline_scale_gate_empty_dict_gates(spark):
    """scale_gate={} means 'gate with defaults' (identity check, not
    truthiness) — it must RUN the gate, exactly like True."""
    from yaetl_spark.pipeline import Pipeline
    from yaetl_spark.sources import ParquetSource

    b = spark.range(5).withColumnRenamed("id", "id2")
    p = (Pipeline(spark)
         .from_(ParquetSource(table_path("region")))
         .transform(lambda df: df.limit(1).crossJoin(b.limit(1))))
    with pytest.raises(ValueError, match="scale gate"):
        p.run(scale_gate={})
    # and a clean plan with {} still runs + reports the plan line
    q = (Pipeline(spark)
         .from_(ParquetSource(table_path("region")))
         .transform(lambda df: df.select("r_name")))
    rep = q.run(scale_gate={})
    assert rep["status"] == "clean" and "shuffles=" in rep["plan"]


def test_is_final_plan_flips_after_action(spark):
    """Pre-execution the adaptive plan is the initial (conservative)
    view; after an action the SAME DataFrame reports the AQE-final
    observed plan."""
    from yaetl_spark.plans import is_final_plan

    df = (spark.read.parquet(table_path("lineitem"))
          .groupBy("l_returnflag").count())
    assert not is_final_plan(df)
    df.collect()
    assert is_final_plan(df)
    # plan_summary on the final plan still parses
    s = plan_summary(df)
    assert s.hash_aggregates >= 1
