"""Structured Streaming tests: the grammar runs as a real stream (memory
sink) and windowed results match the batch equivalents."""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from yaetl_spark.session import ensure_event_time
from yaetl_spark.streaming import (
    StreamPipeline,
    dedup_within_watermark,
    sliding_window_agg,
    tumbling_window_agg,
)


def _wait_done(query, timeout=60):
    query.processAllAvailable()
    query.stop()


def _stage_dir(tmp_path, src_file: str) -> str:
    """Streaming file sources need a *directory*; stage the parquet file
    into one via symlink."""
    import os

    d = tmp_path / "stream_src"
    d.mkdir(exist_ok=True)
    link = d / os.path.basename(src_file)
    if not link.exists():
        os.symlink(src_file, link)
    return str(d)


def test_stream_file_source_counts(spark, sf_dir, tmp_path):  # noqa: C901
    """Stream the events parquet through a filter + memory sink; row count
    matches the batch read."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    schema = batch.schema
    expected = batch.filter(F.col("event_type") == "click").count()

    q = (
        StreamPipeline(spark)
        .from_files(_stage_dir(tmp_path, f"{sf_dir}/events.parquet"),
                    fmt="parquet", schema=schema)
        .qualify(F.col("event_type") == "click")
        .to_memory("clicks_test")
    )
    _wait_done(q)
    got = spark.sql("SELECT count(*) c FROM clicks_test").first()["c"]
    assert got == expected


def test_streaming_tumbling_matches_batch(spark, sf_dir, tmp_path):
    """The same tumbling_window_agg code runs in batch and stream modes and
    produces identical window aggregates (batch-verifiability invariant)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    to_ts = ensure_event_time
    batch = tumbling_window_agg(
        to_ts(raw), "ts", "1 hour", F.count(F.lit(1)).alias("n")
    )
    expected = sorted(
        (r["window_start"], r["n"]) for r in batch.collect()
    )

    stream = (
        StreamPipeline(spark)
        .from_files(_stage_dir(tmp_path, f"{sf_dir}/events.parquet"),
                    fmt="parquet", schema=raw.schema)
        .transform(to_ts)
        .transform(
            lambda df: tumbling_window_agg(
                df, "ts", "1 hour", F.count(F.lit(1)).alias("n"),
                watermark="2 hours",
            )
        )
        .to_memory("tumble_test", output_mode="complete")
    )
    _wait_done(stream)
    got = sorted(
        (r["window_start"], r["n"])
        for r in spark.sql("SELECT * FROM tumble_test").collect()
    )
    assert got == expected


def test_foreach_batch_sink(spark, tmp_path):
    """foreachBatch = per-epoch flush (the streaming loader analogue)."""
    epochs = []
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
    )
    q = (
        StreamPipeline(spark)
        .from_stream(src)
        .qualify(F.col("value") % 2 == 0)
        .to_foreach_batch(
            lambda df, epoch: epochs.append((epoch, df.count())),
            checkpoint=str(tmp_path / "ckpt"),
        )
    )
    deadline = time.time() + 30
    while time.time() < deadline and not epochs:
        time.sleep(0.5)
    q.stop()
    assert epochs, "no epochs committed within 30s"


def test_dedup_within_watermark_batch_fallback(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:00:01")],
        "k int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = dedup_within_watermark(df, ["k"], "ts", "1 minute")
    assert out.count() == 1


def test_dedup_within_watermark_streaming(spark, sf_dir, tmp_path):
    """Streaming dedup: a second file containing exact duplicates of every
    event must produce zero additional output rows (state keyed on
    (user_id, ts), bounded by the watermark)."""
    import shutil
    import time as _t

    from pyspark.sql import functions as F

    from yaetl_spark.streaming import dedup_within_watermark

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = ensure_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
    ev = ev.limit(500).coalesce(1)
    src = str(tmp_path / "dedup_src")
    ev.write.parquet(src)  # file 1: originals
    first = sorted(__import__("glob").glob(f"{src}/part-*"))[0]
    shutil.copy(first, f"{src}/part-dup.parquet")  # file 2: exact duplicates

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    deduped = dedup_within_watermark(
        stream, ["user_id", "ts"], "ts", "3650 days")

    out: list = []
    q = (deduped.writeStream
         .foreachBatch(lambda df, _e: out.extend(df.collect()))
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    try:
        deadline = _t.monotonic() + 120
        while _t.monotonic() < deadline:
            q.processAllAvailable()
            if not q.status["isDataAvailable"]:
                break
    finally:
        q.stop()

    expect = ev.select("user_id", "ts").distinct().count()
    assert len(out) == expect


def test_stream_dedup_query_matches_stream(spark, sf_dir, tmp_path):
    """Batch/stream parity for the stream_dedup driver query: the same
    redelivered feed (every third event arrives twice) replayed as a
    REAL multi-trigger stream through dropDuplicatesWithinWatermark
    must aggregate to exactly the batch query's per-type totals. The
    stream leg uses a replay-spanning watermark because file replay
    compresses the feed's months into two triggers; the query's
    production horizon (1 hour) is redelivery-scale."""
    import time as _t

    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    want = sorted(
        map(tuple, entry_mod.q_stream_dedup(spark, sf).collect()))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = ensure_event_time(
        spark.read.parquet(f"{sf}/events.parquet")
    ).select("event_id", "ts", "event_type", "value")
    redelivered = ev.unionByName(
        ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == 0))
    src = str(tmp_path / "feed")
    redelivered.repartition(2).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    deduped = dedup_within_watermark(
        stream, ["event_id"], "ts", "3650 days")

    out: list = []
    q = (deduped.writeStream
         .foreachBatch(lambda df, _e: out.extend(df.collect()))
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    try:
        deadline = _t.monotonic() + 120
        while _t.monotonic() < deadline:
            q.processAllAvailable()
            if not q.status["isDataAvailable"]:
                break
    finally:
        q.stop()

    got = sorted(map(tuple, (
        spark.createDataFrame(out, schema)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double").alias("sum_value"),
        )
        .collect()
    )))
    assert got == want


def _probe_feed(spark):
    """Index corpus (ids 1-3) + incoming feed (ids 4-8, with known
    near/exact dups of the index side) + event times."""
    import datetime as dt

    idx_rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "completely different text about spark engines"),
    ]
    feed_rows = [
        (4, "the quick brown fox jumps over the lazy dog"),   # dup of 1
        (5, "the quick brown fox jumps over the lazy cat"),   # near 1
        (6, "pack my box with five dozen liquor jugs"),        # dup of 2
        (7, "unrelated text mentioning nothing in common"),
        (8, "the quick brown fox jumps over the lazy dog"),    # dup of 1
    ]
    t0 = dt.datetime(2024, 1, 1)
    feed = [(i, t, t0 + dt.timedelta(minutes=i)) for i, t in feed_rows]
    idx_df = spark.createDataFrame(idx_rows, "doc_id bigint, text string")
    feed_df = spark.createDataFrame(
        feed, "doc_id bigint, text string, ts timestamp")
    return idx_df, feed_df


def test_stream_minhash_probe_batch_matches_minhash_probe(spark):
    """The batch path is row-for-row minhash_probe (the family's
    batch-verifiability invariant): same pairs, same sims, threshold
    and same-id exclusion behave identically."""
    from yaetl_spark.operators import minhash_index, minhash_probe
    from yaetl_spark.streaming import stream_minhash_probe

    idx_df, feed_df = _probe_feed(spark)
    kw = dict(num_hashes=32, bands=16, shingle_size=2)
    index = minhash_index(idx_df, **kw)
    got = sorted(map(tuple, stream_minhash_probe(
        feed_df, index, jaccard_threshold=0.3, **kw).collect()))
    want = sorted(map(tuple, minhash_probe(
        index, feed_df.drop("ts"), jaccard_threshold=0.3,
        **kw).collect()))
    assert got == want and got
    pairs = {(p, i) for p, i, _ in got}
    assert {(4, 1), (6, 2), (8, 1)} <= pairs  # exact dups always hit
    assert not any(p == 7 for p, _ in pairs)  # unrelated doc matches none


def test_stream_minhash_probe_multi_trigger_collapses_redelivery(
        spark, tmp_path):
    """The same probe runs as a REAL multi-trigger stream against the
    static index: a redelivered feed (one doc arrives twice, landing
    in different triggers) emits every matched pair EXACTLY ONCE
    within the watermark horizon, and the emitted set equals the
    batch path on the deduplicated feed."""
    import time as _t

    from yaetl_spark.operators import minhash_index
    from yaetl_spark.streaming import stream_minhash_probe

    idx_df, feed_df = _probe_feed(spark)
    kw = dict(num_hashes=32, bands=16, shingle_size=2)
    index = minhash_index(idx_df, **kw)
    redelivered = feed_df.unionByName(feed_df.filter("doc_id = 4"))
    want = sorted(map(tuple, stream_minhash_probe(
        feed_df, index, jaccard_threshold=0.3, **kw).collect()))

    src = str(tmp_path / "probe_feed")
    redelivered.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out: list = []
    q = (stream_minhash_probe(stream, index, watermark="3650 days",
                              jaccard_threshold=0.3, **kw)
         .writeStream
         .foreachBatch(lambda df, _e: out.extend(df.collect()))
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "probe_ck"))
         .start())
    try:
        deadline = _t.monotonic() + 120
        while _t.monotonic() < deadline:
            q.processAllAvailable()
            if not q.status["isDataAvailable"]:
                break
    finally:
        q.stop()
    got = sorted(map(tuple, out))
    assert got == want
    assert len({(p, i) for p, i, _ in got}) == len(got)  # no re-emits


def test_stateful_sessionize_batch_fallback(spark):
    from yaetl_spark.streaming import stateful_sessionize

    df = spark.createDataFrame(
        [("u1", 0), ("u1", 30), ("u1", 3600), ("u2", 10)],
        "user_id string, sec long",
    ).withColumn("ts", F.timestamp_seconds(F.col("sec"))).drop("sec")
    out = {
        (r.user_id, r.window_start, r.window_end, r.n_events)
        for r in stateful_sessionize(df, "user_id", "ts", 60).collect()
    }
    assert out == {("u1", 0, 90, 2), ("u1", 3600, 3660, 1), ("u2", 10, 70, 1)}


def test_stateful_sessionize_streaming_multi_trigger(spark, tmp_path):
    """Event-time-timeout sessionization across real triggers
    (maxFilesPerTrigger=1). File 1 opens sessions for u1/u2; file 2's
    late-gap u1 event closes u1's first session in-line, and the advanced
    watermark fires u2's event-time timeout. u1's second session stays
    open (no emission) — exactly the append-mode contract."""
    import time as _t

    from yaetl_spark.streaming import stateful_sessionize

    src = str(tmp_path / "sess_src")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "user_id string, sec long"
    ).withColumn("ts", F.timestamp_seconds(F.col("sec"))).drop("sec")
    # base is well past epoch 0: the initial watermark is 0 ms and the
    # late-row filter drops ts <= watermark, so an epoch-0 event vanishes
    B = 100_000
    mk([("u1", B + 0), ("u1", B + 30), ("u2", B + 10)]).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    mk([("u1", B + 3600)]).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    sessions = stateful_sessionize(
        stream, "user_id", "ts", 60, watermark="0 seconds")

    out: list = []
    q = (sessions.writeStream
         .foreachBatch(lambda df, _e: out.extend(df.collect()))
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sess_ck"))
         .start())
    try:
        deadline = _t.monotonic() + 120
        while _t.monotonic() < deadline:
            q.processAllAvailable()
            if not q.status["isDataAvailable"]:
                break
    finally:
        q.stop()

    got = {(r.user_id, r.window_start, r.window_end, r.n_events)
           for r in out}
    assert got == {("u1", B + 0, B + 90, 2), ("u2", B + 10, B + 70, 1)}


def test_interval_join_stream_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream interval join (click→purchase attribution): the same
    interval_join code runs both sides as file streams and matches the
    batch join pair-for-pair. The two-sided time bound lets Spark expire
    join state — without it a stream-stream join is unbounded."""
    from yaetl_spark.streaming import interval_join

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    to_ts = ensure_event_time

    def sides(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        purchases = df.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purch_id"),
            F.col("user_id").alias("purch_user"),
            F.col("ts").alias("purch_ts"),
        )
        return clicks, purchases

    expected = sorted(
        (r["click_id"], r["purch_id"])
        for r in interval_join(
            *sides(to_ts(raw)), "click_user", "purch_user",
            "click_ts", "purch_ts", 1, 1800,
        ).collect()
    )
    assert expected, "fixture should produce at least one join pair"

    src_dir = _stage_dir(tmp_path, f"{sf_dir}/events.parquet")
    stream = to_ts(
        spark.readStream.schema(raw.schema).parquet(src_dir))
    s_clicks, s_purch = sides(stream)
    q = (
        interval_join(
            s_clicks, s_purch, "click_user", "purch_user",
            "click_ts", "purch_ts", 1, 1800, watermark="1 hour",
        )
        .select("click_id", "purch_id")
        .writeStream.format("memory").queryName("ij_test")
        .outputMode("append").start()
    )
    _wait_done(q)
    got = sorted(
        (r["click_id"], r["purch_id"])
        for r in spark.sql("SELECT * FROM ij_test").collect()
    )
    assert got == expected


def test_interval_join_rejects_column_overlap(spark):
    import pytest as _pytest

    from yaetl_spark.streaming import interval_join

    df = spark.range(3).select(
        F.col("id"), F.current_timestamp().alias("ts"))
    with _pytest.raises(ValueError, match="overlap"):
        interval_join(df, df, "id", "id", "ts", "ts")


def test_session_window_streaming_merges_across_triggers(spark, tmp_path):
    """Built-in session_window under real triggers (maxFilesPerTrigger=1):
    file 2 extends a session opened in file 1's trigger (state merge), and
    its far-future event advances the watermark so both finalized sessions
    emit in append mode. Session end = last event + gap."""
    import time as _t

    from yaetl_spark.streaming import session_window_agg

    src = str(tmp_path / "sw_src")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "user_id string, sec long"
    ).withColumn("ts", F.timestamp_seconds(F.col("sec"))).drop("sec")
    B = 100_000
    mk([("u1", B + 0), ("u1", B + 30), ("u2", B + 10)]).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    # B+45 merges into u1's open session; B+3600 pushes the watermark
    mk([("u1", B + 45), ("u1", B + 3600)]).coalesce(1) \
        .write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    sessions = session_window_agg(
        stream, "ts", "1 minute", F.count(F.lit(1)).alias("n"),
        extra_keys=["user_id"], watermark="0 seconds",
    )

    out: list = []
    q = (sessions.writeStream
         .foreachBatch(lambda df, _e: out.extend(df.collect()))
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sw_ck"))
         .start())
    try:
        deadline = _t.monotonic() + 120
        while _t.monotonic() < deadline:
            q.processAllAvailable()
            if not q.status["isDataAvailable"]:
                break
    finally:
        q.stop()

    got = {(r.user_id, r.window_start, r.window_end, r.n) for r in out}
    assert got == {("u1", B + 0, B + 105, 3), ("u2", B + 10, B + 70, 1)}


def test_stream_to_files_exactly_once(spark, sf_dir, tmp_path):
    """File-sink path: stream events → filtered parquet directory with
    checkpoint. Restarting the query over the same source must NOT
    duplicate rows (checkpoint + sink log idempotence)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    expected = batch.filter(F.col("event_type") == "view").count()
    out = str(tmp_path / "landed")

    def run_once():
        q = (
            StreamPipeline(spark)
            .from_files(_stage_dir(tmp_path, f"{sf_dir}/events.parquet"),
                        fmt="parquet", schema=batch.schema)
            .qualify(F.col("event_type") == 'view')
            .to_files(out, checkpoint=str(tmp_path / "ck"))
        )
        _wait_done(q)

    run_once()
    run_once()  # replay: checkpoint says nothing new; no duplicates
    got = spark.read.parquet(out).count()
    assert got == expected


def test_stream_static_join_enrichment(spark, sf_dir, tmp_path):
    """Stream-static join: the streaming side enriches against a batch
    dimension (broadcast per micro-batch, no stream state). Counts match
    the batch join."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"),
         ("purchase", "revenue")],
        "event_type string, category string",
    )
    expected = (events.join(dim, "event_type")
                .groupBy("category").count()
                .collect())
    expected = {(r["category"], r["count"]) for r in expected}

    q = (
        StreamPipeline(spark)
        .from_files(_stage_dir(tmp_path, f"{sf_dir}/events.parquet"),
                    fmt="parquet", schema=events.schema)
        .transform(lambda df: df.join(dim, "event_type"))
        .transform(lambda df: df.groupBy("category").count())
        .to_memory("enriched_test", output_mode="complete")
    )
    _wait_done(q)
    got = {(r["category"], r["count"])
           for r in spark.sql("SELECT * FROM enriched_test").collect()}
    assert got == expected


def test_interval_join_state_expiry_under_triggers(spark, tmp_path):
    """Stream-stream interval_join under real triggers (maxFilesPerTrigger
    =1): on-time pairs match the batch oracle, and a purchase arriving
    AFTER the watermark passed its window is dropped — the two-sided bound
    + watermark expired the click's join state (the contract that keeps
    stream-stream state finite)."""
    import os
    import time as _t

    from yaetl_spark.streaming import interval_join

    clicks_dir = str(tmp_path / "ij_clicks")
    purch_dir = str(tmp_path / "ij_purch")
    mk = lambda rows, sch: spark.createDataFrame(rows, sch).withColumn(  # noqa: E731
        "sec", F.col("sec").cast("long"))
    c_sch, p_sch = "click_id string, cu string, sec long", \
        "purch_id string, pu string, sec long"

    def stage(d, batches, sch):
        t0 = _t.time()
        for i, rows in enumerate(batches):
            sub = f"{d}/f{i}"
            mk(rows, sch).withColumn(
                "ts", F.timestamp_seconds(F.col("sec"))).drop("sec") \
                .coalesce(1).write.mode("overwrite").parquet(sub)
            for f in os.listdir(sub):  # force pickup order = batch order
                os.utime(os.path.join(sub, f), (t0 + i, t0 + i))

    B = 1_000_000
    stage(clicks_dir, [
        [("c1", "u1", B + 0)],
        [("c2", "u1", B + 5000)],
    ], c_sch)
    stage(purch_dir, [
        [("p_ontime", "u1", B + 30)],
        [("p_far", "u1", B + 5020)],
        # buffer batch: state eviction is end-of-batch, so the late row
        # must arrive after the watermark-advancing batch has committed
        [("p_dummy", "u9", B + 5040)],
        [("p_late", "u1", B + 40)],  # in c1's window but watermark-expired
    ], p_sch)

    def src(d):
        sch = spark.read.parquet(f"{d}/f0").schema
        return (spark.readStream.schema(sch)
                .option("maxFilesPerTrigger", 1).parquet(f"{d}/f*"))

    joined = interval_join(
        src(clicks_dir).withColumnRenamed("ts", "cts"),
        src(purch_dir).withColumnRenamed("ts", "pts"),
        "cu", "pu", "cts", "pts",
        0, 60, watermark="10 seconds",
    ).select("click_id", "purch_id")

    out: list = []
    q = (joined.writeStream
         .foreachBatch(lambda df, _e: out.extend(df.collect()))
         .outputMode("append")
         # real periodic trigger (not the default ASAP mode): state
         # eviction happens at micro-batch boundaries the clock drives
         .trigger(processingTime="500 milliseconds")
         .option("checkpointLocation", str(tmp_path / "ij_ck"))
         .start())
    try:
        deadline = _t.monotonic() + 120
        while _t.monotonic() < deadline:
            q.processAllAvailable()
            if not q.status["isDataAvailable"]:
                break
    finally:
        q.stop()

    got = {(r.click_id, r.purch_id) for r in out}
    # batch oracle over the ON-TIME rows: exactly the streamed result
    assert got == {("c1", "p_ontime"), ("c2", "p_far")}
    # the join state observably dropped the watermark-expired purchase
    dropped = sum(
        (p.get("stateOperators") or [{}])[0]
        .get("numRowsDroppedByWatermark", 0) or 0
        for p in q.recentProgress)
    assert dropped >= 1
    # batch over ALL rows would also pair the late purchase — streaming
    # correctly dropped it after state expiry
    batch_all = interval_join(
        spark.read.parquet(f"{clicks_dir}/f*")
        .withColumnRenamed("ts", "cts"),
        spark.read.parquet(f"{purch_dir}/f*")
        .withColumnRenamed("ts", "pts"),
        "cu", "pu", "cts", "pts", 0, 60,
    )
    assert ("c1", "p_late") in {
        (r.click_id, r.purch_id) for r in batch_all.collect()}


def test_stream_to_batch_sink_bridge(spark, sf_dir, tmp_path):
    """to_sink drives a batch Sink per micro-batch: streaming the events
    file through a MergeParquetSink upsert must land exactly the batch
    rows (idempotent keyed writes = effective exactly-once)."""
    from yaetl_spark.sinks import MergeParquetSink

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    expected = batch.filter(F.col("event_type") == "purchase").count()
    out = str(tmp_path / "merged")

    sink = MergeParquetSink(out, keys=["event_id"])
    q = (
        StreamPipeline(spark)
        .from_files(_stage_dir(tmp_path, f"{sf_dir}/events.parquet"),
                    fmt="parquet", schema=batch.schema)
        .qualify(F.col("event_type") == "purchase")
        .to_sink(sink, checkpoint=str(tmp_path / "ck2"))
    )
    _wait_done(q)
    assert spark.read.parquet(out).count() == expected


def test_stream_to_sink_rejects_overwrite_sinks(spark):
    from yaetl_spark.sinks import CsvSink

    import pytest as _pytest

    p = StreamPipeline(spark).from_stream(
        spark.readStream.format("rate").load())
    with _pytest.raises(ValueError, match="LAST micro-batch"):
        p.to_sink(CsvSink("/tmp/nope.csv"))


def _psi_python(ref_pts, stream_vals, bins, lap=0.5):
    """Pure-Python replica of stream_psi's arithmetic (the operator's
    pin): exact integer cut targets, strict-> binning, Laplace
    smoothing, per-term HALF_UP round to 9 (Spark's F.round mode, NOT
    Python's banker's round), decimal-exact bin-ordered sum."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    pts = {}
    for v, w in ref_pts:
        pts[float(v)] = pts.get(float(v), 0) + int(w)
    n_ref = sum(pts.values())
    vals = sorted(pts)
    cum, cum_at = 0, []
    for v in vals:
        cum += pts[v]
        cum_at.append((v, cum))
    cuts = [next(v for v, c in cum_at if c >= (n_ref * i + bins - 1) // bins)
            for i in range(1, bins)]
    ma = [0] * (bins + 1)
    for v in vals:
        ma[1 + sum(1 for e in cuts if v > e)] += pts[v]
    mb = [0] * (bins + 1)
    for v in stream_vals:
        mb[1 + sum(1 for e in cuts if float(v) > e)] += 1
    n = len(stream_vals)
    tot = Decimal(0)
    for i in range(1, bins + 1):
        pa = (ma[i] + lap) / (n_ref + lap * bins)
        pb = (mb[i] + lap) / (n + lap * bins)
        t = (pa - pb) * math.log(pa / pb)
        tot += Decimal(repr(t)).quantize(
            Decimal(1).scaleb(-9), rounding=ROUND_HALF_UP)
    return float(tot)


def test_stream_psi_batch_values_and_validation(spark):
    """Batch semantics pin: per-window psi equals the pure-Python
    replica bit-for-bit; an identically-distributed window scores 0.0,
    a shifted window crosses the 0.25 action line; NULL values drop;
    bad bins/laplace/empty-reference raise."""
    import datetime as dt

    import pytest as _pytest

    from yaetl_spark.streaming import stream_psi

    ref_pts = [(float(v), 1) for v in range(100)]
    ref = spark.createDataFrame(ref_pts, "value double, weight bigint")
    d1, d2 = dt.datetime(2024, 1, 1, 3), dt.datetime(2024, 1, 2, 3)
    day1 = [float(v) for v in range(100)]          # same distribution
    day2 = [float(v) + 200.0 for v in range(100)]  # hard shift
    rows = ([(d1, v) for v in day1] + [(d2, v) for v in day2]
            + [(d1, None)])                        # NULL drops
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {r["window_start"]: r for r in
           stream_psi(df, ref, "value", "ts", "1 day", bins=10).collect()}
    assert len(got) == 2
    day1_key, day2_key = sorted(got)
    assert got[day1_key]["n_events"] == 100       # the NULL dropped
    assert got[day1_key]["psi"] == _psi_python(ref_pts, day1, 10) == 0.0
    assert got[day2_key]["psi"] == _psi_python(ref_pts, day2, 10)
    assert got[day2_key]["psi"] > 0.25
    # determinism under repartitioning
    again = {r["window_start"]: r["psi"] for r in
             stream_psi(df.repartition(7), ref, "value", "ts", "1 day",
                        bins=10).collect()}
    assert again == {k: v["psi"] for k, v in got.items()}
    with _pytest.raises(ValueError, match="bins"):
        stream_psi(df, ref, "value", "ts", bins=1)
    with _pytest.raises(ValueError, match="laplace"):
        stream_psi(df, ref, "value", "ts", laplace=0.0)
    with _pytest.raises(ValueError, match="empty"):
        stream_psi(df, ref.filter("weight < 0"), "value", "ts")
    with _pytest.raises(ValueError, match="negative"):
        stream_psi(df, spark.createDataFrame(
            [(1.0, -2)], "value double, weight bigint"), "value", "ts")


def test_stream_psi_guards_raw_corpus_and_decimal_overflow(spark):
    """The misuse guards: a reference wider than max_reference_rows
    raises an actionable error BEFORE the driver collect (passing a
    raw corpus where a persisted summary belongs must never OOM the
    driver), the guard is opt-out-able for callers who already
    counted, and a bins/round_to pair whose decimal fold would pass
    precision 38 (silent scale loss) raises up front."""
    import datetime as dt

    import pytest as _pytest

    from yaetl_spark.streaming import stream_psi

    ref = spark.createDataFrame(
        [(float(v), 1) for v in range(50)], "value double, weight bigint")
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 3), float(v)) for v in range(50)],
        "ts timestamp, value double")
    with _pytest.raises(ValueError, match="persisted summary"):
        stream_psi(df, ref, "value", "ts", max_reference_rows=10)
    # opt-out (caller already knows the size) and a generous bound
    # both proceed to a normal score
    assert stream_psi(df, ref, "value", "ts",
                      max_reference_rows=None).count() == 1
    assert stream_psi(df, ref, "value", "ts",
                      max_reference_rows=50).count() == 1
    # decimal-fold ceiling: 11 + round_to + bins - 1 > 38 rejected
    with _pytest.raises(ValueError, match="decimal fold"):
        stream_psi(df, ref, "value", "ts", bins=20, round_to=9)
    with _pytest.raises(ValueError, match="decimal fold"):
        stream_psi(df, ref, "value", "ts", bins=25, round_to=6)
    # the widest VALID folds still run: bins = 28 - round_to
    assert stream_psi(df, ref, "value", "ts", bins=19,
                      round_to=9).count() == 1
    assert stream_psi(df, ref, "value", "ts", bins=22,
                      round_to=6).count() == 1


def test_stream_psi_stream_matches_batch(spark, sf_dir, tmp_path):
    """The same stream_psi call runs as a REAL multi-trigger stream
    (complete mode, memory sink) and lands exactly the batch windows —
    the family's batch-verifiability invariant, so the eventual driver
    query's oracle covers the streaming path too."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from yaetl_spark.streaming import stream_psi

    raw = ensure_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
    ref = (raw.filter(F.col("event_type") == "purchase")
           .select(F.col("value").cast("double").alias("value"),
                   F.lit(1).cast("bigint").alias("weight"))
           .filter(F.col("value").isNotNull()))
    expected = sorted(
        map(tuple, stream_psi(raw, ref, "value", "ts", "7 days",
                              bins=8).collect()))
    q = (
        StreamPipeline(spark)
        .from_files(_stage_dir(tmp_path, f"{sf_dir}/events.parquet"),
                    fmt="parquet", schema=spark.read.parquet(
                        f"{sf_dir}/events.parquet").schema)
        .transform(ensure_event_time)
        .transform(lambda df: stream_psi(df, ref, "value", "ts",
                                         "7 days", bins=8))
        .to_memory("stream_psi_test", output_mode="complete")
    )
    _wait_done(q)
    got = sorted(map(tuple,
                     spark.sql("SELECT * FROM stream_psi_test").collect()))
    assert got == expected and got


def test_stream_psi_cross_engine_parity(spark, sf_dir):
    """DuckDB replays the whole stream_psi batch path bit-for-bit on
    the real events table: equidepth reference summary → tie-collapsed
    digest (exact integer cut targets, strict-> binning, Laplace) →
    per-7-day-window masses → HALF_UP 9-decimal terms summed as
    DECIMAL — the oracle blueprint for the query's eventual driver
    declaration (r16)."""
    import duckdb

    from yaetl_spark.operators import equidepth_summary
    from yaetl_spark.streaming import stream_psi

    B, BINS, WIN = 32, 8, 7 * 86400
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = ensure_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
    ref = equidepth_summary(
        ev.filter(F.col("event_type") == "purchase").select(
            F.col("value").cast("double").alias("v"),
            F.lit("all").alias("s")),
        "v", "s", buckets=B)
    got = sorted(map(tuple, stream_psi(
        ev, ref, "value", "ts", "7 days", bins=BINS).collect()))
    assert len(got) >= 4  # several non-vacuous windows

    cuts_cols = ",\n                   ".join(
        f"MIN(CASE WHEN c >= (na * {i} + {BINS - 1}) // {BINS} "
        f"THEN v END) AS e{i}" for i in range(1, BINS))
    bin_of = lambda v: " + ".join(  # noqa: E731
        f"(CASE WHEN {v} > c.e{i} THEN 1 ELSE 0 END)"
        for i in range(1, BINS))
    sql = f"""
        WITH ref_ranked AS (
            SELECT CAST(value AS DOUBLE) AS v,
                   ROW_NUMBER() OVER (ORDER BY CAST(value AS DOUBLE)) AS rn,
                   COUNT(*) OVER () AS n
            FROM events
            WHERE event_type = 'purchase' AND value IS NOT NULL),
        ref_summ AS (
            SELECT (rn * {B} + n - 1) // n AS b, max_by(v, rn) AS value,
                   COUNT(*) AS weight
            FROM ref_ranked GROUP BY (rn * {B} + n - 1) // n),
        ref_pts AS (
            SELECT value AS v, SUM(weight) AS w
            FROM ref_summ GROUP BY value),
        ref_cum AS (
            SELECT v, w,
                   SUM(w) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS c,
                   SUM(w) OVER () AS na
            FROM ref_pts),
        cuts AS (
            SELECT MAX(na) AS na,
                   {cuts_cols}
            FROM ref_cum),
        rmass AS (
            SELECT 1 + {bin_of('p.v')} AS bin, SUM(p.w) AS ma
            FROM ref_pts p CROSS JOIN cuts c
            GROUP BY 1),
        ev_binned AS (
            SELECT (CAST(epoch(e.ts) AS BIGINT) // {WIN}) * {WIN} AS ws,
                   1 + {bin_of('CAST(e.value AS DOUBLE)')} AS bin
            FROM events e CROSS JOIN cuts c
            WHERE e.value IS NOT NULL),
        win AS (SELECT ws, COUNT(*) AS n FROM ev_binned GROUP BY ws),
        wmass AS (SELECT ws, bin, COUNT(*) AS mb
                  FROM ev_binned GROUP BY ws, bin),
        terms AS (
            SELECT s.ws, s.n,
                   (COALESCE(rm.ma, 0) + 0.5)
                       / (c.na + 0.5 * {BINS}) AS pa,
                   (COALESCE(wm.mb, 0) + 0.5)
                       / (s.n + 0.5 * {BINS}) AS pb
            FROM (SELECT w.ws, w.n, sp.bin
                  FROM win w CROSS JOIN generate_series(1, {BINS})
                       sp(bin)) s
            LEFT JOIN wmass wm ON wm.ws = s.ws AND wm.bin = s.bin
            LEFT JOIN rmass rm ON rm.bin = s.bin
            CROSS JOIN cuts c)
        SELECT ws AS window_start, ws + {WIN} AS window_end,
               MAX(n) AS n_events,
               CAST(SUM(CAST(ROUND((pa - pb) * LN(pa / pb), 9)
                             AS DECIMAL(38,9))) AS DOUBLE) AS psi
        FROM terms GROUP BY ws
    """
    con = duckdb.connect()
    try:
        con.execute("CREATE VIEW events AS SELECT * FROM "
                    f"'{sf_dir}/events.parquet'")
        want = sorted(map(tuple, con.execute(sql).fetchall()))
    finally:
        con.close()
    assert got == want


def test_stream_psi_property_random_distributions(spark):
    """Hypothesis fuzz: arbitrary weighted references (ties, skew,
    singleton) scored against arbitrary streams equal the
    decimal-exact Python replica bit-for-bit, for several bin counts —
    the digest arithmetic has no distribution-shaped blind spots."""
    import datetime as dt

    from hypothesis import given, settings, strategies as st

    from yaetl_spark.streaming import stream_psi

    @settings(max_examples=4, deadline=None)
    @given(
        st.lists(st.tuples(st.integers(min_value=-5, max_value=5),
                           st.integers(min_value=1, max_value=9)),
                 min_size=1, max_size=12),
        st.lists(st.integers(min_value=-8, max_value=8),
                 min_size=1, max_size=20),
        st.integers(min_value=2, max_value=6),
    )
    def run(ref_pts, stream_vals, bins):
        ref_rows = [(float(v), w) for v, w in ref_pts]
        ref = spark.createDataFrame(ref_rows,
                                    "value double, weight bigint")
        t0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(t0, float(v)) for v in stream_vals],
            "ts timestamp, value double")
        got = stream_psi(df, ref, "value", "ts", "1 day",
                         bins=bins).first()
        want = _psi_python(ref_rows, [float(v) for v in stream_vals],
                           bins)
        assert got["n_events"] == len(stream_vals)
        assert got["psi"] == want, (ref_pts, stream_vals, bins)

    run()
