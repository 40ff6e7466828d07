"""Streaming ingestion into an upsert sink — events land as files, each
micro-batch MERGEs into a parquet target keyed on event_id, so replays
never duplicate (the streaming flush() analogue).

Run: ``python examples/stream_upsert.py [sf_dir]``
"""

from __future__ import annotations

import os
import os
import sys

# allow `python examples/<name>.py` straight from a checkout: put the
# repo root (the package's parent) on sys.path before importing it
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
import tempfile

from pyspark.sql import functions as F

from yaetl_spark import get_spark
from yaetl_spark.session import ensure_event_time
from yaetl_spark.sinks import MergeParquetSink
from yaetl_spark.streaming import StreamPipeline


def main(spark, sf_dir: str = "/root/testdata/sf0.001",
         out: str | None = None) -> int:
    work = out or tempfile.mkdtemp(prefix="stream_upsert_")
    src = os.path.join(work, "incoming")
    os.makedirs(src, exist_ok=True)
    os.symlink(f"{sf_dir}/events.parquet",
               os.path.join(src, "events.parquet"))

    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    schema = static.schema
    # 100×-scale pre-flight on the BATCH-equivalent plan: a streaming
    # DataFrame can't be plan-inspected before the query starts, so gate
    # the same transform chain over a static read of the source — the
    # micro-batch plan is this plan with the file scan swapped in
    from yaetl_spark.plans import assert_scales

    assert_scales(
        ensure_event_time(static).filter(F.col("event_type") == "purchase"))
    target = os.path.join(work, "landed")
    q = (
        StreamPipeline(spark)
        .from_files(src, fmt="parquet", schema=schema)
        .transform(ensure_event_time)
        .qualify(F.col("event_type") == "purchase")
        .to_sink(MergeParquetSink(target, keys=["event_id"]),
                 checkpoint=os.path.join(work, "ckpt"))
    )
    q.processAllAvailable()
    q.stop()
    return spark.read.parquet(target).count()


if __name__ == "__main__":
    spark = get_spark(app_name="stream-example", shuffle_partitions=8)
    print("landed rows:", main(spark, *(sys.argv[1:2])))
