#!/usr/bin/env python3
"""Decompose a query's wall-clock: Python DSL build time, Catalyst
planning time (analysis+optimization+physical planning, forced via
queryExecution().executedPlan()), and execution time of the noop write;
plus the number of Spark jobs the timed region submits (driver
round-trips inside the query function — collects, first()s, counts —
show up as extra jobs before the final write).

Usage: python scripts/profile_query.py <query> [<query> ...]
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_RUNS (3)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entry_mod  # noqa: E402
from yaetl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: profile_query.py <query> [<query> ...]")
    queries = entry_mod.queries()
    missing = [n for n in names if n not in queries]
    if missing:
        sys.exit(f"unknown queries: {missing}")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    spark = get_spark(
        app_name="yaetl-spark-profile",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    warm = spark.read.parquet(f"{SF_DIR}/region.parquet")
    materialize(warm)
    materialize(
        spark.range(32).mapInPandas(lambda it: it, schema="id long"))
    for t in entry_mod.TABLES:
        materialize(spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(1))
    warm.orderBy("r_regionkey").limit(1).collect()

    tracker = spark.sparkContext.statusTracker()

    out = {}
    for name in names:
        fn = queries[name]
        # cold run (codegen) discarded
        materialize(fn(spark, SF_DIR))
        runs = []
        for _ in range(n_runs):
            jobs0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            t1 = time.monotonic()
            df._jdf.queryExecution().executedPlan()
            t2 = time.monotonic()
            materialize(df)
            t3 = time.monotonic()
            jobs1 = len(tracker.getJobIdsForGroup(None) or [])
            runs.append({
                "build": t1 - t0,
                "plan": t2 - t1,
                "exec": t3 - t2,
                "total": t3 - t0,
                "jobs": jobs1 - jobs0,
            })
        med = {
            k: round(statistics.median(r[k] for r in runs), 3)
            for k in ("build", "plan", "exec", "total")
        }
        med["jobs"] = runs[-1]["jobs"]
        out[name] = med
        print(json.dumps({name: med}), flush=True)
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
