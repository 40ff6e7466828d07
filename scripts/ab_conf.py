#!/usr/bin/env python3
"""A/B a session-conf variation over a query subset: same warmup and
noop-write timing as bench.py, conf overrides from $SPARK_GRAFT_AB_CONF
(JSON object). Spark session conf is fixed at startup, so run this once
per variant (fresh process) and compare medians.

Usage: SPARK_GRAFT_AB_CONF='{"spark.ui.enabled":"false"}' \
           python scripts/ab_conf.py q1 q2 ...
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_RUNS (5)
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
    queries = entry_mod.queries()
    missing = [n for n in names if n not in queries]
    if missing:
        sys.exit(f"unknown queries: {missing}")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    extra = json.loads(os.environ.get("SPARK_GRAFT_AB_CONF", "{}"))

    spark = get_spark(
        app_name="yaetl-spark-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf=extra,
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

    out = {}
    for name in names:
        fn = queries[name]
        materialize(fn(spark, SF_DIR))  # cold discarded
        runs = []
        for _ in range(n_runs):
            t0 = time.monotonic()
            materialize(fn(spark, SF_DIR))
            runs.append(time.monotonic() - t0)
        out[name] = round(statistics.median(runs), 3)
        print(json.dumps({name: out[name],
                          "spread": [round(min(runs), 3),
                                     round(max(runs), 3)]}), flush=True)
    out["_total"] = round(sum(out.values()), 3)
    out["_conf"] = extra
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
