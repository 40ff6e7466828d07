#!/usr/bin/env python3
"""Isolated per-query re-run: times ONLY the queries named on the
command line (n warm runs each, default 7, after a discarded cold
run) in a dedicated Spark session with nothing co-scheduled — the
BENCH_NOTES.md discipline for adjudicating whether a full-suite
regression is ambient contention or a real plan shift.

Usage: python scripts/bench_isolated.py ann_ivf embedding_lsh ...
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_RUNS (default 7)
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
        sys.exit("usage: bench_isolated.py <query> [<query> ...]")
    queries = entry_mod.queries()
    missing = [n for n in names if n not in queries]
    if missing:
        sys.exit(f"unknown queries: {missing}")
    n_warm = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "7"))

    spark = get_spark(
        app_name="yaetl-spark-bench-isolated",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # same session warm-up as bench.py so figures are comparable
    warm = spark.read.parquet(f"{SF_DIR}/region.parquet")
    materialize(warm)
    materialize(
        spark.range(32).mapInPandas(lambda it: it, schema="id long"))
    for t in entry_mod.TABLES:
        materialize(spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(1))
    warm.orderBy("r_regionkey").limit(1).collect()

    import re

    def plan_sig(df) -> dict:
        """Executed-plan fingerprint (AQE-final): join strategies,
        exchange counts, scan count — enough to tell a plan flip from
        ambient noise without reading the full plan dump.

        The timed noop write runs through its OWN QueryExecution, so
        the df's executedPlan() would still be the un-finalized
        AdaptiveSparkPlan (isFinalPlan=false — the static pre-AQE
        plan, blind to runtime join-strategy flips). Finalize the
        df's own QueryExecution first with a JVM-side toRdd().count()
        — full execution, no rows shipped to Python — OUTSIDE the
        timed region, then fingerprint the '== Final Plan ==' section.
        AQE decisions are deterministic given the same data + session
        confs, so this capture run sees the same final plan as the
        timed write."""
        jqe = df._jdf.queryExecution()
        jqe.toRdd().count()  # finalize AQE on df's own QueryExecution
        plan = jqe.executedPlan().toString()
        assert "isFinalPlan=false" not in plan, (
            "plan capture ran but AQE did not finalize — fingerprint "
            "would be the static plan; refusing to record it")
        final = plan.split("== Initial Plan ==")[0]
        return {
            "joins": re.findall(
                r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)", final),
            "exchanges": final.count("Exchange hashpartitioning"),
            "single_partition": final.count("Exchange SinglePartition"),
            "scans": final.count("FileScan parquet"),
        }

    out = {}
    for name in names:
        fn = queries[name]
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        materialize(df)
        cold = round(time.monotonic() - t0, 3)
        sig_cold = plan_sig(df)
        runs = []
        sig_flip = None
        for _ in range(n_warm):
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            materialize(df)
            runs.append(time.monotonic() - t0)
            sig = plan_sig(df)
            if sig != sig_cold and sig_flip is None:
                sig_flip = sig  # first warm run whose plan diverged
        out[name] = {
            "median": round(statistics.median(runs), 3),
            "spread": [round(min(runs), 3), round(max(runs), 3)],
            "cold": cold,
            "n": n_warm,
            "plan": sig_cold,
            "plan_flip": sig_flip,  # null = stable across all runs
        }
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
