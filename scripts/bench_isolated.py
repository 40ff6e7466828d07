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

    # ---- plan capture: listen to the TIMED noop write itself -------
    # The write runs through its own QueryExecution, so fingerprinting
    # the df's executedPlan() would either see the un-finalized
    # AdaptiveSparkPlan (isFinalPlan=false — blind to runtime
    # join-strategy flips) or require a full re-execution per run
    # (the pre-r16 toRdd().count() approach, which doubled bench
    # wall-clock). A QueryExecutionListener instead hands us the
    # write's OWN QueryExecution after it completes — same
    # executedPlan().toString() format as before (fingerprints stay
    # comparable with PLANS.md pins), zero extra executions. The
    # listener bus is async, so captures are awaited OUTSIDE the
    # timed region and matched on the NoopWrite wrapper (queries that
    # internally collect — guard counts, codebook literals — emit
    # their own onSuccess events first).
    from pyspark.java_gateway import ensure_callback_server_started

    ensure_callback_server_started(spark.sparkContext._gateway)
    noop_plans: list[str] = []

    class _PlanListener:
        def onSuccess(self, funcName, qe, durationNs):
            plan = qe.executedPlan().toString()
            if "NoopWrite" in plan.split("\n", 1)[0]:
                noop_plans.append(plan)

        def onFailure(self, funcName, qe, exception):
            pass

        class Java:
            implements = ["org.apache.spark.sql.util.QueryExecutionListener"]

    spark._jsparkSession.listenerManager().register(_PlanListener())

    def plan_sig(base: int) -> dict:
        """Executed-plan fingerprint (AQE-final) of the noop write
        issued after ``base`` captures existed: join strategies,
        exchange counts, scan count — enough to tell a plan flip from
        ambient noise without reading the full plan dump. Snapshot
        ``base = len(noop_plans)`` BEFORE materialize() (the listener
        bus is async — the capture may land before or after the write
        call returns), then call this right after."""
        deadline = time.monotonic() + 30
        while len(noop_plans) <= base:
            if time.monotonic() > deadline:
                raise AssertionError(
                    "QueryExecutionListener never delivered the noop "
                    "write's plan — cannot fingerprint this run")
            time.sleep(0.02)
        plan = noop_plans[-1]
        assert "isFinalPlan=false" not in plan, (
            "captured plan is not AQE-final — fingerprint would be "
            "the static plan; refusing to record it")
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
        base = len(noop_plans)
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        materialize(df)
        cold = round(time.monotonic() - t0, 3)
        sig_cold = plan_sig(base)
        runs = []
        sig_flip = None
        for _ in range(n_warm):
            base = len(noop_plans)
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            materialize(df)
            runs.append(time.monotonic() - t0)
            sig = plan_sig(base)
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
