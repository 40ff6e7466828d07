#!/usr/bin/env python3
"""Per-stage timing probe for semantic_dedup — the r11 verdict's watch
item: the query swung >=2x across r9/r10/r11 full-suite benches, each
time adjudicated as host noise. This decomposes the isolated run so the
variance has an owner instead of a fourth adjudication.

Stages (each timed over n warm runs in ONE dedicated session):
  fit    — kmeans_fit(k=8, iters=2, cache=True): driver-side Lloyd's
           loop = 1 init collect + per-iteration (assign job + k*dim
           sums collect) + cache materialization. Many SMALL sequential
           jobs — wall time is dominated by job-scheduling latency, not
           data work.
  pairs  — the cell-bucketed pair join + anti join with PRE-FIT
           centroids (the actual O(rows^2/cells) data work).
  full   — q_semantic_dedup end to end (fit + pairs).
Also prints the cell populations (skew) so a degenerate-cell
explanation can be confirmed or excluded.

Usage: python scripts/probe_semantic_dedup.py
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
N = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "7"))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn) -> list[float]:
    fn()  # discarded cold run
    runs = []
    for _ in range(N):
        t0 = time.monotonic()
        fn()
        runs.append(time.monotonic() - t0)
    return runs


def main() -> None:
    import pyspark.sql.functions as F

    from yaetl_spark.operators import (build_ivf_index, kmeans_fit,
                                       semantic_dedup)

    spark = get_spark(app_name="probe-semantic-dedup",
                      master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    # read through the SAME scan-spread helper as q_semantic_dedup —
    # a raw single-file read has too few input partitions and times
    # the pair stage on a fraction of the cores (first probe run
    # mismeasured pairs 4.4 s vs 2.6 s full for exactly this reason)
    emb = entry_mod._t(spark, SF_DIR, "embeddings")
    materialize(emb)  # warm scan

    init = [0, 1, 2, 3, 4, 5, 6, 7]
    fit_runs = timed(lambda: kmeans_fit(
        emb, k=8, iters=2, init_ids=init, cache=True))

    cents = kmeans_fit(emb, k=8, iters=2, init_ids=init, cache=True)
    assigned, _ = build_ivf_index(emb, centroids=cents)
    cells = {r["_cell"]: r["n"] for r in assigned.groupBy("_cell")
             .agg(F.count(F.lit(1)).alias("n")).collect()}

    pairs_runs = timed(lambda: materialize(semantic_dedup(
        emb, centroids=cents, threshold=0.3).select("vec_id", "label")))

    full_runs = timed(lambda: materialize(
        entry_mod.queries()["semantic_dedup"](spark, SF_DIR)))

    def stats(runs: list[float]) -> dict:
        return {"median": round(statistics.median(runs), 3),
                "min": round(min(runs), 3), "max": round(max(runs), 3),
                "runs": [round(r, 3) for r in runs]}

    print(json.dumps({
        "sf_dir": SF_DIR, "n": N,
        "fit_only": stats(fit_runs),
        "pairs_with_prefit_centroids": stats(pairs_runs),
        "full_query": stats(full_runs),
        "cell_populations": dict(sorted(cells.items())),
    }))


if __name__ == "__main__":
    main()
