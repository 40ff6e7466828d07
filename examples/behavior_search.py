"""End-to-end behavioral analytics + retrieval — the round-6 operator
surface in one runnable flow:

1. conversion funnel — view → click → purchase in temporal order over a
   deterministically thinned stream (greedy earliest matching)
2. path mining      — the most-walked event-type trigrams
3. robust outliers  — median/MAD modified-z flags on event values per
   type (the robust alternative to mean±kσ)
4. skew diagnostic  — rows-per-key profile of the lineitem order key:
   the check you run BEFORE committing a 100 TB join to that key
5. BM25 retrieval   — top documents for a term query, scored on
   decimal term sums
6. score fusion     — reciprocal rank fusion of the BM25 ranking with
   a raw term-frequency ranking (the hybrid-retrieval combiner)

Everything is deterministic and pre-flighted with the 100×-scale plan
gate.

Run: ``python examples/behavior_search.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

# allow `python examples/<name>.py` straight from a checkout: put the
# repo root (the package's parent) on sys.path before importing it
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F

from yaetl_spark import get_spark
from yaetl_spark.operators import (bm25_topk, event_paths, funnel_steps,
                                   key_skew_profile,
                                   reciprocal_rank_fusion,
                                   robust_outliers)
from yaetl_spark.plans import assert_scales
from yaetl_spark.session import ensure_event_time


def main(spark, sf_dir: str = "/root/testdata/sf0.001"):
    ev = ensure_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1) funnel over a thinned stream (the full stream is dense enough
    #    that everyone converts, which demonstrates nothing)
    thin = ev.filter(F.col("event_id") % 20 < 3)
    funnel = funnel_steps(thin, ["view", "click", "purchase"])
    assert_scales(funnel)
    steps = [(r["step_name"], r["users"], r["conv_from_first"])
             for r in funnel.collect()]

    # 2) most-walked trigram paths
    paths = event_paths(ev, n=3, top=3)
    top_paths = [(r["path"], r["n_occurrences"]) for r in paths.collect()]

    # 3) per-type robust outliers (stream never shuffles — stat tables
    #    broadcast back)
    out = robust_outliers(ev, "value", by=["event_type"])
    assert_scales(out)
    shares = {r["event_type"]: r["outlier_share"] for r in out.collect()}

    # 4) is l_orderkey safe to shuffle on at 1000× this data?
    skew = key_skew_profile(li, ["l_orderkey"]).first()

    # 5) retrieval
    hits = bm25_topk(docs, ["spark", "join", "query"], top=3)
    assert_scales(hits)
    top_docs = [(r["doc_id"], r["bm25"]) for r in hits.collect()]

    # 6) hybrid-retrieval fusion: BM25 rank x raw matched-term count,
    #    combined with RRF — the calibration-free way to merge signals
    #    whose scales have nothing to do with each other
    pool = bm25_topk(docs, ["spark", "join", "query"], top=20)
    fused = reciprocal_rank_fusion(
        pool.withColumn("qid", F.lit(1)),
        "qid", "doc_id", ["bm25", "n_terms_matched"], top_k=3,
    )
    assert_scales(fused)
    fused_docs = [(r["doc_id"], r["fused_score"])
                  for r in fused.orderBy("fused_rank").collect()]

    return steps, top_paths, shares, skew, top_docs, fused_docs


if __name__ == "__main__":
    spark = get_spark(app_name="behavior-search-example",
                      shuffle_partitions=8)
    steps, top_paths, shares, skew, top_docs = main(spark, *(sys.argv[1:2]))
    print("funnel:", steps)
    print("top paths:", top_paths)
    print("outlier share by type:", shares)
    print("order-key skew: max_rows=%d top_share=%s"
          % (skew["max_rows"], skew["top_key_share"]))
    print("bm25 hits:", top_docs)
