"""End-to-end analytics over the events + lineitem tables — the
round-5 statistics/graph surface in one runnable flow:

1. navigation PageRank — per-user event transitions (props.k pages)
   become a weighted directed graph; 3 power iterations rank the pages
2. trend fit        — closed-form OLS of price vs quantity per return
   flag (slope/intercept/r2 from one aggregation pass)
3. correlation      — pairwise Pearson matrix of the lineitem measures

Everything is deterministic (decimal moment/term sums) and pre-flighted
with the 100×-scale plan gate.

Run: ``python examples/analyze_events.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

# allow `python examples/<name>.py` straight from a checkout: put the
# repo root (the package's parent) on sys.path before importing it
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from pyspark.sql import Window
from pyspark.sql import functions as F

from yaetl_spark import get_spark
from yaetl_spark.operators import correlation_matrix, grouped_ols, pagerank
from yaetl_spark.plans import assert_scales
from yaetl_spark.session import ensure_event_time


def main(spark, sf_dir: str = "/root/testdata/sf0.001"):
    ev = ensure_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    # 1) page-transition PageRank
    k = F.from_json(F.col("props"), "k bigint").getField("k")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select("user_id", "ts", "event_id", k.alias("page"))
        .withColumn("prev", F.lag("page").over(w))
        .filter(F.col("prev").isNotNull())
    )
    ranks = pagerank(trans, src="prev", dst="page", iters=3)
    top_pages = ranks.orderBy(F.col("rank").desc(), "node").limit(5).collect()

    # 2) per-flag price trend (one aggregation pass, |groups| rows out)
    trend = grouped_ols(li, y="l_extendedprice", x="l_quantity",
                        by=["l_returnflag"])
    assert_scales(trend, max_shuffles=2)
    fits = {r["l_returnflag"]: (r["slope"], r["r2"])
            for r in trend.collect()}

    # 3) measure correlations (ONE pass for the whole matrix)
    corr = correlation_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])
    assert_scales(corr)
    strongest = corr.orderBy(F.abs(F.col("corr")).desc()).first()

    return top_pages, fits, strongest


if __name__ == "__main__":
    spark = get_spark(app_name="analytics-example", shuffle_partitions=8)
    pages, fits, strongest = main(spark, *(sys.argv[1:2]))
    print("top pages:", [(r["node"], r["rank"]) for r in pages])
    print("price~qty fits by flag:", fits)
    print("strongest correlation:",
          (strongest["col_a"], strongest["col_b"], strongest["corr"]))
