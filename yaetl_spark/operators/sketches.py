"""Mergeable sketches — approximate distincts/quantiles at 100 TB.

Beyond-ref surface (the reference has no aggregation layer at all —
SURVEY.md §2.11); these are the aggregates a curation pipeline actually
runs at scale, where exact distinct-counting would shuffle every key.

The load-bearing property is **mergeability**: a Datasketches HLL sketch
aggregated per partition-grain (per day, per shard) can be unioned later
into any coarser grain without touching raw data again. That turns "unique
users last quarter" from a 100 TB reshuffle into a merge of 90 daily
1.5 KB sketches. ``hll_rollup`` + ``hll_merge`` encode exactly that
two-level pattern with Spark's built-in ``hll_sketch_agg`` /
``hll_union_agg`` (JVM Datasketches, map-side combined, no UDFs).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    rsd: float = 0.05,
    out: str = "approx_distinct",
) -> DataFrame:
    """Per-group approximate distinct count (HyperLogLog++, relative
    standard deviation ``rsd``). The production default where an exact
    ``count(distinct)`` would carry every key through the shuffle."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd=rsd).alias(out)
    )


def hll_rollup(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    lg_k: int = 12,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Fine-grain pass: one mergeable HLL sketch per key group.

    ``lg_k=12`` → ≤ ~1.6% error, ~2 KB per sketch. Persist this table at
    your finest reporting grain (e.g. day × source); every coarser
    report derives from it via :func:`hll_merge` — raw data is read once.
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias(sketch_col)
    )


def hll_merge(
    sketches: DataFrame,
    keys: Sequence[str],
    sketch_col: str = "hll_sketch",
    estimate_col: str = "distinct_estimate",
    keep_sketch: bool = False,
) -> DataFrame:
    """Coarse-grain pass: union fine sketches up to ``keys`` and estimate.

    Input is a :func:`hll_rollup` output (or a union of several); the
    shuffle carries one ~2 KB sketch per fine group — never raw keys.
    ``keep_sketch=True`` retains the merged sketch for further rollup.
    """
    merged = sketches.groupBy(*keys).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )
    out = merged.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col))
    )
    return out if keep_sketch else out.drop(sketch_col)


def approx_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    probabilities: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate percentiles (Greenwald-Khanna sketch,
    bounded memory per group) — the scale path beside the exact
    ``percentile`` oracle mode (see ``aggregates.percentiles``)."""
    probs = F.array(*[F.lit(float(p)) for p in probabilities])
    agg = F.percentile_approx(F.col(col), probs, F.lit(accuracy))
    # element_at over one shared agg column: the sketch is computed once
    return df.groupBy(*keys).agg(agg.alias("_q")).select(
        *keys, *[F.element_at(F.col("_q"), i + 1).alias(
            f"p{int(p * 100):02d}") for i, p in enumerate(probabilities)]
    )
