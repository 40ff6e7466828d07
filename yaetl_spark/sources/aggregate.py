"""AggregateSource — ordered union of sources (shard concatenation).

Parity: ``AggregateExtractor`` consumes extractors sequentially, preserving
per-source order (``/root/reference/src/Extractors/AggregateExtractor.php:22-63``,
``README.md:170-197``). Spark unions do NOT guarantee interleave order
(SURVEY.md §7.4.4), so when ``ordered=True`` we tag each shard with its
index and records must be re-ordered by ``(_shard, sort_key)`` downstream;
with ``ordered=False`` (default) it's a plain ``unionByName`` which is what
a distributed engine wants — no artificial ordering barrier.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import Source

SHARD_COL = "_shard"


SEQ_COL = "_shard_seq"


class AggregateSource(Source):
    """``ordered=True`` tags each row with its shard index (downstream
    re-orders on ``(_shard, key)`` as it sees fit). ``preserve_order=True``
    goes further — full ``AggregateExtractor`` consumption-order parity
    (``README.md:174``): rows come out exactly as the reference would
    consume them, shard 0's rows in their natural order, then shard 1's,
    and so on. It tags ``(_shard, monotonically_increasing_id)`` at load
    (the monotonic id is partition-major, i.e. each shard's natural/
    collect order) and applies the sort, so it plans a RANGE shuffle —
    a deliberate ordering barrier for order-sensitive parity flows, NOT
    the 100 TB hot path (the default plain union stays barrier-free)."""

    def __init__(
        self,
        sources: list[Source],
        ordered: bool = False,
        preserve_order: bool = False,
        **kw,
    ):
        super().__init__(**kw)
        if not sources:
            raise ValueError("AggregateSource needs at least one source")
        self.sources = sources
        self.ordered = ordered
        self.preserve_order = preserve_order

    def load(self, spark: SparkSession) -> DataFrame:
        dfs = [s.read(spark) for s in self.sources]
        if self.preserve_order:
            dfs = [
                df.withColumns({
                    SHARD_COL: F.lit(i),
                    SEQ_COL: F.monotonically_increasing_id(),
                })
                for i, df in enumerate(dfs)
            ]
            out = reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True),
                dfs,
            )
            out = out.orderBy(SHARD_COL, SEQ_COL).drop(SEQ_COL)
            # ordered=True promises the _shard tag in the output; only
            # the internal sequence column is implementation detail
            # (r10 ADVICE: this combination used to drop both silently)
            return out if self.ordered else out.drop(SHARD_COL)
        if self.ordered:
            dfs = [df.withColumn(SHARD_COL, F.lit(i)) for i, df in enumerate(dfs)]
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
        )
