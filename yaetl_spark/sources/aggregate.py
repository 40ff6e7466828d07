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


class AggregateSource(Source):
    def __init__(self, sources: list[Source], ordered: bool = False, **kw):
        super().__init__(**kw)
        if not sources:
            raise ValueError("AggregateSource needs at least one source")
        self.sources = sources
        self.ordered = ordered

    def load(self, spark: SparkSession) -> DataFrame:
        dfs = [s.read(spark) for s in self.sources]
        if self.ordered:
            dfs = [df.withColumn(SHARD_COL, F.lit(i)) for i, df in enumerate(dfs)]
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
        )
