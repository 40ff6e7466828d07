"""Bloom-filter join pruning (beyond-reference).

The classic big⋈small shape at 100 TB: the small side's keys don't fit a
broadcast hash table, but a few-MB bloom filter of them does. Pruning the
big side against the bloom *before* the shuffle removes the dominant cost
— non-matching rows never serialize, never shuffle, never hit the join.
The final exact semi/inner join still runs (a bloom has false positives,
never false negatives), so results are bit-identical to the plain join —
which is exactly what the oracle checks.

Two paths, picked by how much the planner can see:

- **native** (the :func:`bloom_semi_join` default): both sides share one
  query plan, so Spark's own runtime bloom filter
  (``spark.sql.optimizer.runtime.bloomFilter.enabled``, pinned on in
  :mod:`yaetl_spark.session`) does the pruning JVM-side —
  ``bloom_filter_agg`` build, codegen'd ``might_contain`` probe at the
  scan, zero Python in the hot path.
- **explicit** (:func:`bloom_build` / :func:`bloom_prune`, or
  ``strategy="explicit"``): the portable :class:`BloomFilter` handle for
  what the planner can't see — the filter side built in a separate
  pipeline stage or session, or a streaming probe side. Costs one Arrow
  round-trip on the probe.

Scale shape:
- build: k bit positions per key are derived JVM-side from one
  ``xxhash64`` via double hashing; positions aggregate into 64-bit blocks
  with a map-side-combined ``bit_or`` — the shuffle carries at most
  ``m/64`` longs regardless of key count. Only the finished block map
  (``m/64`` longs ≈ m/8 bytes) reaches the driver.
- probe: the bitmap broadcasts once per executor; membership is a
  vectorized numpy test inside an Arrow-batched ``mapInPandas`` — no
  per-row Python, no shuffle, prunes at scan time.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["BloomFilter", "bloom_build", "bloom_prune", "bloom_semi_join"]

_BLOCK = 64
# keep every hash intermediate below 2^62 (ANSI-safe): m < 2^31 caps the
# bitmap at 256 MB ≈ 223M keys at 1% fpp — beyond that, partition the
# keyspace and build one bloom per partition
_MAX_BITS = (1 << 31) - _BLOCK


class BloomFilter:
    """Driver-side handle: m bits as ``ceil(m/64)`` uint64 words."""

    def __init__(self, num_bits: int, num_hashes: int, words: np.ndarray):
        self.num_bits = int(num_bits)
        self.num_hashes = int(num_hashes)
        self.words = words  # uint64[ceil(num_bits/64)]

    @property
    def size_bytes(self) -> int:
        return int(self.words.nbytes)


def _positions_cols(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k bit positions via Kirsch–Mitzenmacher double hashing on one
    xxhash64: pos_i = (h1 + i*h2) mod m, all exact int64 ops so numpy
    reproduces them bit-for-bit at probe time.

    Every intermediate stays below 2^62 — ((x mod m) * (c mod m)) mod m
    instead of a raw multiply — so the arithmetic is identical under ANSI
    and non-ANSI sessions (the driver may hand us an ANSI session, where
    an int64 overflow would *throw* rather than wrap). ``_MAX_BITS``
    guards the bound."""
    m = F.lit(num_bits)
    golden = 0x9E3779B1 % num_bits
    h = F.xxhash64(key)
    h1 = F.pmod(h, m)
    # second hash from the high bits; forced odd. m is 64-aligned, not a
    # power of two, so gcd(h2, m) may still exceed 1 and the k probes can
    # land in a subgroup of the bit positions — the effect is a slightly
    # worse fpp than the sizing formula promises, never a false negative
    # (the numpy probe mirrors this arithmetic exactly).
    # (h>>>17 mod m) < m < 2^31 and golden < m, so the product < 2^62.
    h2 = F.pmod(F.pmod(F.shiftrightunsigned(h, 17), m) * F.lit(golden), m)
    h2 = h2 * F.lit(2) + F.lit(1)
    return [
        F.pmod(h1 + F.lit(i) * h2, m).cast("long")
        for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame,
    key: str | Column,
    expected_items: int,
    fpp: float = 0.01,
) -> BloomFilter:
    """Aggregate a bloom filter of ``df[key]`` with ~``fpp`` false-positive
    rate. Standard sizing: m = -n·ln(p)/ln(2)², k = (m/n)·ln(2)."""
    if expected_items <= 0:
        raise ValueError("expected_items must be positive")
    num_bits = max(
        _BLOCK,
        int(math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2))),
    )
    num_bits = ((num_bits + _BLOCK - 1) // _BLOCK) * _BLOCK
    if num_bits > _MAX_BITS:
        raise ValueError(
            f"bloom sizing {num_bits} bits exceeds the 2^31 ANSI-safe cap; "
            "partition the keyspace and build per-partition blooms"
        )
    num_hashes = max(1, int(round(num_bits / expected_items * math.log(2))))

    key_col = F.col(key) if isinstance(key, str) else key
    pos = F.explode(F.array(*_positions_cols(key_col, num_bits, num_hashes)))
    blocks = (
        df.select(pos.alias("pos"))
        .select(
            (F.col("pos") / _BLOCK).cast("long").alias("block"),
            # shiftleft's numBits arg only takes a literal in the pyspark
            # API; the expr form accepts a per-row shift amount
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_BLOCK} AS INT))").alias("mask"),
        )
        .groupBy("block")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    words = np.zeros(num_bits // _BLOCK, dtype=np.uint64)
    for r in blocks:
        words[r.block] = np.uint64(r.bits % (1 << 64))
    return BloomFilter(num_bits, num_hashes, words)


def bloom_prune(
    df: DataFrame,
    key: str | Column,
    bloom: BloomFilter,
) -> DataFrame:
    """Keep only rows whose key *might* be in the bloom (plus false
    positives at ~fpp). The bitmap rides to executors as a broadcast
    variable; the test is one numpy pass per Arrow batch."""
    key_col = F.col(key) if isinstance(key, str) else key
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        (bloom.num_bits, bloom.num_hashes, bloom.words)
    )
    # unique temp column — a fixed name would silently clobber a
    # same-named user column and corrupt the output schema
    hcol = "__bloom_h"
    while hcol in df.columns:
        hcol += "_"
    tagged = df.withColumn(hcol, F.xxhash64(key_col))
    schema = tagged.schema

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        num_bits, num_hashes, words = bc.value
        m = np.int64(num_bits)
        golden = np.int64(0x9E3779B1 % int(m))
        for pdf in batches:
            h = pdf[hcol].to_numpy(dtype=np.int64)
            h1 = np.mod(h, m)  # numpy mod matches Spark pmod (sign of divisor)
            # mirror the overflow-free reduced multiply of _positions_cols
            h2 = np.mod(
                np.mod((h.astype(np.uint64) >> np.uint64(17)).astype(np.int64), m)
                * golden,
                m,
            )
            h2 = h2 * np.int64(2) + np.int64(1)
            keep = np.ones(len(h), dtype=bool)
            for i in range(num_hashes):
                pos = np.mod(h1 + np.int64(i) * h2, m).astype(np.uint64)
                block = (pos >> np.uint64(6)).astype(np.int64)
                bit = pos & np.uint64(63)
                keep &= (words[block] >> bit) & np.uint64(1) != 0
            yield pdf[keep]

    return tagged.mapInPandas(probe, schema=schema).drop(hcol)


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
    strategy: str = "native",
) -> DataFrame:
    """Exact ``big SEMI JOIN small ON key``, bloom-accelerated. Both
    strategies return the identical result (a bloom has false positives,
    never false negatives, and an exact join always closes).

    ``strategy="native"`` (default) — when both sides live in the SAME
    query plan, emit a plain semi join and let Spark's optimizer inject
    its own runtime bloom filter on the probe side
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``, on by default
    in :mod:`yaetl_spark.session`): the build is a JVM
    ``bloom_filter_agg``, the probe a codegen'd ``might_contain`` at the
    scan — zero Python in the hot path, and AQE sizes/skips the filter
    from real runtime stats. This is strictly better than the explicit
    path whenever the planner can see both sides.

    ``strategy="explicit"`` — build the portable :class:`BloomFilter`
    (distributed ``bit_or`` block aggregation) and probe via the
    vectorized numpy ``mapInPandas`` test. The probe pays one Arrow
    round-trip, so reserve it for what the native path CANNOT do: the
    filter side comes from a separate pipeline stage or session (the
    handle is a plain numpy array — serializable, reusable across jobs),
    or the probe side is a stream.

    The distinct key set is materialized once (eager localCheckpoint)
    and reused by the sizing count, the bloom build, and the closing
    join — the small side is scanned a single time."""
    if strategy == "native":
        keys = small.select(key).distinct()
        return big.join(keys, key, "left_semi")
    if strategy != "explicit":
        raise ValueError(f"unknown strategy {strategy!r}: native|explicit")
    keys = small.select(key).distinct().localCheckpoint(eager=True)
    if expected_items is None:
        expected_items = max(1, keys.count())
    bloom = bloom_build(keys, key, expected_items, fpp)
    pruned = bloom_prune(big, key, bloom)
    return pruned.join(keys, key, "left_semi")
