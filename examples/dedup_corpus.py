"""End-to-end corpus dedup — the full near-duplicate pipeline a
training-data curation job runs: LSH candidates → exact-Jaccard verify →
connected-component clusters → keep one canonical doc per cluster, or
a bounded number of members per cluster (`cluster_cap`) when paraphrase
diversity is worth keeping — plus the DAY-2 form: persist a MinHash
index once and match every future shard against it incrementally
(`minhash_index`/`minhash_probe`), never re-comparing corpus-vs-corpus.

Run: ``python examples/dedup_corpus.py [sf_dir]``
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
from yaetl_spark.operators import (
    cluster_cap,
    dedup_clusters,
    drop_duplicate_members,
    minhash_index,
    minhash_lsh,
    minhash_probe,
    semantic_decontaminate,
    ngram_jaccard_pairs,
)
from yaetl_spark.plans import assert_scales


def main(spark, sf_dir: str = "/root/testdata/sf0.001"):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1) cheap candidates: banded MinHash (never all-pairs)
    candidates = minhash_lsh(
        docs, num_hashes=32, bands=16, shingle_size=2,
        jaccard_threshold=None,
    ).select("id_a", "id_b")

    # 2) exact verification only on the candidates
    pairs = ngram_jaccard_pairs(
        docs, shingle_size=5, threshold=0.2, candidates=candidates)

    # 100×-scale pre-flight: refuse to launch if the candidate or
    # verify plan picked up a cartesian / nested-loop join (i.e. the
    # LSH bucketing silently degenerated into all-pairs)
    assert_scales(candidates)
    assert_scales(pairs)

    # 3) transitive clusters, one canonical keeper each
    clusters = dedup_clusters(pairs)
    kept = drop_duplicate_members(docs, clusters)
    assert_scales(kept)

    # 3b) the middle ground: keep up to TWO members per cluster
    # (deterministic hash order; unclustered docs never enter the rank
    # shuffle) — bounded near-variant diversity for the training mix
    capped = cluster_cap(docs, "doc_id", clusters, cap=2)
    assert_scales(capped)

    # 4) day-2 ingestion: the existing corpus's LSH index persists ONCE
    # (production: .write.partitionBy('band'), probes prune to the
    # touched bands); each new shard signatures itself and probes the
    # index — no corpus re-scan, no corpus self-join — then anti-joins
    # the matches away to keep only novel documents
    old, shard = docs.filter("doc_id < 400"), docs.filter("doc_id >= 400")
    idx = minhash_index(old, num_hashes=32, bands=16, shingle_size=2)
    matches = minhash_probe(idx, shard, num_hashes=32, bands=16,
                            shingle_size=2, jaccard_threshold=0.5)
    assert_scales(matches)
    novel = shard.join(matches.select("probe_id").distinct(),
                       shard.doc_id == F.col("probe_id"), "left_anti")

    # 4b) the same probe as a LIVE ingest service: stream_minhash_probe
    # runs the identical signature/band/bucket-join pipeline on a
    # readStream feed (stream-static join against the persisted index,
    # pair dedup bounded by the watermark). Here it runs on the batch
    # shard — batch and stream paths are row-for-row identical by
    # contract (tests/test_streaming.py) — with an event-time column a
    # real feed would carry.
    from yaetl_spark.streaming import stream_minhash_probe

    feed = shard.withColumn(
        "ts", F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id")))
    live_matches = stream_minhash_probe(
        feed, idx, num_hashes=32, bands=16, shingle_size=2,
        jaccard_threshold=0.5)
    assert_scales(live_matches)

    # 5) semantic decontamination: the embedding-level leak check the
    # n-gram rungs cannot see (paraphrases). The benchmark (eval) set
    # broadcasts as ONE row of (id, vec, norm) structs; the corpus side
    # never shuffles. Threshold is fixture-tuned (synthetic embeddings
    # are near-orthogonal); production paraphrase leaks sit >= 0.95.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus_vecs = emb.filter("vec_id < 400")
    bench_vecs = emb.filter("vec_id >= 400")
    leaks = semantic_decontaminate(
        corpus_vecs, bench_vecs, id_col="vec_id", threshold=0.4)
    # the operator's ONLY join is the declared one-row benchmark
    # broadcast (a BroadcastNestedLoopJoin by plan shape) — allow it
    assert_scales(leaks, allow_nested_loop=True, max_shuffles=1)

    return (docs.count(), clusters.count(), kept.count(), capped.count(),
            shard.count(), novel.count(), live_matches.count(),
            leaks.count())


if __name__ == "__main__":
    spark = get_spark(app_name="dedup-example", shuffle_partitions=8)
    (total, clustered, kept, capped, shard_n, novel_n,
     live_n, leak_n) = main(spark, *(sys.argv[1:2]))
    print(f"docs={total} in_dup_clusters={clustered} kept={kept} "
          f"capped2={capped}")
    print(f"day-2 shard: {shard_n} incoming, {novel_n} novel after "
          f"probing the persisted index")
