"""Operator unit tests: dedup, similarity, text, as-of join, multimodal
plumbing, JDBC upsert SQL."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from yaetl_spark.operators import (
    as_of_join,
    brute_force_topk,
    build_ivf_index,
    embedding_dedup_pairs,
    exact_dedup,
    ivf_topk,
    minhash_lsh,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from yaetl_spark.operators.multimodal import (
    decode_images,
    repartition_by_bytes,
    sample_frames,
    with_media_meta,
)
from yaetl_spark.sinks import build_upsert_sql


# -- dedup -----------------------------------------------------------------

def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),   # near dup
        (4, "completely different text about spark engines"),
        (5, "  The   quick brown fox jumps over the lazy dog "),  # ws/case dup
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup_normalizes_whitespace_and_case(spark):
    out = sorted(r["doc_id"] for r in exact_dedup(_docs(spark)).collect())
    # 1,2,5 collapse to 1; 3 and 4 survive
    assert out == [1, 3, 4]


def test_minhash_lsh_finds_near_dups(spark):
    pairs = minhash_lsh(
        _docs(spark), num_hashes=64, bands=32, shingle_size=2,
        jaccard_threshold=0.3,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got and (1, 5) in got  # exact dups always match
    assert (1, 3) in got or (2, 3) in got  # near dup found
    assert not any(4 in p for p in got)  # unrelated doc not paired


def test_minhash_probe_matches_lsh_cross_pairs(spark):
    """index(old) probed with new == minhash_lsh(old ∪ new) restricted
    to cross (old, new) pairs — same signatures, same band keys, same
    slot-agreement sims (pins _banded_signatures' arithmetic to
    _lsh_band_pairs' inline band_key); deterministic under
    repartitioning of either side."""
    from yaetl_spark.operators import minhash_index, minhash_probe

    docs = _docs(spark)
    old = docs.filter("doc_id <= 3")
    new = docs.filter("doc_id >= 4")
    kw = dict(num_hashes=64, bands=32, shingle_size=2)
    idx = minhash_index(old, **kw)
    got = {(r["probe_id"], r["index_id"]): r["jaccard_sim"]
           for r in minhash_probe(idx, new, jaccard_threshold=0.3,
                                  **kw).collect()}
    want = {(r["id_b"], r["id_a"]): r["jaccard_sim"]
            for r in minhash_lsh(docs, jaccard_threshold=0.3,
                                 **kw).collect()
            if r["id_a"] <= 3 and r["id_b"] >= 4}
    assert got == want and (5, 1) in got  # ws/case dup of doc 1 found
    assert not any(p == 4 for p, _ in got)  # unrelated doc matches nothing
    again = {(r["probe_id"], r["index_id"]): r["jaccard_sim"]
             for r in minhash_probe(idx.repartition(7), new.repartition(5),
                                    jaccard_threshold=0.3, **kw).collect()}
    assert again == got


def test_minhash_probe_same_id_and_threshold_handling(spark):
    """Re-delivered docs (incoming ∩ index) self-match at sim 1.0 —
    excluded by default, visible with exclude_same_id=False; threshold
    None returns every candidate; num_hashes % bands validates; empty
    shingle sets (empty text) never reach the join."""
    from yaetl_spark.operators import minhash_index, minhash_probe

    docs = _docs(spark)
    kw = dict(num_hashes=32, bands=16, shingle_size=2)
    idx = minhash_index(docs, **kw)
    redelivered = docs.filter("doc_id in (1, 4)")
    got = minhash_probe(idx, redelivered, jaccard_threshold=None,
                        exclude_same_id=False, **kw)
    sims = {(r["probe_id"], r["index_id"]): r["jaccard_sim"]
            for r in got.collect()}
    assert sims[(1, 1)] == 1.0 and sims[(4, 4)] == 1.0
    dropped = {(r["probe_id"], r["index_id"])
               for r in minhash_probe(idx, redelivered,
                                      jaccard_threshold=None,
                                      **kw).collect()}
    assert (1, 1) not in dropped and (4, 4) not in dropped
    assert (1, 2) in dropped  # true cross dup survives the exclusion
    with pytest.raises(ValueError, match="divisible"):
        minhash_probe(idx, redelivered, num_hashes=32, bands=5)
    empty = spark.createDataFrame([(9, "")], "doc_id bigint, text string")
    assert minhash_probe(idx, empty, jaccard_threshold=None,
                         **kw).count() == 0


def test_minhash_probe_rolling_mode_oracle_family(spark):
    """hash_fn='rolling' (the SQL-replicable family) carries through
    index+probe: band keys are the raw slot strings and the probe
    agrees with minhash_lsh's cross pairs in the same mode."""
    from yaetl_spark.operators import minhash_index, minhash_probe

    docs = _docs(spark)
    kw = dict(num_hashes=32, bands=8, shingle_size=2, hash_fn="rolling")
    idx = minhash_index(docs.filter("doc_id <= 3"), **kw)
    assert dict(idx.dtypes)["bhash"] == "string"  # raw slot-string keys
    got = {(r["probe_id"], r["index_id"]): r["jaccard_sim"]
           for r in minhash_probe(idx, docs.filter("doc_id >= 4"),
                                  jaccard_threshold=0.25, **kw).collect()}
    want = {(r["id_b"], r["id_a"]): r["jaccard_sim"]
            for r in minhash_lsh(docs, jaccard_threshold=0.25,
                                 **kw).collect()
            if r["id_a"] <= 3 and r["id_b"] >= 4}
    assert got == want and got  # non-empty: the ws/case dup crosses


def test_simhash_dedup_collapses_exact_dups(spark):
    out = sorted(r["doc_id"] for r in simhash_dedup(_docs(spark)).collect())
    assert 1 in out and 4 in out and 2 not in out and 5 not in out


def test_ngram_jaccard_exact_values(spark):
    pairs = ngram_jaccard_pairs(
        _docs(spark), shingle_size=5, threshold=0.5, all_pairs=True
    ).collect()
    sims = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert sims[(1, 2)] == 1.0  # identical text
    assert 0.5 <= sims[(1, 3)] < 1.0  # one word differs


def test_ngram_jaccard_requires_all_pairs_opt_in(spark):
    with pytest.raises(ValueError, match="all_pairs=True"):
        ngram_jaccard_pairs(_docs(spark), threshold=0.5)


def test_embedding_dedup_bruteforce_vs_lsh(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.001, 0.0, 0.0]),  # near dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),    # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    bf = embedding_dedup_pairs(df, threshold=0.99, brute_force=True).collect()
    assert {(r["id_a"], r["id_b"]) for r in bf} == {(1, 2)}
    lsh = embedding_dedup_pairs(df, threshold=0.99, num_planes=4).collect()
    assert {(r["id_a"], r["id_b"]) for r in lsh} <= {(1, 2)}


# -- similarity ------------------------------------------------------------

def test_brute_force_topk_orders_deterministically(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    top = brute_force_topk(emb, q, k=5).collect()
    assert top[0]["vec_id"] == 0 and abs(top[0]["score"] - 1.0) < 1e-6
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_ivf_topk_approximates_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = list(emb.filter(F.col("vec_id") == 7).first()["embedding"])
    assigned, cents = build_ivf_index(emb, num_cells=8)
    approx = ivf_topk(assigned, cents, q, k=5, nprobe=4)
    exact = brute_force_topk(emb, q, k=5)
    # the query's own vector must be found (it lives in the probed cell)
    assert approx.first()["vec_id"] == exact.first()["vec_id"] == 7
    # recall@5 of at least 3/5 with half the cells probed
    a = {r["vec_id"] for r in approx.collect()}
    e = {r["vec_id"] for r in exact.collect()}
    assert len(a & e) >= 3


# -- as-of join ------------------------------------------------------------

def test_as_of_join_backward(spark):
    trades = spark.createDataFrame(
        [(1, 10, "t1"), (1, 20, "t2"), (2, 15, "t3")],
        "key int, t int, trade string",
    )
    quotes = spark.createDataFrame(
        [(1, 5, 100.0), (1, 18, 110.0), (2, 99, 999.0)],
        "key int, t int, px double",
    )
    out = as_of_join(trades, quotes, on="key", left_time="t", right_time="t")
    got = {(r["key"], r["t"], r["px"]) for r in out.collect()}
    assert got == {(1, 10, 100.0), (1, 20, 110.0), (2, 15, None)}


# -- multimodal plumbing ---------------------------------------------------

def test_media_meta_and_stub_decode(spark):
    rows = [(1, b"\x89PNG fake bytes"), (2, b"GIF89a other")]
    df = spark.createDataFrame(rows, "id bigint, data binary")
    meta = with_media_meta(df)
    assert {"media_size", "media_sha1"} <= set(meta.columns)
    feats = decode_images(df, use_stub_decoder=True).collect()
    assert len(feats) == 2 and feats[0]["width"] == 4

    # real path: non-PNG payload without Pillow fails with a clear error
    # (real-codec decode of actual PNG/WAV bytes: test_multimodal_codecs.py)
    with pytest.raises(Exception, match="PNG|Pillow|image"):
        decode_images(df).collect()


def test_sample_frames_stub(spark):
    df = spark.createDataFrame(
        [(1, b"x" * 5000)], "id bigint, data binary"
    )
    frames = sample_frames(df, every_nth=2, use_stub_decoder=True).collect()
    assert len(frames) == 3  # 5 fake frames, every 2nd
    assert all(len(r["frame"]) > 0 for r in frames)


def test_repartition_by_bytes(spark):
    df = spark.createDataFrame(
        [(i, b"x" * 1000) for i in range(50)], "id bigint, data binary"
    )
    out = repartition_by_bytes(with_media_meta(df), target_bytes=10_000)
    assert out.rdd.getNumPartitions() >= 5
    assert out.count() == 50


# -- jdbc upsert SQL -------------------------------------------------------

def test_upsert_sql_dialects():
    pg = build_upsert_sql("t", ["id", "v"], ["id"], "postgres")
    assert "ON CONFLICT (id) DO UPDATE SET v = excluded.v" in pg
    my = build_upsert_sql("t", ["id", "v"], ["id"], "mysql")
    assert "ON DUPLICATE KEY UPDATE v = VALUES(v)" in my
    with pytest.raises(ValueError):
        build_upsert_sql("t", ["id"], ["id"], "oracle9i")


def test_pandas_udaf_grouped_agg(spark, sf_dir):
    """GROUPED_AGG pandas UDF (UDAF surface): exact median per group must
    equal the native median."""
    from pyspark.sql import functions as F

    from yaetl_spark.operators import pandas_udaf

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    med = pandas_udaf(lambda s: float(s.median()))
    got = (orders.groupBy("o_orderstatus")
           .agg(med("o_totalprice").alias("m")).collect())
    expect = (orders.groupBy("o_orderstatus")
              .agg(F.median("o_totalprice").alias("m")).collect())
    g = {r.o_orderstatus: r.m for r in got}
    e = {r.o_orderstatus: r.m for r in expect}
    assert set(g) == set(e)
    for k in e:
        assert abs(g[k] - e[k]) < 1e-9


def test_decontaminate_flag_and_clean(spark):
    from yaetl_spark.operators import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text with different words entirely"),
            (3, "quick brown fox jumps over something else near here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    flagged = {r["doc_id"]: r["n_matched"]
               for r in decontaminate(docs, bench, ngram_size=5).collect()}
    # doc 1 shares 'quick brown fox jumps over' + downstream 5-grams
    assert 1 in flagged and flagged[1] >= 2
    assert 3 in flagged and flagged[3] == 1
    assert 2 not in flagged

    clean = decontaminate(docs, bench, ngram_size=5, mode="clean")
    assert {r["doc_id"] for r in clean.collect()} == {2}

    strict = decontaminate(docs, bench, ngram_size=5, min_matches=2)
    assert {r["doc_id"] for r in strict.collect()} == {1}


def test_decontaminate_short_doc_whole_text_gram(spark):
    """Docs shorter than the n-gram window collapse to one whole-text
    shingle (same rule as shingles()) — a verbatim short leak still flags."""
    from yaetl_spark.operators import decontaminate

    docs = spark.createDataFrame([(1, "tiny leak")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "tiny leak")], "doc_id long, text string")
    assert decontaminate(docs, bench, ngram_size=5).count() == 1


def test_repetition_ratio(spark):
    from yaetl_spark.operators import repetition_ratio

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),      # 4 grams, 1 distinct
            (2, "all words here are fully distinct"),  # no repeats
            (3, "ab cd"),                              # shorter than window
        ],
        "doc_id long, text string",
    ).select("doc_id", repetition_ratio("text", 3).alias("r"))
    got = {r["doc_id"]: r["r"] for r in df.collect()}
    assert got[1] == 0.75
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_redact_pii(spark):
    from yaetl_spark.operators import redact_pii

    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org or call (555) 123-4567, "
             "ssn 123-45-6789, host 10.0.42.7 ok")],
        "id long, text string",
    ).select(redact_pii("text").alias("t"))
    out = df.first()["t"]
    assert "[EMAIL]" in out and "[PHONE]" in out
    assert "[SSN]" in out and "[IPV4]" in out
    assert "@" not in out and "123-45-6789" not in out

    only_email = spark.createDataFrame(
        [(1, "a@b.co 10.0.0.1")], "id long, text string"
    ).select(redact_pii("text", kinds=["email"]).alias("t")).first()["t"]
    assert only_email == "[EMAIL] 10.0.0.1"


def test_percentiles_approx_default_and_exact(spark):
    from yaetl_spark.operators import percentiles

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)] + [("b", 5.0), ("b", 15.0)],
        "k string, x double",
    )
    exact = {r["k"]: r for r in percentiles(
        df, "x", keys=["k"], exact=True).collect()}
    assert exact["a"]["p50"] == 50.5 and exact["a"]["n_rows"] == 100
    assert exact["b"]["p50"] == 10.0  # interpolated midpoint

    # production default: approx sketch — returns actual data elements,
    # within rank tolerance of the exact answer
    approx = {r["k"]: r for r in percentiles(df, "x", keys=["k"]).collect()}
    assert abs(approx["a"]["p50"] - 50.5) <= 1.0
    assert approx["a"]["p99"] >= approx["a"]["p90"] >= approx["a"]["p50"]
    assert approx["b"]["p50"] in (5.0, 15.0)

    # ungrouped + custom prob naming
    g = percentiles(df, "x", probs=(0.25, 0.999)).first()
    assert "p25" in g.asDict() and "p99_9" in g.asDict()


def test_as_of_join_deterministic_tie_break(spark):
    trades = spark.createDataFrame([(1, 10, "t1")], "key int, t int, trade string")
    # two quotes at the identical timestamp: greatest attribute tuple wins
    quotes = spark.createDataFrame(
        [(1, 10, 100.0), (1, 10, 200.0), (1, 10, 150.0)],
        "key int, t int, px double",
    )
    for _ in range(3):
        out = as_of_join(
            trades.repartition(4), quotes.repartition(3),
            on="key", left_time="t", right_time="t",
        ).collect()
        assert [(r["key"], r["t"], r["px"]) for r in out] == [(1, 10, 200.0)]


def test_join_default_record_rejects_non_left(spark):
    from yaetl_spark.operators import OnClause, join

    a = spark.createDataFrame([(1, "x")], "id int, v string")
    b = spark.createDataFrame([(2, "y")], "id int, w string")
    with pytest.raises(ValueError, match="how='left'"):
        join(a, b, OnClause("id", default_record={"w": "d"}), how="full")


# -- range join ------------------------------------------------------------

def test_range_join_bucketed_matches_naive(spark):
    from yaetl_spark.operators import range_join

    vals = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 5.0, 9.99, 10.0, 42.0, 99.5])],
        "vid int, v double",
    )
    ivs = spark.createDataFrame(
        [(100, 0.0, 10.0), (200, 5.0, 50.0), (300, 99.0, 100.0)],
        "iv int, lo double, hi double",
    )
    got = {
        (r["vid"], r["iv"])
        for r in range_join(vals, ivs, "v", "lo", "hi", bucket_width=7.0).collect()
    }
    naive = {
        (r["vid"], r["iv"])
        for r in vals.crossJoin(ivs)
        .filter((F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
        .collect()
    }
    assert got == naive and (3, 200) in got and (0, 100) in got

    # auto bucket width (derived from median span) gives the same answer
    auto = {(r["vid"], r["iv"]) for r in range_join(vals, ivs, "v", "lo", "hi").collect()}
    assert auto == naive


def test_range_join_with_keys_and_guards(spark):
    from yaetl_spark.operators import range_join

    left = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0)], "k string, v double")
    right = spark.createDataFrame(
        [("a", 0.0, 10.0)], "k string, lo double, hi double")
    out = range_join(left, right, "v", "lo", "hi", on="k",
                     bucket_width=4.0).collect()
    assert [(r["k"], r["v"]) for r in out] == [("a", 5.0)]

    with pytest.raises(ValueError, match="inner"):
        range_join(left, right, "v", "lo", "hi", how="left")
    with pytest.raises(ValueError, match="overlap"):
        range_join(left.withColumnRenamed("v", "lo"), right, "lo", "lo", "hi")


def test_tfidf_scores_and_topk(spark):
    from yaetl_spark.operators import tfidf
    import math

    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "durian")],
        "doc_id bigint, text string",
    )
    rows = {(r["doc_id"], r["token"]): (r["tf"], r["score"])
            for r in tfidf(df).collect()}
    # apple: tf=2 in doc1, df=1, N=3 → 2 * (ln(4/2)+1)
    assert rows[(1, "apple")][0] == 2
    assert abs(rows[(1, "apple")][1] - round(2 * (math.log(2.0) + 1), 6)) < 1e-9
    # banana appears in 2 docs → lower idf than cherry (df=1)
    assert rows[(2, "banana")][1] < rows[(2, "cherry")][1]

    top1 = tfidf(df, top_k_per_doc=1).collect()
    assert {(r["doc_id"], r["token"]) for r in top1} == {
        (1, "apple"), (2, "cherry"), (3, "durian")}


def test_tfidf_is_lazy_no_count_job(spark):
    """r16: N rides in the plan via a 1-row broadcast equi join onto the
    vocabulary-sized df table — calling the operator must launch NO job
    (was an eager df.count() per execution, a blocking sequential
    corpus pass before the main DAG), and the constant-key join must
    stay a hash join (no BNLJ/cartesian)."""
    from yaetl_spark.operators import tfidf
    from yaetl_spark.plans import assert_scales, executed_plan

    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "durian")],
        "doc_id bigint, text string",
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    out = tfidf(df)  # must not run anything
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
    plan = executed_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert_scales(out)
    assert out.count() == 5  # distinct (doc, token) pairs — still computes


# --- fuzzy_join -------------------------------------------------------------


def test_fuzzy_join_matches_and_best(spark):
    import pytest
    from pyspark.sql import functions as F

    from yaetl_spark.operators import fuzzy_join

    left = spark.createDataFrame(
        [(1, "Acme Corporation"), (2, "Globex  industries"), (3, "zz")],
        "lid long, name string",
    )
    right = spark.createDataFrame(
        [
            (10, "acme corp"),
            (11, "ACME CORPORATION"),
            (12, "globex industries inc"),
            (13, "unrelated widgets"),
        ],
        "rid long, name string",
    )
    best = {
        r["lid"]: (r["rid"], r["sim"])
        for r in fuzzy_join(
            left, right, "name", "name", "lid", "rid",
            ngram=3, min_sim=0.3, keep="best",
        ).collect()
    }
    # exact normalized match wins with sim 1.0
    assert best[1][0] == 11 and best[1][1] == 1.0
    assert best[2][0] == 12
    assert 3 not in best  # "zz" too short for 3-grams -> no gram set
    # keep="all" returns every pair over the threshold
    allp = fuzzy_join(
        left, right, "name", "name", "lid", "rid",
        ngram=3, min_sim=0.3, keep="all",
    ).collect()
    assert {(r["lid"], r["rid"]) for r in allp} >= {(1, 10), (1, 11), (2, 12)}
    with pytest.raises(ValueError):
        fuzzy_join(left, right, "name", "name", "lid", "rid", keep="top")
    with pytest.raises(ValueError):
        fuzzy_join(left, right, "name", "name", "id", "id")
    with pytest.raises(ValueError):
        fuzzy_join(left, right, "name", "name", "lid", "rid", min_sim=0.0)


def test_fuzzy_join_jaccard_exact_value(spark):
    from yaetl_spark.operators import fuzzy_join

    # "abcd" -> {abc, bcd}; "bcde" -> {bcd, cde}: inter=1, union=3
    left = spark.createDataFrame([(1, "abcd")], "lid long, s string")
    right = spark.createDataFrame([(2, "bcde")], "rid long, s string")
    rows = fuzzy_join(
        left, right, "s", "s", "lid", "rid", ngram=3, min_sim=0.1
    ).collect()
    assert len(rows) == 1
    assert rows[0]["sim"] == round(1 / 3, 6)
    assert rows[0]["n_shared_grams"] == 1


def test_fuzzy_join_gram_df_pruning(spark):
    from pyspark.sql import functions as F

    from yaetl_spark.operators import fuzzy_join

    # 30 right rows all share the stop-gram region "aaaa"; two rows carry
    # a distinctive tail. Without pruning the left probe matches all 30;
    # with max_gram_df=5 the "aaaa"-grams drop and only the distinctive
    # tail pairs survive, with Jaccard over the PRUNED sets.
    right = spark.createDataFrame(
        [(i, "aaaaaaaa common") for i in range(30)]
        + [(100, "xyzqw tail"), (101, "xyzqw tail")],
        "rid long, s string",
    )
    left = spark.createDataFrame([(1, "xyzqw tail")], "lid long, s string")
    unpruned = fuzzy_join(
        left, right, "s", "s", "lid", "rid", ngram=3, min_sim=0.99,
        keep="all",
    )
    pruned = fuzzy_join(
        left, right, "s", "s", "lid", "rid", ngram=3, min_sim=0.99,
        keep="all", max_gram_df=5,
    )
    assert {r["rid"] for r in unpruned.collect()} == {100, 101}
    assert {r["rid"] for r in pruned.collect()} == {100, 101}
    # and partition invariance of the whole operator
    a = sorted(map(tuple, fuzzy_join(
        left, right.repartition(1), "s", "s", "lid", "rid",
        ngram=3, min_sim=0.2, keep="all").collect()))
    b = sorted(map(tuple, fuzzy_join(
        left, right.repartition(7), "s", "s", "lid", "rid",
        ngram=3, min_sim=0.2, keep="all").collect()))
    assert a == b


def test_fuzzy_join_auto_prune_default(spark):
    """max_gram_df defaults to "auto": threshold
    greatest(auto_min_df, ceil(auto_frac * n_right)) computed IN-PLAN —
    provably a no-op below auto_min_df right rows (default == unpruned
    there), and an actual df-prune when the knobs bring the threshold
    under a hot gram's df."""
    import pytest

    from yaetl_spark.operators import fuzzy_join

    right = spark.createDataFrame(
        [(i, "aaaaaaaa common") for i in range(30)]
        + [(100, "xyzqw tail"), (101, "xyzqw tail")],
        "rid long, s string",
    )
    left = spark.createDataFrame(
        [(1, "xyzqw tail"), (2, "aaaaaaaa common")], "lid long, s string"
    )
    auto = sorted(map(tuple, fuzzy_join(
        left, right, "s", "s", "lid", "rid", ngram=3, min_sim=0.2,
        keep="all").collect()))
    off = sorted(map(tuple, fuzzy_join(
        left, right, "s", "s", "lid", "rid", ngram=3, min_sim=0.2,
        keep="all", max_gram_df=None).collect()))
    assert auto == off and len(auto) > 0  # 32 rows << auto_min_df
    # knobs low enough to bite: the 30-row "aaa" grams (df=30) prune out
    bitten = fuzzy_join(
        left, right, "s", "s", "lid", "rid", ngram=3, min_sim=0.2,
        keep="all", auto_min_df=5, auto_frac=0.01,
    )
    assert {r["rid"] for r in bitten.collect() if r["lid"] == 2} == set()
    assert {r["rid"] for r in bitten.collect() if r["lid"] == 1} == {100, 101}
    with pytest.raises(ValueError):
        fuzzy_join(left, right, "s", "s", "lid", "rid", max_gram_df="anything")


# --- bm25_topk --------------------------------------------------------------


def test_bm25_topk_ranks_by_relevance(spark):
    from yaetl_spark.operators import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "spark spark spark join"),          # heavy on query terms
            (2, "spark join"),                      # both terms, short
            (3, "spark filler filler filler filler filler filler"),
            (4, "nothing relevant here at all"),
            (5, "join"),
        ],
        ["doc_id", "text"],
    )
    got = bm25_topk(df, ["spark", "join"], top=10).collect()
    ids = [r["doc_id"] for r in got]
    assert set(ids) == {1, 2, 3, 5}  # doc 4 matches nothing
    assert ids[0] in (1, 2)  # both-term docs outrank single-term docs
    by_id = {r["doc_id"]: r for r in got}
    assert by_id[1]["n_terms_matched"] == 2
    assert by_id[5]["n_terms_matched"] == 1
    # tf saturation: doc 3's lone 'spark' in a LONG doc scores below
    # doc 5's lone 'join' in a one-word doc (length normalization)
    assert by_id[3]["bm25"] < by_id[5]["bm25"]
    # deterministic across partitionings
    a = [tuple(r) for r in got]
    b = [tuple(r) for r in
         bm25_topk(df.repartition(7), ["spark", "join"], top=10).collect()]
    assert a == b
    with pytest.raises(ValueError):
        bm25_topk(df, [])
    with pytest.raises(ValueError):
        bm25_topk(df, ["a", "a"])
    # top cut is TakeOrderedAndProject, not a global sort
    plan = bm25_topk(df, ["spark"], top=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- pii_flags --------------------------------------------------------------


def test_pii_flags_counts_and_masks(spark):
    from yaetl_spark.operators import pii_flags

    df = spark.createDataFrame(
        [
            (1, "mail a.b@x.io and c@y.org, ip 10.0.0.1, call 555-123-4567"),
            (2, "ssn 123-45-6789 hides here"),
            (3, "clean text, no pii at all"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in pii_flags(df).collect()}
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (2, 1, 1)
    assert got[1]["pii_total"] == 4
    assert got[2]["n_ssn"] == 1 and got[2]["pii_total"] == 1
    assert got[3]["pii_total"] == 0 and got[3]["masked_text"] == df.collect()[2]["text"]
    m = got[1]["masked_text"]
    assert "[EMAIL]" in m and "[IPV4]" in m and "[PHONE]" in m
    assert "a.b@x.io" not in m and "10.0.0.1" not in m
    assert got[2]["masked_text"] == "ssn [SSN] hides here"
    # mask=False drops the text column; kinds subset honored
    cols = pii_flags(df, mask=False, kinds=["email"]).columns
    assert cols == ["doc_id", "n_email", "pii_total"]
    with pytest.raises(ValueError):
        pii_flags(df, kinds=["dna"])
    # pure scan: no exchange, no python
    plan = pii_flags(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan


def test_table_diff_summary_and_detail(spark):
    from yaetl_spark.operators import table_diff

    ref = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "id int, s string, v double",
    )
    cur = spark.createDataFrame(
        [(1, "a", 10.0),        # unchanged
         (2, "B", 20.0),        # changed: s
         (3, "c", 30.0),        # changed: v (NULL -> value IS a change)
         (5, "e", 50.0)],       # added; id=4 removed
        "id int, s string, v double",
    )
    row = table_diff(ref, cur, ["id"]).collect()[0]
    assert (row["n_ref"], row["n_cur"]) == (4, 4)
    assert (row["n_added"], row["n_removed"]) == (1, 1)
    assert (row["n_changed"], row["n_unchanged"]) == (2, 1)

    det = {r["id"]: r for r in table_diff(
        ref, cur, ["id"], detail=True).collect()}
    assert set(det) == {2, 3, 4, 5}       # unchanged id=1 omitted
    assert det[2]["change_type"] == "changed" and det[2]["changed_cols"] == "s"
    assert det[3]["changed_cols"] == "v"  # null-safe compare
    assert det[4]["change_type"] == "removed" and det[4]["changed_cols"] == ""
    assert det[5]["change_type"] == "added"

    # explicit compare_cols restrict the changed test
    only_v = table_diff(ref, cur, ["id"], compare_cols=["v"]).collect()[0]
    assert only_v["n_changed"] == 1 and only_v["n_unchanged"] == 2

    with pytest.raises(ValueError, match="key_cols"):
        table_diff(ref, cur, [])
    with pytest.raises(ValueError, match="overlap"):
        table_diff(ref, cur, ["id"], compare_cols=["id"])


def test_table_diff_plan_one_join_no_python(spark):
    from yaetl_spark.operators import table_diff

    ref = spark.range(1000).withColumn("v", F.col("id") * 2)
    cur = spark.range(500, 1500).withColumn("v", F.col("id") * 2 + 1)
    plan = table_diff(ref, cur, ["id"])._jdf.queryExecution() \
        .executedPlan().toString()
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1


def test_token_pmi_known_counts(spark):
    from yaetl_spark.operators import token_pmi
    import math

    docs = spark.createDataFrame(
        [(1, "red cat red"), (2, "red cat"), (3, "red dog"), (4, "dog")],
        ["doc_id", "text"],
    )
    out = {(r["token_a"], r["token_b"]): r for r in
           token_pmi(docs, max_vocab=10, min_pair_docs=1).collect()}
    # doc-frequency presence counts: red=3, cat=2, dog=2;
    # pairs: (cat,red)=2 docs, (dog,red)=1 doc (canonical a<b order)
    r = out[("cat", "red")]
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (2, 2, 3)
    assert r["pmi"] == round(math.log(2 * 4 / (2 * 3)), 6)
    assert out[("dog", "red")]["n_ab"] == 1
    # min_pair_docs prunes
    pruned = token_pmi(docs, max_vocab=10, min_pair_docs=2)
    assert {(r["token_a"], r["token_b"]) for r in pruned.collect()} \
        == {("cat", "red")}
    # vocab cap: max_vocab=1 invalid, =2 keeps only the top-2 head
    import pytest as _pt
    with _pt.raises(ValueError):
        token_pmi(docs, max_vocab=1)
    capped = token_pmi(docs, max_vocab=2, min_pair_docs=1)
    toks = {t for r in capped.collect()
            for t in (r["token_a"], r["token_b"])}
    assert toks <= {"red", "cat"}  # head by df desc, token asc tiebreak


def test_token_pmi_partition_invariance(spark):
    from yaetl_spark.operators import token_pmi

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5} gamma") for i in range(40)],
        ["doc_id", "text"],
    )
    a = sorted(map(tuple, token_pmi(docs, max_vocab=8).collect()))
    b = sorted(map(tuple, token_pmi(
        docs.repartition(9), max_vocab=8).collect()))
    assert a == b and a


def test_token_pmi_persist_matches_default(spark):
    from yaetl_spark.operators import token_pmi

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 5} gamma") for i in range(30)],
        ["doc_id", "text"],
    )
    base = sorted(map(tuple, token_pmi(docs, max_vocab=8).collect()))
    cached = token_pmi(docs, max_vocab=8, persist=True)
    try:
        assert sorted(map(tuple, cached.collect())) == base
        assert cached.persisted_tokens.is_cached
    finally:
        cached.persisted_tokens.unpersist()


def test_rolling_quantile_exact_values_and_invariance(spark):
    from yaetl_spark.operators import rolling_quantile

    df = spark.createDataFrame(
        [("a", i, float(v)) for i, v in enumerate([1, 9, 2, 8, 3])]
        + [("b", 0, 100.0)],
        ["k", "t", "v"],
    )
    got = {(r["k"], r["t"]): r["rolling_q"] for r in
           rolling_quantile(df, "v", "t", ["k"], q=0.5, window=3)
           .collect()}
    # trailing-3 medians: [1], [1,9]->5, [1,9,2]->2, [9,2,8]->8, [2,8,3]->3
    assert [got[("a", t)] for t in range(5)] == [1.0, 5.0, 2.0, 8.0, 3.0]
    assert got[("b", 0)] == 100.0  # window never crosses keys
    # interpolated (non-median) quantile, q=0.25 over [1,9]: 1 + 0.25*8 = 3
    q25 = {r["t"]: r["rolling_q"] for r in
           rolling_quantile(df.filter("k = 'a'"), "v", "t", ["k"],
                            q=0.25, window=2).collect()}
    assert q25[1] == 3.0
    a = sorted(map(tuple, rolling_quantile(df, "v", "t", ["k"]).collect()))
    b = sorted(map(tuple, rolling_quantile(
        df.repartition(5), "v", "t", ["k"]).collect()))
    assert a == b
    import pytest as _pt
    with _pt.raises(ValueError):
        rolling_quantile(df, "v", "t", [], q=0.5)
    with _pt.raises(ValueError):
        rolling_quantile(df, "v", "t", ["k"], q=1.5)
    with _pt.raises(ValueError):
        rolling_quantile(df, "v", "t", ["k"], window=0)


def test_normalized_dedup_collapses_case_punct_ws(spark):
    from yaetl_spark.operators import normalize_for_dedup, normalized_dedup
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "HELLO-WORLD?"),
         (4, "different doc"), (5, None), (6, None), (7, "   ")],
        ["doc_id", "text"],
    )
    kept = sorted(r["doc_id"] for r in normalized_dedup(docs).collect())
    # 1,2,3 collapse (min id 1); NULL texts collapse (min id 5);
    # whitespace-only normalizes to '' — its own key
    assert kept == [1, 4, 5, 7]
    norm = docs.filter("doc_id = 3").select(
        normalize_for_dedup(F.col("text")).alias("n")).first()["n"]
    assert norm == "hello world"
    # partition invariance
    a = sorted(r["doc_id"] for r in
               normalized_dedup(docs.repartition(5)).collect())
    assert a == kept
    import pytest as _pt
    with _pt.raises(ValueError):
        normalized_dedup(docs, keep="max_id")


def test_shard_minhash_dedup_content_mode(spark):
    """Container dedup: shards sharing verbatim documents pair up,
    disjoint shards don't; both hash families agree on WHICH pairs."""
    from yaetl_spark.operators import shard_minhash_dedup

    rows = []
    for i in range(24):
        rows.append(("s1", f"document number {i} body"))
        # s2 = s1 re-uploaded with 4 docs swapped out
        rows.append(("s2", f"document number {i} body" if i < 20
                     else f"unique to s2 {i}"))
        rows.append(("s3", f"totally different text {i} here"))
    df = spark.createDataFrame(rows, ["shard", "text"])
    for fn in ("rolling", "xxhash"):
        got = shard_minhash_dedup(
            df, "shard", element="content", jaccard_threshold=0.3,
            hash_fn=fn)
        pairs = {(r["shard_a"], r["shard_b"]) for r in got.collect()}
        assert pairs == {("s1", "s2")}, (fn, pairs)
        est = got.first()["jaccard_sim"]
        # true overlap jaccard = 20/28 ≈ 0.714; 32-slot estimate lands
        # within the sketch's tolerance band
        assert 0.4 <= est <= 1.0, (fn, est)
    # partition invariance (the groupBy min-merge is order-free)
    got2 = shard_minhash_dedup(
        df.repartition(7), "shard", element="content",
        jaccard_threshold=0.3, hash_fn="rolling")
    assert {(r["shard_a"], r["shard_b"], r["jaccard_sim"])
            for r in got2.collect()} == {
        (r["shard_a"], r["shard_b"], r["jaccard_sim"])
        for r in shard_minhash_dedup(
            df, "shard", element="content", jaccard_threshold=0.3,
            hash_fn="rolling").collect()}


def test_shard_minhash_dedup_token_mode_is_min_union(spark):
    """Token mode: the shard signature must equal the MinHash of the
    UNION of its docs' shingle sets — verified by comparing a 2-doc
    shard against the same text concatenated into one doc."""
    from yaetl_spark.operators import shard_minhash_dedup

    split = spark.createDataFrame(
        [("sh", "alpha beta gamma delta"), ("sh", "epsilon zeta eta")],
        ["shard", "text"])
    merged = spark.createDataFrame(
        [("sh", "alpha beta gamma delta epsilon zeta eta")],
        ["shard", "text"])
    # a probe shard holding exactly the union text must read as an
    # EXACT duplicate (sim 1.0) of the 2-doc shard — i.e. the min-merge
    # produced precisely the union's signature
    probe = spark.createDataFrame(
        [("pr", "alpha beta gamma delta epsilon zeta eta")],
        ["shard", "text"])
    a = shard_minhash_dedup(
        split.union(probe), "shard", element="token", shingle_size=1,
        jaccard_threshold=None, hash_fn="rolling").collect()
    b = shard_minhash_dedup(
        merged.union(probe), "shard", element="token", shingle_size=1,
        jaccard_threshold=None, hash_fn="rolling").collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
    assert [(r["shard_a"], r["shard_b"], r["jaccard_sim"])
            for r in a] == [("pr", "sh", 1.0)]


def test_shard_minhash_dedup_validations(spark):
    from yaetl_spark.operators import shard_minhash_dedup
    import pytest as _pt

    df = spark.createDataFrame([("s", "t")], ["shard", "text"])
    with _pt.raises(ValueError, match="element"):
        shard_minhash_dedup(df, "shard", element="bogus")
    with _pt.raises(ValueError, match="divisible"):
        shard_minhash_dedup(df, "shard", num_hashes=10, bands=4).collect()


def test_shard_minhash_dedup_return_sigs_handle(spark):
    """return_sigs=True hands the persist handle back explicitly —
    the r11 ADVICE replaced the fragile result-attribute with an
    explicit return so downstream transformations can't lose it."""
    from yaetl_spark.operators import shard_minhash_dedup

    df = spark.createDataFrame(
        [("s1", "alpha beta gamma"), ("s2", "alpha beta gamma")],
        ["shard", "text"])
    pairs, sigs = shard_minhash_dedup(
        df, "shard", element="content", jaccard_threshold=0.3,
        hash_fn="rolling", return_sigs=True)
    try:
        assert sigs is not None and sigs.storageLevel.useMemory
        assert [(r["shard_a"], r["shard_b"]) for r in pairs.collect()] \
            == [("s1", "s2")]
    finally:
        sigs.unpersist()
    assert not sigs.storageLevel.useMemory
    # persist=False -> no cache to manage, handle slot is None
    pairs2, sigs2 = shard_minhash_dedup(
        df, "shard", element="content", jaccard_threshold=0.3,
        hash_fn="rolling", persist=False, return_sigs=True)
    assert sigs2 is None
    assert pairs2.count() == 1
    # default path unchanged: a bare DataFrame, no attribute riding it
    bare = shard_minhash_dedup(
        df, "shard", element="content", jaccard_threshold=0.3,
        hash_fn="rolling")
    assert not hasattr(bare, "persisted_sigs")
    bare.count()


def test_reciprocal_rank_fusion_known_values(spark):
    from yaetl_spark.operators import reciprocal_rank_fusion

    rows = [
        (1, "a", 9.0, 1.0), (1, "b", 1.0, 9.0), (1, "c", 5.0, 5.0),
        (1, "d", None, 2.0),
        (2, "x", 1.0, 1.0),
    ]
    df = spark.createDataFrame(rows, ["q", "d", "s1", "s2"])
    out = reciprocal_rank_fusion(df, "q", "d", ["s1", "s2"], k=60,
                                 top_k=3)
    got = {(r["q"], r["d"]): r for r in out.collect()}
    # a: ranks (1, 4) -> 1/61 + 1/64; b: (3, 1) -> 1/63 + 1/61;
    # c: (2, 2) -> 2/62; d absent from ranker 1 -> rank NULL, 1 term
    assert got[(1, "a")]["fused_score"] == round(1 / 61 + 1 / 64, 6)
    assert got[(1, "b")]["fused_score"] == round(1 / 63 + 1 / 61, 6)
    assert got[(1, "c")]["fused_score"] == round(2 / 62, 6)
    assert [got[(1, x)]["fused_rank"] for x in "bca"] == [1, 2, 3]
    assert got[(1, "d")] if (1, "d") in got else True  # top_k=3 keeps d out? d: 1/62 ranks 4th -> excluded
    assert (1, "d") not in got
    assert got[(1, "a")]["rank_s1"] == 1 and got[(1, "a")]["rank_s2"] == 4
    # single-candidate query survives with rank 1
    assert got[(2, "x")]["fused_rank"] == 1
    # partition invariance
    out2 = reciprocal_rank_fusion(
        df.repartition(5), "q", "d", ["s1", "s2"], k=60, top_k=3)
    assert {tuple(r) for r in out2.collect()} == {
        tuple(r) for r in out.collect()}
    import pytest as _pt
    with _pt.raises(ValueError):
        reciprocal_rank_fusion(df, "q", "d", [])
    with _pt.raises(ValueError):
        reciprocal_rank_fusion(df, "q", "d", ["s1"], k=0)


def test_reciprocal_rank_fusion_single_exchange(spark):
    """Every rank window and the final top-k window share ONE
    query-keyed Exchange (same partitioning; only in-partition sorts
    between them), and the top-k filter plans as WindowGroupLimit."""
    from yaetl_spark.operators import reciprocal_rank_fusion

    rows = [(i % 5, f"d{i}", float(i % 7), float(i % 3))
            for i in range(200)]
    df = spark.createDataFrame(rows, ["q", "d", "s1", "s2"])
    plan = reciprocal_rank_fusion(df, "q", "d", ["s1", "s2"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "WindowGroupLimit" in plan


def test_ngram_novelty_known_values(spark):
    from yaetl_spark.operators import ngram_novelty

    ref = spark.createDataFrame([("the quick brown fox jumps",)], ["text"])
    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps"),          # all 3 trigrams known
        (2, "a totally new sentence here folks"),  # all 4 novel
        (3, "the quick brown cat jumps high"),     # 1 of 4 known
        (4, ""),                                   # no grams -> absent
        (5, None),                                 # NULL text -> absent
    ], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in ngram_novelty(docs, ref, n=3).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[1]["n_grams"], got[1]["n_known"], got[1]["novelty"]) == (3, 3, 0.0)
    assert (got[2]["n_grams"], got[2]["n_known"], got[2]["novelty"]) == (4, 0, 1.0)
    assert (got[3]["n_grams"], got[3]["n_known"], got[3]["novelty"]) == (4, 1, 0.75)
    # a corpus is never novel against itself
    self_nov = ngram_novelty(docs.filter("doc_id <= 3"),
                             docs.filter("doc_id <= 3"), n=3)
    assert all(r["novelty"] == 0.0 for r in self_nov.collect())
    # partition invariance
    again = ngram_novelty(docs.repartition(7), ref, n=3)
    assert {tuple(r) for r in again.collect()} == {
        tuple(r) for r in ngram_novelty(docs, ref, n=3).collect()}


def test_random_projection_properties(spark):
    """Deterministic planes; (approximate, rounding-bounded) linearity;
    NULL vectors project to NULL; out_dim validated; scan-only plan."""
    from pyspark.sql import functions as F

    from yaetl_spark.operators import random_projection

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [0.0, 0.0, 0.0, 0.0]),
         (3, None)],
        "id int, v array<double>",
    )
    out = {r["id"]: r["v_proj"]
           for r in random_projection(df, "v", out_dim=4).collect()}
    # same input, same seed -> identical output (no RNG state)
    out2 = {r["id"]: r["v_proj"]
            for r in random_projection(df.repartition(3), "v",
                                       out_dim=4).collect()}
    assert out == out2
    assert out[2] == [0.0, 0.0, 0.0, 0.0]
    assert out[3] is None
    # linearity up to the output rounding: proj(2v) == 2*proj(v)
    dbl = {r["id"]: r["v_proj"] for r in random_projection(
        df.withColumn("v", F.transform("v", lambda x: x * 2)),
        "v", out_dim=4).collect()}
    assert all(abs(a * 2 - b) < 2e-6 for a, b in zip(out[1], dbl[1]))
    import pytest as _pt
    with _pt.raises(ValueError):
        random_projection(df, "v", out_dim=0)
    plan = random_projection(df, "v", out_dim=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure scan-level arithmetic


def test_pq_encode_known_values(spark):
    """Hand-built m=2, k=2 codebooks over 4-dim vectors: codes pick the
    nearest sub-centroid per slice, ties break to the LOWEST code (the
    build_ivf_index struct-min rule), reconstruction error is the sum
    of the per-subspace minima, NULL vectors encode to NULL."""
    from yaetl_spark.operators import pq_encode

    books = [
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])],
        [(0, [0.0, 0.0]), (1, [4.0, 0.0])],
    ]
    df = spark.createDataFrame(
        [(1, [0.5, 0.0, 4.0, 0.0]),   # sub0 -> 0 (d=.25), sub1 -> 1 (d=0)
         (2, [9.0, 9.0, 2.0, 0.0]),   # sub0 -> 1 (d=2), sub1 tie -> 0
         (3, None)],
        "id int, v array<double>",
    )
    out = {r["id"]: (r["pq_code"], r["err"])
           for r in pq_encode(df, books, vec_col="v",
                              error_col="err").collect()}
    assert out[1] == ([0, 1], 0.25)
    assert out[2] == ([1, 0], 2.0 + 4.0)  # tie at d=4 goes to code 0
    assert out[3] == (None, None)
    # scan-only: codebooks are literals, no shuffle
    plan = pq_encode(df, books, vec_col="v") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pq_fit_and_adc_topk(spark):
    """pq_fit recovers an obviously-clustered structure per subspace;
    pq_adc_topk ranks by LUT distance without reading vectors and its
    plan is a scan + global top-k (TakeOrderedAndProject)."""
    from yaetl_spark.operators import pq_adc_topk, pq_encode, pq_fit
    import pytest as _pt

    # two tight clusters in each 2-dim subspace
    rows = []
    for i in range(8):
        a = [0.0, 0.0] if i % 2 == 0 else [10.0, 10.0]
        b = [5.0, 0.0] if i < 4 else [0.0, 5.0]
        rows.append((i, [x + 0.01 * i for x in a] + b))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    books = pq_fit(df, m=2, k=2, iters=2, init_ids=[0, 1], cache=True)
    assert len(books) == 2 and all(len(b) == 2 for b in books)
    assert all(len(cv) == 2 for b in books for _, cv in b)
    enc = pq_encode(df, books)
    # same-cluster rows share codes per subspace
    codes = {r["vec_id"]: list(r["pq_code"]) for r in enc.collect()}
    assert codes[0][0] == codes[2][0] and codes[1][0] == codes[3][0]
    assert codes[0][0] != codes[1][0]
    # ADC: query at the even/first cluster -> nearest are even ids < 4
    top = pq_adc_topk(enc, books, [0.0, 0.0, 5.0, 0.0], top_k=3)
    got = [r["vec_id"] for r in top.collect()]
    assert got[0] in (0, 2) and len(got) == 3
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    with _pt.raises(ValueError, match="query dim"):
        pq_adc_topk(enc, books, [1.0, 2.0], top_k=3)
    with _pt.raises(ValueError, match="divisible"):
        pq_fit(df, m=3, k=2, iters=1, init_ids=[0, 1])


def test_ivf_pq_topk_prunes_and_ranks(spark):
    """IVFADC: rows outside the probed coarse cells never appear even
    if their ADC distance is small; within the probe set, ranking is
    by LUT distance with id tie-break, and the plan is a pruned scan +
    one global top-k (no shuffle, no join)."""
    from yaetl_spark.operators import (build_ivf_index, ivf_pq_topk,
                                       pq_encode)

    # two coarse cells far apart in the first two dims
    cents = [(0, [0.0, 0.0, 0.0, 0.0]), (1, [100.0, 100.0, 0.0, 0.0])]
    books = [
        [(0, [0.0, 0.0]), (1, [100.0, 100.0])],
        [(0, [0.0, 0.0]), (1, [5.0, 0.0])],
    ]
    rows = [(1, [0.1, 0.0, 0.0, 0.0]),
            (2, [0.2, 0.0, 5.0, 0.0]),
            (3, [99.9, 99.9, 0.0, 0.0])]   # near the query in PQ terms
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    assigned, _ = build_ivf_index(df, centroids=cents)
    enc = pq_encode(assigned, books)
    top = ivf_pq_topk(enc, cents, books, [0.0, 0.0, 0.0, 0.0],
                      k=3, nprobe=1)
    got = [(r["vec_id"], r["adc_dist"]) for r in top.collect()]
    # nprobe=1 probes cell 0 only: vec 3 is EXCLUDED despite any score
    assert [v for v, _ in got] == [1, 2]
    # ADC: vec 1 codes (0,0) -> 0.0; vec 2 codes (0,1) -> 25.0
    assert got[0] == (1, 0.0) and got[1] == (2, 25.0)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan
    # nprobe=2 admits the far cell
    all3 = ivf_pq_topk(enc, cents, books, [0.0, 0.0, 0.0, 0.0],
                       k=3, nprobe=2)
    assert {r["vec_id"] for r in all3.collect()} == {1, 2, 3}


def test_topk_recall_counts_and_edges(spark):
    """Known overlap arithmetic; duplicate-free counting; empty exact
    set yields NULL recall instead of an ANSI 0/0."""
    from yaetl_spark.operators import topk_recall

    exact = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)],
                                  ["vec_id"])
    approx = spark.createDataFrame([(i,) for i in (3, 4, 5)],
                                   ["vec_id"])
    r = topk_recall(exact, approx).first()
    assert (r["n_exact"], r["n_approx"], r["n_overlap"]) == (4, 3, 2)
    assert r["recall"] == 0.5
    # identical sets -> recall 1; disjoint -> 0
    assert topk_recall(exact, exact).first()["recall"] == 1.0
    disjoint = spark.createDataFrame([(9,)], ["vec_id"])
    assert topk_recall(exact, disjoint).first()["recall"] == 0.0
    # empty exact side -> NULL recall, zero counts
    empty = exact.filter("vec_id > 100")
    re = topk_recall(empty, approx).first()
    assert re["n_exact"] == 0 and re["recall"] is None


def test_hard_negative_mining_band_and_rank(spark):
    """Band semantics: near-dups (cosine >= hi) and easy negatives
    (< lo) are excluded; survivors rank per anchor by cosine desc with
    id tie-break; per_anchor caps the fan-out; cross-cell candidates
    never pair. Both directions of a pair appear (anchor-centric)."""
    from yaetl_spark.operators import hard_negative_mining

    # cell 0 anchor family: v1 ~ v2 (near-dup), v1 vs v3 moderate,
    # v1 vs v4 orthogonal; v5 sits in the other cell
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0])]
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),     # cos(1,2) ~ 0.9999 -> >= hi, out
        (3, [0.5, 0.86, 0.0]),       # cos(1,3) ~ 0.5 -> in band
        (4, [0.0, 1.0, 0.0]),        # cos(1,4) = 0 -> < lo, out
        (5, [0.4, 0.65, 0.1]),       # cos(1,5) ~ 0.52 in band
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = hard_negative_mining(
        df, lo=0.3, hi=0.95, per_anchor=2, centroids=cents)
    got = {(r["anchor"], r["negative"]): (r["cosine"], r["neg_rank"])
           for r in out.collect()}
    # anchor 1: 5 (cos ~.520) outranks 3 (cos ~.503); 2 excluded as a
    # near-dup, 4 excluded as orthogonal
    assert got[(1, 5)][1] == 1 and got[(1, 3)][1] == 2
    assert all(n not in (2, 4) for a, n in got if a == 1)
    # anchor-centric both ways: 3's own list is ranked from ITS view
    # (4 at ~.865 leads) and the per_anchor=2 cut drops 1 and 5
    assert got[(3, 4)][1] == 1 and (3, 1) not in got
    # band bounds hold everywhere (rounded cosine in [lo, hi))
    assert all(0.3 <= c < 0.95 for c, _ in got.values())
    # per_anchor cap respected
    from collections import Counter
    assert max(Counter(a for a, _ in got).values()) <= 2
    import pytest as _pt
    with _pt.raises(ValueError, match="lo"):
        hard_negative_mining(df, lo=0.9, hi=0.5, centroids=cents)


def test_hard_negative_mining_max_cell_guard(spark):
    """A collapsed fit (one centroid: every vector in one cell) must
    trip max_cell_rows with the same actionable error semantic_dedup
    raises, instead of silently planning the all-pairs join; a
    well-spread fit under the bound passes with the result unchanged
    (r12 verdict What's-wrong #1)."""
    import pytest as _pt

    from yaetl_spark.operators import hard_negative_mining

    cents2 = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0])]
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.5, 0.86, 0.0]),
        (4, [0.0, 1.0, 0.0]),
        (5, [0.4, 0.65, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    with _pt.raises(ValueError, match="hard_negative_mining cell"):
        hard_negative_mining(
            df, lo=0.3, hi=0.95, centroids=[(0, [1.0, 0.0, 0.0])],
            max_cell_rows=3,
        )
    with _pt.raises(ValueError, match="max_cell_rows must be"):
        hard_negative_mining(df, centroids=cents2, max_cell_rows=0)
    guarded = hard_negative_mining(
        df, lo=0.3, hi=0.95, per_anchor=2, centroids=cents2,
        max_cell_rows=5,
    )
    free = hard_negative_mining(
        df, lo=0.3, hi=0.95, per_anchor=2, centroids=cents2)
    key = lambda r: (r["anchor"], r["negative"])  # noqa: E731
    assert sorted(map(key, guarded.collect())) == \
        sorted(map(key, free.collect()))


def test_pq_adc_topk_codebook_mismatch_is_loud(spark):
    """Codes produced by a DIFFERENT codebook (values outside the
    map's key set) must raise in-plan, not sort NULL distances into
    the top-k (r12 ADVICE: asc() puts NULLs first)."""
    import pytest as _pt

    from yaetl_spark.operators import pq_adc_topk

    books = [
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])],
        [(0, [0.0, 0.0]), (1, [4.0, 0.0])],
    ]
    bad = spark.createDataFrame(
        [(1, [0, 1]), (2, [7, 0])],  # code 7 exists in no codebook
        "vec_id int, pq_code array<int>",
    )
    with _pt.raises(Exception, match="NULL ADC distance"):
        pq_adc_topk(bad, books, [0.0] * 4, top_k=2).collect()
    # well-coded rows still rank normally through the guard
    ok = spark.createDataFrame(
        [(1, [0, 0]), (2, [1, 1])], "vec_id int, pq_code array<int>")
    got = [r["vec_id"] for r in
           pq_adc_topk(ok, books, [0.0] * 4, top_k=2).collect()]
    assert got == [1, 2]


def test_pq_fit_null_vector_probe(spark):
    """The width probe must skip NULL vectors (a NULL first row used
    to yield size()=-1 and a misleading divisibility error) and raise
    a clear diagnostic when NO vector is non-null (r12 ADVICE)."""
    import pytest as _pt

    from yaetl_spark.operators import pq_fit

    all_null = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id int, embedding array<double>")
    with _pt.raises(ValueError, match="no non-null vectors"):
        pq_fit(all_null, m=2, k=2, iters=1)
    # NULL-first ordering must not break the probe: dim comes from the
    # non-null row and the fit proceeds
    mixed = spark.createDataFrame(
        [(0, None), (1, [0.0, 0.0, 5.0, 0.0]),
         (2, [10.0, 10.0, 0.0, 5.0])],
        "vec_id int, embedding array<double>")
    books = pq_fit(mixed, m=2, k=2, iters=1, init_ids=[1, 2])
    assert len(books) == 2 and all(len(b) == 2 for b in books)


def test_token_count_estimate_bounds_and_edges(spark):
    """vocab_permille=1000 -> every word is 1 token (count == token
    count); =0 -> every word longer than short_len costs
    ceil(len/piece_chars); digits split singly; punct costs 1;
    empty -> 0; NULL -> NULL."""
    from yaetl_spark.operators import token_count_estimate

    txt = "The cat extraordinarily 42, ok!"
    # tokens: the(3) cat(3) extraordinarily(15) 4 2 , ok(2) !
    df = spark.createDataFrame(
        [(1, txt), (2, ""), (3, None)], ["id", "text"])
    hi = {r["id"]: r["n"] for r in df.select(
        "id", token_count_estimate(
            F.col("text"), vocab_permille=1000).alias("n")).collect()}
    lo = {r["id"]: r["n"] for r in df.select(
        "id", token_count_estimate(
            F.col("text"), vocab_permille=0).alias("n")).collect()}
    assert hi[1] == 8          # every word in vocab
    assert lo[1] == 8 - 1 + 4  # extraordinarily -> ceil(15/4) = 4 pieces
    assert hi[2] == 0 and lo[2] == 0
    assert hi[3] is None and lo[3] is None
    # default permille sits between the bounds
    mid = df.select(token_count_estimate(F.col("text")).alias("n")) \
        .collect()[0]["n"]
    assert hi[1] <= mid <= lo[1]
    import pytest as _pt
    with _pt.raises(ValueError, match="vocab_permille"):
        token_count_estimate(F.col("text"), vocab_permille=1001)
    with _pt.raises(ValueError, match="piece_chars"):
        token_count_estimate(F.col("text"), piece_chars=0)


def test_random_projection_empty_vector(spark):
    """A zero-length (non-NULL) vector projects to 0.0 components
    instead of raising INVALID_INDEX_OF_ZERO — r11 ADVICE: sequence(0,
    size-1) descends when size=0 and element_at(v, 0) always throws;
    the SQL oracle's fold over range(1, len+1) yields 0.0 there."""
    from yaetl_spark.operators import random_projection

    df = spark.createDataFrame(
        [(1, []), (2, [1.0, -1.0]), (3, None)],
        "id int, v array<double>",
    )
    out = {r["id"]: r["v_proj"]
           for r in random_projection(df, "v", out_dim=4).collect()}
    assert out[1] == [0.0, 0.0, 0.0, 0.0]
    assert out[3] is None
    assert len(out[2]) == 4 and any(c != 0.0 for c in out[2])


def test_reciprocal_rank_fusion_rejects_output_collisions(spark):
    """Output-contract columns (rank_<sc>, fused_score, fused_rank)
    already present in the input are rejected loudly instead of being
    silently clobbered (r11 ADVICE)."""
    import pytest as _pt

    from yaetl_spark.operators import reciprocal_rank_fusion

    base = spark.createDataFrame(
        [("q", "d", 1.0)], ["query_id", "doc_id", "bm25"])
    for bad in ("rank_bm25", "fused_score", "fused_rank"):
        df = base.withColumn(bad, F.lit(0))
        with _pt.raises(ValueError, match=bad):
            reciprocal_rank_fusion(df, "query_id", "doc_id", ["bm25"])
    # clean input still works
    got = reciprocal_rank_fusion(
        base, "query_id", "doc_id", ["bm25"]).collect()
    assert got[0]["fused_rank"] == 1


def test_minhash_probe_cross_engine_parity(spark, sf_dir):
    """DuckDB replays the index+probe pipeline bit-for-bit in rolling
    mode: full-corpus LSH candidates (the oracle family
    __spark_entry__._minhash_cands_cte) restricted to cross
    (index, incoming) pairs equal minhash_probe(index(old), new) on the
    real documents table — the oracle blueprint for the query's
    eventual driver declaration (r16)."""
    import duckdb

    import __spark_entry__ as entry_mod
    from yaetl_spark.operators import minhash_index, minhash_probe

    # bands=16 (2 slot rows per band) makes the sf0.001 corpus collide
    # richly — ~200 cross pairs, so the parity is exercised, not vacuous
    nh, nb, thr, split, bound = 32, 16, 0.1, 250, 350
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kw = dict(num_hashes=nh, bands=nb, shingle_size=2, hash_fn="rolling")
    idx = minhash_index(docs.filter(f"doc_id < {split}"), **kw)
    got = sorted(
        (r["probe_id"], r["index_id"], r["jaccard_sim"])
        for r in minhash_probe(
            idx, docs.filter(f"doc_id >= {split} and doc_id < {bound}"),
            jaccard_threshold=thr, **kw).collect())
    assert len(got) > 100  # the parity must cover a real pair set

    sql = f"""
        WITH {entry_mod._minhash_cands_cte(nh, nb, bound=bound)}
        SELECT id_b AS probe_id, id_a AS index_id,
               round(list_sum(list_transform(range(1, {nh} + 1),
                     i -> CASE WHEN sa.sig[i] = sb.sig[i]
                               THEN 1 ELSE 0 END)) / {float(nh)}, 6)
                   AS jaccard_sim
        FROM cands
        JOIN sigs sa ON sa.doc_id = id_a
        JOIN sigs sb ON sb.doc_id = id_b
        WHERE id_a < {split} AND id_b >= {split}
          AND list_sum(list_transform(range(1, {nh} + 1),
                  i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))
              / {float(nh)} >= {thr}
    """
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'")
        want = sorted(map(tuple, con.execute(sql).fetchall()))
    finally:
        con.close()
    assert got == want


def _ref_bpe(word_counts, k, eow="</w>"):
    """Pure-Python Sennrich BPE (the published algorithm, verbatim):
    char init with end-of-word marker, most-frequent pair fused per
    round (count desc, then (left, right) lexicographic), leftmost
    non-overlapping application."""
    vocab = {}
    for w, n in word_counts.items():
        syms = tuple(list(w[:-1]) + [w[-1] + eow])
        vocab[syms] = vocab.get(syms, 0) + n
    merges = []
    for _ in range(k):
        pairs = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + n)
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p[0], p[1]))
        merges.append((best[0], best[1], pairs[best]))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + n
        vocab = new_vocab
    return merges, vocab


def test_bpe_train_matches_reference_algorithm(spark, sf_dir):
    """The distributed trainer reproduces the published Sennrich
    algorithm EXACTLY on the real documents table: same merge
    sequence with same counts, same final segmentation of every word
    — and is deterministic under repartitioning."""
    from collections import Counter

    from yaetl_spark.operators import bpe_train, tokenize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter("doc_id < 120")
    toks = [t for r in docs.select(
        tokenize(F.col("text")).alias("t")).collect() for t in r["t"]]
    want_merges, want_vocab = _ref_bpe(Counter(toks), 24)

    merges, vocab = bpe_train(docs, num_merges=24, return_vocab=True)
    got = [(r["left"], r["right"], r["pair_count"])
           for r in merges.orderBy("rank").collect()]
    assert got == want_merges
    got_vocab = {tuple(r["pieces"]): 0 for r in vocab.collect()}
    for r in vocab.collect():
        got_vocab[tuple(r["pieces"])] = (
            got_vocab.get(tuple(r["pieces"]), 0) + r["n_words"])
    assert {k: v for k, v in got_vocab.items() if v} == dict(want_vocab)
    again = bpe_train(docs.repartition(13), num_merges=24)
    assert [(r["left"], r["right"], r["pair_count"])
            for r in again.orderBy("rank").collect()] == want_merges


def test_bpe_train_exhaustion_min_count_and_validation(spark):
    """A corpus that fuses completely stops early (merge table shorter
    than num_merges, every word one piece); min_count excludes rare
    words from TRAINING but still segments them in the vocab; exact
    token counting via the vocab join works as documented; bad
    num_merges/min_count raise."""
    from yaetl_spark.operators import bpe_train, tokenize

    df = spark.createDataFrame(
        [(1, "aaa aaa aaa zq")], "doc_id long, text string")
    merges, vocab = bpe_train(df, num_merges=50, min_count=2,
                              return_vocab=True)
    rules = [(r["left"], r["right"]) for r in merges.orderBy("rank").collect()]
    # only 'aaa' trains (zq is rare): a+a, aa+a</w> — then exhaustion
    assert rules == [("a", "a"), ("aa", "a</w>")]
    pieces = {r["word"]: list(r["pieces"]) for r in vocab.collect()}
    assert pieces["aaa"] == ["aaa</w>"]
    assert pieces["zq"] == ["z", "q</w>"]  # segmented, just not trained
    # exact per-doc token count = explode -> vocab join -> sum sizes
    toks = df.select("doc_id", F.explode(tokenize(F.col("text"))).alias("word"))
    counted = (toks.join(F.broadcast(vocab), "word")
               .groupBy("doc_id")
               .agg(F.sum(F.size("pieces")).alias("n_tokens")).first())
    assert counted["n_tokens"] == 3 * 1 + 2
    with pytest.raises(ValueError, match="num_merges"):
        bpe_train(df, num_merges=0)
    with pytest.raises(ValueError, match="min_count"):
        bpe_train(df, min_count=0)


def test_bpe_train_256_merges_lineage_stays_flat(spark):
    """The documented operating envelope, pinned: a 256-merge run (4×
    the default, inside the ~64–1024 range the docstring declares)
    still reproduces the published algorithm EXACTLY, and the
    per-iteration eager localCheckpoint keeps the returned vocab's
    plan at CONSTANT depth — 256 merge folds never stack 256
    projections, so lineage (and with it driver plan memory /
    optimizer time) is flat in num_merges."""
    from collections import Counter

    from yaetl_spark.operators import bpe_train

    words = [
        "".join(chr(97 + ((i * 131 + j * 17 + (i * j * j) % 101) % 26))
                for j in range(10))
        for i in range(120)
    ]
    want_merges, _ = _ref_bpe(Counter(words), 256)
    assert len(want_merges) == 256  # the corpus sustains the full run

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string")
    merges, vocab = bpe_train(df, num_merges=256, return_vocab=True)
    got = [(r["left"], r["right"], r["pair_count"])
           for r in merges.orderBy("rank").collect()]
    assert got == want_merges
    # lineage discipline: the returned vocab reads the LAST checkpoint
    # — a few plan lines over an in-memory scan, however many merges
    # ran — instead of a num_merges-deep withColumn tower.
    plan = vocab._jdf.queryExecution().analyzed().toString()
    assert len(plan.splitlines()) < 10, plan
    assert "LogicalRDD" in plan or "ExistingRDD" in plan


def _bpe_oracle_sql(k, bound, sep="\x1f"):
    """Unrolled-CTE DuckDB replica of bpe_train (the r16 oracle
    blueprint): each symbol wraps as ``SEP+sym+SEP`` so adjacent
    replacements never share separator characters — string
    ``replace()`` is then EXACTLY the leftmost non-overlapping greedy
    merge scan — and every merge round is pairs-count → total-order
    argmax → replace, one CTE triple per rank. Every CTE is
    MATERIALIZED: default inlining would re-expand v_i (and the base
    scan) exponentially across the unrolled rounds."""
    parts = [f"""
    words AS MATERIALIZED (
        SELECT t AS w, COUNT(*) AS n
        FROM (SELECT unnest(list_filter(
                  regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                  x -> x <> '')) AS t
              FROM documents WHERE doc_id < {bound})
        GROUP BY t),
    v0 AS MATERIALIZED (
        SELECT n, list_reduce(
            list_transform(
                list_concat(
                    [substr(w, i, 1) for i in range(1, length(w))],
                    [substr(w, length(w), 1) || '</w>']),
                s -> '{sep}' || s || '{sep}'),
            (a, b) -> a || b) AS s
        FROM words)"""]
    for i in range(k):
        parts.append(f"""
    p{i} AS MATERIALIZED (
        SELECT l, r, SUM(n) AS c
        FROM (
            SELECT n,
                   unnest(toks[1:len(toks)-1]) AS l,
                   unnest(toks[2:len(toks)]) AS r
            FROM (SELECT n, str_split(trim(s, '{sep}'),
                                      '{sep}{sep}') AS toks
                  FROM v{i})
        ) GROUP BY l, r),
    b{i} AS MATERIALIZED (
        SELECT l, r, c FROM p{i}
        ORDER BY c DESC, l ASC, r ASC LIMIT 1),
    v{i + 1} AS MATERIALIZED (
        SELECT n, replace(s,
            '{sep}' || (SELECT l FROM b{i}) || '{sep}{sep}'
                    || (SELECT r FROM b{i}) || '{sep}',
            '{sep}' || (SELECT l || r FROM b{i}) || '{sep}') AS s
        FROM v{i})""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, l AS left, r AS right, "
        f"CAST(c AS BIGINT) AS pair_count FROM b{i}" for i in range(k))
    return f"WITH {','.join(parts)} SELECT * FROM ({sel}) ORDER BY rank"


def test_bpe_train_cross_engine_parity(spark, sf_dir):
    """DuckDB replays the whole iterative trainer bit-for-bit on the
    real documents table — merge sequence AND final segmentations —
    via the wrapped-symbol replace trick, proving the r16 driver
    declaration can use a FULL oracle rather than a rows-only check."""
    import duckdb

    from yaetl_spark.operators import bpe_train

    K, BOUND, SEP = 8, 120, "\x1f"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter(f"doc_id < {BOUND}")
    merges, vocab = bpe_train(docs, num_merges=K, return_vocab=True)
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in merges.orderBy("rank").collect()]

    con = duckdb.connect()
    try:
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        want = [tuple(r) for r in
                con.execute(_bpe_oracle_sql(K, BOUND, SEP)).fetchall()]
        # final segmentations too: vK holds every word's merged string
        seg_sql = _bpe_oracle_sql(K, BOUND, SEP).split("SELECT * FROM")[0] \
            + (f"SELECT w.w AS word, str_split(trim(v.s, '{SEP}'), "
               f"'{SEP}{SEP}') AS pieces "
               f"FROM v{K} v POSITIONAL JOIN words w")
        want_seg = {r[0]: list(r[1])
                    for r in con.execute(seg_sql).fetchall()}
    finally:
        con.close()
    assert got == want and len(got) == K
    got_seg = {r["word"]: list(r["pieces"]) for r in vocab.collect()}
    assert got_seg == want_seg


def _ref_bpe_apply(rules, word, eow="</w>"):
    """Pure-Python application of an ordered merge-rule list to one
    word: char init + leftmost non-overlapping scan per rule — the
    published tokenize step bpe_apply's nested fold must reproduce."""
    syms = list(word[:-1]) + [word[-1] + eow]
    for left, right in rules:
        out, i = [], 0
        while i < len(syms):
            if (i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == (left, right)):
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _ref_bpe_batched(word_counts, k, n_per_sweep, window=None,
                     eow="</w>"):
    """Pure-Python reference of bpe_train's batched contract: per
    sweep, scan the top-``window`` pairs in (count desc, left, right)
    order and greedily keep up to N whose {left, right, left+right}
    trios are pairwise disjoint; fuse kept rules in kept order."""
    window = window or 8 * n_per_sweep
    vocab = {}
    for w, n in word_counts.items():
        syms = tuple(list(w[:-1]) + [w[-1] + eow])
        vocab[syms] = vocab.get(syms, 0) + n
    merges = []
    while len(merges) < k:
        pairs = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        ordered = sorted(pairs, key=lambda p: (-pairs[p], p[0], p[1]))
        picked, used = [], set()
        for p in ordered[:window]:
            if len(picked) == min(n_per_sweep, k - len(merges)):
                break
            trio = {p[0], p[1], p[0] + p[1]}
            if trio & used:
                continue
            picked.append(p)
            used |= trio
        for p in picked:
            merges.append((p[0], p[1], pairs[p]))
        new_vocab = {}
        for syms, n in vocab.items():
            out = list(syms)
            for rule in picked:
                out = _apply_one_bpe_rule(out, rule)
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + n
        vocab = new_vocab
    return merges, vocab


def _apply_one_bpe_rule(syms, rule):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == rule:
            out.append(rule[0] + rule[1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_bpe_apply_matches_train_vocab(spark, sf_dir):
    """bpe_apply on the TRAINING corpus reproduces bpe_train's own
    vocab segmentation bit-for-bit (the single-fold-over-rules
    expression equals the trainer's per-merge fold sequence), and the
    per-doc counts equal an independent explode→join→sum recompute."""
    from yaetl_spark.operators import bpe_apply, bpe_train, tokenize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter("doc_id < 120")
    merges, tvocab = bpe_train(docs, num_merges=16, return_vocab=True)
    counts, avocab = bpe_apply(docs, merges, return_vocab=True)
    want_seg = {r["word"]: list(r["pieces"]) for r in tvocab.collect()}
    got_seg = {r["word"]: list(r["pieces"]) for r in avocab.collect()}
    assert got_seg == want_seg
    want_counts = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.explode(tokenize(F.col("text"))).alias("word"))
        .join(tvocab, "word")
        .groupBy("doc_id").agg(F.sum(F.size("pieces")).alias("n"))
        .collect()}
    got_counts = {r["doc_id"]: r["bpe_token_count"]
                  for r in counts.collect()}
    # every doc present; token-free docs count 0, the rest match
    assert set(got_counts) == {
        r["doc_id"] for r in docs.select("doc_id").collect()}
    for d, n in got_counts.items():
        assert n == want_counts.get(d, 0), d


def test_bpe_apply_oov_nulls_zero_rules_and_guard(spark):
    """Scoring a DIFFERENT corpus: unseen words segment from chars
    through whatever merges fire (pure-Python reference parity), null
    and token-free texts count 0, a plain (left, right) list works as
    the merge table, zero rules give character counts, and the
    max_merges literal guard raises actionably."""
    import pytest

    from yaetl_spark.operators import bpe_apply, bpe_train

    train = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "newer new newest lower")],
        "doc_id bigint, text string")
    score = spark.createDataFrame(
        [(10, "low newest slower"), (11, ""), (12, None),
         (13, "zzz")],
        "doc_id bigint, text string")
    merges = bpe_train(train, num_merges=10)
    rules = [(r["left"], r["right"])
             for r in merges.orderBy("rank").collect()]
    counts, vocab = bpe_apply(score, merges, return_vocab=True)
    got_seg = {r["word"]: list(r["pieces"]) for r in vocab.collect()}
    for w in ["low", "newest", "slower", "zzz"]:
        assert got_seg[w] == _ref_bpe_apply(rules, w), w
    got = {r["doc_id"]: r["bpe_token_count"] for r in counts.collect()}
    want10 = sum(len(_ref_bpe_apply(rules, w))
                 for w in ["low", "newest", "slower"])
    assert got == {10: want10, 11: 0, 12: 0,
                   13: len(_ref_bpe_apply(rules, "zzz"))}
    # a plain ordered list is accepted and equals the DataFrame path
    got_list = {r["doc_id"]: r["bpe_token_count"]
                for r in bpe_apply(score, rules).collect()}
    assert got_list == got
    # zero rules → the no-merges segmentation: one piece per char
    got0 = {r["doc_id"]: r["bpe_token_count"]
            for r in bpe_apply(score, []).collect()}
    assert got0 == {10: len("lownewestslower"), 11: 0, 12: 0, 13: 3}
    with pytest.raises(ValueError, match="max_merges"):
        bpe_apply(score, rules, max_merges=3)


def test_bpe_train_batched_matches_reference(spark, sf_dir):
    """merges_per_sweep>1 follows the batched contract EXACTLY (pure-
    Python reference parity on the real documents table: same rules,
    same counts, same final segmentations), merges_per_sweep=1 is the
    exact-Sennrich path unchanged, and the validation raises."""
    from collections import Counter

    import pytest

    from yaetl_spark.operators import bpe_apply, bpe_train, tokenize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter("doc_id < 120")
    toks = [t for r in docs.select(
        tokenize(F.col("text")).alias("t")).collect() for t in r["t"]]
    want_merges, want_vocab = _ref_bpe_batched(Counter(toks), 24, 4)
    merges, vocab = bpe_train(docs, num_merges=24, merges_per_sweep=4,
                              return_vocab=True)
    got = [(r["left"], r["right"], r["pair_count"])
           for r in merges.orderBy("rank").collect()]
    assert got == want_merges
    got_vocab: dict = {}
    for r in vocab.collect():
        k = tuple(r["pieces"])
        got_vocab[k] = got_vocab.get(k, 0) + r["n_words"]
    assert got_vocab == dict(want_vocab)
    # sweep=1 param goes through the unchanged exact-Sennrich path
    exact = bpe_train(docs, num_merges=8)
    one = bpe_train(docs, num_merges=8, merges_per_sweep=1)
    assert [tuple(r) for r in one.collect()] == \
        [tuple(r) for r in exact.collect()]
    # the batched table applies cleanly: bpe_apply(train corpus)
    # reproduces the batched trainer's own segmentations
    _, avocab = bpe_apply(docs, merges, return_vocab=True)
    assert {r["word"]: list(r["pieces"]) for r in avocab.collect()} == \
        {r["word"]: list(r["pieces"]) for r in vocab.collect()}
    with pytest.raises(ValueError, match="merges_per_sweep"):
        bpe_train(docs, merges_per_sweep=0)
    with pytest.raises(ValueError, match="candidate_window"):
        bpe_train(docs, merges_per_sweep=4, candidate_window=2)


def _bpe_apply_oracle_sql(k, train_bound, score_bound, sep="\x1f"):
    """Unrolled-CTE DuckDB replica of bpe_train(train)+bpe_apply(score)
    — the r17 driver-oracle blueprint: the :func:`_bpe_oracle_sql`
    train chain derives the merge rules (b0..b{k-1}), then a second
    wrapped-symbol replace chain applies them IN RANK ORDER to the
    SCORED corpus's distinct words (char-BPE OOV semantics: unseen
    words enter at s0 and segment through whatever rules fire), and
    per-doc counts come from a token join with token-free/null docs
    kept at 0."""
    base = _bpe_oracle_sql(k, train_bound, sep).split("SELECT * FROM")[0]
    split = ("list_filter(regexp_split_to_array(lower(text), "
             "'[^a-z0-9]+'), x -> x <> '')")
    parts = [f"""
    sw AS MATERIALIZED (
        SELECT DISTINCT t AS w
        FROM (SELECT unnest({split}) AS t
              FROM documents WHERE doc_id < {score_bound})),
    s0 AS MATERIALIZED (
        SELECT w, list_reduce(
            list_transform(
                list_concat(
                    [substr(w, i, 1) for i in range(1, length(w))],
                    [substr(w, length(w), 1) || '</w>']),
                s -> '{sep}' || s || '{sep}'),
            (a, b) -> a || b) AS s
        FROM sw)"""]
    for i in range(k):
        parts.append(f"""
    s{i + 1} AS MATERIALIZED (
        SELECT w, replace(s,
            '{sep}' || (SELECT l FROM b{i}) || '{sep}{sep}'
                    || (SELECT r FROM b{i}) || '{sep}',
            '{sep}' || (SELECT l || r FROM b{i}) || '{sep}') AS s
        FROM s{i})""")
    parts.append(f"""
    wp AS (SELECT w, len(str_split(trim(s, '{sep}'),
                                   '{sep}{sep}')) AS np
           FROM s{k}),
    tok AS (SELECT doc_id, unnest({split}) AS t
            FROM documents WHERE doc_id < {score_bound})""")
    return f"""{base.rstrip()}, {','.join(parts)}
    SELECT d.doc_id,
           CAST(COALESCE(SUM(wp.np), 0) AS BIGINT) AS bpe_token_count
    FROM (SELECT doc_id FROM documents WHERE doc_id < {score_bound}) d
    LEFT JOIN tok ON tok.doc_id = d.doc_id
    LEFT JOIN wp ON wp.w = tok.t
    GROUP BY d.doc_id ORDER BY d.doc_id"""


def test_bpe_apply_cross_engine_parity(spark, sf_dir):
    """DuckDB replays train-then-apply bit-for-bit on the real
    documents table, scoring a STRICT SUPERSET of the training range
    (so OOV segmentation is exercised) — proving the r17 bpe_apply
    declaration can use a FULL hash oracle."""
    import duckdb

    from yaetl_spark.operators import bpe_apply, bpe_train

    K, TRAIN, SCORE = 8, 120, 200
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe_train(docs.filter(f"doc_id < {TRAIN}"), num_merges=K)
    got = sorted(
        (r["doc_id"], r["bpe_token_count"])
        for r in bpe_apply(docs.filter(f"doc_id < {SCORE}"),
                           merges).collect())
    con = duckdb.connect()
    try:
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf_dir}/documents.parquet'")
        want = [tuple(r) for r in con.execute(
            _bpe_apply_oracle_sql(K, TRAIN, SCORE)).fetchall()]
    finally:
        con.close()
    assert got == want and len(got) == SCORE


def test_bpe_train_property_random_corpora(spark):
    """Hypothesis fuzz: on arbitrary tiny corpora (repeats, ties,
    single-char words, full fusions) the distributed trainer's merge
    sequence equals the verbatim published algorithm's — the tiebreak
    total order and the greedy fold have no input-shaped blind spots."""
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from yaetl_spark.operators import bpe_train

    word = st.text(alphabet="ab", min_size=1, max_size=4)

    @settings(max_examples=3, deadline=None)
    @given(st.lists(word, min_size=1, max_size=12),
           st.integers(min_value=1, max_value=4))
    def run(words, k):
        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)],
            "doc_id long, text string")
        got = [(r["left"], r["right"], r["pair_count"])
               for r in bpe_train(df, num_merges=k).orderBy("rank")
               .collect()]
        assert got == _ref_bpe(Counter(words), k)[0], (words, k)

    run()


def test_minhash_probe_property_random_split(spark):
    """Hypothesis fuzz: for random corpora and random split points,
    probe(index(old), new) always equals minhash_lsh(corpus)'s cross
    pairs — banding equivalence holds for every corpus shape, not just
    the curated fixture."""
    from hypothesis import given, settings, strategies as st

    from yaetl_spark.operators import minhash_index, minhash_probe

    word = st.sampled_from(["quick", "brown", "fox", "lazy", "dog"])
    doc = st.lists(word, min_size=1, max_size=6).map(" ".join)

    @settings(max_examples=3, deadline=None)
    @given(st.lists(doc, min_size=2, max_size=8), st.data())
    def run(texts, data):
        split = data.draw(st.integers(min_value=1,
                                      max_value=len(texts) - 1))
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")
        kw = dict(num_hashes=16, bands=8, shingle_size=2,
                  hash_fn="rolling")
        got = {(r["probe_id"], r["index_id"]): r["jaccard_sim"]
               for r in minhash_probe(
                   minhash_index(df.filter(f"doc_id < {split}"), **kw),
                   df.filter(f"doc_id >= {split}"),
                   jaccard_threshold=None, **kw).collect()}
        want = {(r["id_b"], r["id_a"]): r["jaccard_sim"]
                for r in minhash_lsh(df, jaccard_threshold=None,
                                     **kw).collect()
                if r["id_a"] < split <= r["id_b"]}
        assert got == want, (texts, split)

    run()
