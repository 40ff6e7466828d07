"""Curation operators: corpus line dedup, per-group caps, Gopher rules.

Covers semantics (small hand-built corpora with known answers), the
partition-invariance property (the Spark analogue of the reference's
batch-invariance tests, ``/root/reference/tests/YaEtlTest.php:112-124``),
and the determinism contract of ``cap_per_group``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yaetl_spark.operators import (
    cap_per_group,
    frequent_lines,
    gopher_quality_flags,
    hash_bucket,
    line_dedup,
)

from .conftest import table_path


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# --- line_dedup -------------------------------------------------------------


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "cookie banner\nunique alpha\nfooter"),
            (2, "cookie banner\nunique beta\nfooter"),
            (3, "cookie banner\nunique gamma"),
            (4, "cookie banner\nfooter"),
            (5, "all original text here"),
        ],
        "doc_id long, text string",
    )


def test_line_dedup_removes_hot_lines_keeps_order(spark):
    # "cookie banner" x4 and "footer" x3 exceed max_occurrences=2
    out = {
        r.doc_id: (r.text, r.n_lines)
        for r in line_dedup(_corpus(spark), max_occurrences=2).collect()
    }
    assert out[1] == ("unique alpha", 1)
    assert out[2] == ("unique beta", 1)
    assert out[3] == ("unique gamma", 1)
    assert out[5] == ("all original text here", 1)
    # doc 4 was ONLY boilerplate → dropped entirely (drop_empty=True)
    assert 4 not in out


def test_line_dedup_keep_empty_docs(spark):
    out = {
        r.doc_id: (r.text, r.n_lines)
        for r in line_dedup(
            _corpus(spark), max_occurrences=2, drop_empty=False
        ).collect()
    }
    assert out[4] == ("", 0)
    assert len(out) == 5


def test_line_dedup_min_line_chars_exemption(spark):
    # exempt lines shorter than 7 chars: "footer" (6) survives everywhere,
    # "cookie banner" (13) still gets cut
    out = {
        r.doc_id: r.text
        for r in line_dedup(
            _corpus(spark), max_occurrences=2, min_line_chars=7
        ).collect()
    }
    assert out[1] == "unique alpha\nfooter"
    assert out[4] == "footer"


def test_line_dedup_order_preserved_multiline(spark):
    df = spark.createDataFrame(
        [(1, "a\nhot\nb\nhot\nc"), (2, "hot"), (3, "hot")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in line_dedup(df, max_occurrences=2).collect()}
    # "hot" occurs 4 times total (twice in doc 1) → removed; order a,b,c kept
    assert out[1] == "a\nb\nc"


def test_line_dedup_partition_invariant(spark):
    docs = spark.read.parquet(table_path("documents"))
    a = line_dedup(docs, sep=" ", max_occurrences=20)
    b = line_dedup(docs.repartition(7), sep=" ", max_occurrences=20)
    assert _rows(a) == _rows(b)


def test_line_dedup_validates_threshold(spark):
    import pytest

    with pytest.raises(ValueError):
        line_dedup(_corpus(spark), max_occurrences=0)


# --- cap_per_group ----------------------------------------------------------


def test_cap_per_group_exact_quota_and_determinism(spark):
    docs = spark.read.parquet(table_path("documents"))
    capped = cap_per_group(docs, "source", "doc_id", 3)
    per = capped.groupBy("source").count().collect()
    assert per and all(r["count"] <= 3 for r in per)
    # deterministic: identical kept set regardless of partitioning
    again = cap_per_group(docs.repartition(11), "source", "doc_id", 3)
    assert _rows(capped) == _rows(again)
    # the kept rows are exactly the n smallest by (hash_bucket, key)
    one = docs.filter(F.col("source") == "src1").select(
        "doc_id", hash_bucket("doc_id", 1_000_000).alias("b")
    ).collect()
    expect = {r.doc_id for r in sorted(one, key=lambda r: (r.b, r.doc_id))[:3]}
    got = {
        r.doc_id
        for r in capped.filter(F.col("source") == "src1").collect()
    }
    assert got == expect


def test_cap_per_group_rank_col_and_groups_below_quota(spark):
    df = spark.createDataFrame(
        [(i, "g" if i < 8 else "tiny") for i in range(10)],
        "k long, g string",
    )
    out = cap_per_group(df, "g", "k", 5, rank_col="rk")
    got = {(r.g, r.rk) for r in out.collect()}
    assert sum(1 for g, _ in got if g == "g") == 5
    # a group smaller than the quota keeps everything
    assert sum(1 for g, _ in got if g == "tiny") == 2
    assert all(1 <= rk <= 5 for _, rk in got)


def test_cap_per_group_single_window_shuffle(spark):
    docs = spark.read.parquet(table_path("documents"))
    plan = (
        cap_per_group(docs, "source", "doc_id", 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one Exchange (the window's group partitioning), no extra shuffles
    assert plan.count("Exchange hashpartitioning") == 1


# --- gopher_quality_flags ---------------------------------------------------


def test_gopher_flags_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog ran to the old mill together"),
            (2, "short"),
            (3, "x " * 200),  # 200 one-char words → mean_word_len 1.0
            (4, "!!! ??? ... ;;; ### the and of to more words here now ok"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.asDict() for r in gopher_quality_flags(df).collect()}
    assert out[1]["gopher_pass"] is True
    assert out[1]["n_tokens"] == 11
    # doc 2: below min_tokens and no stopword markers
    assert out[2]["flag_tokens"] is False
    assert out[2]["gopher_pass"] is False
    # doc 3: mean word length 1.0 < 2.0
    assert out[3]["mean_word_len"] == 1.0
    assert out[3]["flag_word_len"] is False
    # doc 4: punctuation-heavy
    assert out[4]["flag_punct"] is False
    assert out[4]["gopher_pass"] is False


def test_gopher_flags_is_narrow_plan(spark):
    docs = spark.read.parquet(table_path("documents"))
    plan = (
        gopher_quality_flags(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure scan-level expressions


# --- frequent_lines ---------------------------------------------------------


def test_frequent_lines_inventory_matches_removal_set(spark):
    inv = {
        (r.line, r.n)
        for r in frequent_lines(_corpus(spark), min_occurrences=3).collect()
    }
    assert inv == {("cookie banner", 4), ("footer", 3)}


# --- cross-engine formula parity (hypothesis) -------------------------------


def test_hash_formulas_match_reference_arithmetic(spark):
    """The deterministic bucket/split formulas must be plain integer/md5
    arithmetic any engine reproduces — hypothesis drives random keys
    through Spark in ONE batch and replays the documented formula in
    Python. Catches silent drift in hash_bucket / hash_bucket_str /
    split_column (the oracle SQL embeds the same formulas)."""
    import hashlib

    from hypothesis import given, settings, strategies as st

    from yaetl_spark.operators import hash_bucket_str, split_column

    KNUTH, SALT = 2654435761, 12345

    @settings(max_examples=3, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**31 - 1),
            min_size=1, max_size=40, unique=True,
        )
    )
    def run(keys):
        df = spark.createDataFrame([(k, str(k)) for k in keys], "k long, s string")
        got = df.select(
            "k",
            hash_bucket("k", 1000).alias("b_int"),
            hash_bucket_str("s", 1000).alias("b_str"),
            split_column("k", (0.8, 0.1, 0.1)).alias("split"),
        ).collect()
        for r in got:
            assert r.b_int == (r.k * KNUTH + SALT) % 1000
            md5_prefix = int(hashlib.md5(str(r.k).encode()).hexdigest()[:8], 16)
            assert r.b_str == md5_prefix % 1000
            b = (r.k * KNUTH + SALT) % 10000
            expect = "train" if b < 8000 else ("val" if b < 9000 else "test")
            assert r.split == expect

    run()
