"""Transformer semantics — parity with the reference array-transformer
tests (tests/Arrays/*, FIXTURES.md §5)."""

from __future__ import annotations

import pyspark.sql.functions as F

from yaetl_spark import (
    Drop,
    Keep,
    MapFields,
    Rename,
    Replace,
    ReplaceRecursive,
    PandasMap,
    WithColumns,
)


def test_rename_preserves_order(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    out = Rename({"b": "bb"}).apply(df)
    assert out.columns == ["a", "bb", "c"]


def test_drop_and_keep(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    assert Drop("b").apply(df).columns == ["a", "c"]
    assert Keep("c", "a").apply(df).columns == ["c", "a"]


def test_replace_fill_nulls_mode(spark):
    df = spark.createDataFrame([(1, None), (2, "x")], "id int, v string")
    out = Replace(defaults={"v": "d"}, fill_nulls=True).apply(df)
    got = dict((r["id"], r["v"]) for r in out.collect())
    assert got == {1: "d", 2: "x"}


def test_replace_recursive_nested_struct(spark):
    """Nested defaults reach into struct fields; present values survive
    (ArrayReplaceRecursiveTransformerTest.php:15-51 analogue)."""
    df = spark.createDataFrame(
        [(1, {"a": 10, "b": None})],
        "id int, s struct<a:int, b:int>",
    )
    out = ReplaceRecursive(
        defaults={"s": {"c": 99}, "top": "t"},
        overrides={"s": {"a": 0}},
    ).apply(df)
    row = out.first()
    assert row["top"] == "t"
    assert row["s"]["a"] == 0  # override forces
    assert row["s"]["b"] is None  # present-but-null survives
    assert row["s"]["c"] == 99  # default adds missing nested field


def test_map_fields_trim(spark):
    """ArrayMapTransformer('trim') analogue (docs/citizens.md:262-273)."""
    df = spark.createDataFrame([("  a  ", " b ")], "x string, y string")
    out = MapFields(F.trim).apply(df)
    assert out.first().asDict() == {"x": "a", "y": "b"}


def test_map_fields_with_key(spark):
    df = spark.createDataFrame([(1, 2)], "x int, y int")
    out = MapFields(
        lambda c, name: c + 10 if name == "x" else c, with_key=True
    ).apply(df)
    assert out.first().asDict() == {"x": 11, "y": 2}


def test_with_columns(spark):
    df = spark.createDataFrame([(2,)], "x int")
    out = WithColumns(y=F.col("x") * 3).apply(df)
    assert out.first()["y"] == 6


def test_pandas_map_escape_hatch(spark):
    """CallableTransformer analogue: arbitrary record logic, Arrow-batched."""
    df = spark.createDataFrame([(i,) for i in range(100)], "x int")

    def fn(pdf):
        pdf["y"] = pdf["x"] * 2
        return pdf

    out = PandasMap(fn, "x int, y int").apply(df)
    rows = sorted((r["x"], r["y"]) for r in out.collect())
    assert rows[:3] == [(0, 0), (1, 2), (2, 4)] and len(rows) == 100


# -- property-based checks (hypothesis) -------------------------------------

try:
    from hypothesis import given, settings, strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False

if HAS_HYPOTHESIS:
    import pytest
    from pyspark.sql import functions as F

    from yaetl_spark.operators import rolling_fingerprint

    def _py_rolling(text: str, base: int = 31, mod: int = 2147483647) -> int:
        import re

        norm = re.sub(r"\s+", " ", text).strip().lower()
        h = 0
        for ch in norm:
            h = (h * base + ord(ch)) % mod
        return h

    @settings(max_examples=20, deadline=None)
    @given(st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=40),
        min_size=1, max_size=8))
    def test_rolling_fingerprint_matches_python_model(texts):
        spark = pytest.importorskip("pyspark.sql").SparkSession.getActiveSession()
        if spark is None:
            from yaetl_spark.session import get_spark

            spark = get_spark(app_name="hyp", shuffle_partitions=4)
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = [r.h for r in df.select(
            rolling_fingerprint(F.col("text")).alias("h")).collect()]
        assert got == [_py_rolling(t) for t in texts]


def test_scd2_merge_close_insert_nochange(spark):
    from pyspark.sql import functions as F

    from yaetl_spark.operators import scd2_merge

    current = spark.createDataFrame(
        [
            # closed history row
            (1, "BUILDING", 100, 200, False),
            # open rows
            (1, "MACHINERY", 200, None, True),
            (2, "FURNITURE", 150, None, True),
            (3, "HOUSEHOLD", 150, None, True),
        ],
        "k int, seg string, valid_from long, valid_to long, is_current boolean",
    )
    updates = spark.createDataFrame(
        [
            (1, "AUTOMOBILE", 300),   # changed → close + new version
            (2, "FURNITURE", 300),    # unchanged → no-op
            (4, "MACHINERY", 300),    # new key → insert
        ],
        "k int, seg string, effective_ts long",
    )
    out = scd2_merge(current, updates, key="k", change_cols=["seg"],
                     effective_col="effective_ts")
    rows = {tuple(r) for r in out.collect()}
    assert rows == {
        (1, "BUILDING", 100, 200, False),      # closed history untouched
        (1, "MACHINERY", 200, 300, False),     # closed by the update
        (1, "AUTOMOBILE", 300, None, True),    # new open version
        (2, "FURNITURE", 150, None, True),     # unchanged stays open
        (3, "HOUSEHOLD", 150, None, True),     # untouched stays open
        (4, "MACHINERY", 300, None, True),     # brand-new key
    }
    # exactly one open row per live key
    opens = out.filter(F.col("is_current")).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in opens)


def test_chunk_documents_boundaries(spark):
    from yaetl_spark.operators import chunk_documents

    df = spark.createDataFrame(
        [(1, "a" * 10), (2, "b" * 25), (3, "c")], "doc_id int, text string")
    out = chunk_documents(df, chunk_size=10, overlap=5)
    got = sorted((r.doc_id, r.chunk_id, len(r.chunk)) for r in out.collect())
    # doc1: exactly one chunk; doc2: ceil((25-10)/5)+1 = 4 chunks, last
    # short (25 - 3*5 = 10 → len 10); doc3: single short chunk
    assert got == [
        (1, 0, 10),
        (2, 0, 10), (2, 1, 10), (2, 2, 10), (2, 3, 10),
        (3, 0, 1),
    ]
    # overlap property: consecutive chunks share the overlap region
    chunks = {(r.doc_id, r.chunk_id): r.chunk for r in out.collect()}
    assert chunks[(2, 0)][5:] == chunks[(2, 1)][:5]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from yaetl_spark.operators import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=10, overlap=10)


def test_scd2_merge_rejects_untracked_columns(spark):
    from yaetl_spark.operators import scd2_merge

    current = spark.createDataFrame(
        [(1, "A", "note", 100, None, True)],
        "k int, seg string, memo string, valid_from long, valid_to long, "
        "is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "B", 200)], "k int, seg string, effective_ts long"
    )
    with pytest.raises(ValueError, match="memo"):
        scd2_merge(current, updates, key="k", change_cols=["seg"],
                   effective_col="effective_ts")


def test_map_fields_recursive_walks_leaves(spark):
    """ArrayWalkRecursiveTransformer parity: the callable reaches every
    leaf through nested structs, arrays, array-of-struct and map values
    (ref ArrayWalkRecursiveTransformer.php:56-65 + ArrayTransformersTest)."""
    from pyspark.sql import functions as F

    from yaetl_spark.operators import MapFieldsRecursive

    df = spark.createDataFrame(
        [(" a ", {"x": " b ", "y": [" c ", " d "]},
          [{"z": " e "}], {"k1": " f "})],
        "s string, st struct<x string, y array<string>>, "
        "arr array<struct<z string>>, m map<string, string>",
    )
    out = MapFieldsRecursive(F.trim).apply(df).first()
    assert out["s"] == "a"
    assert out["st"]["x"] == "b" and out["st"]["y"] == ["c", "d"]
    assert out["arr"][0]["z"] == "e"
    assert out["m"]["k1"] == "f"

    # key-aware form sees the nearest field name
    seen = []

    def tag(col, name):
        seen.append(name)
        return F.concat(F.lit(name + ":"), F.trim(col))

    tagged = MapFieldsRecursive(tag, with_key=True, columns=["st"]).apply(df).first()
    assert tagged["st"]["x"] == "x: b ".replace(" b ", "b")
    assert tagged["st"]["y"] == ["y:c", "y:d"]
    assert tagged["s"] == " a "  # untargeted column untouched
    assert set(seen) == {"x", "y"}


def test_grouped_pandas_map_full_group_semantics(spark):
    from yaetl_spark.operators import GroupedPandasMap

    df = spark.createDataFrame(
        [("a", 1), ("a", 5), ("b", 10)], "g string, x int"
    )

    def spread(pdf):
        pdf["spread"] = int(pdf["x"].max() - pdf["x"].min())
        return pdf[["g", "spread"]].head(1)

    got = {
        r.g: r.spread
        for r in GroupedPandasMap(["g"], spread, "g string, spread int")
        .apply(df).collect()
    }
    assert got == {"a": 4, "b": 0}


def test_grouped_pandas_map_requires_keys(spark):
    import pytest

    from yaetl_spark.operators import GroupedPandasMap

    with pytest.raises(ValueError):
        GroupedPandasMap([], lambda p: p, "g string")
