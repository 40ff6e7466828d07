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
