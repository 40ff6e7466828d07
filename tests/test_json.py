"""JsonSource / JsonSink round-trips.

The reference has no JSON connector (its file surface is CSV/lines —
SURVEY.md §2.2); NDJSON is table stakes for a Spark engine, so the pair is
beyond-ref surface. Coverage mirrors the CSV tests: schema fidelity,
nested structs, unicode, nulls, and the multiLine (JSON-array) read mode.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from yaetl_spark import JsonSink, JsonSource, Pipeline


def test_json_roundtrip_nested_unicode(spark, tmp_path):
    path = str(tmp_path / "out.json")
    df = spark.createDataFrame(
        [
            (1, "héllo wörld", {"a": 1, "b": "x"}, ["u", "v"]),
            (2, "日本語テキスト", {"a": 2, "b": None}, []),
            (3, None, None, None),
        ],
        "id bigint, text string, meta struct<a:bigint,b:string>, tags array<string>",
    )
    JsonSink(path).write(df)
    back = JsonSource(
        path, schema="id bigint, text string, meta struct<a:bigint,b:string>, tags array<string>"
    ).read(spark)
    assert back.schema == df.schema
    got = {r.id: r for r in back.collect()}
    assert got[1].text == "héllo wörld" and got[1].meta.a == 1
    assert got[2].text == "日本語テキスト" and got[2].meta.b is None
    assert got[3].text is None and got[3].meta is None


def test_json_source_infers_schema(spark, tmp_path):
    p = tmp_path / "rows.jsonl"
    p.write_text(
        "\n".join(
            json.dumps(r)
            for r in [{"k": 1, "s": "a"}, {"k": 2, "s": "b"}, {"k": 3}]
        )
    )
    df = JsonSource(str(p)).read(spark)
    assert {f.name for f in df.schema.fields} == {"k", "s"}
    assert df.count() == 3
    assert df.filter(F.col("s").isNull()).count() == 1


def test_json_source_multiline_array(spark, tmp_path):
    p = tmp_path / "arr.json"
    p.write_text(json.dumps([{"k": 1}, {"k": 2}], indent=2))
    df = JsonSource(str(p), multi_line=True).read(spark)
    assert sorted(r.k for r in df.collect()) == [1, 2]


def test_json_in_pipeline(spark, tmp_path):
    src = tmp_path / "in.jsonl"
    src.write_text("\n".join(json.dumps({"id": i, "v": i * 10}) for i in range(20)))
    out = str(tmp_path / "out")
    report = (
        Pipeline(spark)
        .from_(JsonSource(str(src), schema="id bigint, v bigint"))
        .qualify(F.col("v") >= 50)
        .to(JsonSink(out))
        .run()
    )
    assert report["status"] == "clean" and report["num_records"] == 15
    back = JsonSource(out, schema="id bigint, v bigint").read(spark)
    assert back.count() == 15
