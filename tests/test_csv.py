"""CSV fixture tests — the reference's file-format golden tests
(FIXTURES.md §2: unicode, embedded newlines/quotes/delimiters, BOM,
Excel sep=, headerless, trailing-newline variants; tests/FileTest.php)."""

from __future__ import annotations

import os

import pytest

from yaetl_spark import CsvSink, CsvSource, TextLinesSource

HEADER = ["id", "name", "given_name", "country", "city", "garbage"]
ROWS = [
    ("1", "Doe", "John", "US", "New York", 'quote " and ,comma'),
    ("2", "Kowalski", "Zażółć", "PL", "Łódź", "multi\nline value"),
    ("3", "山田", "太郎", "JP", "東京", "semi;colon `tick`"),
    ("4", "Dupont", "René", "FR", "Orléans", 'doubled "" quotes'),
    ("5", "السيد", "أحمد", "EG", "القاهرة", "plain"),
]


def _write_variant(tmp_path, name, header=True, sep=",", bom=False, sep_line=False,
                   trailing_nl=True):
    path = os.path.join(tmp_path, name)
    with open(path, "wb") as fh:
        if bom:
            fh.write(b"\xef\xbb\xbf")
        if sep_line:
            fh.write(f"sep={sep}\n".encode())
        lines = []
        if header:
            lines.append(sep.join(HEADER))
        for row in ROWS:
            cells = []
            for cell in row:
                if any(ch in cell for ch in (sep, '"', "\n")):
                    cells.append('"' + cell.replace('"', '""') + '"')
                else:
                    cells.append(cell)
            lines.append(sep.join(cells))
        payload = "\n".join(lines)
        if trailing_nl:
            payload += "\n"
        fh.write(payload.encode("utf-8"))
    return path


VARIANTS = [
    dict(name="header_nl.csv"),
    dict(name="header_no_nl.csv", trailing_nl=False),
    dict(name="no_header.csv", header=False),
    dict(name="bom.csv", bom=True),
    dict(name="sep_semicolon.csv", sep=";", sep_line=True),
]


@pytest.mark.parametrize("variant", VARIANTS, ids=lambda v: v["name"])
def test_csv_variants_parse_identically(spark, tmp_path, variant):
    """Every variant parses to the same 5 records (FileTest.php:136-190)."""
    v = dict(variant)
    name = v.pop("name")
    path = _write_variant(str(tmp_path), name, **v)
    src = CsvSource(
        path,
        header=v.get("header", True),
        sep="auto" if v.get("sep_line") else v.get("sep", ","),
        field_names=None if v.get("header", True) else HEADER,
    )
    df = src.read(spark)
    assert df.columns == HEADER
    got = sorted(tuple(r) for r in df.collect())
    assert got == sorted(ROWS)


def test_csv_roundtrip(spark, tmp_path):
    """Write with the sink, re-read with the source, byte-equal records
    (FileTest.php:110-131)."""
    df = spark.createDataFrame(ROWS, ", ".join(f"{c} string" for c in HEADER))
    out = os.path.join(str(tmp_path), "rt.csv")
    CsvSink(out, single_file=True, bom=True, sep_line=True, sep=";").write(df)
    back = CsvSource(out, sep="auto").read(spark)
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)


def test_text_lines_skip_blank_and_trim(spark, tmp_path):
    """LineExtractor parity: trimmed, non-empty lines (FIXTURES.md §3)."""
    path = os.path.join(str(tmp_path), "lines.txt")
    with open(path, "wb") as fh:
        fh.write("﻿1\n 2 \n\n3\n\n".encode("utf-8"))
    df = TextLinesSource(path).read(spark)
    assert sorted(r["value"] for r in df.collect()) == ["1", "2", "3"]


def test_csv_single_file_append_and_modes(spark, tmp_path):
    """single_file honors mode against the FINAL file: append concatenates
    (header deduplicated), error refuses, ignore no-ops."""
    df1 = spark.createDataFrame([("a", "1")], "k string, v string")
    df2 = spark.createDataFrame([("b", "2")], "k string, v string")
    out = os.path.join(str(tmp_path), "ap.csv")
    CsvSink(out, single_file=True).write(df1)
    CsvSink(out, single_file=True, mode="append").write(df2)
    back = CsvSource(out).read(spark)
    assert sorted(tuple(r) for r in back.collect()) == [("a", "1"), ("b", "2")]

    import pytest

    with pytest.raises(FileExistsError):
        CsvSink(out, single_file=True, mode="error").write(df1)
    CsvSink(out, single_file=True, mode="ignore").write(df1)  # no-op
    assert sorted(tuple(r) for r in CsvSource(out).read(spark).collect()) == [
        ("a", "1"), ("b", "2")]


UTF_VARIANTS = [
    ("utf16le.csv", "utf-16-le", b"\xff\xfe"),
    ("utf16be.csv", "utf-16-be", b"\xfe\xff"),
    ("utf32le.csv", "utf-32-le", b"\xff\xfe\x00\x00"),
    ("utf32be.csv", "utf-32-be", b"\x00\x00\xfe\xff"),
]


@pytest.mark.parametrize(
    "name,codec,bom", UTF_VARIANTS, ids=lambda v: v if isinstance(v, str) else "")
def test_csv_bom_encoding_autodetect(spark, tmp_path, name, codec, bom):
    """encoding='auto' (the default) detects UTF-16/32 LE+BE from the
    BOM (FileHandlerTrait.php:26-61 parity) — same 5 unicode records,
    BOM consumed, no stray U+FEFF in the first header field."""
    path = os.path.join(str(tmp_path), name)
    lines = [",".join(HEADER)]
    for row in ROWS:
        cells = []
        for cell in row:
            if any(ch in cell for ch in (",", '"', "\n")):
                cells.append('"' + cell.replace('"', '""') + '"')
            else:
                cells.append(cell)
        lines.append(",".join(cells))
    payload = "\n".join(lines) + "\n"
    with open(path, "wb") as fh:
        fh.write(bom + payload.encode(codec))
    df = CsvSource(path).read(spark)
    assert df.columns == HEADER  # BOM must not leak into the header
    assert sorted(tuple(r) for r in df.collect()) == sorted(ROWS)


def test_csv_utf16_roundtrip(spark, tmp_path):
    """Sink writes UTF-16LE + BOM; the source's BOM sniff reads it back
    with zero hints (FIXTURES.md §2 round-trip requirement)."""
    df = spark.createDataFrame(ROWS, ", ".join(f"{c} string" for c in HEADER))
    out = os.path.join(str(tmp_path), "rt16.csv")
    CsvSink(out, single_file=True, bom=True, encoding="UTF-16LE").write(df)
    with open(out, "rb") as fh:
        assert fh.read(2) == b"\xff\xfe"
    back = CsvSource(out).read(spark)
    assert back.columns == HEADER
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)


def test_sniffers_skip_unreadable_candidates(tmp_path):
    """BOM/sep sniffing degrades past an unreadable first glob candidate
    to the next file (the pre-r7 try-next behavior, ADVICE r7)."""
    import os

    from yaetl_spark.sources.files import (
        _sniff_bom_encoding,
        _sniff_sep_line,
    )

    # first candidate unreadable: dangling symlink raises OSError on open
    # (chmod tricks don't work under root)
    os.symlink(str(tmp_path / "missing"), str(tmp_path / "a.csv"))
    b = tmp_path / "b.csv"
    b.write_bytes("sep=;\nx;y\n1;2\n".encode("utf-16"))
    pattern = str(tmp_path / "*.csv")
    assert _sniff_bom_encoding(pattern) == "UTF-16"
    assert _sniff_sep_line(pattern, "UTF-16") == ";"


def test_bom_sniff_warns_on_non_local_path():
    """encoding='auto' cannot open s3a:// driver-side: it must WARN and
    fall back to UTF-8, never silently (round-7 verdict item 6)."""
    import warnings as w

    from yaetl_spark.sources.files import _sniff_bom_encoding

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        assert _sniff_bom_encoding("s3a://bucket/data/*.csv") is None
    assert any("cannot BOM-sniff non-local" in str(c.message) for c in caught)


def test_bom_sniff_warns_on_mixed_encodings(tmp_path):
    """A glob whose files carry different BOMs warns before using the
    first file's encoding."""
    import warnings as w

    from yaetl_spark.sources.files import _sniff_bom_encoding

    (tmp_path / "a.csv").write_bytes("x,y\n1,2\n".encode("utf-8-sig"))
    (tmp_path / "b.csv").write_bytes("x,y\n1,2\n".encode("utf-16"))
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        enc = _sniff_bom_encoding(str(tmp_path / "*.csv"))
    assert enc == "UTF-8"  # first file's answer
    assert any("mixed BOMs" in str(c.message) for c in caught)


@pytest.mark.parametrize("codec", ["utf-16", "utf-16-be", "utf-32"])
def test_csv_sep_preamble_stripped_in_wide_encodings(spark, tmp_path, codec):
    """Excel sep= preamble + UTF-16/32: the preamble strip must be
    encoding-aware (multi-byte 'sep=' and newline), or the preamble
    line survives and eats the header row."""
    from yaetl_spark import CsvSource

    p = tmp_path / f"wide_{codec}.csv"
    text = "sep=;\nid;name\n1;alpha\n2;beta\n"
    bom = "" if codec == "utf-16-be" else "﻿"
    payload = text.encode(codec) if codec != "utf-16-be" \
        else ("﻿" + text).encode(codec)
    p.write_bytes(payload)
    rows = sorted(
        tuple(r) for r in CsvSource(str(p), sep="auto").read(spark).collect()
    )
    assert rows == [("1", "alpha"), ("2", "beta")], rows


def test_bom_sniff_handles_file_uri(tmp_path):
    """file:// URIs (which Spark itself accepts) are normalized to bare
    paths before driver-side open(), so encoding='auto' works instead of
    silently falling back to UTF-8."""
    from yaetl_spark.sources.files import _sniff_bom_encoding

    p = tmp_path / "u16.csv"
    p.write_bytes("x,y\n1,2\n".encode("utf-16"))
    assert _sniff_bom_encoding(f"file://{p}") == "UTF-16"
    assert _sniff_bom_encoding(f"file:{p}") == "UTF-16"


def test_sep_preamble_stripped_across_glob(spark, tmp_path):
    """A glob whose files each carry a sep= preamble: every file is
    stripped (the old single-literal-path strip would crash on
    open(glob))."""
    from yaetl_spark import CsvSource

    for name, rows in (("a.csv", [("1", "x")]), ("b.csv", [("2", "y")])):
        (tmp_path / name).write_bytes(
            ("sep=;\nid;name\n"
             + "".join(f"{a};{b}\n" for a, b in rows)).encode())
    df = CsvSource(str(tmp_path / "*.csv"), sep="auto").read(spark)
    assert sorted(map(tuple, df.collect())) == [("1", "x"), ("2", "y")]


def test_sep_preamble_stripped_bomless_wide_encoding(spark, tmp_path):
    """BOM-less UTF-16LE with an explicit encoding=: the sniffer decodes
    sep= with the caller's encoding, and the stripper must use the SAME
    codec — a utf-8 byte-wise fallback would leave the preamble line to
    be parsed as the header row."""
    from yaetl_spark import CsvSource

    p = tmp_path / "nobom16.csv"
    p.write_bytes("sep=;\nid;name\n1;alpha\n".encode("utf-16-le"))
    df = CsvSource(str(p), sep="auto", encoding="UTF-16LE").read(spark)
    assert sorted(map(tuple, df.collect())) == [("1", "alpha")]


def test_strip_preamble_same_basename_glob(spark, tmp_path):
    """A glob resolving SAME-NAMED files in different directories must
    keep every stripped copy — basename flattening used to clobber all
    but one (ADVICE r8)."""
    for sub, row in [("a", "1;alpha"), ("b", "2;beta")]:
        d = tmp_path / sub
        d.mkdir()
        (d / "data.csv").write_text(f"sep=;\nid;name\n{row}\n")
    df = CsvSource(str(tmp_path / "*" / "data.csv"), sep="auto").read(spark)
    assert sorted(map(tuple, df.collect())) == [
        ("1", "alpha"), ("2", "beta")]


def test_strip_preamble_empty_resolution_raises(tmp_path):
    """Zero resolved files fails with a clear FileNotFoundError, not an
    unrelated Spark error on an empty temp dir (ADVICE r8)."""
    from yaetl_spark.sources.files import _strip_preamble_copy

    with pytest.raises(FileNotFoundError, match="zero readable files"):
        _strip_preamble_copy(str(tmp_path / "nope" / "*.csv"), "utf-8")
