"""File sources: parquet, CSV, text lines, JSON.

CSV parity targets the reference extractor
(``/root/reference/src/Extractors/File/CsvExtractor.php:34-139``): optional
header, custom separator/quote/escape, UTF BOM handling, Excel ``sep=``
sniffing, blank-line skip, newline-inside-quotes safety. Spark's CSV reader
covers BOM/multiLine/encoding natively; ``sep=`` sniffing is done here by
peeking at the first bytes of one file (driver-side, O(1) I/O).

Text-line parity targets ``LineExtractor.php:15-36``: one trimmed,
non-empty line per record.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import Source


class ParquetSource(Source):
    def __init__(self, path: str, columns: list[str] | None = None, **kw):
        super().__init__(**kw)
        self.path = path
        self.columns = columns

    def load(self, spark: SparkSession) -> DataFrame:
        df = spark.read.parquet(self.path)
        if self.columns:
            df = df.select(*self.columns)  # column pruning reaches the scan
        return df


class OrcSource(Source):
    """ORC scan — same contract as :class:`ParquetSource` (columnar,
    predicate/column pushdown via the native ORC reader)."""

    def __init__(self, path: str, columns: list[str] | None = None, **kw):
        super().__init__(**kw)
        self.path = path
        self.columns = columns

    def load(self, spark: SparkSession) -> DataFrame:
        df = spark.read.orc(self.path)
        if self.columns:
            df = df.select(*self.columns)
        return df


# longest-first so the UTF-32 BOMs win over their UTF-16 prefixes; the
# endianness-agnostic Java charset names ("UTF-16"/"UTF-32") are
# deliberate — they CONSUME the BOM while decoding, so the first field
# never carries a stray U+FEFF (reference: fab2s/OpinHelpers Bom via
# src/Traits/FileHandlerTrait.php:26-61)
_BOM_ENCODINGS: tuple[tuple[bytes, str], ...] = (
    (b"\xff\xfe\x00\x00", "UTF-32"),  # UTF-32LE
    (b"\x00\x00\xfe\xff", "UTF-32"),  # UTF-32BE
    (b"\xff\xfe", "UTF-16"),          # UTF-16LE
    (b"\xfe\xff", "UTF-16"),          # UTF-16BE
    (b"\xef\xbb\xbf", "UTF-8"),
)


def _first_file(path: str) -> str | None:
    """Resolve a path/glob/dir to its first regular file (driver-side,
    O(1) I/O — same resolution the sep sniffer uses)."""
    candidates = (
        sorted(_glob.glob(path)) if any(c in path for c in "*?[") else [path]
    )
    for p in candidates:
        if os.path.isdir(p):
            inner = sorted(_glob.glob(os.path.join(p, "*")))
            p = next((i for i in inner if os.path.isfile(i)), None)
            if p is None:
                continue
        return p
    return None


def _sniff_bom_encoding(path: str) -> str | None:
    """Detect the file encoding from its BOM (UTF-8/16/32, either
    endianness) — FileHandlerTrait parity. Returns None when no BOM."""
    p = _first_file(path)
    if p is None:
        return None
    try:
        with open(p, "rb") as fh:
            head = fh.read(4)
    except OSError:
        return None
    for bom, enc in _BOM_ENCODINGS:
        if head.startswith(bom):
            return enc
    return None


def _sniff_sep_line(path: str, encoding: str) -> str | None:
    """Return the separator from an Excel ``sep=X`` first line, if present."""
    p = _first_file(path)
    if p is not None:
        try:
            with open(p, "rb") as fh:
                head = fh.read(64)
        except OSError:
            return None
        # strip BOMs before sniffing
        for bom in (b"\xef\xbb\xbf", b"\xff\xfe\x00\x00", b"\x00\x00\xfe\xff",
                    b"\xff\xfe", b"\xfe\xff"):
            if head.startswith(bom):
                head = head[len(bom):]
                break
        try:
            text = head.decode(encoding, errors="ignore")
        except LookupError:
            text = head.decode("utf-8", errors="ignore")
        first = text.splitlines()[0] if text.splitlines() else ""
        if first.lower().startswith("sep=") and len(first) >= 5:
            return first[4]
        return None
    return None


def _strip_preamble_copy(path: str, encoding: str) -> str:
    """Copy an Excel ``sep=``-preamble CSV to a temp file without the
    preamble line (BOM preserved). Returns the temp path."""
    import tempfile

    boms = (b"\xef\xbb\xbf", b"\xff\xfe\x00\x00", b"\x00\x00\xfe\xff",
            b"\xff\xfe", b"\xfe\xff")
    raw = open(path, "rb").read()
    bom = b""
    for b in boms:
        if raw.startswith(b):
            bom, raw = b, raw[len(b):]
            break
    nl = raw.find(b"\n")
    if nl >= 0 and raw[:4].lower() == b"sep=":
        raw = raw[nl + 1:]
    tmp = tempfile.NamedTemporaryFile(
        suffix=".csv", prefix="yaetl_sep_", delete=False
    )
    tmp.write(bom + raw)
    tmp.close()
    return tmp.name


class CsvSource(Source):
    """CSV scan with reference-parity options.

    ``sep='auto'`` sniffs an Excel ``sep=`` preamble line (and skips it);
    ``encoding='auto'`` (the default) sniffs the encoding from the file
    BOM — UTF-8 / UTF-16 LE+BE / UTF-32 LE+BE, reference
    ``src/Traits/FileHandlerTrait.php:26-61`` — falling back to UTF-8
    when no BOM is present (a no-behavior-change default: BOM-less files
    read exactly as before). ``multiLine=True`` keeps embedded newlines
    inside quoted fields safe — note multiLine disables intra-file split
    parallelism, so leave it off for huge machine-written CSVs that
    never embed newlines (and note non-UTF-8 encodings NEED multiLine,
    or an explicit lineSep, for Spark to split records correctly).
    """

    def __init__(
        self,
        path: str,
        header: bool = True,
        sep: str = ",",
        quote: str = '"',
        escape: str = '"',
        encoding: str = "auto",
        multi_line: bool = True,
        schema: str | None = None,
        infer_schema: bool = False,
        field_names: list[str] | None = None,
        **kw,
    ):
        super().__init__(**kw)
        self.path = path
        self.header = header
        self.sep = sep
        self.quote = quote
        self.escape = escape
        self.encoding = encoding
        self.multi_line = multi_line
        self.schema = schema
        self.infer_schema = infer_schema
        self.field_names = field_names

    def load(self, spark: SparkSession) -> DataFrame:
        sep = self.sep
        path = self.path
        encoding = self.encoding
        if encoding == "auto":
            encoding = _sniff_bom_encoding(self.path) or "UTF-8"
        if sep == "auto":
            sniffed = _sniff_sep_line(self.path, encoding)
            sep = sniffed or ","
            if sniffed is not None:
                # Strip the Excel preamble line up front so header parsing
                # stays correct. ``sep=`` files are Excel-origin exports —
                # inherently small, single-file artifacts — so a driver-side
                # rewrite is appropriate; bulk machine-written CSV never
                # carries a preamble and never enters this path.
                path = _strip_preamble_copy(self.path, encoding)
        reader = (
            spark.read.option("header", self.header)
            .option("sep", sep)
            .option("quote", self.quote)
            .option("escape", self.escape)
            .option("encoding", encoding)
            .option("multiLine", self.multi_line)
            .option("mode", "PERMISSIVE")
            .option("ignoreTrailingWhiteSpace", False)
            .option("ignoreLeadingWhiteSpace", False)
        )
        if self.schema:
            reader = reader.schema(self.schema)
        elif self.infer_schema:
            reader = reader.option("inferSchema", True)
        df = reader.csv(path)
        if not self.header and self.field_names:
            df = df.toDF(*self.field_names)
        return df


class TextLinesSource(Source):
    """One trimmed, non-empty line per record (LineExtractor parity)."""

    def __init__(self, path: str, column: str = "value", **kw):
        super().__init__(**kw)
        self.path = path
        self.column = column

    def load(self, spark: SparkSession) -> DataFrame:
        df = spark.read.text(self.path)
        trimmed = F.trim(F.regexp_replace(F.col("value"), "^﻿", ""))
        return (
            df.select(trimmed.alias(self.column))
            .filter(F.col(self.column) != "")
        )


class JsonSource(Source):
    def __init__(self, path: str, schema: str | None = None, multi_line: bool = False, **kw):
        super().__init__(**kw)
        self.path = path
        self.schema = schema
        self.multi_line = multi_line

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.option("multiLine", self.multi_line)
        if self.schema:
            reader = reader.schema(self.schema)
        return reader.json(self.path)
