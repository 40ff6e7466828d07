"""Local duckdb-oracle harness mimicking the driver's correctness gate:
row-count + schema (column names) + order-insensitive value compare.
"""

from __future__ import annotations

import math
from datetime import datetime, timezone

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def canonical(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))


def dtype_kind_mismatches(got: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    """Columns where one side is integer-typed and the other float-typed.

    The driver's value hash is type-faithful: oracle ``1.0`` (float64)
    never hashes equal to engine ``1`` (int64), even though Python
    ``==`` says they match — exactly how r10's sessionize red row
    slipped past this harness (its oracle's uncast ``SUM(int) OVER``
    came back HUGEINT → pandas float64). The local gate must dominate
    the driver's, so an int-vs-float column pair is a hard failure
    here regardless of values.
    """
    bad = []
    for c in got.columns:
        if c not in oracle.columns:
            continue
        a, b = got[c].dtype.kind, oracle[c].dtype.kind
        if {a, b} & {"i", "u"} and "f" in {a, b}:
            bad.append(c)
    return bad


def compare(spark_df, oracle_pdf: pd.DataFrame) -> dict:
    got = spark_df.toPandas()
    out = {
        "rows_spark": len(got),
        "rows_oracle": len(oracle_pdf),
        "cols_spark": sorted(got.columns),
        "cols_oracle": sorted(oracle_pdf.columns),
    }
    out["count_match"] = out["rows_spark"] == out["rows_oracle"]
    out["schema_match"] = out["cols_spark"] == out["cols_oracle"]
    if not (out["count_match"] and out["schema_match"]):
        out["value_match"] = False
        return out
    out["dtype_mismatch"] = dtype_kind_mismatches(got, oracle_pdf)
    if out["dtype_mismatch"]:
        out["value_match"] = False
        return out
    a, b = canonical(got), canonical(oracle_pdf)
    out["value_match"] = a == b
    if not out["value_match"]:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        out["first_diffs"] = diffs[:3]
    return out
