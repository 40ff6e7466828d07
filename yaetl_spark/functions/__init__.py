"""Scalar-function surface.

The reference's only "function library" is user callables (SURVEY.md
§2.10); on Spark the full native surface (string/date/math/array/map/JSON
in ``pyspark.sql.functions``) is exposed directly — re-exported here as
``yaetl_spark.functions.F`` — plus the engine's own vector/text helpers.
"""

from pyspark.sql import functions as F  # noqa: F401 — the native surface

from ..operators.similarity import cosine_similarity, dot_product, norm
from ..operators.text import (
    char_ngrams,
    fingerprint,
    let_once,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokenize,
)

__all__ = [
    "F",
    "let_once",
    "cosine_similarity",
    "dot_product",
    "norm",
    "token_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_id",
    "fingerprint",
    "tokenize",
    "char_ngrams",
]
