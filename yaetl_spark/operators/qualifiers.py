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

    For *targeted* breaks with deterministic record order, see
    :class:`BreakAt`.
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


class BreakAt(Qualifier):
    """Targeted break interrupt, made deterministic by a record order.

    The reference's break interrupt stops the *targeted* traversable: self,
    a specific upstream node, or an ancestor flow
    (``/root/reference/src/Qualifiers/QualifierAbstract.php:69-77``; counter
    matrix in ``tests/QualifierTest.php:407-1276``). Record-at-a-time, "stop"
    means "records after the triggering one are never extracted". The
    deterministic batch analogue: order records by ``order_by`` and keep only
    those strictly before the first record matching ``condition``
    (``inclusive=True`` keeps the trigger record itself).

    In a linear DataFrame lineage, breaking a mid-flow node and breaking its
    source truncate the same flow — the reference's observable difference is
    about in-flight records, which a vectorized engine doesn't have. The one
    distinction that survives is *which flow* is truncated: ``target="self"``
    truncates the declaring (branch) flow only; ``target="root"`` on a branch
    qualifier truncates the shared ancestor flow — root sinks and sibling
    branches included — matching the root-targeted break from inside a branch
    (``tests/QualifierTest.php:570-648``).

    Scale shape: no global sort. The cut point is a map-side-combinable
    ``min(order_by) WHERE condition`` aggregate; the truncation is a filter
    against that one-row broadcast (lazy form), or — when the pipeline runs
    it (``Pipeline.run``) — a *literal* pushed-down filter after an eager
    one-row cut job, which Catalyst can push into the scan and use for
    partition pruning.
    """

    def __init__(
        self,
        condition: Column | str,
        order_by: Column | str,
        inclusive: bool = False,
        target: str = "self",
    ):
        if target not in ("self", "root"):
            raise ValueError(
                f"target must be 'self' or 'root', got {target!r}. The "
                "reference additionally targets a specific UPSTREAM NODE "
                "from a downstream qualifier (Interrupter(TARGET_TOP/"
                "node), src/Qualifiers/QualifierAbstract.php:69-77) — in "
                "its record-at-a-time engine that differs from a source "
                "break only in which in-flight records drain through the "
                "nodes between target and qualifier. A vectorized plan "
                "has no in-flight records, so node-targeted breaks are "
                "indistinguishable from target='self' here; they are "
                "rejected (documented divergence, SURVEY.md §2.8) rather "
                "than silently approximated."
            )
        self.condition = condition
        self.order_by = order_by
        self.inclusive = inclusive
        self.target = target

    def _cond(self) -> Column:
        c = self.condition
        return F.expr(c) if isinstance(c, str) else c

    def _order(self) -> Column:
        o = self.order_by
        return F.col(o) if isinstance(o, str) else o

    def cut(self, df: DataFrame):
        """Eagerly compute the cut point (one tiny job); None = no trigger."""
        row = df.filter(self._cond()).agg(F.min(self._order())).first()
        return row[0] if row else None

    def truncate(self, df: DataFrame, cut_value) -> DataFrame:
        """Apply an already-computed cut as a literal (pushdown-able) filter."""
        if cut_value is None:
            return df
        order = self._order()
        keep = order <= F.lit(cut_value) if self.inclusive else order < F.lit(cut_value)
        return df.filter(keep)

    def apply(self, df: DataFrame) -> DataFrame:
        """Lazy single-plan form: broadcast the one-row cut aggregate."""
        order = self._order()
        cut = df.filter(self._cond()).agg(F.min(order).alias("__break_cut"))
        keep = (
            order <= F.col("__break_cut")
            if self.inclusive
            else order < F.col("__break_cut")
        )
        return (
            df.crossJoin(F.broadcast(cut))
            .filter(F.col("__break_cut").isNull() | keep)
            .drop("__break_cut")
        )
