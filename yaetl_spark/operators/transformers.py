"""Row transformers — Column-expression builders, never row loops.

Parity map (SURVEY.md §2.4):

- ``KeyRenameTransformer``   → :class:`Rename`
- ``KeyUnsetTransformer``    → :class:`Drop`
- ``ArrayReplaceTransformer``→ :class:`Replace` (defaults + overrides)
- ``ArrayReplaceRecursiveTransformer`` → :class:`ReplaceRecursive`
- ``ArrayMapTransformer`` / ``ArrayWalkTransformer`` → :class:`MapFields`
- ``CallableTransformer``    → :class:`Callable-escape hatches <PandasMap>`
- ``NoOpTransformer``        → :class:`NoOp`

Reference semantics nailed down by its tests
(``/root/reference/tests/Arrays/ArrayReplaceTransformerTest.php:15-52``):
defaults fill *missing* keys only — a present-but-null value stays null —
and overrides force values unconditionally. In a schema-full engine
"missing key" means "column absent from the schema", so defaults add
absent columns as literals and leave existing columns untouched.
``fill_nulls=True`` opts into the looser null-coalescing behavior.

Every transformer compiles to a single ``select`` / ``withColumns`` so
Catalyst folds chains of them into one projection (whole-stage codegen).
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Mapping

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class Transformer:
    def apply(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.apply(df)


class NoOp(Transformer):
    def apply(self, df: DataFrame) -> DataFrame:
        return df


class Rename(Transformer):
    """``{'old': 'new'}`` column renames (KeyRenameTransformer parity;
    unlike the reference, column order IS preserved)."""

    def __init__(self, mapping: Mapping[str, str]):
        self.mapping = dict(mapping)

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumnsRenamed(self.mapping)


class Drop(Transformer):
    def __init__(self, *columns: str):
        self.columns = columns

    def apply(self, df: DataFrame) -> DataFrame:
        return df.drop(*self.columns)


class Keep(Transformer):
    """Projection to an explicit column list (the positive form of Drop)."""

    def __init__(self, *columns: str):
        self.columns = columns

    def apply(self, df: DataFrame) -> DataFrame:
        return df.select(*self.columns)


class Replace(Transformer):
    """Defaults for absent columns + forced overrides.

    ``array_replace($defaults, $record, $overrides)`` parity
    (``ArrayReplaceTransformer.php:50-53``).
    """

    def __init__(
        self,
        defaults: Mapping[str, Any] | None = None,
        overrides: Mapping[str, Any] | None = None,
        fill_nulls: bool = False,
    ):
        self.defaults = dict(defaults or {})
        self.overrides = dict(overrides or {})
        self.fill_nulls = fill_nulls

    def apply(self, df: DataFrame) -> DataFrame:
        cols: dict[str, Column] = {}
        for name, value in self.defaults.items():
            lit = value if isinstance(value, Column) else F.lit(value)
            if name not in df.columns:
                cols[name] = lit
            elif self.fill_nulls:
                cols[name] = F.coalesce(F.col(name), lit)
        for name, value in self.overrides.items():
            cols[name] = value if isinstance(value, Column) else F.lit(value)
        return df.withColumns(cols) if cols else df


class ReplaceRecursive(Transformer):
    """Recursive defaults/overrides reaching into struct columns.

    Nested dict values descend into ``StructType`` columns via
    ``withField`` (``ArrayReplaceRecursiveTransformer.php:50-53`` parity).
    """

    def __init__(
        self,
        defaults: Mapping[str, Any] | None = None,
        overrides: Mapping[str, Any] | None = None,
    ):
        self.defaults = dict(defaults or {})
        self.overrides = dict(overrides or {})

    @staticmethod
    def _apply_nested(
        col: Column, schema_fields: dict, spec: Mapping[str, Any], force: bool
    ) -> Column:
        out = col
        for key, value in spec.items():
            if isinstance(value, Mapping) and key in schema_fields and isinstance(
                schema_fields[key].dataType, StructType
            ):
                sub_fields = {f.name: f for f in schema_fields[key].dataType.fields}
                out = out.withField(
                    key,
                    ReplaceRecursive._apply_nested(
                        out.getField(key), sub_fields, value, force
                    ),
                )
            elif key not in schema_fields:
                out = out.withField(key, F.lit(value))
            elif force:
                out = out.withField(key, F.lit(value))
        return out

    def apply(self, df: DataFrame) -> DataFrame:
        top = {f.name: f for f in df.schema.fields}
        cols: dict[str, Column] = {}
        for spec, force in ((self.defaults, False), (self.overrides, True)):
            for name, value in spec.items():
                if (
                    isinstance(value, Mapping)
                    and name in top
                    and isinstance(top[name].dataType, StructType)
                ):
                    sub = {f.name: f for f in top[name].dataType.fields}
                    base = cols.get(name, F.col(name))
                    cols[name] = self._apply_nested(base, sub, value, force)
                elif name not in top:
                    cols[name] = F.lit(value)
                elif force:
                    cols[name] = F.lit(value)
        return df.withColumns(cols) if cols else df


class MapFields(Transformer):
    """Apply a Column function to every field (ArrayMapTransformer parity).

    ``fn`` is ``Column -> Column`` (e.g. ``F.trim``) or with ``with_key=True``
    ``(Column, name) -> Column`` (ArrayWalkTransformer's key-aware form).
    ``columns`` restricts the target set.
    """

    def __init__(
        self,
        fn: Callable[..., Column],
        columns: list[str] | None = None,
        with_key: bool = False,
    ):
        self.fn = fn
        self.columns = columns
        self.with_key = with_key

    def apply(self, df: DataFrame) -> DataFrame:
        targets = self.columns or df.columns
        exprs = []
        for c in df.columns:
            if c in targets:
                col = self.fn(F.col(c), c) if self.with_key else self.fn(F.col(c))
                exprs.append(col.alias(c))
            else:
                exprs.append(F.col(c))
        return df.select(*exprs)


class MapFieldsRecursive(Transformer):
    """Apply a Column function to every LEAF value, descending into nested
    structs, arrays and map values (ArrayWalkRecursiveTransformer parity —
    ref ``src/Transformers/Arrays/ArrayWalkRecursiveTransformer.php:56-65``:
    PHP's ``array_walk_recursive`` recurses into nested arrays and applies
    the callable to non-array leaves only).

    ``fn`` is ``Column -> Column``, or ``(Column, name) -> Column`` with
    ``with_key=True``. The name passed for a nested leaf is its struct
    field name; array elements and map values inherit the enclosing
    field's name (Spark arrays are positional where PHP lists are keyed —
    the integer keys PHP would pass carry no schema meaning here).

    Whole plan stays a single Project of native higher-order functions
    (``transform`` / ``transform_values`` / struct rebuild) — no shuffle,
    no Python, fully codegen'd.
    """

    def __init__(
        self,
        fn: Callable[..., Column],
        columns: list[str] | None = None,
        with_key: bool = False,
    ):
        self.fn = fn
        self.columns = columns
        self.with_key = with_key

    def _leaf(self, col: Column, name: str) -> Column:
        return self.fn(col, name) if self.with_key else self.fn(col)

    def _walk(self, col: Column, name: str, dtype) -> Column:
        from pyspark.sql.types import ArrayType, MapType, StructType

        if isinstance(dtype, StructType):
            return F.struct(
                *[
                    self._walk(
                        col.getField(f.name), f.name, f.dataType
                    ).alias(f.name)
                    for f in dtype.fields
                ]
            )
        if isinstance(dtype, ArrayType):
            return F.transform(
                col, lambda x: self._walk(x, name, dtype.elementType)
            )
        if isinstance(dtype, MapType):
            return F.transform_values(
                col, lambda k, v: self._walk(v, name, dtype.valueType)
            )
        return self._leaf(col, name)

    def apply(self, df: DataFrame) -> DataFrame:
        targets = self.columns or df.columns
        exprs = []
        for f in df.schema.fields:
            if f.name in targets:
                exprs.append(
                    self._walk(F.col(f.name), f.name, f.dataType).alias(f.name)
                )
            else:
                exprs.append(F.col(f.name))
        return df.select(*exprs)


class WithColumns(Transformer):
    """Arbitrary named Column expressions — the main projection workhorse."""

    def __init__(self, **exprs: Column):
        self.exprs = exprs

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumns(self.exprs)


class Apply(Transformer):
    """DataFrame -> DataFrame callable (full declarative escape hatch)."""

    def __init__(self, fn: Callable[[DataFrame], DataFrame]):
        self.fn = fn

    def apply(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


class PandasMap(Transformer):
    """CallableTransformer escape hatch: arbitrary record→record logic as an
    Arrow-batched ``mapInPandas`` (never row-at-a-time Python UDFs).

    ``fn`` is ``pd.DataFrame -> pd.DataFrame``; ``schema`` is the output
    schema (DDL string or StructType). This is the slow path by design —
    prefer Column expressions (SURVEY.md §2.10).
    """

    def __init__(self, fn: Callable[[pd.DataFrame], pd.DataFrame], schema: Any):
        self.fn = fn
        self.schema = schema

    def apply(self, df: DataFrame) -> DataFrame:
        fn = self.fn

        def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for batch in batches:
                yield fn(batch)

        return df.mapInPandas(mapper, schema=self.schema)


class GroupedPandasMap(Transformer):
    """Per-group Arrow escape hatch: ``groupBy(keys).applyInPandas(fn)`` —
    the grouped-map companion to :class:`PandasMap` for logic that needs a
    whole group in one pandas frame (per-group normalization, per-entity
    model scoring, group-local resampling).

    ``fn`` is ``pd.DataFrame -> pd.DataFrame`` receiving one full group.
    Scale shape: one shuffle on the group keys; memory is O(largest
    group), so key choice must bound group size — at 100 TB a hot key
    becomes an executor OOM, not a slowdown (pre-split hot keys with a
    salt column in ``keys`` when group semantics allow it).
    """

    def __init__(
        self,
        keys: list[str],
        fn: Callable[[pd.DataFrame], pd.DataFrame],
        schema: Any,
    ):
        if not keys:
            raise ValueError("keys must name at least one grouping column")
        self.keys = keys
        self.fn = fn
        self.schema = schema

    def apply(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.keys).applyInPandas(self.fn, self.schema)


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    change_cols: list[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2 merge: history-preserving upsert.

    ``current`` is the dimension with ``valid_from``/``valid_to``/
    ``is_current`` columns (``valid_to`` null while open); ``updates``
    carries the key, the tracked ``change_cols`` and an ``effective_col``
    timestamp. For each key in ``updates`` whose tracked values differ
    from the open row, the open row closes (``valid_to`` = new effective
    ts) and a new open row appends. No-change updates are dropped; brand
    new keys insert as open rows.

    Plan shape: one shuffle on the key for the open-rows join; closed
    history never rejoins (it unions back untouched) — at 100 TB the
    closed partition rides through as a pass-through scan. With the
    dimension stored partitioned on ``is_current``, the join side prunes
    to open rows only.
    """
    from pyspark.sql import functions as F

    keys = [key] if isinstance(key, str) else list(key)
    dim_cols = keys + change_cols
    expected = set(dim_cols) | {valid_from, valid_to, current_flag}
    extra = sorted(set(current.columns) - expected)
    if extra:
        raise ValueError(
            "scd2_merge requires current's columns to be exactly keys + "
            f"change_cols + bookkeeping columns; untracked columns {extra} "
            "cannot be populated on new versions — add them to change_cols"
        )

    open_rows = current.filter(F.col(current_flag))
    closed_rows = current.filter(~F.col(current_flag))

    u = updates.select(
        *[F.col(c).alias(f"_u_{c}") for c in dim_cols],
        F.col(effective_col).alias("_u_eff"),
    )
    key_cond = [F.col(k) == F.col(f"_u_{k}") for k in keys]
    joined = open_rows.join(u, key_cond, "full_outer")

    changed = ~F.struct(*[F.col(c) for c in change_cols]).eqNullSafe(
        F.struct(*[F.col(f"_u_{c}") for c in change_cols]))
    has_old = F.col(valid_from).isNotNull()
    has_new = F.col("_u_eff").isNotNull()

    # old open rows: keep as-is when no update or unchanged; close when
    # the tracked values changed
    kept_open = joined.filter(has_old & (~has_new | ~changed)).select(
        *[F.col(c) for c in current.columns]
    )
    closed_now = joined.filter(has_old & has_new & changed).select(
        *[F.col(c) if c not in (valid_to, current_flag)
          else (F.col("_u_eff").alias(valid_to) if c == valid_to
                else F.lit(False).alias(current_flag))
          for c in current.columns]
    )
    # new versions: changed rows + brand-new keys
    fresh = joined.filter(has_new & (~has_old | changed)).select(
        *[
            (F.col(f"_u_{c}").alias(c) if c in dim_cols
             else F.col("_u_eff").alias(c) if c == valid_from
             else F.lit(None).cast(dict(current.dtypes)[valid_to]).alias(c)
             if c == valid_to
             else F.lit(True).alias(c))
            for c in current.columns
        ]
    )
    return closed_rows.unionByName(kept_open).unionByName(
        closed_now).unionByName(fresh)
