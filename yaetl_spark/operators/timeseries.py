"""Time-series regularization + cohort analytics (beyond-reference).

Gap-filling turns an event-driven aggregate (rows only where activity
happened) into a regular series (one row per key per period, carried
forward) — the prerequisite for joining series, charting, and window
math that assumes dense time. Cohort retention is the standard
product-analytics rollup: users grouped by first-activity period,
tracked by period offset.

Scale shapes:
- ``date_spine``/``gap_fill``: the spine is ``per-key (min, max)`` →
  ``explode(sequence(...))`` — size = keys × periods, generated
  distributed, never on the driver. The fill join shuffles on
  (key, period) where the aggregate side is already period-grained
  (small); the forward-fill window partitions by key.
- ``cohort_retention``: two shuffles — per-user first-activity (user-
  keyed, map-side combinable min), then the (cohort, offset) distinct-
  user count. User activity never multiplies: each (user, period) row
  contributes one count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["date_spine", "ewma", "gap_fill", "cohort_retention"]


def date_spine(
    df: DataFrame,
    key_cols: list[str],
    day_col: str,
    step: str = "1 day",
) -> DataFrame:
    """One row per key per period over each key's own [min, max] activity
    span: ``key_cols + [day_col]``. ``step`` is any Spark interval string
    (``"1 day"``, ``"1 hour"``, ``"15 minutes"``, ``"7 days"`` — the
    period column's type must support it: DATE steps by whole days,
    TIMESTAMP by any interval). Generated with
    ``explode(sequence(min, max, step))`` per key — distributed, and
    spine size is bounded by keys × span/step, independent of event
    count. Input values must already sit on step boundaries (they come
    from a ``date_trunc``-style aggregate), or spine rows won't align
    with data rows."""
    return (
        df.groupBy(*key_cols)
        .agg(F.min(day_col).alias("_lo"), F.max(day_col).alias("_hi"))
        .select(
            *key_cols,
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"interval {step}"))
            ).alias(day_col),
        )
    )


def gap_fill(
    daily: DataFrame,
    key_cols: list[str],
    day_col: str,
    fill_cols: dict[str, str],
    step: str = "1 day",
) -> DataFrame:
    """Densify a per-(key, period) aggregate onto the full per-key spine
    (``step`` as in :func:`date_spine` — hourly, weekly, …).

    ``fill_cols`` maps column → strategy: ``"ffill"`` carries the last
    observed value forward (leading gaps stay NULL), ``"zero"`` fills
    gaps with 0. Rows arrive back one-per-key-per-period.
    """
    spine = date_spine(daily, key_cols, day_col, step=step)
    joined = spine.join(daily, [*key_cols, day_col], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined
    for col, how in fill_cols.items():
        if how == "ffill":
            out = out.withColumn(col, F.last(col, ignorenulls=True).over(w))
        elif how == "zero":
            out = out.withColumn(
                col, F.coalesce(F.col(col), F.lit(0).cast(joined.schema[col].dataType))
            )
        else:
            raise ValueError(f"unknown fill strategy {how!r} for {col}")
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort × offset retention counts: users grouped by their first
    active period (``cohort``), counted once per later period at
    ``offset = period - cohort`` (in periods). Returns
    ``(cohort, offset, n_users)`` with offset 0 = the cohort size."""
    if period not in ("day", "week", "month"):
        raise ValueError("period must be day/week/month")
    p = F.date_trunc(period, F.col(ts_col)).cast("date")
    active = events.select(
        F.col(user_col).alias("_u"), p.alias("_p")
    ).distinct()
    first = active.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    div = {"day": 1, "week": 7}.get(period)
    if div is not None:
        offset = (F.datediff("_p", "_cohort") / div).cast("long")
    else:
        offset = (
            (F.year("_p") - F.year("_cohort")) * 12
            + (F.month("_p") - F.month("_cohort"))
        ).cast("long")
    return (
        active.join(first, "_u")
        .groupBy(F.col("_cohort").alias("cohort"), offset.alias("offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def ewma(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    by: list[str],
    alpha: float = 0.3,
    order_col: str | None = None,
    max_points: int | None = None,
) -> DataFrame:
    """Per-key exponentially weighted moving average — the standard
    smoother for per-entity metric streams (user engagement, sensor
    drift, queue depth): ``s_i = α·x_i + (1−α)·s_{i−1}`` folded over
    each key's time-ordered values, seeded with the first value.
    Returns one row per key: ``(by…, n_points, ewma)`` with ``ewma``
    the final smoothed level, rounded to 6.

    The fold is a scan-level ``aggregate`` over the key's sorted value
    array — the SAME left-to-right IEEE double sequence a SQL engine's
    ``list_reduce`` runs, so the result is bit-reproducible across
    engines (ties broken by ``order_col`` so the order itself is
    deterministic too; ``order_col`` defaults to ``ts_col``).

    Scale shape (100 TB): ONE key-partitioned shuffle into per-key
    arrays, then pure expression work — no joins, no Python, no
    iteration. The per-key array is the bounded state: ``max_points``
    is the mega-key guard (same discipline as ``semantic_dedup.
    max_cell_rows`` / ``funnel_steps.max_events_per_user``), enforced
    IN-PLAN — a key holding more than ``max_points`` values fails the
    job naming the key, at zero cost on clean data. It bounds the
    downstream fold; a key too large to even materialize its array
    still fails in the aggregation itself — profile with
    ``key_skew_profile`` first when keys may hold
    executor-memory-scale point counts.
    """
    by = list(by)
    if not by:
        raise ValueError(
            "by must name at least one key column (for a single global "
            "series, add a constant key)"
        )
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if max_points is not None and max_points < 1:
        raise ValueError("max_points must be >= 1")
    ordc = order_col or ts_col
    clean = df.dropna(subset=[value_col, ts_col])
    grouped = clean.groupBy(*by).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("_t"),
                    F.col(ordc).alias("_o"),
                    F.col(value_col).cast("double").alias("_v"),
                )
            )
        ).alias("_pts")
    )
    vals = F.transform(F.col("_pts"), lambda s: s["_v"])
    a = F.lit(float(alpha))
    one_minus = F.lit(1.0) - F.lit(float(alpha))
    folded = F.aggregate(
        F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: a * x + one_minus * acc,
    )
    if max_points is not None:
        key_str = F.concat_ws(
            ",", *[F.col(c).cast("string") for c in by]
        )
        folded = F.when(
            F.size("_pts") <= F.lit(int(max_points)), folded
        ).otherwise(
            F.raise_error(F.concat(
                F.lit("ewma: key ("), key_str,
                F.lit(") holds "), F.size("_pts").cast("string"),
                F.lit(f" points (> max_points={max_points}); the "
                      "per-key array would materialize in one task — "
                      "segment or downsample the mega-key upstream"),
            ))
        )
    return grouped.select(
        *by,
        F.size("_pts").cast("bigint").alias("n_points"),
        F.round(folded, 6).alias("ewma"),
    )
