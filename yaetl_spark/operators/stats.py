"""Single-pass statistics — correlation and closed-form regression.

Beyond-reference analytics surface (the reference has no aggregation at
all — SURVEY.md §2.9): the two moments-based statistics every analytics
engine ships, computed in ONE aggregation pass over moment sums and made
engine-deterministic with the repo's absorb-the-ulps pattern (each term
rounded to 9 decimals, accumulated as DECIMAL(38,9) — an exact,
order-independent sum — with the float formula applied only to the
aggregated scalars). A plain float SUM is partition-order-dependent at
the ulp level, which would break both rerun stability and the DuckDB
oracle hash compare.

Scale shape (100 TB): one partial-aggregated pass over the scan for any
number of columns/pairs — no shuffle of the data itself, just the 1-row
(or |groups|-row) moment table. Pair count grows quadratically in
``len(cols)`` but only as *expressions per row*, never as rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["correlation_matrix", "frequent_itemsets", "grouped_ols"]

_DEC = "decimal(38,9)"


def _dsum(c: Column) -> Column:
    """Order-independent sum: round each term to 9 decimals, accumulate
    exactly as DECIMAL(38,9), hand back a double scalar."""
    return F.sum(F.round(c, 9).cast(_DEC)).cast("double")


def correlation_matrix(
    df: DataFrame, cols: Sequence[str]
) -> DataFrame:
    """Pairwise Pearson correlations of ``cols`` in ONE aggregation
    pass: per pair, ``corr = (n·Σxy − Σx·Σy) /
    sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))`` over the moment sums.
    Returns ``(col_a, col_b, corr, n)`` — one row per unordered pair
    (``col_a < col_b`` lexicographically by input order), ``corr``
    rounded to 6, NULL when either column is constant (zero variance).

    Rows containing a NULL in ANY of ``cols`` are dropped first
    (listwise deletion), so every pair shares the same ``n`` —
    document-simple and what the oracle replicates; pre-filter yourself
    for pairwise-complete semantics.

    Deterministic: moment sums use the DECIMAL(38,9) pattern (module
    docstring), so the matrix is bit-stable across partitionings and
    engines. One scan, map-side partial aggregation, a 1-row moment
    table — nothing else moves.
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    if len(set(cols)) != len(cols):
        raise ValueError("duplicate column names")
    clean = df.dropna(subset=cols)
    aggs = [F.count(F.lit(1)).cast("double").alias("_n")]
    for c in cols:
        x = F.col(c).cast("double")
        aggs.append(_dsum(x).alias(f"_s_{c}"))
        aggs.append(_dsum(x * x).alias(f"_ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(
                _dsum(F.col(a).cast("double") * F.col(b).cast("double"))
                .alias(f"_sp_{a}_{b}")
            )
    m = clean.agg(*aggs)

    def corr_expr(a: str, b: str) -> Column:
        n = F.col("_n")
        cov = n * F.col(f"_sp_{a}_{b}") - F.col(f"_s_{a}") * F.col(f"_s_{b}")
        va = n * F.col(f"_ss_{a}") - F.col(f"_s_{a}") * F.col(f"_s_{a}")
        vb = n * F.col(f"_ss_{b}") - F.col(f"_s_{b}") * F.col(f"_s_{b}")
        return F.when(
            (va > 0) & (vb > 0), F.round(cov / F.sqrt(va * vb), 6)
        )

    pairs = F.array(*[
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            corr_expr(a, b).alias("corr"),
        )
        for i, a in enumerate(cols)
        for b in cols[i + 1:]
    ])
    return m.select(
        F.explode(pairs).alias("_p"), F.col("_n").cast("bigint").alias("n")
    ).select("_p.col_a", "_p.col_b", "_p.corr", "n")


def grouped_ols(
    df: DataFrame,
    y: str,
    x: str,
    by: Sequence[str] = (),
) -> DataFrame:
    """Per-group simple linear regression ``y = intercept + slope·x``
    in closed form from the moment sums — the trend-fit every BI layer
    ships, grouped (e.g. price-per-unit by return flag, daily growth by
    region) with no ML library and no iteration::

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n
        r2        = cov² / (var_x · var_y)

    Returns ``(by…, n, slope, intercept, r2)``, each statistic rounded
    to 6; slope/r2 NULL for a zero-variance ``x`` (and intercept then
    NULL too — no line to fit). Rows with NULL in ``x``/``y`` drop.

    Deterministic DECIMAL(38,9) moment sums (module docstring); one
    partial-aggregated pass, shuffling only the |groups|-row moment
    table on the group keys.
    """
    by = list(by)
    clean = df.dropna(subset=[x, y])
    xc, yc = F.col(x).cast("double"), F.col(y).cast("double")
    g = clean.groupBy(*by) if by else clean.groupBy()
    m = g.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        _dsum(xc).alias("_sx"),
        _dsum(yc).alias("_sy"),
        _dsum(xc * xc).alias("_sxx"),
        _dsum(yc * yc).alias("_syy"),
        _dsum(xc * yc).alias("_sxy"),
    )
    n = F.col("_n")
    vx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    cov = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    slope = F.when(vx > 0, cov / vx)
    intercept = F.when(vx > 0, (F.col("_sy") - slope * F.col("_sx")) / n)
    # (cov·cov)/(vx·vy), not pow(corr, 2): POWER's libm rounding is not
    # guaranteed identical across engines; plain multiply/divide is
    r2 = F.when((vx > 0) & (vy > 0), cov * cov / (vx * vy))
    return m.select(
        *by,
        n.cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def frequent_itemsets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    min_support: float = 0.0,
) -> DataFrame:
    """Association-rule mining over baskets — the 2-itemset level of
    market-basket analysis (Agrawal & Srikant 1994's support/confidence
    framework): for every unordered item pair co-occurring in at least
    ``min_pair_count`` baskets and at support ≥ ``min_support``,

    - ``support``  = P(a, b)        — co-occurrence share of baskets
    - ``conf_ab``  = P(b | a), ``conf_ba`` = P(a | b)
    - ``lift``     = P(a, b) / (P(a) · P(b)) — >1 means genuinely
      associated, not just individually popular

    Returns ``(item_a, item_b, pair_n, support, conf_ab, conf_ba,
    lift)`` with ``item_a < item_b`` and ratios rounded to 6. All
    counts are integers, so the result is exactly reproducible.

    Scale shape (100 TB):
    - the raw stream shuffles ONCE, on the basket key, into a
      deduplicated sorted item array per basket (``collect_set`` —
      state bounded by basket size; cap pathological baskets upstream);
    - pair expansion is scan-level array arithmetic over that grouped
      frame (never a second shuffle of the stream, never a self-join —
      quadratic only within a basket);
    - item totals explode from the SAME grouped frame; together with
      the pair counts, every downstream shuffle is over the bounded
      pair/item vocabulary, and the basket count rides in via a 1-row
      broadcast hash join
      (:func:`~yaetl_spark.operators.curation.attach_scalars`).
    """
    from .curation import attach_scalars

    if min_pair_count < 1:
        raise ValueError("min_pair_count must be >= 1")
    if not 0.0 <= min_support <= 1.0:
        raise ValueError("min_support must be in [0, 1]")
    grouped = (
        df.select(
            F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it")
        )
        .filter(F.col("_bk").isNotNull() & F.col("_it").isNotNull())
        .groupBy("_bk")
        .agg(F.array_sort(F.collect_set("_it")).alias("_items"))
    )
    nb_row = grouped.agg(F.count(F.lit(1)).cast("double").alias("_nb"))
    item_n = (
        grouped.select(F.explode("_items").alias("_it"))
        .groupBy("_it")
        .agg(F.count(F.lit(1)).alias("_in"))
    )
    m = F.size("_items")
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), m - 1),
            lambda i: F.transform(
                F.sequence(i + 1, m),
                lambda j: F.struct(
                    F.element_at(F.col("_items"), i).alias("item_a"),
                    F.element_at(F.col("_items"), j).alias("item_b"),
                ),
            ),
        )
    )
    pairs = (
        grouped.filter(m >= 2)
        .select(F.explode(pair_structs).alias("_p"))
        .groupBy(
            F.col("_p.item_a").alias("item_a"),
            F.col("_p.item_b").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= min_pair_count)
    )
    enriched = (
        attach_scalars(pairs, nb_row, "item_a")
        .join(item_n.withColumnRenamed("_in", "_na"),
              F.col("item_a") == F.col("_it")).drop("_it")
        .join(item_n.withColumnRenamed("_in", "_nb_item"),
              F.col("item_b") == F.col("_it")).drop("_it")
    )
    support = F.col("pair_n") / F.col("_nb")
    out = enriched.select(
        "item_a", "item_b",
        F.col("pair_n").cast("bigint").alias("pair_n"),
        F.round(support, 6).alias("support"),
        F.round(F.col("pair_n") / F.col("_na"), 6).alias("conf_ab"),
        F.round(F.col("pair_n") / F.col("_nb_item"), 6).alias("conf_ba"),
        F.round(
            F.col("pair_n") * F.col("_nb") / (F.col("_na") * F.col("_nb_item")),
            6,
        ).alias("lift"),
    )
    if min_support > 0.0:
        out = out.filter(F.col("support") >= F.lit(float(min_support)))
    return out
