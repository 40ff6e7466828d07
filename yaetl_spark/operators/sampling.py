"""Deterministic sampling & dataset splitting — training-pipeline surface.

Beyond-ref operators (the reference has no sampling; SURVEY.md §2.11 lists
the absences we fill Spark-side). Everything here is RNG-free: buckets come
from pure integer/hash arithmetic on a key column, so a sample is

- reproducible across engines (the oracle SQL computes the same buckets),
- stable across cluster sizes, partitioning, and reruns (no seed state),
- pushdown-able — the bucket predicate is a scan-level filter, which is
  the shape that matters at 100 TB: a 1% sample reads ~1% of row groups
  when the key correlates with file order, and never shuffles.

``df.sample()``/``sampleBy()`` are deliberately not used: their per-task
RNG streams change with partitioning, which breaks train/eval set stability
between pipeline versions — the cardinal sin of dataset curation.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth multiplicative constant (2^32 * golden ratio conjugate) — fast
# integer mixing for already-unique integer keys.
_KNUTH = 2654435761
_SALT = 12345


def hash_bucket(
    key: Column | str, buckets: int = 1000, salt: int = _SALT
) -> Column:
    """Deterministic bucket in [0, buckets) from a key column.

    Integer keys mix via Knuth multiplicative hashing; string keys via the
    first 8 hex digits of md5 — both reproducible in any engine (the
    DuckDB oracle uses the same arithmetic / ``md5``).
    """
    c = F.col(key) if isinstance(key, str) else key
    # dtype-dispatch happens at plan time via a try on the cast: callers
    # pass the right variant explicitly with `string_key=True` semantics
    return F.pmod(c * F.lit(_KNUTH) + F.lit(salt), F.lit(buckets))


def hash_bucket_str(
    key: Column | str, buckets: int = 1000
) -> Column:
    """String-key variant: md5-prefix → int → bucket. JVM-side, no UDF."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint"),
        F.lit(buckets),
    )


def hash_sample(
    df: DataFrame,
    key: Column | str,
    fraction: float,
    buckets: int = 1000,
    string_key: bool = False,
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows keyed by ``key``."""
    b = (hash_bucket_str if string_key else hash_bucket)(key, buckets)
    return df.filter(b < F.lit(int(round(fraction * buckets))))


def stratified_hash_sample(
    df: DataFrame,
    key: Column | str,
    strata: Column | str,
    rates: Mapping[object, float],
    default_rate: float = 1.0,
    buckets: int = 1000,
    string_key: bool = False,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``rates`` maps a stratum value
    to its keep-fraction (e.g. downsample boilerplate web text to 5% while
    keeping 100% of books). One pushed-down filter, zero shuffles."""
    s = F.col(strata) if isinstance(strata, str) else strata
    rate = None
    for value, frac in rates.items():
        thr = F.lit(int(round(frac * buckets)))
        rate = F.when(s == F.lit(value), thr) if rate is None else rate.when(
            s == F.lit(value), thr
        )
    rate = (
        rate.otherwise(F.lit(int(round(default_rate * buckets))))
        if rate is not None
        else F.lit(int(round(default_rate * buckets)))
    )
    b = (hash_bucket_str if string_key else hash_bucket)(key, buckets)
    return df.filter(b < rate)


def split_column(
    key: Column | str,
    weights: Sequence[float] = (0.98, 0.01, 0.01),
    names: Sequence[str] = ("train", "val", "test"),
    buckets: int = 10000,
    string_key: bool = False,
) -> Column:
    """Deterministic train/val/test assignment as a Column.

    Cumulative bucket thresholds over the key hash: a document keeps its
    split forever — across reruns, engines, and data growth (new keys land
    proportionally). The standard contamination guard: eval membership
    must never depend on partitioning or RNG state.
    """
    if len(weights) != len(names):
        raise ValueError("weights and names must have equal length")
    total = float(sum(weights))
    b = (hash_bucket_str if string_key else hash_bucket)(key, buckets)
    out = None
    acc = 0.0
    for w, name in zip(weights, names):
        acc += w / total
        thr = F.lit(int(round(acc * buckets)))
        out = F.when(b < thr, F.lit(name)) if out is None else out.when(
            b < thr, F.lit(name)
        )
    # rounding safety: the last threshold == buckets, so otherwise() is
    # unreachable; keep it for arithmetic edge cases
    return out.otherwise(F.lit(names[-1]))


def dataset_split(
    df: DataFrame,
    key: Column | str,
    weights: Sequence[float] = (0.98, 0.01, 0.01),
    names: Sequence[str] = ("train", "val", "test"),
    split_col: str = "split",
    **kw,
) -> DataFrame:
    """Attach the deterministic split assignment as a column."""
    return df.withColumn(split_col, split_column(key, weights, names, **kw))


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    clusters: DataFrame,
    weights: Sequence[float] = (0.98, 0.01, 0.01),
    names: Sequence[str] = ("train", "val", "test"),
    split_col: str = "split",
    cluster_id: str = "doc_id",
    cluster_col: str = "cluster",
    **kw,
) -> DataFrame:
    """Group-aware train/val/test assignment: every member of a
    near-duplicate CLUSTER lands in the same split, decided by the
    cluster representative's hash; unclustered rows split by their own
    id — the rule that closes the leakage channel row-hash
    :func:`dataset_split` cannot see (a near-dup pair straddling
    train/test inflates eval scores exactly like verbatim
    contamination; Lee et al. 2022 "Deduplicating Training Data Makes
    Language Models Better" measures this effect directly).

    ``clusters`` is the ``(doc_id, cluster)`` table from
    :func:`~yaetl_spark.operators.graph.dedup_clusters` (any near-dup
    rung: MinHash, SimHash, embedding). Same determinism contract as
    the other hash splitters: a row's split depends only on its
    effective key, so assignments are stable across reruns, engines,
    partitionings, and corpus growth — and a cluster's split never
    changes when new members join it (the representative is the
    cluster minimum, stable under growth of non-minimal members).

    Scale shape (100 TB): one LEFT join against the cluster table
    (clustered docs only — at corpus scale a small fraction, planner
    broadcast-able), then the scan-level hash split on
    ``coalesce(cluster, id)``. No shuffle of the corpus beyond the
    join's own requirement.
    """
    # collision-safe temp names (the top_p_filter/quantile_strata
    # pattern): fixed "_ls_*" names would silently collide with
    # same-named caller columns
    jid, jcl = "_ls_id", "_ls_cluster"
    while jid in df.columns or jcl in df.columns:
        jid, jcl = "_" + jid, "_" + jcl
    c = clusters.select(
        F.col(cluster_id).alias(jid),
        F.col(cluster_col).alias(jcl),
    )
    joined = df.join(c, df[id_col] == F.col(jid), "left").drop(jid)
    key = F.coalesce(F.col(jcl), F.col(id_col))
    return joined.withColumn(
        split_col, split_column(key, weights, names, **kw)
    ).drop(jcl)


def cluster_cap(
    df: DataFrame,
    id_col: str,
    clusters: DataFrame,
    cap: int,
    cluster_id: str = "doc_id",
    cluster_col: str = "cluster",
    buckets: int = 1_000_000,
    rank_col: str | None = None,
) -> DataFrame:
    """Balanced per-cluster sampling: keep at most ``cap`` members of
    every near-duplicate cluster — the training-mix move BETWEEN "drop
    all duplicates" (:func:`~yaetl_spark.operators.graph.
    dedup_clusters` + keep-representative) and "keep everything": a
    bounded number of near-variants per cluster preserves paraphrase
    diversity without letting a 10k-copy boilerplate cluster dominate
    the mixture (the cluster-level analogue of
    :func:`~yaetl_spark.operators.curation.cap_per_group`'s per-source
    quota).

    ``clusters`` is the ``(doc_id, cluster)`` table from any near-dup
    rung (MinHash, SimHash, embedding); it must map each id AT MOST
    once (:func:`~yaetl_spark.operators.graph.dedup_clusters` emits
    unique ids) — a duplicate mapping would duplicate rows through
    the join. Selection within a cluster is
    DETERMINISTIC: rank by ``(hash_bucket(id), id)`` — the
    :func:`~yaetl_spark.operators.curation.cap_per_group` convention —
    so the kept set is stable across reruns, engines, partitionings,
    and corpus growth (new members displace proportionally, never
    reshuffle the quota). Unclustered rows are singleton clusters and
    always survive (``cap >= 1``). ``rank_col`` optionally exposes the
    within-cluster rank (1 for unclustered rows).

    Scale shape (100 TB): the window shuffles ONLY the clustered
    fraction — rows that miss the (small, broadcast-able) cluster
    table short-circuit past the exchange entirely, so the shuffle is
    bounded by the near-dup population, not the corpus. The cost is a
    second pruned scan for the unclustered branch (cheap, columnar);
    persist the join output first if the input is itself an expensive
    lineage.
    """
    from pyspark.sql.window import Window

    if cap < 1:
        raise ValueError("cap must be >= 1")
    jid, jcl = "_cc_id", "_cc_cluster"
    while jid in df.columns or jcl in df.columns:
        jid, jcl = "_" + jid, "_" + jcl
    c = clusters.select(
        F.col(cluster_id).alias(jid),
        F.col(cluster_col).alias(jcl),
    )
    joined = df.join(c, df[id_col] == F.col(jid), "left").drop(jid)
    if rank_col is None:
        # internal temp: uniquify like jid/jcl so a pre-existing
        # ``_cc_rank`` user column is never clobbered-then-dropped
        rk = "_cc_rank"
        while rk in df.columns:
            rk = "_" + rk
    else:
        if rank_col in df.columns:
            raise ValueError(
                f"rank_col {rank_col!r} already exists in the input — "
                "withColumn would silently overwrite it")
        rk = rank_col
    w = Window.partitionBy(F.col(jcl)).orderBy(
        hash_bucket(id_col, buckets).asc(), F.col(id_col).asc()
    )
    capped = (
        joined.filter(F.col(jcl).isNotNull())
        .withColumn(rk, F.row_number().over(w))
        .filter(F.col(rk) <= cap)
        .drop(jcl)
    )
    singles = joined.filter(F.col(jcl).isNull()).drop(jcl) \
        .withColumn(rk, F.lit(1))
    out = capped.unionByName(singles)
    return out.drop(rk) if rank_col is None else out


def weighted_hash_sample(
    df: DataFrame,
    key: Column | str,
    weight: Column | str,
    buckets: int = 1000,
    string_key: bool = False,
) -> DataFrame:
    """Keep each row with probability equal to its own ``weight`` (clamped
    to [0, 1]), decided deterministically by the key hash — the per-row
    generalization of :func:`hash_sample` and the quality-weighted
    downsampling move of corpus curation (keep good docs at full rate,
    noisy docs proportionally to their score).

    Same guarantees as the other hash samplers: a row's fate depends only
    on (key, weight) — stable across reruns, engines, partitionings, and
    data growth; pure scan-level arithmetic, no RNG state, no shuffle.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    w = F.least(F.greatest(w.cast("double"), F.lit(0.0)), F.lit(1.0))
    b = (hash_bucket_str if string_key else hash_bucket)(key, buckets)
    return df.filter(b < w * F.lit(float(buckets)))


def quantile_strata_sample(
    df: DataFrame,
    value_col: str,
    key: Column | str,
    rates: Sequence[float],
    exact: bool = False,
    accuracy: int = 10_000,
    round_to: int = 6,
    buckets: int = 1000,
    string_key: bool = False,
    stratum_col: str | None = None,
) -> DataFrame:
    """Stratified-by-quantile sampling: fit the ``len(rates)``
    equi-depth stratum boundaries of ``value_col`` (one percentile
    aggregate), assign every row its stratum by scan-level array
    arithmetic, then keep a deterministic per-stratum fraction decided
    by the key hash — "keep 100% of the top price decile, 5% of the
    rest" without a global sort, an RNG, or a per-stratum job.

    ``rates[k]`` is stratum k's keep-fraction (stratum 0 = lowest
    values). Boundary conventions are shared with
    :func:`~yaetl_spark.operators.features.quantile_transform` (bounds
    rounded to ``round_to`` BEFORE use; stratum = boundaries strictly
    below the value, clamped — so a value sitting exactly ON an
    interior boundary belongs to the lower stratum) and the bucket
    arithmetic with :func:`hash_sample`, so the whole decision is
    engine-reproducible. NULL values carry no quantile and are
    dropped. ``stratum_col`` optionally exposes the assignment for
    auditing.

    Scale shape (100 TB): fit is ONE mergeable percentile aggregate
    (sketch by default; ``exact=True`` sort-aggregates for
    oracle-exact boundaries) reduced to a 1-row boundary array riding
    a broadcast (:func:`~yaetl_spark.operators.curation.
    attach_scalars` — never a collect); apply is a pushdown-friendly
    scan-level filter. Zero shuffles of the corpus itself.
    """
    from .curation import attach_scalars
    from .features import _pcts

    n = len(rates)
    if n < 2:
        raise ValueError("need at least 2 strata (len(rates) >= 2)")
    if not all(0.0 <= r <= 1.0 for r in rates):
        raise ValueError("every rate must be in [0, 1]")
    x = F.col(value_col).cast("double")
    # collision-safe temp name: a caller column literally named
    # "_qs_bounds" would make attach_scalars emit a duplicate/ambiguous
    # column (r11 ADVICE; same pattern as top_p_filter's temps)
    bounds_col = "_qs_bounds"
    while bounds_col in df.columns:
        bounds_col = "_" + bounds_col
    fit = df.agg(
        F.transform(
            _pcts(value_col, [i / n for i in range(n + 1)],
                  exact, accuracy),
            lambda v: F.round(v, round_to),
        ).alias(bounds_col)
    )
    tagged = attach_scalars(
        df.filter(x.isNotNull()), fit, value_col
    )
    b = F.col(bounds_col)
    k = F.least(
        F.greatest(
            F.size(F.filter(b, lambda v: v < x)) - F.lit(1), F.lit(0)
        ),
        F.lit(n - 1),
    )
    thr = F.element_at(
        F.array(*[F.lit(int(round(r * buckets))) for r in rates]),
        k + 1,
    )
    hb = (hash_bucket_str if string_key else hash_bucket)(key, buckets)
    if stratum_col is not None:
        tagged = tagged.withColumn(stratum_col, k.cast("int"))
    return tagged.filter(hb < thr).drop(bounds_col)


def shuffle_shards(
    df: DataFrame,
    key: Column | str,
    num_shards: int,
    salt: int = _SALT,
    shard_col: str = "shard",
    pos_col: str = "pos",
    string_key: bool = False,
    buckets: int = 1_000_000_007,
) -> DataFrame:
    """Deterministic global shuffle into ``num_shards`` export shards —
    the last step of a training-data pipeline: every row gets a
    ``(shard, pos)`` pair that together define a reproducible
    pseudo-random total order (shard-major), so N output files can be
    written with a seeded shuffle and re-produced bit-for-bit on any
    rerun, engine, cluster size, or partitioning.

    ``df.orderBy(rand())`` is deliberately not this: per-task RNG
    streams change with partitioning, and a global ``orderBy`` is a
    range-partitioned full sort. Here the permutation rank is the same
    hash arithmetic as :func:`hash_bucket` (Knuth multiplicative for
    integer keys, md5-prefix for strings — SQL-replicable), vary
    ``salt`` to draw a different permutation:

    - ``shard = rank_hash mod num_shards`` — uniform, key-stable;
    - ``pos`` = dense 0-based row_number within the shard, ordered by
      ``(rank_hash, key)`` (the key tiebreak makes hash collisions
      harmless — the order stays total and deterministic).

    Scale shape (100 TB): ONE shuffle, keyed on the shard id (the
    window's hash partitioning), and one within-shard sort — exactly
    the exchange+sort a sharded writer needs anyway; there is no
    global range partitioning, no sampling pass, no skew (hash
    uniformity), no driver action. Size ``num_shards`` so one shard's
    rows fit an executor's sort-spill budget (at 100 TB, tens of
    thousands of shards). Write with
    ``.repartition(num_shards, shard).sortWithinPartitions(pos)
    .write.partitionBy(shard)`` to land one ordered file per shard
    without re-shuffling.
    """
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    c = F.col(key) if isinstance(key, str) else key
    if string_key:
        # fold the salt into the hashed string so string permutations
        # re-draw with salt exactly like integer ones
        rank_hash = hash_bucket_str(
            F.concat_ws("\x1f", c, F.lit(str(salt))), buckets
        )
    else:
        rank_hash = hash_bucket(c, buckets, salt=salt)
    rk = "_sh_rank"
    while rk in df.columns:  # collision-safe temp (leakage_safe_split)
        rk = "_" + rk
    from pyspark.sql import Window

    w = (
        Window.partitionBy(F.col(shard_col))
        .orderBy(F.col(rk).asc(), c.asc())
    )
    return (
        df.withColumn(rk, rank_hash)
        .withColumn(
            shard_col,
            F.pmod(F.col(rk), F.lit(num_shards)).cast("int"),
        )
        .withColumn(pos_col, (F.row_number().over(w) - 1).cast("bigint"))
        .drop(rk)
    )


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    id_col: str = "doc_id",
    summary_partitions: int = 32,
    buckets: int | None = None,
    salt: int = _SALT,
    string_key: bool = False,
    out_col: str = "zorder",
) -> DataFrame:
    """Multi-column Z-ORDER (Morton) layout key for data-skipping
    file layout — the lakehouse `OPTIMIZE ZORDER BY` primitive, built
    deterministically: each column is quantile-bucketed into
    ``2^bits`` equi-depth buckets and the bucket indices' bits are
    interleaved MSB-first (column order = priority order within each
    bit level) into one ``bigint``. Files written in ``out_col`` order
    keep EVERY listed column's values locally clustered, so parquet
    min/max zonemaps prune scans filtered on ANY of the columns — the
    multi-dimensional generalization of sorting by one column.

    Quantile bucketing (not fixed-width) makes the key skew-immune:
    each bucket holds ~1/2^bits of the rows whatever the distribution,
    which is what makes the interleaving balanced and the layout worth
    writing. NULL values bucket 0 (sort first). Deterministic across
    reruns, engines, and partitionings — same discipline as
    :func:`curriculum_shards`, whose machinery this shares.

    Scale shape at 100 TB: ONE melted corpus pass computes every
    column's equi-depth summary together (explode to (col, value),
    one sub-sharded sort window — the :func:`hash_bucket` sub-shard
    arithmetic, SQL-replicable); cuts stay summary-sized
    (:func:`_rank_cut_row` per column off that one summary) and reach
    the corpus as a ONE-ROW eagerly-checkpointed broadcast; per-row
    assignment is a narrow map (two-level search per column,
    :func:`_count_below`, then pure bit arithmetic). No corpus
    shuffle at all in the assignment pass. Write the layout with
    ``curriculum_shards(zorder_key(df, cols), "zorder")`` — balanced
    z-ordered shards — or ``.sortWithinPartitions(out_col)`` for a
    per-file ordering.

    ``bits`` trades layout resolution against key width
    (``len(cols)·bits ≤ 62``); ``buckets`` (default ``4·2^bits``) is
    the summary points per (column, sub-shard) — raise for tighter
    bucket balance.
    """
    from .sketches import equidepth_summary

    cols = list(cols)
    if not cols:
        raise ValueError("cols must name at least one column")
    if bits < 1:
        raise ValueError("bits must be >= 1")
    if len(cols) * bits > 62:
        raise ValueError(
            f"len(cols)*bits = {len(cols) * bits} exceeds 62 — the "
            "interleaved key must fit a bigint; lower bits or drop "
            "columns")
    if summary_partitions < 1:
        raise ValueError("summary_partitions must be >= 1")
    n_buckets = 1 << bits
    if buckets is None:
        buckets = 4 * n_buckets
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    clash = [c for c in df.columns
             if c == out_col or c.startswith("_zo_")]
    if clash:
        raise ValueError(
            f"zorder_key would collide with input column(s) {clash}; "
            "rename them or pass a different out_col")
    key = F.col(id_col)
    if string_key:
        sub = hash_bucket_str(
            F.concat_ws("\x1f", key, F.lit(str(salt))), summary_partitions)
    else:
        sub = hash_bucket(key, summary_partitions, salt=salt)

    melted = df.select(
        sub.alias("_zo_sub"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("c"),
                     F.col(c).cast("double").alias("v"))
            for i, c in enumerate(cols)
        ])).alias("_zo_m"),
    ).select(
        (F.col("_zo_m.c").cast("bigint")
         * F.lit(summary_partitions).cast("bigint")
         + F.col("_zo_sub").cast("bigint")).alias("_zo_cs"),
        F.col("_zo_m.v").alias("_zo_v"),
    )
    summ = equidepth_summary(
        melted, col="_zo_v", shard_col="_zo_cs", buckets=buckets)
    col_of = F.call_function(
        "div", F.col("shard").cast("bigint"),
        F.lit(summary_partitions).cast("bigint"))
    row = None
    for i in range(len(cols)):
        r = _rank_cut_row(
            summ.filter(col_of == i), F.col("value"), n_buckets,
            f"_zo_arr{i}")
        row = r if row is None else row.crossJoin(r)
    row = row.localCheckpoint(eager=True)  # one row; see curriculum_shards

    out = df.crossJoin(F.broadcast(row))
    for i, c in enumerate(cols):
        out = out.withColumn(
            f"_zo_b{i}",
            _count_below(F.col(f"_zo_arr{i}"), F.col(c).cast("double"),
                         n_buckets - 1).cast("bigint"))
    z = F.lit(0).cast("bigint")
    for b in range(bits - 1, -1, -1):
        for i in range(len(cols)):
            z = (z * F.lit(2).cast("bigint")
                 + F.shiftright(F.col(f"_zo_b{i}"), b)
                 .bitwiseAND(F.lit(1).cast("bigint")))
    return out.withColumn(out_col, z).drop(
        *[f"_zo_arr{i}" for i in range(len(cols))],
        *[f"_zo_b{i}" for i in range(len(cols))])


def _rank_cut_row(
    summ: DataFrame, pt_v: Column, n_buckets: int, arr_name: str
) -> DataFrame:
    """ONE-ROW frame whose ``arr_name`` column holds the sorted array
    of ``n_buckets − 1`` exact rank-target cut values derived from an
    equi-depth summary's ``(value, weight)`` points: cut ``i`` is the
    min point whose cumulative weight reaches ``ceil(n·i/n_buckets)``.
    Everything is summary-sized — a single-partition CDF window, then
    each point emits exactly the cut indices whose rank target falls
    in its cumulative range (c_prev, c], i.e. i ∈
    [⌊c_prev·N/n⌋+1, ⌊c·N/n⌋] via EXACT integral division (no per-cut
    unrolled aggregates, no |cuts|×|points| theta join; products stay
    far inside int64). Callers broadcast the row and usually eagerly
    localCheckpoint it first (see :func:`curriculum_shards`)."""
    from pyspark.sql import Window

    pts = summ.groupBy(pt_v.alias("_rc_pv")).agg(
        F.sum(F.col("weight").cast("bigint")).alias("_rc_w"))
    cw = Window.orderBy(F.col("_rc_pv").asc())
    cum = pts.select(
        "_rc_pv",
        "_rc_w",
        F.sum("_rc_w").over(
            cw.rowsBetween(Window.unboundedPreceding, 0)).alias("_rc_c"),
        F.sum("_rc_w").over(
            cw.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)).alias("_rc_n"),
    )
    big_n = F.lit(n_buckets).cast("bigint")
    i_hi = F.least(
        F.lit(n_buckets - 1).cast("bigint"),
        F.call_function("div", F.col("_rc_c") * big_n, F.col("_rc_n")))
    i_lo = F.greatest(
        F.lit(1).cast("bigint"),
        F.call_function(
            "div",
            (F.col("_rc_c") - F.col("_rc_w")) * big_n, F.col("_rc_n"))
        + F.lit(1).cast("bigint"))
    cuts = cum.select(
        "_rc_pv",
        F.when(i_hi >= i_lo, F.sequence(i_lo, i_hi))
        .otherwise(F.array().cast("array<bigint>")).alias("_rc_is"),
    ).select(F.explode("_rc_is").alias("_rc_i"), "_rc_pv")
    return cuts.groupBy().agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("_rc_i"),
                                        F.col("_rc_pv")))),
            lambda s: s["_rc_pv"],
        ).alias(arr_name))


def _count_below(arr: Column, v: Column, m: int) -> Column:
    """Count of the sorted ``m``-element array's values strictly below
    ``v`` — a TWO-LEVEL search (≈2·√m coarse probes + one fine slice
    instead of an O(m) scan per row; at m in the thousands the flat
    scan is the difference between a narrow map and a hot spot). NULL
    ``v`` counts 0 (null comparisons drop out of the filter)."""
    if m <= 0:
        return F.lit(0)
    import math

    step = max(1, math.isqrt(m))
    nseg = m // step
    coarse = F.transform(
        F.sequence(F.lit(1), F.lit(nseg)),
        lambda j: F.element_at(arr, (j * step).cast("int")))
    cidx = F.size(F.filter(coarse, lambda e: e < v))
    fine = F.slice(arr, cidx * F.lit(step) + 1, step)
    return cidx * F.lit(step) + F.size(F.filter(fine, lambda e: e < v))


def curriculum_shards(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    num_shards: int = 16,
    buckets: int = 256,
    summary_partitions: int = 32,
    ascending: bool = True,
    salt: int = _SALT,
    shard_col: str = "shard",
    pos_col: str = "pos",
    string_key: bool = False,
    summary: DataFrame | None = None,
) -> DataFrame:
    """Deterministic SCORE-ORDERED export sharding — the curriculum
    sibling of :func:`shuffle_shards`: every row gets a ``(shard,
    pos)`` pair where shard boundaries partition the GLOBAL score
    order (shard 0 = lowest scores with ``ascending=True``, easy→hard;
    ``ascending=False`` flips it) and ``pos`` is the dense 0-based
    within-shard order by ``(score, id)`` — together a reproducible
    curriculum total order, bit-stable across reruns, engines, and
    partitionings. Rows with NULL score are EXCLUDED (score first).

    Pass ``summary`` (an :func:`~yaetl_spark.operators.sketches
    .equidepth_summary` with ``value``/``weight`` columns over the RAW
    score — the persisted-summary pattern the drift family uses) to
    skip the summary pass entirely: boundaries then come from the
    persisted distribution, so incremental daily exports keep STABLE
    shard boundaries while only the new day's rows are assigned and
    positioned (one corpus pass total). ``ascending`` still applies —
    the summary's values are re-oriented internally.

    This is a global sort at 100 TB without a global sort (and without
    ``repartitionByRange``'s nondeterministic sampling): boundaries
    come from a :func:`~yaetl_spark.operators.sketches
    .equidepth_summary` pass — sub-sharded by the same Knuth/md5 hash
    arithmetic as :func:`hash_bucket` (SQL-replicable, unlike an
    xxhash salt) — and cut ``i`` is the summary value at exact
    integer rank target ``ceil(n·i/num_shards)``; shard sizes are
    balanced to within the summary's rank-error bound
    (≈ n/buckets per sub-shard, plus tie mass — heavy ties at a cut
    all land in the LOWER shard, deterministically). Raise ``buckets``
    /``summary_partitions`` for tighter balance.

    Scale shape: TWO corpus passes. Pass 1 is the summary (one
    exchange: the sub-shard sort window; the bucket aggregate reuses
    it). The cut table then stays summary-sized end to end — a
    single-partition CDF window over ≤ ``summary_partitions·buckets``
    points, each point emitting exactly the cut indices whose rank
    target it covers via EXACT integral division (no per-cut unrolled
    aggregates, no |cuts|×|points| theta join) — and reaches pass 2 as
    a ONE-ROW broadcast (the declared 1-row
    BroadcastNestedLoopJoin, the :func:`summary_psi` cuts pattern;
    no driver collect anywhere). Pass 2 assigns shards with a
    TWO-LEVEL sorted-array search (√M coarse probes + one √M fine
    slice instead of an O(num_shards) scan per row), then one
    exchange for the within-shard position window. Size
    ``num_shards`` so one shard fits an executor's sort-spill budget
    — shards are balanced by construction, so this turns the global
    sort into ``num_shards`` even task-local sorts (the TeraSort
    shape). Write with ``.repartition(num_shards, shard)
    .sortWithinPartitions(pos).write.partitionBy(shard)``.
    """
    from pyspark.sql import Window

    from .sketches import equidepth_summary

    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    if summary_partitions < 1:
        raise ValueError("summary_partitions must be >= 1")
    for t in ("_cur_v", "_cur_arr"):
        if t in df.columns:
            raise ValueError(
                f"curriculum_shards uses internal column {t!r}; rename "
                "it in the input")
    key = F.col(id_col)
    if string_key:
        sub = hash_bucket_str(
            F.concat_ws("\x1f", key, F.lit(str(salt))), summary_partitions)
    else:
        sub = hash_bucket(key, summary_partitions, salt=salt)
    v = F.col(score_col).cast("double")
    cv = v if ascending else -v
    base = df.filter(v.isNotNull())

    if summary is None:
        summ = equidepth_summary(
            base.select(cv.alias("_cur_v"), sub.alias("_cur_sub")),
            col="_cur_v", shard_col="_cur_sub", buckets=buckets)
        pt_v = F.col("value")
    else:
        summ = summary
        pt_v = (F.col("value").cast("double") if ascending
                else -F.col("value").cast("double"))
    cuts_row = _rank_cut_row(summ, pt_v, num_shards, "_cur_arr")
    # eager ONE-ROW checkpoint: without it the broadcast side embeds
    # the whole upstream lineage, so the final plan carries the corpus
    # chain TWICE — on deep pipeline lineages Catalyst/AQE bookkeeping
    # over that doubled tree dominates wall-clock (observed: minutes of
    # driver-side collectFirst on the curation example). The summary
    # pass must execute before assignment anyway, so materializing the
    # single cuts row here costs nothing extra and keeps the output
    # plan linear in the input lineage.
    cuts_row = cuts_row.localCheckpoint(eager=True)

    shard_expr = _count_below(
        F.col("_cur_arr"), F.col("_cur_v"), num_shards - 1)
    w = (Window.partitionBy(F.col(shard_col))
         .orderBy(F.col("_cur_v").asc(), key.asc()))
    return (
        base.withColumn("_cur_v", cv)
        .crossJoin(F.broadcast(cuts_row))
        .withColumn(shard_col, shard_expr.cast("int"))
        .withColumn(pos_col, (F.row_number().over(w) - 1).cast("bigint"))
        .drop("_cur_v", "_cur_arr")
    )
