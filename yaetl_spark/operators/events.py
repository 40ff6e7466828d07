"""Event-sequence analytics — funnels and path mining over an event
stream.

Beyond-reference capability layer (the reference has no event or
sequence surface at all — SURVEY.md §2.9/§2.11 list the absences we
fill Spark-side): the two sequence questions every product-analytics
store (and every behavioral-data curation pass) asks of a
``(user, ts, type)`` stream:

- :func:`funnel_steps` — ordered-conversion funnel: how many users
  performed step 1, THEN step 2, THEN step 3 … in temporal order.
- :func:`event_paths` — frequent path mining: the most common length-n
  event-type sequences users actually walk.

Both are pure Column expressions + relational ops (JVM-side,
whole-stage codegen; no Python UDFs), built only from primitives with
identical semantics in DuckDB so each operator is oracle-checkable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["event_paths", "event_transitions", "funnel_steps", "sessionize"]


def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    max_events_per_user: int | None = None,
) -> DataFrame:
    """Ordered-conversion funnel: for each prefix of ``steps``, count
    the users who performed those event types IN TEMPORAL ORDER
    (greedy earliest matching — take the first step-1 event, then the
    first step-2 event strictly after it in ``(ts, order_col)`` order,
    and so on; greedy matching reaches a prefix iff ANY ordered
    subsequence does, so the counts are the classic funnel semantics).
    Repeating a type in ``steps`` (view → view → purchase) is allowed
    and means "at least twice, in order".

    Returns one row per step: ``(step, step_name, users,
    conv_from_prev, conv_from_first)`` — ``step`` 1-based, rates
    rounded to 6, NULL ``conv_from_prev`` on step 1 and whenever the
    previous step had zero users. Steps no user reached still appear
    with ``users = 0``.

    Scale shape (100 TB):
    - the stream is filtered to the |steps| event types BEFORE the
      shuffle (scan-level ``isin`` — on a 100 TB firehose the funnel
      types are typically a small fraction);
    - ONE user-keyed shuffle into a sorted per-user event array
      (``collect_list`` state bounded by funnel events per user), then
      the greedy match is a scan-level ``aggregate`` fold over that
      array — no joins, no per-step passes;
    - everything after is arithmetic over the ≤ |steps|-row count
      table (a single-partition window over k rows);
    - ``max_events_per_user`` guards the per-user array state (the
      same mega-key discipline as ``semantic_dedup.max_cell_rows`` and
      ``frequent_itemsets.max_basket_items``): a bot user holding a
      large slice of the stream materializes its whole filtered event
      list in ONE aggregation task. The guard is IN-PLAN
      (``raise_error`` on the oversized array, naming the user and its
      event count) — it costs nothing when the data is clean, where an
      eager pre-check would double the user-keyed shuffle at 100 TB.
      It bounds the downstream fold; a user too large to even
      materialize its event array still fails in the aggregation
      itself — profile with ``key_skew_profile`` first when bots may
      hold executor-memory-scale event counts.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("steps must name at least one event type")
    k = len(steps)
    sess = df.sparkSession
    # event-type -> FIRST step index demanding it is not enough when a
    # type repeats; the fold below matches against the step the user is
    # currently AT, so carry the full per-step type array instead
    step_arr = F.array(*[F.lit(s) for s in steps])
    ev = (
        df.filter(F.col(type_col).isin(steps))
        .select(
            F.col(user_col).alias("_u"),
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(order_col).alias("tb"),
                F.col(type_col).alias("t"),
            ).alias("_e"),
        )
    )
    if max_events_per_user is not None and max_events_per_user < 1:
        raise ValueError("max_events_per_user must be >= 1")
    grouped = ev.groupBy("_u").agg(
        F.array_sort(F.collect_list("_e")).alias("_es")
    )
    if max_events_per_user is not None:
        grouped = grouped.withColumn(
            "_es",
            F.when(
                F.size("_es") <= F.lit(int(max_events_per_user)),
                F.col("_es"),
            ).otherwise(F.raise_error(F.concat(
                F.lit("funnel_steps user "), F.col("_u").cast("string"),
                F.lit(" holds "), F.size("_es").cast("string"),
                F.lit(f" funnel-type events (> max_events_per_user="
                      f"{max_events_per_user}): the per-user event "
                      "array would materialize in one task — drop or "
                      "segment the mega-user upstream, or raise "
                      "max_events_per_user if the state is acceptable"),
            ))),
        )
    # greedy fold: acc = number of steps completed so far; an event
    # advances acc iff its type is the one step acc+1 demands
    stage = F.aggregate(
        "_es",
        F.lit(0),
        lambda acc, e: F.when(
            (acc < F.lit(k))
            & (e.getField("t") == F.element_at(step_arr, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    per_stage = (
        grouped.select(stage.alias("_stage"))
        .filter(F.col("_stage") >= 1)
        .select(F.explode(F.sequence(F.lit(1), F.col("_stage"))).alias("step"))
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("_users"))
    )
    spine = sess.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], ["step", "step_name"]
    )
    w = Window.orderBy("step")
    dense = (
        spine.join(per_stage, "step", "left")
        .withColumn("_users", F.coalesce(F.col("_users"), F.lit(0)))
        .withColumn("_prev", F.lag("_users").over(w))
        .withColumn("_first", F.first("_users").over(w))
    )
    return dense.select(
        F.col("step").cast("int").alias("step"),
        "step_name",
        F.col("_users").cast("bigint").alias("users"),
        F.when(
            F.col("_prev") > 0,
            F.round(F.col("_users") / F.col("_prev"), 6),
        ).alias("conv_from_prev"),
        F.when(
            F.col("_first") > 0,
            F.round(F.col("_users") / F.col("_first"), 6),
        ).alias("conv_from_first"),
    )


def event_paths(
    df: DataFrame,
    n: int = 3,
    top: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    sep: str = ">",
) -> DataFrame:
    """Frequent path mining: the ``top`` most common length-``n``
    event-type sequences (consecutive events of one user in
    ``(ts, order_col)`` order), as ``sep``-joined path strings —
    "view>click>purchase". Returns ``(path, n_occurrences)`` ordered
    by ``(n_occurrences DESC, path ASC)`` — a total order, so the
    top-``top`` cut is deterministic and engine-reproducible.

    Rows with NULL ``type_col`` are excluded BEFORE windowing: a NULL
    step inside a window would otherwise be silently skipped by
    ``concat_ws`` and the (a, NULL, b) window would collide with a
    genuine shorter 'a>b' path. Exclusion means sequences are over the
    user's non-null events, in order.

    Scale shape (100 TB): ONE user-keyed shuffle (the sort window —
    state per user, not per corpus), ``n-1`` scan-level ``lead``
    columns over it, then a path-keyed partial aggregation whose key
    space is |event types|^n (tiny vs the stream); the top cut is
    TakeOrderedAndProject, never a global sort materialization.
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    if top < 1:
        raise ValueError("top must be >= 1")
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    leads = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    paths = (
        df.filter(F.col(type_col).isNotNull())
        .select(F.concat_ws(sep, *leads).alias("path"),
                  leads[-1].alias("_last"))
        .filter(F.col("_last").isNotNull())  # drop truncated tails
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        paths.orderBy(F.col("n_occurrences").desc(), F.col("path").asc())
        .limit(top)
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = "event_id",
    min_count: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over the event stream: for
    every observed ``(event_type → next event_type)`` pair within a
    user's timeline, the transition count and the row-normalized
    probability ``p = n / Σ n over the source type``. Returns
    ``(event_type, next_type, n_transitions, p)`` — the
    next-action model behind "what do users do after X" and the
    sequence-level drift check (compare two periods' matrices with
    :func:`~yaetl_spark.operators.stats.categorical_shift` on the pair
    counts).

    ``min_count`` prunes rare pairs BEFORE row-normalization, so ``p``
    is conditional on the KEPT transition mass (rows still sum to 1) —
    fit with ``min_count=1`` when you need unconditional probabilities.

    NULL event types are excluded BEFORE the window (same policy as
    :func:`event_paths` — a NULL must never alias a real step), and the
    per-user ordering is made total with ``tiebreak_col`` so ties in
    ``ts_col`` can't flip pairs between runs.

    Scale shape (100 TB): one shuffle to partition by user (window
    ``lead``), then a |types|²-bounded pair aggregate and a
    |types|-bounded row-sum join — both tiny. State per user is one
    row of look-ahead, never the collected timeline; a mega-user costs
    a long sorted run inside one partition, nothing more.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        df.filter(F.col(type_col).isNotNull())
        .select(
            F.col(type_col).alias("event_type"),
            F.lead(type_col).over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .filter(F.col("n_transitions") >= min_count)
    )
    totals = pairs.groupBy("event_type").agg(
        F.sum("n_transitions").alias("_row_total")
    )
    return (
        pairs.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "next_type",
            "n_transitions",
            F.round(
                F.col("n_transitions").cast("double")
                / F.col("_row_total"),
                round_to,
            ).alias("p"),
        )
    )


def sessionize(
    df: DataFrame,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    aggregate: bool = True,
) -> DataFrame:
    """Batch sessionization — the batch analogue of the streaming
    session window (``streaming/stream.py`` session mode): assign every
    event to a session that closes when the gap to the user's previous
    event exceeds ``gap_sec`` seconds (classic gaps-and-islands:
    flag session starts with ``lag``, number sessions with a running
    sum of the flags).

    ``aggregate=False`` returns the input rows plus a 1-based
    ``session_seq`` column (per-event assignment, e.g. for joining
    session ids back onto the stream). ``aggregate=True`` (default)
    returns one row per session: ``(user, session_seq, n_events,
    start_epoch, end_epoch, duration_sec)`` — epochs as floor-seconds
    BIGINT so results are engine-stable (same convention as the lag
    analytics query).

    Gap semantics match the streaming session window: a new session
    starts when ``ts − prev_ts > gap_sec`` (a gap of exactly
    ``gap_sec`` still merges), computed on floor-second epochs.

    Scale shape (100 TB):
    - ONE user-keyed shuffle; the two window passes (lag flag, running
      session number) share its sort order, and the per-session
      aggregate groups on ``(user, session_seq)`` — a superset of the
      window's hash partitioning, so Catalyst plans it with NO second
      Exchange (plan-gated in tests);
    - window state is O(1) per row (lag-1 + running sum) — no
      collect_list, no per-user buffering;
    - skew profile is the same as any per-user window: one user's
      events sort within one task, fine unless a single user is a
      measurable fraction of 100 TB (at which point the upstream
      per-source caps in ``curation.py`` are the remedy).
    """
    if gap_sec < 0:
        raise ValueError("gap_sec must be >= 0")
    from ..session import epoch_seconds, is_ntz

    # tz-invariant epoch: unix_timestamp on the canonical NTZ event
    # time would go through a session-tz cast and shift every epoch
    # under a non-UTC driver session (r10 verdict hazard)
    epoch = epoch_seconds(F.col(ts_col), ntz=is_ntz(df, ts_col))
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    prev = F.lag(epoch).over(w)
    new_s = F.when(
        prev.isNull() | ((epoch - prev) > F.lit(int(gap_sec))), 1
    ).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = df.withColumn("session_seq", F.sum(new_s).over(wrun))
    if not aggregate:
        return tagged
    return (
        tagged.groupBy(F.col(user_col), F.col("session_seq"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(epoch).alias("start_epoch"),
            F.max(epoch).alias("end_epoch"),
        )
        .withColumn(
            "duration_sec", F.col("end_epoch") - F.col("start_epoch")
        )
    )
