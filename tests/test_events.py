"""Event-sequence analytics (operators/events.py): funnel_steps greedy
ordered matching and event_paths frequent-sequence mining — hand-built
fixtures with known answers, partition invariance, and plan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from yaetl_spark.operators import event_paths, funnel_steps


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _fixture(spark):
    # u1 completes a>b>c; u2 does b before a (reaches only a);
    # u3 does a>c>b (a then b in order — c irrelevant, reaches a>b);
    # u4 never does a; u5 tests the repeated-step funnel (a a b)
    rows = [
        (1, _ts(1), 1, "a"), (2, _ts(2), 1, "b"), (3, _ts(3), 1, "c"),
        (4, _ts(1), 2, "b"), (5, _ts(2), 2, "a"),
        (6, _ts(1), 3, "a"), (7, _ts(2), 3, "c"), (8, _ts(3), 3, "b"),
        (9, _ts(1), 4, "x"),
        (10, _ts(1), 5, "a"), (11, _ts(2), 5, "a"), (12, _ts(3), 5, "b"),
    ]
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )


def test_funnel_steps_greedy_ordered_counts(spark):
    ev = _fixture(spark)
    got = {r["step"]: r for r in
           funnel_steps(ev, ["a", "b", "c"]).collect()}
    # a: u1,u2,u3,u5 -> 4; a-then-b: u1,u3,u5 -> 3; a-then-b-then-c: u1
    assert [got[i]["users"] for i in (1, 2, 3)] == [4, 3, 1]
    assert got[1]["conv_from_prev"] is None
    assert got[2]["conv_from_prev"] == 0.75
    assert got[3]["conv_from_prev"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[3]["conv_from_first"] == 0.25
    assert [got[i]["step_name"] for i in (1, 2, 3)] == ["a", "b", "c"]


def test_funnel_steps_repeated_step_and_zero_step(spark):
    ev = _fixture(spark)
    got = {r["step"]: r["users"] for r in
           funnel_steps(ev, ["a", "a", "b"]).collect()}
    # two a's in order then b: only u5 (u1/u3 have one a)
    assert got == {1: 4, 2: 1, 3: 1}
    # a step nobody reaches still yields a row with users=0
    got = {r["step"]: r["users"] for r in
           funnel_steps(ev, ["c", "x"]).collect()}
    assert got == {1: 2, 2: 0}
    with pytest.raises(ValueError):
        funnel_steps(ev, [])


def test_funnel_tie_breaks_on_order_col(spark):
    # same timestamp: event_id decides order — b(id=2) after a(id=1)
    rows = [(1, _ts(1), 1, "a"), (2, _ts(1), 1, "b"),
            (3, _ts(1), 2, "b"), (4, _ts(1), 2, "a")]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"])
    got = {r["step"]: r["users"] for r in
           funnel_steps(ev, ["a", "b"]).collect()}
    assert got == {1: 2, 2: 1}  # only user 1 has a before b


def test_funnel_partition_invariant(spark):
    ev = _fixture(spark)
    a = sorted(map(tuple, funnel_steps(ev, ["a", "b", "c"]).collect()))
    b = sorted(map(tuple, funnel_steps(
        ev.repartition(7), ["a", "b", "c"]).collect()))
    assert a == b


def test_event_paths_counts_and_order(spark):
    rows = [
        (1, _ts(1), 1, "a"), (2, _ts(2), 1, "b"), (3, _ts(3), 1, "c"),
        (4, _ts(4), 1, "a"), (5, _ts(5), 1, "b"), (6, _ts(6), 1, "c"),
        (7, _ts(1), 2, "a"), (8, _ts(2), 2, "b"), (9, _ts(3), 2, "c"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"])
    got = [(r["path"], r["n_occurrences"]) for r in
           event_paths(ev, n=3, top=10).collect()]
    # a>b>c occurs 3x (twice for u1, once for u2); u1 also walks
    # b>c>a and c>a>b once each; truncated tails (< n events left) drop
    assert got[0] == ("a>b>c", 3)
    assert set(got[1:]) == {("b>c>a", 1), ("c>a>b", 1)}
    # top cut is deterministic: (count DESC, path ASC)
    top1 = event_paths(ev, n=3, top=1).collect()
    assert [(r["path"], r["n_occurrences"]) for r in top1] == [("a>b>c", 3)]
    with pytest.raises(ValueError):
        event_paths(ev, n=1)
    with pytest.raises(ValueError):
        event_paths(ev, top=0)


def test_event_paths_never_crosses_users_and_is_invariant(spark):
    rows = [(1, _ts(1), 1, "a"), (2, _ts(2), 2, "b"), (3, _ts(3), 1, "c"),
            (4, _ts(4), 2, "a"), (5, _ts(5), 1, "b")]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"])
    got = {r["path"] for r in event_paths(ev, n=2, top=10).collect()}
    assert got == {"a>c", "c>b", "b>a"}  # u1: a>c>b, u2: b>a
    a = sorted(map(tuple, event_paths(ev, n=2, top=10).collect()))
    b = sorted(map(tuple, event_paths(
        ev.repartition(5), n=2, top=10).collect()))
    assert a == b


def test_event_sequence_plans_stay_native(spark):
    ev = _fixture(spark)
    for df in (funnel_steps(ev, ["a", "b"]), event_paths(ev, n=2)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
            assert node not in plan
    # the top cut must be TakeOrderedAndProject, not a global sort
    plan = event_paths(ev, n=2, top=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_funnel_max_events_per_user_guard(spark):
    ev = _fixture(spark)
    # in-plan guard: raises at execution, naming the user and count
    with pytest.raises(Exception, match="funnel-type events"):
        funnel_steps(ev, ["a", "b", "c"], max_events_per_user=2).collect()
    # at-the-bound passes with values unchanged vs unguarded
    got = sorted(map(tuple, funnel_steps(
        ev, ["a", "b", "c"], max_events_per_user=3).collect()))
    ref = sorted(map(tuple, funnel_steps(ev, ["a", "b", "c"]).collect()))
    assert got == ref
    with pytest.raises(ValueError):
        funnel_steps(ev, ["a"], max_events_per_user=0)


def _sess_fixture(spark):
    # u1: events at 0s, 1800s (gap == gap_sec -> merges), 3601s (>1800s
    # after 1800s -> new session); u2: single event; epochs chosen so
    # floor-second semantics are exact
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1),
        (2, base + dt.timedelta(seconds=1800), 1),
        (3, base + dt.timedelta(seconds=3601), 1),
        (4, base, 2),
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "user_id"])


def test_sessionize_gap_semantics(spark):
    from yaetl_spark.operators import sessionize

    got = {
        (r["user_id"], r["session_seq"]): r
        for r in sessionize(_sess_fixture(spark), gap_sec=1800).collect()
    }
    # exactly-gap merges; strictly-greater splits
    assert set(got) == {(1, 1), (1, 2), (2, 1)}
    s11 = got[(1, 1)]
    assert (s11["n_events"], s11["duration_sec"]) == (2, 1800)
    s12 = got[(1, 2)]
    assert (s12["n_events"], s12["duration_sec"]) == (1, 0)
    assert got[(2, 1)]["n_events"] == 1


def test_sessionize_per_event_and_partition_invariance(spark):
    from yaetl_spark.operators import sessionize

    ev = _sess_fixture(spark)
    tagged = sessionize(ev, gap_sec=1800, aggregate=False)
    assert {
        (r["event_id"], r["session_seq"]) for r in tagged.collect()
    } == {(1, 1), (2, 1), (3, 2), (4, 1)}
    a = sorted(map(tuple, sessionize(ev, gap_sec=1800).collect()))
    b = sorted(map(tuple, sessionize(
        ev.repartition(7), gap_sec=1800).collect()))
    assert a == b
    with pytest.raises(ValueError):
        sessionize(ev, gap_sec=-1)


def test_sessionize_single_exchange(spark):
    """The session aggregate groups on (user, session_seq) — a superset
    of the window's user hash partitioning — so the whole plan holds ONE
    hash Exchange (the user-keyed shuffle both window passes share)."""
    from yaetl_spark.operators import sessionize

    plan = sessionize(_sess_fixture(spark), gap_sec=1800) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan
