"""BreakAt — targeted break interrupts made order-deterministic.

Parity model: the reference's break interrupt matrix
(``/root/reference/tests/QualifierTest.php:407-1276``) — break self stops the
declaring traversable, break targeted at the root flow stops everything,
records extracted *before* the trigger still reach every sink. Batch
analogue asserted here: ordered truncation at the first trigger record.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yaetl_spark import BranchPipeline, Pipeline
from yaetl_spark.operators.qualifiers import BreakAt
from yaetl_spark.sinks import CollectSink


def _seq(spark, n=10):
    # ids 0..n-1 with a flag column that triggers at id == 6
    return spark.range(n).select(
        F.col("id"), (F.col("id") * 2).alias("val")
    )


def test_breakat_truncates_at_first_trigger(spark):
    df = _seq(spark)
    out = BreakAt(F.col("id") >= 6, "id").apply(df)
    assert sorted(r.id for r in out.collect()) == [0, 1, 2, 3, 4, 5]


def test_breakat_inclusive_keeps_trigger_row(spark):
    df = _seq(spark)
    out = BreakAt(F.col("id") >= 6, "id", inclusive=True).apply(df)
    assert sorted(r.id for r in out.collect()) == [0, 1, 2, 3, 4, 5, 6]


def test_breakat_no_trigger_is_noop(spark):
    df = _seq(spark)
    out = BreakAt(F.col("id") > 99, "id").apply(df)
    assert out.count() == 10


def test_breakat_rejects_bad_target(spark):
    with pytest.raises(ValueError):
        BreakAt(F.lit(True), "id", target="sibling")


def test_breakat_target_matrix_mirrors_reference_and_names_divergence(spark):
    """The reference's break-target matrix
    (ref tests/QualifierTest.php:407-1276; dispatch in
    ref src/Qualifiers/QualifierAbstract.php:69-77) has three target
    kinds. The two this engine CAN honor are asserted to match the
    reference's per-node record counts; the third is a *documented
    divergence* whose rejection path is pinned here — no silent gap.

    1. TARGET_SELF (ref flow7 shape: break-at-5 inside a branch) —
       nodes after the qualifier in the branch see 5 records
       (inclusive), the root flow's own nodes see all 10.
    2. TARGET_TOP on the root flow from inside a branch — every flow
       (root sink, breaking branch, sibling branch) sees the truncated
       prefix, matching ref QualifierTest.php:570-648.
    3. A specific upstream NODE as target: only observable through
       in-flight records draining between the target node and the
       qualifier — a vectorized plan has none, so construction is
       REJECTED with an error naming the divergence, rather than
       silently degrading to 'self'.
    """
    # (1) self-target: reference counts 5 at the post-qualifier node,
    # 10 on the unbranched flow
    root_sink, branch_sink = CollectSink(), CollectSink()
    child = (
        BranchPipeline(spark)
        .qualify(BreakAt(F.col("id") >= 4, "id", inclusive=True))
        .to(branch_sink)
    )
    Pipeline(spark).from_(_seq(spark)).to(root_sink).branch(child).run()
    assert len(branch_sink.rows) == 5  # num_exec of the ref's post-break node
    assert len(root_sink.rows) == 10

    # (2) root-target from a branch: all three flows truncate together
    # (asserted in detail by test_branch_root_break_truncates_everything)

    # (3) node-target: rejected, and the error must NAME the divergence
    with pytest.raises(ValueError, match="in-flight records"):
        BreakAt(F.lit(True), "id", target="extractor1")
    with pytest.raises(ValueError, match="documented divergence"):
        BreakAt(F.lit(True), "id", target="node")


def test_pipeline_breakat_dirty_only_when_fired(spark):
    # fired → sink sees the truncated flow and flushes 'dirty'
    seen: list[str] = []
    sink = CollectSink(on_flush=seen.append)
    report = (
        Pipeline(spark)
        .from_(_seq(spark))
        .qualify(BreakAt(F.col("id") >= 4, "id"))
        .to(sink)
        .run()
    )
    assert report["status"] == "dirty"
    assert seen == ["dirty"]
    assert sorted(r.id for r in sink.rows) == [0, 1, 2, 3]

    # not fired → clean, untruncated
    sink2 = CollectSink()
    report2 = (
        Pipeline(spark)
        .from_(_seq(spark))
        .qualify(BreakAt(F.col("id") > 99, "id"))
        .to(sink2)
        .run()
    )
    assert report2["status"] == "clean"
    assert len(sink2.rows) == 10


def test_branch_self_break_leaves_root_intact(spark):
    root_sink, branch_sink = CollectSink(), CollectSink()
    child = (
        BranchPipeline(spark)
        .qualify(BreakAt(F.col("id") >= 3, "id"))
        .to(branch_sink)
    )
    report = (
        Pipeline(spark)
        .from_(_seq(spark))
        .to(root_sink)
        .branch(child)
        .run()
    )
    assert len(root_sink.rows) == 10  # root flow untouched
    assert sorted(r.id for r in branch_sink.rows) == [0, 1, 2]
    assert report["status"] == "dirty"


def test_branch_root_break_truncates_everything(spark):
    """Root-targeted break from inside a branch stops the whole flow —
    root sink AND sibling branch see the truncated flow
    (ref tests/QualifierTest.php:570-648)."""
    root_sink, brk_sink, sibling_sink = CollectSink(), CollectSink(), CollectSink()
    breaker = (
        BranchPipeline(spark)
        .qualify(F.col("val") >= 0)  # prefix op before the break
        .qualify(BreakAt(F.col("id") >= 5, "id", target="root"))
        .to(brk_sink)
    )
    sibling = BranchPipeline(spark).to(sibling_sink)
    report = (
        Pipeline(spark)
        .from_(_seq(spark))
        .to(root_sink)
        .branch(breaker)
        .branch(sibling)
        .run()
    )
    for s in (root_sink, brk_sink, sibling_sink):
        assert sorted(r.id for r in s.rows) == [0, 1, 2, 3, 4]
    assert report["status"] == "dirty"


def test_branch_root_break_unfired_is_clean(spark):
    root_sink, brk_sink = CollectSink(), CollectSink()
    breaker = (
        BranchPipeline(spark)
        .qualify(BreakAt(F.col("id") > 99, "id", target="root"))
        .to(brk_sink)
    )
    report = (
        Pipeline(spark).from_(_seq(spark)).to(root_sink).branch(breaker).run()
    )
    assert len(root_sink.rows) == 10 and len(brk_sink.rows) == 10
    assert report["status"] == "clean"


def test_breakat_plan_has_no_global_sort(spark):
    """The truncation must not introduce a global Sort/Window — the cut is a
    min-aggregate broadcast (lazy form)."""
    df = _seq(spark, 1000)
    out = BreakAt(F.col("id") >= 500, "id").apply(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan.split("Exchange")[0]  # no sort above the filter
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# --- ContinueAt: targeted continue at an upstream node ----------------------


def test_continue_at_skips_rest_of_inner_iteration(spark):
    """Sequential from_ (crossJoin re-extraction, README.md:140-168) with
    a continue targeted at the OUTER extractor: when the qualifier fires
    on (a, b), the triggering record and the REST of b's for that a are
    skipped, and the flow resumes with the next a — the distinguishable
    slice of the reference's targeted-interrupt matrix
    (tests/QualifierTest.php:407-1276). Flow flushes CLEAN: a continue
    advances the flow, it never breaks it."""
    from yaetl_spark import (CollectSink, ContinueAt, MemorySource,
                             Pipeline)

    outer = MemorySource([(a,) for a in range(4)], "a long")
    inner = MemorySource([(b,) for b in range(5)], "b long")
    sink = CollectSink()
    report = (
        Pipeline(spark)
        .from_(outer)
        .from_(inner)  # crossJoin: nested re-extraction per outer record
        .qualify(ContinueAt(
            condition=(F.col("b") == F.col("a") + 1),
            order_by="b",
            partition_by=["a"],
        ))
        .to(sink)
        .run()
    )
    got = sorted((r["a"], r["b"]) for r in sink.rows)
    # per outer a: trigger at b = a+1; keep b's strictly before it;
    # a=3 triggers at b=4 -> keeps b in 0..3; a=0 triggers at b=1 -> {0}
    want = sorted(
        (a, b) for a in range(4) for b in range(5) if b < a + 1
    )
    assert got == want
    assert report["status"] == "clean"  # continue never dirties the flow


def test_continue_at_inclusive_and_no_trigger_keys(spark):
    from yaetl_spark.operators import ContinueAt

    df = spark.createDataFrame(
        [(a, b) for a in range(3) for b in range(4)], "a long, b long"
    )
    # inclusive keeps the trigger row itself
    inc = ContinueAt(F.col("b") == 2, "b", ["a"], inclusive=True).apply(df)
    assert sorted((r["a"], r["b"]) for r in inc.collect()) == sorted(
        (a, b) for a in range(3) for b in range(4) if b <= 2
    )
    # keys that never trigger keep every row
    some = ContinueAt(
        (F.col("a") == 1) & (F.col("b") == 0), "b", ["a"]
    ).apply(df)
    got = sorted((r["a"], r["b"]) for r in some.collect())
    want = sorted(
        (a, b) for a in range(3) for b in range(4)
        if not (a == 1)  # a=1 triggers at b=0: keeps nothing
    )
    assert got == want
    with pytest.raises(ValueError, match="partition_by"):
        ContinueAt(F.col("b") == 0, "b", [])


def test_continue_at_plan_one_window_shuffle_no_join(spark):
    from yaetl_spark.operators import ContinueAt

    df = spark.createDataFrame(
        [(a, b) for a in range(10) for b in range(10)], "a long, b long"
    )
    plan = ContinueAt(F.col("b") == 5, "b", ["a"]).apply(df)._jdf \
        .queryExecution().executedPlan().toString()
    for node in ("BroadcastHashJoin", "SortMergeJoin", "CartesianProduct",
                 "BroadcastNestedLoopJoin", "ArrowEvalPython"):
        assert node not in plan
    assert plan.count("Exchange hashpartitioning") == 1
