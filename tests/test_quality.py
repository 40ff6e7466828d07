"""Unit tests for operators/quality.py (validation suite, AUC,
calibration) and similarity.retrieval_metrics — hand-checked small
fixtures; the engine↔oracle parity of the driver queries is covered by
tests/test_oracle.py."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from yaetl_spark.operators import (
    between,
    binary_classifier_eval,
    calibration_bins,
    completeness,
    in_set,
    matches,
    max_value,
    min_value,
    retrieval_metrics,
    uniqueness,
    validate,
)


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_validate_metrics_and_passes(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (2, None, -5.0),
            (4, "z", 30.0),
        ],
        "id int, cat string, v double",
    )
    out = validate(
        df,
        [
            completeness("cat", 1.0),
            uniqueness("id", 1.0),
            in_set("cat", ["a", "b"], 0.5),
            between("v", 0.0, 25.0, 0.8),
            min_value("v", 0.0),
            max_value("v", 100.0),
        ],
    )
    got = {r["check"]: r for r in _rows(out)}
    assert got["completeness(cat)"]["value"] == 0.75
    assert not got["completeness(cat)"]["passed"]
    assert got["uniqueness(id)"]["value"] == 0.75
    assert not got["uniqueness(id)"]["passed"]
    # in_set over NON-NULL values: 2 of 3
    assert got["in_set(cat)"]["value"] == round(2 / 3, 6)
    assert got["in_set(cat)"]["passed"]
    # between: 2 of 4 non-null v inside [0, 25]... 10, 20 in; -5, 30 out
    assert got["between(v)"]["value"] == 0.5
    assert not got["between(v)"]["passed"]
    assert got["min_value(v)"]["value"] == -5.0
    assert not got["min_value(v)"]["passed"]
    assert got["max_value(v)"]["value"] == 30.0
    assert got["max_value(v)"]["passed"]
    # rows come back ordered by check name
    names = [r["check"] for r in _rows(out)]
    assert names == sorted(names)


def test_validate_unrounded_pass_comparison(spark):
    """A 0.9999996 ratio must NOT pass a 1.0 threshold even though its
    reported value rounds to 1.0."""
    n = 2_500_000
    df = spark.range(n).select(
        F.when(F.col("id") > 0, F.col("id")).alias("x")
    )
    out = _rows(validate(df, [completeness("x", 1.0)]))[0]
    assert out["value"] == 1.0  # rounded display value
    assert not out["passed"]  # exact comparison caught the one NULL


def test_validate_approx_uniqueness_runs(spark):
    df = spark.range(1000).select((F.col("id") % 100).alias("k"))
    out = _rows(validate(df, [uniqueness("k", 0.05)], approx=True))[0]
    # HLL estimate of 100 distinct over 1000 rows ≈ 0.1 ratio
    assert 0.05 < out["value"] < 0.2
    assert out["passed"]


def test_validate_matches_regex(spark):
    df = spark.createDataFrame(
        [("1-URGENT",), ("5-LOW",), ("9-BAD",), (None,)], "p string"
    )
    out = _rows(validate(df, [matches("p", "^[1-5]-", 0.6)]))[0]
    assert out["value"] == round(2 / 3, 6)
    assert out["passed"]


def test_validate_input_guards(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        validate(df, [])
    with pytest.raises(ValueError):
        validate(df, [completeness("id"), completeness("id")])


def test_auc_perfect_and_reversed(spark):
    df = spark.createDataFrame(
        [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)], "s double, y int"
    )
    row = binary_classifier_eval(df, "s", "y").collect()[0]
    assert (row["n"], row["n_pos"], row["n_neg"]) == (4, 2, 2)
    assert row["auc"] == 1.0
    rev = df.select((1 - F.col("s")).alias("s"), "y")
    assert binary_classifier_eval(rev, "s", "y").collect()[0]["auc"] == 0.0


def test_auc_ties_average_rank(spark):
    # all scores tied → AUC must be exactly 0.5
    df = spark.createDataFrame(
        [(0.5, 0), (0.5, 1), (0.5, 0), (0.5, 1)], "s double, y int"
    )
    assert binary_classifier_eval(df, "s", "y").collect()[0]["auc"] == 0.5


def test_auc_matches_pairwise_definition(spark):
    """AUC == (#concordant + 0.5·#tied) / (n_pos·n_neg), checked against
    the O(n²) definition on a deterministic mixed sample with ties."""
    pts = []
    for i in range(60):
        s = (i * 37 % 19) / 19.0  # collides → real tie groups
        y = 1 if (i * 13 % 7) < 3 else 0
        pts.append((s, y))
    pos = [s for s, y in pts if y == 1]
    neg = [s for s, y in pts if y == 0]
    num = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    )
    expected = round(num / (len(pos) * len(neg)), 6)
    df = spark.createDataFrame(pts, "s double, y int")
    got = binary_classifier_eval(df, "s", "y", round_scores=None).collect()[0]
    assert got["auc"] == expected


def test_auc_degenerate_single_class(spark):
    df = spark.createDataFrame([(0.3, 1), (0.7, 1)], "s double, y int")
    row = binary_classifier_eval(df, "s", "y").collect()[0]
    assert row["auc"] is None
    assert (row["n_pos"], row["n_neg"]) == (2, 0)


def test_calibration_bins_values_and_clamp(spark):
    df = spark.createDataFrame(
        [(-0.2, 0), (0.05, 0), (0.55, 1), (0.58, 0), (1.3, 1)],
        "p double, y int",
    )
    got = {r["bin"]: r for r in _rows(calibration_bins(df, "p", "y"))}
    assert set(got) == {0, 5, 9}  # -0.2 clamps to 0, 1.3 clamps to 9
    assert got[0]["n"] == 2 and got[0]["frac_pos"] == 0.0
    assert got[5]["n"] == 2 and got[5]["frac_pos"] == 0.5
    assert got[5]["mean_score"] == round((0.55 + 0.58) / 2, 6)
    assert got[5]["gap"] == round((0.55 + 0.58) / 2 - 0.5, 6)
    assert got[9]["n"] == 1 and got[9]["frac_pos"] == 1.0
    with pytest.raises(ValueError):
        calibration_bins(df, "p", "y", lo=1.0, hi=0.0)


def test_retrieval_metrics_hand_checked(spark):
    """4-point corpus in 1-D-ish embeddings where the neighbor structure
    is obvious: query 0 (label A) has its only same-label neighbor
    ranked first → rr = 1, recall = 1, ndcg = 1."""
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.1], 0),   # nearest to 0, same label
        (2, [0.0, 1.0], 1),
        (3, [0.1, 0.99], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    q = df.filter(F.col("vec_id") == 0)
    got = _rows(retrieval_metrics(df, q, k=2))
    assert len(got) == 1
    r = got[0]
    assert r["query_id"] == 0 and r["n_rel"] == 1 and r["hits"] == 1
    assert r["precision_at_k"] == 0.5
    assert r["recall_at_k"] == 1.0
    assert r["rr"] == 1.0
    assert r["ndcg"] == 1.0  # only relevant doc sits at rank 1 = ideal


def test_retrieval_metrics_rank_two_ndcg(spark):
    """Relevant doc at rank 2 of 2 → rr = 0.5, ndcg = (1/log2(3))/1."""
    # label 0's only peer is the FAR vector: query 0, corpus 1, 2
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.3], 1),    # rank 1, not relevant
        (2, [0.0, 1.0], 0),    # rank 2, relevant
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = _rows(retrieval_metrics(df, df.filter("vec_id = 0"), k=2))[0]
    assert got["hits"] == 1 and got["rr"] == 0.5
    expected_ndcg = round(
        round(1 / math.log2(3), 9) / round(1 / math.log2(2), 9), 6
    )
    assert got["ndcg"] == expected_ndcg


def test_retrieval_metrics_no_relevant_universe(spark):
    """A query whose label appears nowhere else: recall/ndcg NULL,
    rr 0 — and no ANSI-mode blowup from the idcg guard."""
    rows = [
        (0, [1.0, 0.0], 7),
        (1, [0.9, 0.3], 1),
        (2, [0.0, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = _rows(retrieval_metrics(df, df.filter("vec_id = 0"), k=2))[0]
    assert got["n_rel"] == 0 and got["hits"] == 0
    assert got["recall_at_k"] is None and got["ndcg"] is None
    assert got["rr"] == 0.0
    with pytest.raises(ValueError):
        retrieval_metrics(df, df, k=0)


def test_auc_wide_range_two_level_matches_pairwise(spark):
    """Scores spanning many integer buckets (the two-level cumulative
    path actually splits): AUC equals the exact pairwise
    P(s_pos > s_neg) + 0.5·P(tie) definition."""
    import itertools

    rows = [
        (-250.5, 0), (-250.5, 1), (-3.25, 0), (0.5, 1), (0.5, 0),
        (17.0, 1), (17.0, 1), (999.75, 0), (999.75, 1), (1e6, 1),
    ]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(pos, neg)
    )
    expected = round(wins / (len(pos) * len(neg)), 6)
    df = spark.createDataFrame(rows, "s double, y int")
    got = binary_classifier_eval(df, "s", "y", round_scores=None).collect()[0]
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert got["auc"] == expected


def test_auc_plan_has_no_global_sort_over_score_aggregate(spark):
    """The only unpartitioned window runs over the BUCKET aggregate;
    the per-score cumulative window is partitioned by bucket."""
    df = spark.createDataFrame(
        [(float(i) * 7.3, i % 2) for i in range(100)], "s double, y int"
    )
    plan = binary_classifier_eval(df, "s", "y")._jdf.queryExecution() \
        .optimizedPlan().toString()
    # every Window over _s must carry the _bkt partition key
    for line in plan.splitlines():
        if "windowspecdefinition(_s" in line.replace(" ", ""):
            raise AssertionError(
                f"unpartitioned per-score window survived: {line}")
        if "windowspecdefinition" in line and "_s#" in line:
            assert "_bkt" in line, f"per-score window not bucketed: {line}"


def test_retrieval_metrics_external_queries(spark):
    """exclude_self=False: an EXTERNAL query set — n_rel counts the
    full label universe, and a corpus row sharing an id with a query
    is NOT dropped (ADVICE r8)."""
    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.9, 0.3], 1), (2, [0.0, 1.0], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    # external query reuses id 0 on purpose; its label has TWO corpus rows
    queries = spark.createDataFrame(
        [(0, [1.0, 0.05], 0)], "vec_id long, embedding array<double>, label int"
    )
    got = _rows(retrieval_metrics(corpus, queries, k=3,
                                  exclude_self=False))[0]
    assert got["n_rel"] == 2            # not label_count - 1
    assert got["hits"] == 2             # corpus id 0 retrieved, not dropped
    assert got["rr"] == 1.0
    # under the default subset-of-corpus contract the same call drops
    # corpus id 0 and discounts the self row
    got_self = _rows(retrieval_metrics(corpus, queries, k=3))[0]
    assert got_self["n_rel"] == 1 and got_self["hits"] == 1


def test_retrieval_metrics_max_queries_guard(spark):
    """A query sample over max_queries fails LOUD in-plan instead of
    scheduling the quadratic corpus x queries score."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame(
        [(i, [float(i), 1.0], i % 2) for i in range(8)],
        "vec_id long, embedding array<double>, label int",
    )
    with pytest.raises(SparkRuntimeException, match="max_queries"):
        retrieval_metrics(df, df, k=2, max_queries=4).collect()
    assert retrieval_metrics(df, df, k=2, max_queries=8).count() == 8


def test_auc_extreme_scores_survive_ansi(spark):
    """Scores beyond long range: the saturated bucket key must not
    overflow floor() under an ANSI session, and the AUC must still
    match the pairwise definition (within-bucket ordering carries the
    saturated tail)."""
    import itertools

    rows = [
        (-1e300, 0), (-5.0, 0), (1.0, 1), (8.8e307, 1), (1e308, 0),
        (1e308, 1), (2.5, 1),
    ]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(pos, neg)
    )
    expected = round(wins / (len(pos) * len(neg)), 6)
    df = spark.createDataFrame(rows, "s double, y int")
    _prior_ansi = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        got = binary_classifier_eval(
            df, "s", "y", round_scores=None).collect()[0]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", _prior_ansi)
    assert got["auc"] == expected


def test_cohens_kappa_known_value_and_edges(spark):
    from yaetl_spark.operators import cohens_kappa

    lab = spark.createDataFrame(
        [(True, True)] * 40 + [(False, False)] * 40
        + [(True, False)] * 10 + [(False, True)] * 10,
        ["a", "b"],
    )
    r = cohens_kappa(lab, "a", "b").first()
    # po=0.8; marginals 50/50 both sides -> pe=0.5; kappa=0.6
    assert (r["n"], r["po"], r["pe"], r["kappa"]) == (100, 0.8, 0.5, 0.6)
    # degenerate: both raters constant -> pe=1 -> kappa NULL (no 0/0)
    const = spark.createDataFrame([(1, 1)] * 5, ["a", "b"])
    rc = cohens_kappa(const, "a", "b").first()
    assert rc["pe"] == 1.0 and rc["kappa"] is None
    # NULL rows excluded from n
    with_null = lab.union(spark.createDataFrame(
        [(None, True), (True, None)], "a boolean, b boolean"))
    assert cohens_kappa(with_null, "a", "b").first()["n"] == 100
    # partition invariance
    r2 = cohens_kappa(lab.repartition(7), "a", "b").first()
    assert tuple(r2) == tuple(r)


def test_cohens_kappa_plan_single_scan(spark):
    """ONE corpus pass: the contingency partial-agg is the only
    corpus-sized shuffle, and the marginals/chance term are HOF folds
    over the collected cell array — never a re-scan per branch (the
    naive formulation scanned 3x) and never a BNLJ/cartesian."""
    from yaetl_spark.operators import cohens_kappa
    import __spark_entry__ as entry_mod
    from .conftest import SF_DIR

    lab = spark.createDataFrame([(True, False)] * 20, ["a", "b"])
    plan = cohens_kappa(lab, "a", "b") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the driver query reads parquet — gate the single-scan property
    qplan = entry_mod.queries()["cohens_kappa"](spark, SF_DIR) \
        ._jdf.queryExecution().executedPlan().toString()
    assert qplan.count("FileScan parquet") == 1


def test_cohens_kappa_max_classes_guard(spark):
    from yaetl_spark.operators import cohens_kappa
    import pytest as _pt

    ids = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["a", "b"])
    with _pt.raises(Exception, match="distinct classes"):
        cohens_kappa(ids, "a", "b", max_classes=10).collect()
    # at-the-bound passes
    assert cohens_kappa(
        ids, "a", "b", max_classes=100).first()["n"] == 40


def test_fleiss_kappa_known_value_and_edges(spark):
    from yaetl_spark.operators import fleiss_kappa

    # 3 items × 3 raters, labels {x, y}:
    # item 1: x,x,x (P=1)  item 2: x,x,y (P=1/3)  item 3: y,y,y (P=1)
    # p_bar = 7/9; marginals x=5/9, y=4/9 -> p_e = 41/81; kappa = 22/40
    rows = [(1, "x")] * 3 + [(2, "x"), (2, "x"), (2, "y")] + [(3, "y")] * 3
    df = spark.createDataFrame(rows, ["item", "label"])
    r = fleiss_kappa(df, "item", "label").first()
    assert (r["n_items"], r["n_raters"], r["n_categories"]) == (3, 3, 2)
    assert r["p_bar"] == round(7 / 9, 6)
    assert r["p_e"] == round(41 / 81, 6)
    assert r["kappa"] == 0.55
    # unanimous constant panel -> p_e = 1 -> kappa NULL (no 0/0)
    const = spark.createDataFrame(
        [(1, "x")] * 3 + [(2, "x")] * 3, ["item", "label"])
    rc = fleiss_kappa(const, "item", "label").first()
    assert rc["p_e"] == 1.0 and rc["kappa"] is None
    # NULL items/labels excluded
    with_null = df.union(spark.createDataFrame(
        [(None, "x"), (9, None)], "item int, label string"))
    assert fleiss_kappa(with_null, "item", "label").first()["n_items"] == 3
    # partition invariance
    r2 = fleiss_kappa(df.repartition(7), "item", "label").first()
    assert tuple(r2) == tuple(r)


def test_fleiss_kappa_guards(spark):
    from yaetl_spark.operators import fleiss_kappa
    import pytest as _pt

    # ragged panel: item 2 has only 2 ratings
    ragged = spark.createDataFrame(
        [(1, "x"), (1, "y"), (1, "x"), (2, "x"), (2, "y")],
        ["item", "label"])
    with _pt.raises(Exception, match="ragged rating panel"):
        fleiss_kappa(ragged, "item", "label").collect()
    # single-rating items are not a panel either
    solo = spark.createDataFrame([(1, "x"), (2, "y")], ["item", "label"])
    with _pt.raises(Exception, match="ragged rating panel"):
        fleiss_kappa(solo, "item", "label").collect()
    # identifier posing as a label
    ids = spark.createDataFrame(
        [(i // 2, f"lbl{i}") for i in range(40)], ["item", "label"])
    with _pt.raises(Exception, match="distinct labels"):
        fleiss_kappa(ids, "item", "label", max_classes=10).collect()


def test_fleiss_kappa_single_corpus_shuffle(spark):
    """The (item,label) count table feeds both the per-item and the
    per-label reduction — Catalyst must reuse that exchange, not scan
    the corpus twice; and no BNLJ/cartesian sneaks in via the 1-row
    crossJoin."""
    from yaetl_spark.operators import fleiss_kappa

    rows = [(i % 50, ["x", "y", "z"][(i * 7) % 3]) for i in range(150)]
    df = spark.createDataFrame(rows, ["item", "label"])
    out = fleiss_kappa(df, "item", "label")
    out.collect()  # AQE inserts ReusedExchange at runtime
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
    assert "CartesianProduct" not in plan


def test_krippendorff_alpha_known_value(spark):
    """Hand-computed nominal alpha on a ragged panel:
    item A: 1,1,2 (m=3)  item B: 1,2 (m=2)  item C: 2,2,2,2 (m=4)
    item D: 1 (m=1, excluded — no pairable values).
    n = 9; d_o = (4/2 + 2/1 + 0)/9 = 4/9;
    marginals (pairable only): n_1 = 3, n_2 = 6 ->
    d_e = (81 - 45)/(9*8) = 0.5; alpha = 1 - (4/9)/0.5 = 1/9."""
    from yaetl_spark.operators import krippendorff_alpha

    rows = ([("A", 1), ("A", 1), ("A", 2), ("B", 1), ("B", 2)]
            + [("C", 2)] * 4 + [("D", 1)])
    df = spark.createDataFrame(rows, ["item", "label"])
    r = krippendorff_alpha(df, "item", "label").first()
    assert (r["n_items"], r["n_values"], r["n_categories"]) == (3, 9, 2)
    assert r["d_o"] == round(4 / 9, 6)
    assert r["d_e"] == 0.5
    assert r["alpha"] == round(1 / 9, 6)
    # partition invariance (the cross-item float sum is regrouped by
    # panel size and folded in fixed ascending-m order)
    r2 = krippendorff_alpha(df.repartition(7), "item", "label").first()
    assert tuple(r2) == tuple(r)
    # NULL items/labels excluded
    with_null = df.union(spark.createDataFrame(
        [(None, 1), ("Z", None)], "item string, label int"))
    assert krippendorff_alpha(
        with_null, "item", "label").first()["n_values"] == 9


def test_krippendorff_alpha_scores_the_panel_fleiss_rejects(spark):
    """The exact ragged panel fleiss_kappa raises on must come back
    with a finite alpha — the operator exists for precisely this
    input class (r11 verdict item 2)."""
    import pytest as _pt

    from yaetl_spark.operators import fleiss_kappa, krippendorff_alpha

    ragged = spark.createDataFrame(
        [(1, "x"), (1, "y"), (1, "x"), (2, "x"), (2, "y")],
        ["item", "label"])
    with _pt.raises(Exception, match="ragged rating panel"):
        fleiss_kappa(ragged, "item", "label").collect()
    r = krippendorff_alpha(ragged, "item", "label").first()
    # item 1: m=3, counts x=2,y=1 -> A=9-5=4, /2 = 2; item 2: m=2,
    # A=4-2=2, /1 = 2 -> d_o = 4/5; marginals x=3,y=2 ->
    # d_e = (25-13)/(5*4) = 0.6; alpha = 1 - (4/5)/0.6 = -1/3
    assert (r["n_items"], r["n_values"]) == (2, 5)
    assert r["d_o"] == 0.8 and r["d_e"] == 0.6
    assert r["alpha"] == round(-1 / 3, 6)


def test_krippendorff_alpha_edges_and_guards(spark):
    from yaetl_spark.operators import krippendorff_alpha
    import pytest as _pt

    # single-category panel: d_e = 0 -> alpha NULL (no ANSI 0/0)
    const = spark.createDataFrame(
        [(1, "x")] * 3 + [(2, "x")] * 2, ["item", "label"])
    rc = krippendorff_alpha(const, "item", "label").first()
    assert rc["d_e"] == 0.0 and rc["alpha"] is None and rc["d_o"] == 0.0
    # perfect agreement with >1 category: d_o = 0, alpha = 1
    perf = spark.createDataFrame(
        [(1, "x")] * 2 + [(2, "y")] * 2, ["item", "label"])
    rp = krippendorff_alpha(perf, "item", "label").first()
    assert rp["d_o"] == 0.0 and rp["alpha"] == 1.0
    # nothing pairable -> zero rows, not a divide-by-zero
    solo = spark.createDataFrame([(1, "x"), (2, "y")], ["item", "label"])
    assert krippendorff_alpha(solo, "item", "label").count() == 0
    # degenerate item column: too many distinct panel sizes
    many = spark.createDataFrame(
        [(i, j, "x") for i in range(1, 30) for j in range(i + 1)],
        ["item", "rep", "label"])
    with _pt.raises(Exception, match="distinct panel sizes"):
        krippendorff_alpha(
            many.select("item", "label"), "item", "label",
            max_panel_sizes=5).collect()


def test_krippendorff_alpha_interval_known_value(spark):
    """Hand-computed interval alpha: item A rates [1,2,4] (m=3), item
    B [2,2] (m=2), item C [5] excluded (m=1). A_A = 2(3*21-49) = 28,
    /2 = 14; A_B = 0 -> d_o = 14/5 = 2.8. Pairable value moments
    T1 = 11, T2 = 29 -> d_e = 2(5*29-121)/20 = 2.4;
    alpha = 1 - 2.8/2.4 = -1/6."""
    from yaetl_spark.operators import krippendorff_alpha

    rows = [("A", 1), ("A", 2), ("A", 4), ("B", 2), ("B", 2), ("C", 5)]
    df = spark.createDataFrame(rows, ["item", "label"])
    r = krippendorff_alpha(df, "item", "label", metric="interval").first()
    assert (r["n_items"], r["n_values"], r["n_categories"]) == (2, 5, 3)
    assert r["d_o"] == 2.8 and r["d_e"] == 2.4
    assert r["alpha"] == round(-1 / 6, 6)
    # adjacent disagreement must cost less than distant disagreement
    near = spark.createDataFrame(
        [(1, 4), (1, 5), (2, 4), (2, 5)], ["item", "label"])
    far = spark.createDataFrame(
        [(1, 1), (1, 5), (2, 1), (2, 5)], ["item", "label"])
    a_near = krippendorff_alpha(
        near, "item", "label", metric="interval").first()
    a_far = krippendorff_alpha(
        far, "item", "label", metric="interval").first()
    # same structure -> same alpha, but observed disagreement scales
    # with the squared gap (1 vs 16)
    assert a_near["d_o"] < a_far["d_o"]
    # perfect agreement across distinct values -> alpha exactly 1
    perf = spark.createDataFrame(
        [(1, 3), (1, 3), (2, 5), (2, 5), (2, 5)], ["item", "label"])
    assert krippendorff_alpha(
        perf, "item", "label", metric="interval").first()["alpha"] == 1.0


def test_krippendorff_alpha_interval_guards_and_binary_equivalence(spark):
    """Fractional ratings raise in-plan; with BINARY labels the squared
    difference IS the identity metric, so interval and nominal alpha
    coincide exactly — a cross-metric consistency check."""
    import pytest as _pt

    from yaetl_spark.operators import krippendorff_alpha

    frac = spark.createDataFrame(
        [(1, 1.0), (1, 2.5), (2, 1.0), (2, 2.0)], ["item", "label"])
    with _pt.raises(Exception, match="non-integer rating"):
        krippendorff_alpha(
            frac, "item", "label", metric="interval").collect()
    with _pt.raises(ValueError, match="metric"):
        krippendorff_alpha(frac, "item", "label", metric="ratio")
    # integral-valued doubles are fine
    ok = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 1.0), (2, 1.0)], ["item", "label"])
    assert krippendorff_alpha(
        ok, "item", "label", metric="interval").first()["n_values"] == 4
    binary = spark.createDataFrame(
        [(i, (i * 7 + r) % 2) for i in range(30) for r in range(2 + i % 2)],
        ["item", "label"])
    ni = krippendorff_alpha(binary, "item", "label").first()
    iv = krippendorff_alpha(
        binary, "item", "label", metric="interval").first()
    assert (ni["d_o"], ni["d_e"], ni["alpha"]) == (
        iv["d_o"], iv["d_e"], iv["alpha"])


def test_krippendorff_alpha_single_corpus_shuffle(spark):
    """One corpus shuffle to the (item,label) counts; the per-item
    window and reduction ride the same item partitioning (no second
    corpus-wide exchange) and the 1-row combine is not a cartesian
    blow-up."""
    from yaetl_spark.operators import krippendorff_alpha

    rows = [(i % 50, ["x", "y", "z"][(i * 7) % 3])
            for i in range(150)] + [(i % 50, "x") for i in range(25)]
    df = spark.createDataFrame(rows, ["item", "label"])
    out = krippendorff_alpha(df, "item", "label")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the AQE-final plan scans the corpus ONCE: the (item,label)
    # partial-count exchange is reused by the marginals branch;
    # everything downstream operates on the count table (bounded by
    # |items|x|labels|). toString() appends the pre-AQE Initial Plan,
    # so count inside the final section only.
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ExistingRDD") == 1
    assert "ReusedExchange" in final


def test_fk_integrity_counts(spark):
    from yaetl_spark.operators import fk_integrity

    fact = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (None,)], "k int")
    dim = spark.createDataFrame(
        [(1,), (2,), (3,), (None,), (2,)], "k int")  # dup + NULL ignored
    r = fk_integrity(fact, dim, "k").first()
    assert (r["n_fact"], r["n_null_key"], r["n_matched"], r["n_orphan"]) \
        == (5, 1, 3, 1)
    assert r["orphan_rate"] == 0.2
    # duplicate dim keys must NOT explode fact rows (distinct first)
    assert r["n_fact"] == fact.count()
    # empty fact -> rate NULL, no ANSI 0/0
    empty = fk_integrity(fact.filter("k = 12345"), dim, "k").first()
    assert empty["n_fact"] == 0 and empty["orphan_rate"] is None
    # differing key names
    f2 = spark.createDataFrame([(1,)], "fk int")
    d2 = spark.createDataFrame([(1,)], "dk int")
    assert fk_integrity(f2, d2, "fk", "dk").first()["n_orphan"] == 0
