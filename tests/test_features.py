"""Feature-engineering operators: scalers, winsorization, embedding
normalization/quantization — plus event transitions, vocabulary stats,
token entropy, and file-level zonemap stats."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from yaetl_spark.operators import (
    apply_scaler,
    clip_outliers,
    event_transitions,
    file_stats,
    fit_scaler,
    l2_normalize,
    quantize_embeddings,
    scale_features,
    token_entropy,
    vocab_stats,
)

from .conftest import table_path


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# ------------------------------------------------------------------ scalers

def test_zscore_matches_closed_form(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 10.0]
    df = _df(spark, [(v,) for v in vals], "x double")
    out = scale_features(df, ["x"], method="zscore").collect()
    mean = sum(vals) / len(vals)
    var = sum((v - mean) ** 2 for v in vals) / (len(vals) - 1)
    std = math.sqrt(var)
    got = {r["x"]: r["x_scaled"] for r in out}
    for v in vals:
        assert got[v] == pytest.approx(round((v - round(mean, 9)) /
                                             round(std, 9), 6), abs=1e-6)


def test_minmax_hits_unit_interval(spark):
    df = _df(spark, [(v,) for v in [5.0, 7.5, 10.0]], "x double")
    got = sorted(r["x_scaled"]
                 for r in scale_features(df, ["x"], "minmax").collect())
    assert got == [0.0, 0.5, 1.0]


def test_robust_scaler_exact_median_iqr(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]  # outlier shouldn't explode scale
    df = _df(spark, [(v,) for v in vals], "x double")
    params = fit_scaler(df, ["x"], "robust", exact=True).collect()[0]
    assert params["x__center"] == 3.0  # median
    # interpolated quartiles of 5 points: p25 = idx 1.0 -> 2, p75 = idx
    # 3.0 -> 4, so IQR = 2 — the 100 outlier never touches the scale
    assert params["x__scale"] == 2.0
    out = apply_scaler(df, fit_scaler(df, ["x"], "robust", exact=True),
                       ["x"]).collect()
    got = {r["x"]: r["x_scaled"] for r in out}
    assert got[3.0] == 0.0


def test_constant_column_scales_to_zero(spark):
    df = _df(spark, [(2.0,), (2.0,), (2.0,)], "x double")
    for method in ("zscore", "minmax", "robust"):
        got = {r["x_scaled"]
               for r in scale_features(df, ["x"], method,
                                       exact=True).collect()}
        assert got == {0.0}, method


def test_null_passes_through_scaling(spark):
    df = _df(spark, [(1.0,), (3.0,), (None,)], "x double")
    rows = scale_features(df, ["x"], "minmax").collect()
    assert any(r["x_scaled"] is None and r["x"] is None for r in rows)
    assert all(r["x_scaled"] is not None for r in rows
               if r["x"] is not None)


def test_fit_on_train_apply_on_eval(spark):
    """The leak-free split: params fitted on one frame scale another."""
    train = _df(spark, [(0.0,), (10.0,)], "x double")
    eval_ = _df(spark, [(5.0,), (20.0,)], "x double")
    params = fit_scaler(train, ["x"], "minmax")
    got = sorted(r["x_scaled"]
                 for r in apply_scaler(eval_, params, ["x"]).collect())
    assert got == [0.5, 2.0]  # eval values beyond the fit range extrapolate


def test_apply_scaler_plan_is_broadcast_not_bnlj(spark):
    li = spark.read.parquet(table_path("lineitem")).select("l_quantity")
    out = scale_features(li, ["l_quantity"], "zscore")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bad_method_raises(spark):
    df = _df(spark, [(1.0,)], "x double")
    with pytest.raises(ValueError):
        fit_scaler(df, ["x"], "sigmoid")


# -------------------------------------------------------------- winsorize

def test_clip_outliers_quantile_bounds(spark):
    vals = [float(i) for i in range(1, 101)]
    df = _df(spark, [(v,) for v in vals], "x double")
    out = clip_outliers(df, "x", 0.05, 0.95, exact=True).collect()
    flags = {r["x"]: r["x_clip"] for r in out}
    clipped = {r["x"]: r["x_clipped"] for r in out}
    # p05 of 1..100 (interpolated) = 5.95, p95 = 95.05
    assert flags[1.0] == -1 and clipped[1.0] == 5.95
    assert flags[100.0] == 1 and clipped[100.0] == 95.05
    assert flags[50.0] == 0 and clipped[50.0] == 50.0


def test_clip_outliers_explicit_and_one_sided(spark):
    df = _df(spark, [(v,) for v in [-5.0, 0.0, 5.0]], "x double")
    out = {r["x"]: r for r in
           clip_outliers(df, "x", lower_q=None, upper_q=None,
                         lower=-1.0).collect()}
    assert out[-5.0]["x_clipped"] == -1.0 and out[-5.0]["x_clip"] == -1
    assert out[5.0]["x_clipped"] == 5.0 and out[5.0]["x_clip"] == 0
    # no bounds at all: passthrough, flag 0
    out2 = clip_outliers(df, "x", lower_q=None, upper_q=None).collect()
    assert all(r["x_clip"] == 0 and r["x_clipped"] == r["x"]
               for r in out2)


def test_clip_null_passthrough(spark):
    df = _df(spark, [(1.0,), (None,)], "x double")
    rows = {r["x"]: r for r in
            clip_outliers(df, "x", lower=0.0, upper=2.0,
                          lower_q=None, upper_q=None).collect()}
    assert rows[None]["x_clipped"] is None and rows[None]["x_clip"] == 0


# ------------------------------------------------------- embedding vectors

def test_l2_normalize_unit_norm_and_zero_vector(spark):
    df = _df(spark, [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, None)],
             "id int, embedding array<double>")
    rows = {r["id"]: r["embedding"]
            for r in l2_normalize(df, round_to=6).collect()}
    assert rows[1] == [0.6, 0.8]
    assert rows[2] == [0.0, 0.0]  # zero vector untouched, no NaN
    assert rows[3] is None


def _max_recon_err(q, scale_of):
    """Max |x − dequant(code)| over the whole frame; ``scale_of(c)``
    maps the zip lambda's (x, c, row-scale ref) to the per-element
    scale expression (a column for global, element for per-dim)."""
    err = F.aggregate(
        F.zip_with(
            "embedding", "codes",
            lambda x, c: F.abs(x.cast("double")
                               - c.cast("double")
                               * scale_of(x, c) / F.lit(127.0))),
        F.lit(0.0), lambda a, b: F.greatest(a, b))
    return q.select(F.max(err).alias("m")).collect()[0]["m"]


def test_quantize_roundtrip_error_bounded(spark):
    emb = spark.read.parquet(table_path("embeddings"))
    q = quantize_embeddings(emb, "embedding", bits=8)
    scale = q.select(F.max("q_scale")).collect()[0][0]
    max_err = _max_recon_err(q, lambda x, c: F.col("q_scale"))
    # max absolute reconstruction error <= half a code step
    assert max_err <= scale / 127.0 / 2.0 + 1e-12
    # codes stay inside the symmetric int8 range
    rng = q.select(
        F.max(F.aggregate(F.transform("codes", lambda c: F.abs(c)),
                          F.lit(0), lambda a, b: F.greatest(a, b))).alias("m")
    ).collect()[0]["m"]
    assert rng <= 127


def test_quantize_per_dim_tightens_error(spark):
    # dim 0 spans ±10, dim 1 spans ±0.1: a global absmax scale wastes
    # nearly all of dim 1's code range; per-dim must cut its error
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-10, 10), rnd.uniform(-0.1, 0.1)])
            for i in range(200)]
    df = _df(spark, rows, "id int, embedding array<double>")

    qg = quantize_embeddings(df, "embedding", bits=8)
    qd = quantize_embeddings(df, "embedding", bits=8,
                             per_dim=True, dim=2)
    err_g_dim1 = qg.select(F.max(F.abs(
        F.element_at("embedding", 2).cast("double")
        - F.element_at("codes", 2).cast("double")
        * F.col("q_scale") / F.lit(127.0))).alias("m")
    ).collect()[0]["m"]
    err_d_dim1 = qd.select(F.max(F.abs(
        F.element_at("embedding", 2).cast("double")
        - F.element_at("codes", 2).cast("double")
        * F.element_at("q_scale", 2) / F.lit(127.0))).alias("m")
    ).collect()[0]["m"]
    assert err_d_dim1 < err_g_dim1 / 10
    rng = qd.select(F.max(F.aggregate(F.transform("codes", lambda c: F.abs(c)),
                                      F.lit(0), lambda a, b: F.greatest(a, b)))).collect()[0][0]
    assert rng <= 127


def test_quantize_zero_dataset_and_bits_validation(spark):
    df = _df(spark, [(1, [0.0, 0.0])], "id int, embedding array<double>")
    row = quantize_embeddings(df).select("codes", "q_scale").collect()[0]
    assert row["codes"] == [0, 0] and row["q_scale"] == 0.0
    with pytest.raises(ValueError):
        quantize_embeddings(df, bits=1)
    with pytest.raises(ValueError):
        quantize_embeddings(df, per_dim=True)  # dim required


# -------------------------------------------------------- event transitions

def test_event_transitions_probabilities(spark):
    rows = [
        (1, 1, 100, "a"), (2, 1, 200, "b"), (3, 1, 300, "a"),
        (4, 2, 100, "a"), (5, 2, 200, "b"),
        (6, 3, 100, "a"), (7, 3, 200, "c"),
        (8, 4, 100, None), (9, 4, 200, "a"),  # NULL excluded pre-window
    ]
    df = _df(spark, rows, "event_id long, user_id long, ts long,"
                          " event_type string")
    got = {(r["event_type"], r["next_type"]): (r["n_transitions"], r["p"])
           for r in event_transitions(df).collect()}
    assert got[("a", "b")] == (2, 0.666667)
    assert got[("a", "c")] == (1, 0.333333)
    assert got[("b", "a")] == (1, 1.0)
    assert not any(k[0] is None or k[1] is None for k in got)
    # row-normalization: probabilities per source sum to ~1
    from collections import defaultdict
    per_src = defaultdict(float)
    for (src, _), (_, p) in got.items():
        per_src[src] += p
    assert all(abs(s - 1.0) < 1e-5 for s in per_src.values())


def test_event_transitions_tiebreak_total_order(spark):
    # two events share ts; event_id must break the tie deterministically
    rows = [(2, 1, 100, "b"), (1, 1, 100, "a"), (3, 1, 200, "c")]
    df = _df(spark, rows, "event_id long, user_id long, ts long,"
                          " event_type string")
    got = {(r["event_type"], r["next_type"])
           for r in event_transitions(df).collect()}
    assert got == {("a", "b"), ("b", "c")}


# ------------------------------------------------------------- text extras

def test_vocab_stats_coverage_monotone(spark):
    docs = spark.read.parquet(table_path("documents")).select(
        "doc_id", "text")
    rows = vocab_stats(docs, top_k=10).collect()
    assert len(rows) == 10
    cums = [r["cum_coverage"] for r in rows]
    assert cums == sorted(cums)
    assert abs(cums[-1] - round(sum(r["coverage"] for r in rows), 6)) < 1e-5
    assert all(r["df"] <= r["n"] for r in rows)


def test_token_entropy_known_answers(spark):
    df = _df(spark, [(1, "a a b b"), (2, "x x x x"), (3, "q w e r")],
             "doc_id long, text string")
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert got[1]["entropy"] == pytest.approx(1.0, abs=1e-6)
    assert got[2]["entropy"] == pytest.approx(0.0, abs=1e-6)
    assert got[3]["entropy"] == pytest.approx(2.0, abs=1e-6)
    assert got[1]["n_tokens"] == 4 and got[1]["n_unique"] == 2


def test_token_entropy_empty_doc_absent(spark):
    df = _df(spark, [(1, "hello"), (2, "!!!")],
             "doc_id long, text string")
    ids = {r["doc_id"] for r in token_entropy(df).collect()}
    assert ids == {1}


# --------------------------------------------------------------- file stats

def test_file_stats_per_file_rows(spark, tmp_path):
    src = spark.range(0, 90).select(
        F.col("id"), (F.col("id") % 7).alias("v"))
    src.repartition(3).write.mode("overwrite").parquet(
        str(tmp_path / "t"))
    df = spark.read.parquet(str(tmp_path / "t"))
    rows = file_stats(df, ["id"]).collect()
    assert len(rows) == 3
    assert sum(r["n_rows"] for r in rows) == 90
    assert min(r["id_min"] for r in rows) == 0
    assert max(r["id_max"] for r in rows) == 89
    assert all(r["file"].endswith(".parquet") and "/" not in r["file"]
               for r in rows)


def test_file_stats_requires_cols(spark):
    df = spark.range(3)
    with pytest.raises(ValueError):
        file_stats(df, [])


# ------------------------------------------------- categorical encoders

def test_category_index_deterministic_order(spark):
    from yaetl_spark.operators import (
        apply_category_index, fit_category_index)

    df = _df(spark, [("b",), ("a",), ("a",), ("c",), ("a",), ("b",),
                     (None,)], "x string")
    idx = {r["value"]: (r["idx"], r["n"])
           for r in fit_category_index(df, "x").collect()}
    assert idx == {"a": (0, 3), "b": (1, 2), "c": (2, 1)}
    out = {r["x"]: r["x_idx"]
           for r in apply_category_index(
               df, fit_category_index(df, "x"), "x").collect()}
    assert out == {"a": 0, "b": 1, "c": 2, None: -1}


def test_category_index_topk_and_min_count(spark):
    from yaetl_spark.operators import (
        apply_category_index, fit_category_index)

    df = _df(spark, [("a",)] * 3 + [("b",)] * 2 + [("c",)], "x string")
    fit = fit_category_index(df, "x", top_k=2)
    assert {r["value"] for r in fit.collect()} == {"a", "b"}
    # OOV category 'c' maps to the default
    out = {r["x"]: r["x_idx"]
           for r in apply_category_index(df, fit, "x",
                                         default=-7).collect()}
    assert out["c"] == -7
    fit2 = fit_category_index(df, "x", min_count=2)
    assert {r["value"] for r in fit2.collect()} == {"a", "b"}


def test_category_index_ties_break_by_value(spark):
    from yaetl_spark.operators import fit_category_index

    df = _df(spark, [("z",), ("y",)], "x string")
    idx = {r["value"]: r["idx"]
           for r in fit_category_index(df, "x").collect()}
    assert idx == {"y": 0, "z": 1}  # equal counts -> lexicographic


def test_target_encoding_shrinks_to_prior(spark):
    from yaetl_spark.operators import (
        apply_target_encoding, fit_target_encoding)

    rows = [("a", 1.0)] * 8 + [("a", 0.0)] * 2 + [("b", 1.0)]
    df = _df(spark, rows, "cat string, y double")
    enc = fit_target_encoding(df, "cat", "y", smoothing=10.0)
    got = {r["value"]: r for r in enc.collect()}
    prior = round(9.0 / 11.0, 9)
    # a: (8 + 10*prior)/(10+10); b: (1 + 10*prior)/(1+10)
    assert got["a"]["enc"] == pytest.approx(
        round((8 + 10 * prior) / 20, 6), abs=1e-6)
    assert got["b"]["enc"] == pytest.approx(
        round((1 + 10 * prior) / 11, 6), abs=1e-6)
    # singleton category sits nearer the prior than its raw mean 1.0
    assert abs(got["b"]["enc"] - prior) < abs(1.0 - prior) / 2
    # unseen category at apply time falls back to the prior
    eval_ = _df(spark, [("zzz", 0.0)], "cat string, y double")
    out = apply_target_encoding(eval_, enc, "cat").collect()[0]
    assert out["cat_enc"] == pytest.approx(prior, abs=1e-6)


def test_hash_features_stable_and_bounded(spark):
    from yaetl_spark.operators import hash_features

    df = _df(spark, [("a", "x"), ("a", None), ("b", "x")],
             "c1 string, c2 string")
    rows = hash_features(df, ["c1", "c2"], n_features=32).collect()
    for r in rows:
        assert len(r["feature_idx"]) == 2
        for i, v in enumerate(r["feature_idx"]):
            col = ["c1", "c2"][i]
            if r[col] is None:
                assert v == -1
            else:
                assert 0 <= v < 32
    # same (col, value) always hashes identically
    a_hashes = {r["feature_idx"][0] for r in rows if r["c1"] == "a"}
    assert len(a_hashes) == 1
    with pytest.raises(ValueError):
        hash_features(df, ["c1"], n_features=1)


def test_quantile_transform_uniformizes(spark):
    from yaetl_spark.operators import quantile_transform

    vals = [float(i) for i in range(1, 101)]
    df = _df(spark, [(v,) for v in vals], "x double")
    out = {r["x"]: r["x_q"]
           for r in quantile_transform(df, "x", n_quantiles=10,
                                       exact=True).collect()}
    assert out[1.0] == 0.0 and out[100.0] == 1.0
    # monotone non-decreasing in x
    qs = [out[v] for v in vals]
    assert qs == sorted(qs)
    # median lands near 0.5
    assert abs(out[50.0] - 0.5) < 0.02
    # NULL passthrough
    df2 = _df(spark, [(1.0,), (2.0,), (None,)], "x double")
    rows = quantile_transform(df2, "x", n_quantiles=2,
                              exact=True).collect()
    assert any(r["x"] is None and r["x_q"] is None for r in rows)


def test_quantile_transform_constant_column(spark):
    from yaetl_spark.operators import quantile_transform

    df = _df(spark, [(5.0,)] * 4, "x double")
    got = {r["x_q"] for r in
           quantile_transform(df, "x", n_quantiles=4,
                              exact=True).collect()}
    assert got == {0.0}  # x <= fitted min -> 0, never NaN


def test_quantile_transform_heavy_hitter_left_edge(spark):
    """A value so frequent it spans multiple quantile boundaries makes
    consecutive boundaries EQUAL; the documented policy interpolates as
    the bucket's left edge (frac = 0) — never a divide-by-zero NaN —
    and the output stays monotone."""
    from yaetl_spark.operators import quantile_transform

    vals = [1.0] * 80 + [float(v) for v in range(2, 22)]  # 80% ones
    df = _df(spark, [(v,) for v in vals], "x double")
    out = {r["x"]: r["x_q"]
           for r in quantile_transform(df, "x", n_quantiles=10,
                                       exact=True).collect()}
    assert all(q is not None and not math.isnan(q) for q in out.values())
    assert out[1.0] == 0.0  # the heavy hitter IS the fitted min
    ordered = [out[v] for v in sorted(out)]
    assert ordered == sorted(ordered)
    assert out[21.0] == 1.0


def test_l2_normalize_null_element_passes_through(spark):
    """A vector CONTAINING a NULL element passes through unchanged —
    the norm would be NULL and a bare nrm==0 guard would null every
    component (ADVICE r8)."""
    df = _df(spark, [(1, [3.0, None, 4.0]), (2, [3.0, 4.0])],
             "id int, embedding array<double>")
    rows = {r["id"]: r["embedding"]
            for r in l2_normalize(df, round_to=6).collect()}
    assert rows[1] == [3.0, None, 4.0]   # untouched, not all-NULL
    assert rows[2] == [0.6, 0.8]         # clean rows still normalize


def test_category_index_topk_zero_raises(spark):
    """top_k=0 must raise (matching categorical_shift), not silently
    return the FULL vocabulary through a truthiness test (ADVICE r8);
    top_k=None still means uncapped."""
    from yaetl_spark.operators import fit_category_index

    df = _df(spark, [("a",), ("b",), ("a",)], "x string")
    with pytest.raises(ValueError, match="top_k"):
        fit_category_index(df, "x", top_k=0)
    with pytest.raises(ValueError, match="top_k"):
        fit_category_index(df, "x", top_k=-3)
    assert fit_category_index(df, "x", top_k=None).count() == 2
