"""seasonal_decompose + changepoints (operators/timeseries.py) — the
round-8 drift-monitoring pair: additive decomposition and depth-1
binary-segmentation mean-shift detection."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from yaetl_spark.operators import changepoints, seasonal_decompose


def _series_df(spark, vals, key="k"):
    return spark.createDataFrame(
        [(key, int(i), float(v)) for i, v in enumerate(vals)],
        "k string, idx long, v double",
    )


def test_seasonal_decompose_matches_numpy_reference(spark):
    """trend = centered MA, seasonal = phase mean of detrended centered
    by the key's mean detrended value, residual closes the identity."""
    period, n = 7, 42
    seas = np.array([5, -3, 2, 0, -1, 4, -7], dtype=float)
    vals = 10 + 0.5 * np.arange(n) + seas[np.arange(n) % period]
    out = {
        r["idx"]: r
        for r in seasonal_decompose(
            _series_df(spark, vals), "v", "idx", ["k"], period
        ).collect()
    }
    half = period // 2
    trend = np.full(n, np.nan)
    for i in range(half, n - half):
        trend[i] = vals[i - half:i + half + 1].mean()
    detr = vals - trend
    phase = np.arange(n) % period
    key_mean = np.nanmean(detr)
    for i in range(n):
        r = out[i]
        assert r["value"] == vals[i]
        if np.isnan(trend[i]):
            assert r["trend"] is None and r["residual"] is None
        else:
            s_ref = np.nanmean(detr[phase == phase[i]]) - key_mean
            assert r["trend"] == round(trend[i], 6)
            assert r["seasonal"] == pytest.approx(s_ref, abs=2e-6)
            assert r["residual"] == pytest.approx(
                vals[i] - r["trend"] - r["seasonal"], abs=2e-6
            )


def test_seasonal_decompose_short_series_and_nulls(spark):
    # shorter than the MA window: every trend NULL, seasonal NULL too
    # (no detrended rows to average), residual NULL
    short = seasonal_decompose(
        _series_df(spark, [1.0, 2.0, 3.0]), "v", "idx", ["k"], 7
    ).collect()
    assert len(short) == 3
    assert all(
        r["trend"] is None and r["seasonal"] is None
        and r["residual"] is None for r in short
    )
    # NULL values drop before decomposition
    df = _series_df(spark, range(20)).withColumn(
        "v", F.when(F.col("idx") == 5, None).otherwise(F.col("v"))
    )
    out = seasonal_decompose(df, "v", "idx", ["k"], 3)
    assert out.count() == 19
    with pytest.raises(ValueError, match="at least one key"):
        seasonal_decompose(df, "v", "idx", [], 3)
    with pytest.raises(ValueError, match="period"):
        seasonal_decompose(df, "v", "idx", ["k"], 1)


def test_seasonal_decompose_partition_invariant(spark):
    vals = np.sin(np.arange(30)) * 3 + np.arange(30) * 0.1
    df = _series_df(spark, vals)
    a = sorted(map(tuple, seasonal_decompose(
        df.repartition(1), "v", "idx", ["k"], 5).collect()))
    b = sorted(map(tuple, seasonal_decompose(
        df.repartition(9), "v", "idx", ["k"], 5).collect()))
    assert a == b


def test_changepoints_finds_planted_mean_shift(spark):
    rng = np.random.default_rng(11)
    vals = np.concatenate([np.zeros(20), np.full(25, 5.0)])
    vals = vals + rng.normal(0, 0.1, len(vals))
    r = changepoints(
        _series_df(spark, vals), "v", "idx", ["k"]
    ).collect()[0]
    assert r["cp_index"] == 19  # last index of the left segment
    assert r["is_change"] is True
    i, n = 20, len(vals)
    ml, mr = vals[:i].mean(), vals[i:].mean()
    ref = np.sqrt(i * (n - i) / n) * abs(ml - mr)
    assert r["score"] == round(float(ref), 6)
    assert r["mean_before"] == round(float(ml), 6)
    assert r["mean_after"] == round(float(mr), 6)
    assert r["n_points"] == n


def test_changepoints_flat_series_and_small_keys(spark):
    # constant series: score 0 everywhere, argmax ties to the smallest
    # admissible split, is_change False
    flat = changepoints(
        _series_df(spark, [3.0] * 10), "v", "idx", ["k"], min_segment=2
    ).collect()[0]
    assert flat["score"] == 0.0 and flat["is_change"] is False
    assert flat["cp_index"] == 1  # smallest admissible split (i=2)
    # a key below 2*min_segment points has no admissible split: absent
    two_keys = _series_df(spark, [1.0, 2.0, 3.0, 4.0]).unionByName(
        _series_df(spark, [1.0, 2.0, 3.0], key="tiny")
    )
    got = {r["k"]: r for r in changepoints(
        two_keys, "v", "idx", ["k"], min_segment=2).collect()}
    assert set(got) == {"k"}


def test_changepoints_guards(spark):
    df = _series_df(spark, range(10))
    with pytest.raises(ValueError, match="at least one key"):
        changepoints(df, "v", "idx", [])
    with pytest.raises(ValueError, match="min_segment"):
        changepoints(df, "v", "idx", ["k"], min_segment=0)
    with pytest.raises(ValueError, match="threshold"):
        changepoints(df, "v", "idx", ["k"], threshold=0)
    with pytest.raises(ValueError, match="max_points"):
        changepoints(df, "v", "idx", ["k"], min_segment=3, max_points=5)
    # in-plan mega-key guard names the key
    with pytest.raises(Exception, match="changepoints: key \\(k\\)"):
        changepoints(df, "v", "idx", ["k"], max_points=8).collect()
    ok = changepoints(df, "v", "idx", ["k"], max_points=10).collect()
    assert ok[0]["n_points"] == 10


def test_changepoints_partition_invariant(spark):
    rng = np.random.default_rng(3)
    vals = np.concatenate([rng.normal(0, 1, 30), rng.normal(2, 1, 30)])
    df = _series_df(spark, vals)
    a = sorted(map(tuple, changepoints(
        df.repartition(1), "v", "idx", ["k"]).collect()))
    b = sorted(map(tuple, changepoints(
        df.repartition(7), "v", "idx", ["k"]).collect()))
    assert a == b


@pytest.mark.parametrize("op", ["seasonal", "changepoint"])
def test_decompose_plans_one_exchange_no_python(spark, op):
    """Both operators: ONE key-hash exchange, windows and the argmax
    share it; no Python escape hatch, no nested-loop join."""
    df = _series_df(spark, range(50))
    out = (
        seasonal_decompose(df, "v", "idx", ["k"], 7)
        if op == "seasonal"
        else changepoints(df, "v", "idx", ["k"])
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_autocorrelation_matches_numpy(spark):
    rng = np.random.default_rng(5)
    n, period = 70, 7
    vals = 3 * np.sin(2 * np.pi * np.arange(n) / period)
    vals = vals + rng.normal(0, 0.5, n)
    from yaetl_spark.operators import autocorrelation

    got = {
        r["lag"]: (r["acf"], r["n_pairs"])
        for r in autocorrelation(
            _series_df(spark, vals), "v", "idx", ["k"], 10
        ).collect()
    }
    assert set(got) == set(range(1, 11))
    xbar = vals.mean()
    denom = ((vals - xbar) ** 2).sum()
    for k in (1, 3, 7, 10):
        num = ((vals[k:] - xbar) * (vals[:-k] - xbar)).sum()
        assert got[k][0] == pytest.approx(num / denom, abs=2e-6)
        assert got[k][1] == n - k
    # seasonal series: the ACF peak over lags >= 2 sits at the period
    assert max((L for L in got if L >= 2), key=lambda L: got[L][0]) == period


def test_autocorrelation_edges(spark):
    from yaetl_spark.operators import autocorrelation

    # constant series: zero variance -> acf NULL, pairs still counted
    flat = autocorrelation(
        _series_df(spark, [2.0] * 6), "v", "idx", ["k"], 2
    ).collect()
    assert {r["lag"]: r["acf"] for r in flat} == {1: None, 2: None}
    # series shorter than max_lag: impossible lags absent (no pairs)
    short = autocorrelation(
        _series_df(spark, [1.0, 2.0, 3.0]), "v", "idx", ["k"], 5
    ).collect()
    assert sorted(r["lag"] for r in short) == [1, 2]
    with pytest.raises(ValueError, match="max_lag"):
        autocorrelation(_series_df(spark, [1.0]), "v", "idx", ["k"], 0)
    with pytest.raises(ValueError, match="at least one key"):
        autocorrelation(_series_df(spark, [1.0]), "v", "idx", [], 2)
    # partition invariance
    vals = np.arange(40) % 5 + 0.25 * np.arange(40)
    df = _series_df(spark, vals)
    a = sorted(map(tuple, autocorrelation(
        df.repartition(1), "v", "idx", ["k"], 6).collect()))
    b = sorted(map(tuple, autocorrelation(
        df.repartition(8), "v", "idx", ["k"], 6).collect()))
    assert a == b


def test_autocorrelation_plan_one_exchange_no_python(spark):
    from yaetl_spark.operators import autocorrelation

    df = _series_df(spark, range(50))
    plan = autocorrelation(df, "v", "idx", ["k"], 5)._jdf \
        .queryExecution().executedPlan().toString()
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in plan
    assert plan.count("Exchange hashpartitioning") == 1
