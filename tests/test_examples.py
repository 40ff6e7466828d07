"""The examples/ scripts must stay runnable against the test data."""

from __future__ import annotations

import sys


def test_etl_pipeline_example(spark, sf_dir, tmp_path):
    sys.path.insert(0, "examples")
    try:
        import etl_pipeline
    finally:
        sys.path.pop(0)
    rep = etl_pipeline.main(spark, sf_dir, out=str(tmp_path / "etl.csv"))
    assert rep["status"] == "clean" and rep["num_records"] > 0


def test_dedup_corpus_example(spark, sf_dir):
    sys.path.insert(0, "examples")
    try:
        import dedup_corpus
    finally:
        sys.path.pop(0)
    (total, clustered, kept, capped, shard_n, novel_n,
     live_n, leak_n) = dedup_corpus.main(spark, sf_dir)
    assert kept + clustered >= total  # every dropped doc was clustered
    assert kept <= total
    # cap=2 keeps at least the canonical set and never exceeds the corpus
    assert kept <= capped <= total
    # day-2 probe: novel docs are a subset of the shard
    assert 0 <= novel_n <= shard_n and shard_n > 0
    # the live-feed probe's batch path matches the batch probe's pair
    # count (row-for-row identity is pinned in tests/test_streaming.py)
    assert live_n >= shard_n - novel_n > 0
    # semantic decontamination flagged a bounded, non-negative leak set
    assert 0 <= leak_n <= 400


def test_stream_upsert_example(spark, sf_dir, tmp_path):
    sys.path.insert(0, "examples")
    try:
        import stream_upsert
    finally:
        sys.path.pop(0)
    n = stream_upsert.main(spark, sf_dir, out=str(tmp_path / "su"))
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as F
    assert n == batch.filter(F.col("event_type") == "purchase").count()


def test_curate_corpus_example(spark, sf_dir):
    sys.path.insert(0, "examples")
    try:
        import curate_corpus
    finally:
        sys.path.pop(0)
    (raw, quality, uniq, capped, splits, shard_pairs,
     rater_kappa, rater_alpha, n_packs, n_shards_used,
     n_cur_shards) = curate_corpus.main(spark, sf_dir)
    # each stage is monotone non-increasing
    assert raw >= quality >= uniq >= capped > 0
    # split assignment covers every kept doc
    assert sum(splits.values()) == capped
    assert set(splits) <= {"train", "val", "test"}
    # the container audit ran (this corpus has no >0.9 vocab twins)
    assert shard_pairs >= 0
    # three correlated-but-distinct length raters agree well above
    # chance on this corpus — and kappa is a real number, not NULL
    assert rater_kappa is not None and 0 < rater_kappa <= 1
    # the ragged (abstaining) panel is scored by alpha, not refused
    assert rater_alpha is not None and -1 <= rater_alpha <= 1
    # packing produced at least one window and no more than one per doc
    assert 0 < n_packs <= splits.get("train", 0)
    # the export shuffle landed every train doc in a valid shard
    assert 0 < n_shards_used <= 4
    # the curriculum export produced valid score-ordered shards too
    assert 0 < n_cur_shards <= 4


def test_analyze_events_example(spark, sf_dir):
    sys.path.insert(0, "examples")
    try:
        import analyze_events
    finally:
        sys.path.pop(0)
    pages, fits, strongest = analyze_events.main(spark, sf_dir)
    assert len(pages) == 5
    # pagerank scores are a probability mass -> each in (0, 1)
    assert all(0 < r["rank"] < 1 for r in pages)
    assert set(fits) == {"A", "N", "R"}
    assert strongest["corr"] is not None and abs(strongest["corr"]) <= 1.0


def test_behavior_search_example(spark, sf_dir):
    sys.path.insert(0, "examples")
    try:
        import behavior_search
    finally:
        sys.path.pop(0)
    (steps, top_paths, shares, skew, top_docs,
     fused_docs) = behavior_search.main(spark, sf_dir)
    assert [s[0] for s in steps] == ["view", "click", "purchase"]
    users = [s[1] for s in steps]
    assert users[0] >= users[1] >= users[2]  # funnels only narrow
    assert len(top_paths) == 3 and all(n >= 1 for _, n in top_paths)
    assert set(shares)  # one entry per observed event type
    assert skew["max_rows"] >= 1 and 0 < skew["top_key_share"] <= 1
    assert len(top_docs) == 3
    assert top_docs[0][1] >= top_docs[1][1] >= top_docs[2][1]
    # fusion returns a strict top-3 in fused order
    assert len(fused_docs) == 3
    assert fused_docs[0][1] >= fused_docs[1][1] >= fused_docs[2][1]


def test_monitor_ingest_example(spark, sf_dir):
    sys.path.insert(0, "examples")
    try:
        import monitor_ingest
    finally:
        sys.path.pop(0)
    (report, quarantine, num_drift, cat_drift, smoothed, acf_peak,
     worst_resid, shifts, summary_drift, window_drift) = monitor_ingest.main(
        spark, sf_dir)
    assert report["status"] == "clean"
    assert report["num_records"] + report["num_rejected"] > 0
    assert len(quarantine.rows or []) == report["num_rejected"]
    # tiny-SF halves are sampling-noisy, so assert structure not level:
    # PSI/KL finite and non-negative, JS within its ln(2) bound
    assert num_drift["psi"] >= 0.0 and cat_drift["psi"] >= 0.0
    assert num_drift["kl_ref_cur"] is not None
    assert 0.0 <= num_drift["js"] <= 0.6931472
    assert 0.0 <= cat_drift["js"] <= 0.6931472
    assert len(smoothed) == 5
    assert all(r["n_points"] >= 1 for r in smoothed)
    # seasonality block: ACF bounded, residual closes the identity,
    # changepoint scores positive where flagged
    assert len(acf_peak) == 1 and -1.0 <= acf_peak[0]["acf"] <= 1.0
    assert acf_peak[0]["lag"] >= 2
    assert all(r["residual"] is not None for r in worst_resid)
    assert all(r["score"] > 0 and r["is_change"] for r in shifts)
    # persisted-summary drift block: merged percentiles ordered, all
    # three drift scores present and in-range on the same halves
    assert summary_drift["p50"] <= summary_drift["p99"]
    assert summary_drift["n_rows"] > 0
    assert summary_drift["w1"] >= 0.0
    assert 0.0 <= summary_drift["ks"] <= 1.0
    assert summary_drift["psi"] >= 0.0
    # streaming-ready windowed PSI: several windows, counts positive,
    # scores finite and non-negative (PSI >= 0 by Gibbs' inequality...
    # per-term rounding can dip a hair under 0 — allow the epsilon)
    assert len(window_drift) >= 2
    assert all(n > 0 and p >= -1e-8 for _, n, p in window_drift)


def test_prepare_features_example(spark, sf_dir):
    sys.path.insert(0, "examples")
    try:
        import prepare_features
    finally:
        sys.path.pop(0)
    out = prepare_features.main(spark, sf_dir)
    assert out["n_train"] + out["n_eval"] > 0
    assert 0.0 <= out["auc"] <= 1.0
    assert out["n_calibration_bins"] >= 1
    assert out["mrr_int8"] is None or 0.0 <= out["mrr_int8"] <= 1.0
