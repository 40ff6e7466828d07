"""Ingestion monitoring — the round-6 data-quality surface in one
runnable flow, the checks a long-running corpus pipeline runs on every
new snapshot before letting it into the training mix:

1. quarantine      — `qualify(reject_to=)` routes documents failing a
   minimum-length gate to a dead-letter sink instead of silently
   dropping them; the run report carries `num_rejected`
2. numeric drift   — `distribution_shift` PSI/KL/JS of document length
   between the corpus halves (stand-in for last-batch vs this-batch)
3. category drift  — `categorical_shift` over the source tags, with
   the deterministic top-k + `__other__` lump
4. engagement EWMA — per-user smoothed event values via the scan-level
   array fold (bit-matched to SQL `list_reduce`)
5. seasonality     — `autocorrelation` detects the weekly period,
   `seasonal_decompose` splits daily volume into trend + seasonal +
   residual, `changepoints` flags the most likely mean-shift day —
   anomalies judged AFTER the weekly rhythm is explained away
6. persisted-summary drift — `equidepth_summary` computes one exact
   mergeable length summary per (snapshot, source) — persist THESE at
   ingest time — and every later comparison is summary-sized:
   `summary_quantiles` for the merged p50/p99, `summary_w1_distance` /
   `summary_ks_distance` / `summary_psi` for W1, KS, and PSI drift
   between snapshots without ever re-reading the corpus

Everything is deterministic and pre-flighted with the 100×-scale plan
gate. Run: ``python examples/monitor_ingest.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

# allow `python examples/<name>.py` straight from a checkout: put the
# repo root (the package's parent) on sys.path before importing it
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F

from yaetl_spark import CollectSink, ParquetSource, Pipeline, get_spark
from yaetl_spark.operators import (autocorrelation, categorical_shift,
                                   changepoints, distribution_shift,
                                   equidepth_summary, ewma,
                                   seasonal_decompose, summary_ks_distance,
                                   summary_psi, summary_quantiles,
                                   summary_w1_distance)
from yaetl_spark.plans import assert_scales
from yaetl_spark.session import ensure_event_time
from yaetl_spark.streaming import stream_psi


def main(spark, sf_dir: str = "/root/testdata/sf0.001"):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = ensure_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))

    # 1) quarantine short documents instead of silently dropping them
    quarantine = CollectSink()
    kept = CollectSink()
    report = (
        Pipeline(spark)
        .from_(ParquetSource(f"{sf_dir}/documents.parquet"))
        .qualify(F.col("n_chars") >= 100, reject_to=quarantine)
        .to(kept)
        .run(scale_gate=True)
    )

    # 2) numeric drift between the corpus halves
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    cur = docs.filter(F.col("doc_id") % 2 == 1)
    num_drift_df = distribution_shift(ref, cur, "n_chars", buckets=8)
    assert_scales(num_drift_df)
    num_drift = num_drift_df.collect()[0]

    # 3) category drift over the source tags
    cat_drift_df = categorical_shift(ref, cur, "source", top_k=2)
    assert_scales(cat_drift_df)
    cat_drift = cat_drift_df.collect()[0]

    # 4) per-user engagement smoothing (guarded against bot mega-users)
    smooth_df = ewma(ev, "value", "ts", ["user_id"], alpha=0.3,
                     order_col="event_id", max_points=1_000_000)
    assert_scales(smooth_df, max_shuffles=2)
    smoothed = smooth_df.orderBy(F.col("ewma").desc()).limit(5).collect()

    # 5) seasonality-aware volume monitoring: ACF finds the period,
    # decomposition explains it away, changepoints flag level shifts
    daily = (
        ev.filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("_day"))
        .agg(F.count(F.lit(1)).cast("double").alias("v"))
        .select(
            "event_type",
            F.datediff("_day", F.lit("2024-01-01").cast("date"))
            .alias("day_idx"),
            "v",
        )
    )
    acf_df = autocorrelation(daily, "v", "day_idx", ["event_type"], 10)
    assert_scales(acf_df, max_shuffles=2)
    acf_peak = (
        acf_df.filter(F.col("lag") >= 2)
        .orderBy(F.col("acf").desc()).limit(1).collect()
    )
    dec = seasonal_decompose(daily, "v", "day_idx", ["event_type"], 7)
    assert_scales(dec, max_shuffles=2)
    worst_resid = (
        dec.filter(F.col("residual").isNotNull())
        .orderBy(F.abs(F.col("residual")).desc()).limit(3).collect()
    )
    cp_df = changepoints(daily, "v", "day_idx", ["event_type"],
                         threshold=1.5, max_points=100_000)
    assert_scales(cp_df, max_shuffles=2)
    shifts = cp_df.filter("is_change").collect()

    # 6) persisted-summary drift: ONE fine pass per snapshot produces
    # the per-source summaries (persist these tables in production);
    # every later question — merged percentiles, W1/KS/PSI vs any
    # other snapshot — is answered from the summaries alone
    summ_ref = equidepth_summary(ref, "n_chars", "source", buckets=8)
    summ_cur = equidepth_summary(cur, "n_chars", "source", buckets=8)
    merged_q = summary_quantiles(
        summ_ref.unionByName(summ_cur), (0.5, 0.99)).first()
    w1 = summary_w1_distance(summ_ref, summ_cur).first()
    ks = summary_ks_distance(summ_ref, summ_cur).first()
    psi = summary_psi(summ_ref, summ_cur, bins=8).first()
    summary_drift = {
        "n_rows": merged_q["n_rows"], "p50": merged_q["p50"],
        "p99": merged_q["p99"], "w1": w1["w1_distance"],
        "ks": ks["ks_stat"], "psi": psi["psi"],
    }

    # 7) live-window drift: the same PSI arithmetic as a STREAMING
    # monitor — stream_psi scores every 7-day event-time window of the
    # value feed against a persisted reference summary; the reference's
    # cuts/masses are digested ONCE at plan time (|summary|-bounded)
    # into literals, so the plan is join-free with one windowed
    # aggregate — swap the batch read for readStream and the identical
    # call runs as a live monitor (parity pinned in test_streaming.py)
    ref_vals = equidepth_summary(
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("value").cast("double").alias("v"),
                F.lit("all").alias("s")),
        "v", "s", buckets=32)
    windows = stream_psi(ev, ref_vals, "value", "ts", "7 days", bins=8)
    assert_scales(windows, max_shuffles=1)  # scan -> one windowed agg
    window_drift = sorted(
        (r["window_start"], r["n_events"], r["psi"])
        for r in windows.collect())

    return (report, quarantine, num_drift, cat_drift, smoothed,
            acf_peak, worst_resid, shifts, summary_drift, window_drift)


if __name__ == "__main__":
    spark = get_spark(app_name="monitor-example", shuffle_partitions=8)
    (report, quarantine, num_drift, cat_drift, smoothed,
     acf_peak, worst_resid, shifts, summary_drift, window_drift) = main(
        spark, *(sys.argv[1:2]))
    print("kept:", report["num_records"],
          "quarantined:", report["num_rejected"])
    print("length drift:", {k: num_drift[k] for k in ("psi", "kl_ref_cur", "js")})
    print("source drift:", {k: cat_drift[k] for k in ("psi", "kl_ref_cur", "js")})
    print("hottest users:",
          [(r["user_id"], r["ewma"]) for r in smoothed])
    print("dominant period:",
          [(r["event_type"], r["lag"], r["acf"]) for r in acf_peak])
    print("largest residuals:",
          [(r["event_type"], r["day_idx"], r["residual"])
           for r in worst_resid])
    print("level shifts:",
          [(r["event_type"], r["cp_index"], r["score"]) for r in shifts])
    print("summary drift (persist-once/compare-many):", summary_drift)
    print("windowed PSI vs reference (streaming-ready):",
          [(ws, n, p) for ws, n, p in window_drift[:4]])
