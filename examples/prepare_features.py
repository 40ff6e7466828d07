"""End-to-end training-data feature preparation — the late-round-8
quality + feature surface in one runnable flow:

1. quality gate      — Deequ-style declarative checks on orders
                       (completeness / uniqueness / set / bounds) in
                       ONE aggregation pass; the pipeline refuses to
                       proceed if a check fails
2. train/eval split  — deterministic hash split, then LEAK-FREE
                       scaling: z-score params fitted on train only,
                       applied to both splits
3. winsorize + rank  — quantile clipping and CDF-position rank
                       normalization of the order totals (no global
                       sort — boundary array broadcast)
4. encoders          — frequency-indexed vocabulary, smoothed target
                       encoding (fit on train, eval scores fall back
                       to the prior for OOV), and fit-free feature
                       hashing
5. classifier eval   — exact ROC-AUC + calibration bins of a
                       quality-score column against a label
6. embedding prep    — L2-normalize, int8-quantize, and grade the
                       retrieval quality of the compressed vectors
                       (precision@k / MRR / nDCG)

Everything is deterministic (decimal term sums, rounded fitted params)
and pre-flighted with the 100×-scale plan gate.

Run: ``python examples/prepare_features.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F

from yaetl_spark import get_spark
from yaetl_spark.operators import (
    apply_scaler,
    apply_target_encoding,
    binary_classifier_eval,
    between,
    calibration_bins,
    clip_outliers,
    completeness,
    fit_category_index,
    apply_category_index,
    fit_scaler,
    fit_target_encoding,
    hash_features,
    in_set,
    l2_normalize,
    quantile_transform,
    quantize_embeddings,
    retrieval_metrics,
    uniqueness,
    validate,
)
from yaetl_spark.operators.sampling import hash_bucket
from yaetl_spark.plans import assert_scales


def main(spark, sf_dir: str = "/root/testdata/sf0.001"):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1) quality gate: bad data never reaches feature fitting
    report = validate(orders, [
        completeness("o_custkey", 1.0),
        uniqueness("o_orderkey", 1.0),
        in_set("o_orderstatus", ["O", "F", "P"], 1.0),
        between("o_totalprice", 0.0, 1e9, 1.0),
    ])
    assert_scales(report, allow_nested_loop=True)
    failed = [r["check"] for r in report.collect() if not r["passed"]]
    if failed:
        raise RuntimeError(f"quality gate failed: {failed}")

    # 2) leak-free scaling: fit on train, apply to train AND eval
    b = hash_bucket(F.col("o_orderkey"), 100)
    train = orders.filter(b < 80)
    evalf = orders.filter(b >= 80)
    params = fit_scaler(train, ["o_totalprice"], method="zscore")
    train_s = apply_scaler(train, params, ["o_totalprice"])
    eval_s = apply_scaler(evalf, params, ["o_totalprice"])
    assert_scales(eval_s, allow_nested_loop=True)

    # 3) winsorize + rank-normalize (sketch quantiles — the scale path)
    clipped = clip_outliers(train_s, "o_totalprice", 0.01, 0.99)
    ranked = quantile_transform(clipped, "o_totalprice", n_quantiles=50)
    assert_scales(ranked, allow_nested_loop=True)

    # 4) categorical encoders, fitted on train only
    vocab = fit_category_index(train, "o_orderpriority")
    enc = fit_target_encoding(train, "o_orderpriority", "o_totalprice",
                              smoothing=50.0)
    eval_enc = apply_target_encoding(
        apply_category_index(eval_s, vocab, "o_orderpriority"),
        enc, "o_orderpriority",
    )
    eval_enc = hash_features(
        eval_enc, ["o_orderstatus", "o_orderpriority"], n_features=256
    )
    assert_scales(eval_enc, allow_nested_loop=True)

    # 5) grade a quality-classifier-style score on the eval split:
    # score = scaled total squashed to (0,1); label = priority is urgent
    scored = eval_enc.select(
        (F.lit(1.0) / (F.lit(1.0)
                       + F.exp(-F.col("o_totalprice_scaled")))).alias("s"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        .cast("int").alias("y"),
    )
    auc_row = binary_classifier_eval(scored, "s", "y").collect()[0]
    bins = calibration_bins(scored, "s", "y", n_bins=10)
    assert_scales(bins, allow_nested_loop=True)

    # 6) embedding prep: normalize -> int8 quantize -> grade retrieval
    # of the DEQUANTIZED vectors against label-agreement relevance
    unit = l2_normalize(emb, "embedding")
    q = quantize_embeddings(unit, "embedding", bits=8)
    dequant = q.select(
        "vec_id", "label",
        F.transform(
            "codes",
            lambda c: c.cast("double") * F.col("q_scale") / F.lit(127.0),
        ).alias("embedding"),
    )
    sample = dequant.filter(F.col("vec_id") % 50 == 0)
    ir = retrieval_metrics(dequant, sample, k=10)
    assert_scales(ir, allow_nested_loop=True)
    ir_rows = ir.collect()
    mrr = (round(sum(r["rr"] for r in ir_rows) / len(ir_rows), 4)
           if ir_rows else None)

    n_eval = eval_enc.count()
    return {
        "checks_passed": report.count() - len(failed),
        "n_train": train.count(),
        "n_eval": n_eval,
        "auc": auc_row["auc"],
        "n_calibration_bins": bins.count(),
        "mrr_int8": mrr,
    }


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = main(get_spark(app_name="prepare-features"), sf)
    print(out)
