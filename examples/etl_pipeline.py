"""Linear ETL with the Pipeline grammar — the reference's
``(new YaEtl)->from($e)->join(...)->qualify(...)->transform(...)->to($l)->exec()``
flow, Spark-first (`/root/reference/docs/index.md` quick-start shape).

Run: ``python examples/etl_pipeline.py [sf_dir]``
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

from yaetl_spark import OnClause, ParquetSource, Pipeline, Rename, get_spark
from yaetl_spark.sinks import CsvSink


def main(spark, sf_dir: str = "/root/testdata/sf0.001",
         out: str = "/tmp/etl_demo.csv") -> dict:
    customers = spark.read.parquet(f"{sf_dir}/customer.parquet")
    report = (
        Pipeline(spark)
        .from_(ParquetSource(f"{sf_dir}/orders.parquet"))
        .left_join(
            customers,
            OnClause({"o_custkey": "c_custkey"},
                     default_record={"c_name": "NO MATCH"}),
        )
        .qualify(F.col("o_totalprice") > 100_000)
        .transform(Rename({"o_orderkey": "orderkey", "c_name": "customer"}))
        .observe("demo", F.count(F.lit(1)).alias("rows_seen"))
        .to(CsvSink(out, single_file=True))
        .run(scale_gate={})  # pre-flight with defaults before the write
    )
    return report


if __name__ == "__main__":
    spark = get_spark(app_name="etl-example", shuffle_partitions=8)
    rep = main(spark, *(sys.argv[1:2]))
    print({k: rep[k] for k in sorted(rep)})
