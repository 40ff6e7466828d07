from .base import CollectSink, NoOpSink, Sink
from .files import (
    BucketedTableSink,
    ClusteredParquetSink,
    CsvSink,
    JsonSink,
    MergeParquetSink,
    OrcSink,
    ParquetSink,
    compact_parquet,
)
from .jdbc import JdbcSink, build_upsert_sql

__all__ = [
    "Sink",
    "NoOpSink",
    "CollectSink",
    "CsvSink",
    "JsonSink",
    "ParquetSink",
    "OrcSink",
    "MergeParquetSink",
    "ClusteredParquetSink",
    "BucketedTableSink",
    "JdbcSink",
    "build_upsert_sql",
    "compact_parquet",
]
