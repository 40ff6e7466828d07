from .base import DataFrameSource, Source
from .files import CsvSource, JsonSource, ParquetSource, TextLinesSource
from .memory import MemorySource, RangeSource
from .jdbc import JdbcSource
from .aggregate import SHARD_COL, AggregateSource

__all__ = [
    "Source",
    "DataFrameSource",
    "ParquetSource",
    "CsvSource",
    "JsonSource",
    "TextLinesSource",
    "MemorySource",
    "RangeSource",
    "JdbcSource",
    "AggregateSource",
    "SHARD_COL",
]
