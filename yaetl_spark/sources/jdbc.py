"""JDBC source — the PdoExtractor analogue.

The reference paginates with ``LIMIT batch OFFSET n`` per fetch
(``/root/reference/src/Extractors/DbExtractorAbstract.php:142-148``) and
streams MySQL unbuffered (``PdoExtractorTrait.php:85-94``). On Spark the
same concerns map to ``spark.read.jdbc`` partitioning options:
``partitionColumn/lowerBound/upperBound/numPartitions`` split the table
into parallel range scans, and ``fetchsize`` streams each partition.

No JDBC driver jar ships in this container, so this is exercised by unit
tests only at the plan level; the code path is production-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .base import Source


class JdbcSource(Source):
    def __init__(
        self,
        url: str,
        table: str | None = None,
        query: str | None = None,
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        num_partitions: int | None = None,
        fetchsize: int = 10_000,
        properties: dict[str, str] | None = None,
        **kw,
    ):
        super().__init__(**kw)
        if (table is None) == (query is None):
            raise ValueError("exactly one of table/query is required")
        self.url = url
        self.table = table
        self.query = query
        self.partition_column = partition_column
        self.lower_bound = lower_bound
        self.upper_bound = upper_bound
        self.num_partitions = num_partitions
        self.fetchsize = fetchsize
        self.properties = properties or {}

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format("jdbc").option("url", self.url)
        if self.table:
            reader = reader.option("dbtable", self.table)
        else:
            reader = reader.option("query", self.query)
        reader = reader.option("fetchsize", str(self.fetchsize))
        if self.partition_column:
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError("partition_column requires lower_bound/upper_bound")
            reader = (
                reader.option("partitionColumn", self.partition_column)
                .option("lowerBound", str(self.lower_bound))
                .option("upperBound", str(self.upper_bound))
                .option("numPartitions", str(self.num_partitions or 8))
            )
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        return reader.load()
