"""JDBC sink with upsert — the DbLoader analogue.

The reference upserts per record inside a transaction with a shared lock
(``/root/reference/src/Laravel/Loaders/DbLoader.php:91-109``). Row-at-a-time
transactions cannot work at 100 TB (SURVEY.md §7.4.3); the scale-correct
designs offered here:

- ``mode='append'/'overwrite'``: plain ``df.write.jdbc`` (batched inserts,
  one round-trip per ``batchsize`` rows per partition).
- ``mode='upsert'``: per-partition batched upsert via ``mapInPandas``
  (Arrow-batched rows → ``executemany`` of ``INSERT ... ON CONFLICT``) —
  the distributed equivalent of MERGE when no lakehouse table format is
  available. Requires a DBAPI connection factory (no JDBC jar in this
  container), so the SQL generation is unit-tested and the network path is
  exercised only when a factory is injected. ``mapInPandas`` (not
  ``foreachPartition``) keeps the write inside SQL execution, so
  ``df.observe`` metrics attached by ``Pipeline.run`` still fire —
  RDD-level actions bypass the CollectMetrics listener and would deadlock
  ``Observation.get``.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import Sink


def build_upsert_sql(
    table: str, columns: list[str], key_columns: list[str], dialect: str = "postgres"
) -> str:
    """Generate a parameterized single-row upsert statement."""
    collist = ", ".join(columns)
    placeholders = ", ".join(["?"] * len(columns))
    if dialect == "postgres" or dialect == "sqlite":
        keys = ", ".join(key_columns)
        sets = ", ".join(
            f"{c} = excluded.{c}" for c in columns if c not in key_columns
        )
        return (
            f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) "
            f"ON CONFLICT ({keys}) DO UPDATE SET {sets}"
        )
    if dialect == "mysql":
        sets = ", ".join(
            f"{c} = VALUES({c})" for c in columns if c not in key_columns
        )
        return (
            f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) "
            f"ON DUPLICATE KEY UPDATE {sets}"
        )
    raise ValueError(f"unknown dialect {dialect!r}")


class JdbcSink(Sink):
    def __init__(
        self,
        url: str = "",
        table: str = "",
        mode: str = "append",
        key_columns: list[str] | None = None,
        dialect: str = "postgres",
        batchsize: int = 10_000,
        properties: dict[str, str] | None = None,
        connection_factory: Callable[[], object] | None = None,
        **kw,
    ):
        super().__init__(**kw)
        self.url = url
        self.table = table
        self.mode = mode
        self.key_columns = key_columns or []
        self.dialect = dialect
        self.batchsize = batchsize
        self.properties = properties or {}
        self.connection_factory = connection_factory

    def write(self, df: DataFrame) -> None:
        if self.mode == "upsert":
            if not self.key_columns:
                raise ValueError("upsert mode requires key_columns")
            sql = build_upsert_sql(
                self.table, df.columns, self.key_columns, self.dialect
            )
            factory = self.connection_factory
            if factory is None:
                raise NotImplementedError(
                    "upsert needs a connection_factory (no JDBC driver jar in "
                    "this environment); SQL generation is tested separately"
                )
            batchsize = self.batchsize

            def upsert_partition(batches: Iterator) -> Iterator:
                import pandas as pd

                conn = factory()
                cur = conn.cursor()
                n = 0
                for pdf in batches:
                    rows = list(pdf.itertuples(index=False, name=None))
                    for i in range(0, len(rows), batchsize):
                        cur.executemany(sql, rows[i : i + batchsize])
                        conn.commit()
                    n += len(rows)
                conn.close()
                yield pd.DataFrame({"upserted": [n]})

            # one aggregate action over the per-partition counts; stays a
            # SQL-engine action so upstream observe() metrics materialize
            df.mapInPandas(upsert_partition, "upserted bigint").agg(
                F.sum("upserted")
            ).collect()
            return
        writer = df.write.mode(self.mode).format("jdbc").option("url", self.url)
        writer = writer.option("dbtable", self.table).option(
            "batchsize", str(self.batchsize)
        )
        for k, v in self.properties.items():
            writer = writer.option(k, v)
        writer.save()
