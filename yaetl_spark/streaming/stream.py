"""Structured Streaming layer (beyond-reference — SURVEY.md §2.11).

The reference is batch-only; the engine adds a streaming grammar mirroring
the batch Pipeline: source → watermark → windowed aggregation / stateful
op → sink. Late data is handled by watermarks; sinks commit per epoch via
``foreachBatch`` (the streaming analogue of the reference's ``flush()``,
``/root/reference/src/YaEtl.php:349-363``).

Window helpers return *batch-compatible* expressions (``F.window`` works
in both modes) so every windowed query can be verified against the DuckDB
oracle in batch mode and run unchanged as a stream.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    time_col: str,
    duration: str,
    *aggs: Column,
    extra_keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window aggregation, batch- and stream-compatible.

    Emits ``window_start``/``window_end`` as epoch seconds (bigint) so the
    result is engine-portable (timestamps hash differently across engines;
    integers don't).
    """
    if watermark and df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    keys = [F.window(F.col(time_col), duration).alias("_w")] + [
        F.col(k) for k in (extra_keys or [])
    ]
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        F.unix_timestamp(F.col("_w.start")).alias("window_start"),
        F.unix_timestamp(F.col("_w.end")).alias("window_end"),
        *[c for c in out.columns if c != "_w"],
    )


def sliding_window_agg(
    df: DataFrame,
    time_col: str,
    duration: str,
    slide: str,
    *aggs: Column,
    extra_keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    if watermark and df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    keys = [F.window(F.col(time_col), duration, slide).alias("_w")] + [
        F.col(k) for k in (extra_keys or [])
    ]
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        F.unix_timestamp(F.col("_w.start")).alias("window_start"),
        F.unix_timestamp(F.col("_w.end")).alias("window_end"),
        *[c for c in out.columns if c != "_w"],
    )


def session_window_agg(
    df: DataFrame,
    time_col: str,
    gap: str,
    *aggs: Column,
    extra_keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Session windows (gap-based); streaming requires a watermark."""
    if watermark and df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    keys = [F.session_window(F.col(time_col), gap).alias("_w")] + [
        F.col(k) for k in (extra_keys or [])
    ]
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        F.unix_timestamp(F.col("_w.start")).alias("window_start"),
        F.unix_timestamp(F.col("_w.end")).alias("window_end"),
        *[c for c in out.columns if c != "_w"],
    )


def dedup_within_watermark(
    df: DataFrame, keys: list[str], time_col: str, watermark: str
) -> DataFrame:
    """Streaming exact dedup bounded by the watermark (state stays finite)."""
    if df.isStreaming:
        return df.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return df.dropDuplicates(keys)


def running_totals(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    time_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Custom stateful operator: per-key running (count, sum) maintained
    across epochs via ``applyInPandasWithState`` — the engine's template
    for operators Spark's built-ins can't express (SURVEY.md §7: custom
    stateful streaming).

    State is one (bigint, double) pair per key — O(distinct keys), not
    O(events); Arrow-batched, partitioned by key hash (each executor owns
    a key range; no cross-partition coordination).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if watermark and time_col and df.isStreaming:
        df = df.withWatermark(time_col, watermark)

    key_fields = [f for f in df.schema.fields if f.name in keys]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in key_fields]
        + ["n_events bigint", "total_value double"]
    )
    state_schema = "cnt bigint, total double"

    def fn(key: tuple, pdfs, state: GroupState):
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf[value_col].astype("float64").sum())
        state.update((cnt, total))
        yield pd.DataFrame(
            [dict(zip(keys, key), n_events=cnt, total_value=total)]
        )

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


class StreamPipeline:
    """Streaming mirror of the batch Pipeline grammar.

    ``from_stream`` accepts a streaming DataFrame (e.g. file source over
    the events table or ``rate`` source); transformations are regular
    Column ops; ``to_memory``/``to_foreach_batch`` start the query.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._df: DataFrame | None = None

    def from_stream(self, df: DataFrame) -> "StreamPipeline":
        if not df.isStreaming:
            raise ValueError("from_stream expects a streaming DataFrame")
        self._df = df
        return self

    def from_files(
        self, path: str, fmt: str = "parquet", schema=None, **options
    ) -> "StreamPipeline":
        reader = self.spark.readStream.format(fmt)
        if schema is not None:
            reader = reader.schema(schema)
        for k, v in options.items():
            reader = reader.option(k, v)
        self._df = reader.load(path)
        return self

    def transform(self, fn: Callable[[DataFrame], DataFrame]) -> "StreamPipeline":
        self._df = fn(self._df)
        return self

    def qualify(self, cond: Column | str) -> "StreamPipeline":
        cond = F.expr(cond) if isinstance(cond, str) else cond
        self._df = self._df.filter(cond)
        return self

    @property
    def df(self) -> DataFrame:
        return self._df

    def to_memory(self, name: str, output_mode: str = "append"):
        """Memory sink (tests): returns the StreamingQuery."""
        return (
            self._df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .start()
        )

    def to_foreach_batch(
        self, fn: Callable[[DataFrame, int], None], output_mode: str = "update",
        checkpoint: str | None = None,
    ):
        """Per-epoch sink commit — the streaming flush() analogue."""
        writer = self._df.writeStream.foreachBatch(fn).outputMode(output_mode)
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        return writer.start()
