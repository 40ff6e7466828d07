from .stream import (
    StreamPipeline,
    dedup_within_watermark,
    interval_join,
    running_totals,
    session_window_agg,
    sliding_window_agg,
    stateful_sessionize,
    stream_minhash_probe,
    stream_psi,
    tumbling_window_agg,
)

__all__ = [
    "StreamPipeline",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "dedup_within_watermark",
    "interval_join",
    "running_totals",
    "stateful_sessionize",
    "stream_minhash_probe",
    "stream_psi",
]
