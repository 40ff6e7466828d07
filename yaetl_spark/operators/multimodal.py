"""Multimodal (image/audio/video) column plumbing (beyond-reference).

Design: media travels as an opaque ``binary`` column plus a typed metadata
struct; all per-item compute is Arrow-batched ``mapInPandas`` so bytes
never round-trip through Python row objects. The Spark-side plumbing —
schemas, batch iteration, partition sizing — is real and tested; the
actual codecs (PIL/ffmpeg/librosa) are NOT installed in this container,
so the decode kernels are deterministic stubs behind
``use_stub_decoder=True`` and raise ``NotImplementedError`` otherwise.

At scale: media rows are huge — repartition by byte budget
(:func:`repartition_by_bytes`) before any decode pass so a task's Arrow
batches fit executor memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, n_frames int, "
    "sample_rate int, duration_sec double, codec string"
)


def with_media_meta(df: DataFrame, binary_col: str = "data") -> DataFrame:
    """Attach a null-initialized metadata struct + content hash/size —
    hash/size are computed JVM-side (no Python)."""
    return df.withColumns(
        {
            "media_size": F.length(F.col(binary_col)).cast("bigint"),
            "media_sha1": F.sha1(F.col(binary_col)),
            "media_sha256": F.sha2(F.col(binary_col), 256),
        }
    )


def repartition_by_bytes(
    df: DataFrame, size_col: str = "media_size", target_bytes: int = 256 << 20
) -> DataFrame:
    """Repartition so each partition holds ~target_bytes of media payload.

    Uses the total size / target ratio for the partition count and plain
    round-robin redistribution to spread large items — prevents one task
    from receiving several 4 GB videos. (Round-robin, not a hash of any
    row attribute: equally-sized items from one input split would hash
    together and re-create the hot task.)
    """
    total = df.agg(F.sum(size_col)).first()[0] or 0
    n = max(1, int(total / target_bytes) + 1)
    return df.repartition(n)


def _stub_decode_image(data: bytes) -> np.ndarray:
    """Deterministic fake decoder: derives a 4x4 RGB array from a sha256 of
    the bytes so tests get stable, content-dependent output. (Python's
    builtin ``hash()`` is salted per process — it would differ across
    executor workers; a real digest is executor-stable. sha256 specifically
    because the DuckDB oracle can replicate it on varchar payloads —
    ``sha256(text)`` — making the stub features hash-checkable.)"""
    import hashlib

    h = np.frombuffer(hashlib.sha256(data).digest(), dtype=np.uint8)
    return np.tile(h[:3], (4, 4, 1))


def decode_images(
    df: DataFrame,
    binary_col: str = "data",
    id_col: str = "id",
    use_stub_decoder: bool = False,
) -> DataFrame:
    """binary → (id, width, height, mean_r/g/b feature) via mapInPandas.

    Real implementation requires PIL (absent here); the stub path keeps
    the Spark plumbing (schema, Arrow batches, partition shape) genuine.
    """
    if not use_stub_decoder:
        raise NotImplementedError(
            "image codecs are not installed in this environment; "
            "pass use_stub_decoder=True for the deterministic fake"
        )
    out_schema = f"{id_col} bigint, width int, height int, mean_r double, mean_g double, mean_b double"

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            # itertuples, not iterrows — ~10× less per-row overhead in the
            # decode loop (the only Python loop on the multimodal hot path)
            rows = []
            for rid, data in zip(batch[id_col], batch[binary_col]):
                arr = _stub_decode_image(bytes(data))
                rows.append(
                    (
                        rid,
                        arr.shape[1],
                        arr.shape[0],
                        float(arr[..., 0].mean()),
                        float(arr[..., 1].mean()),
                        float(arr[..., 2].mean()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "mean_r", "mean_g", "mean_b"],
            )

    return df.select(id_col, binary_col).mapInPandas(mapper, schema=out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    binary_col: str = "data",
    id_col: str = "id",
    use_stub_decoder: bool = False,
) -> DataFrame:
    """binary → (id, data: binary, width, height) resized payloads.

    Real implementation needs PIL; the stub emits a deterministic
    ``width*height*3``-byte payload derived from an md5 keystream of the
    input (content-dependent, size-exact — the partition/Arrow plumbing is
    what's real here).
    """
    if not use_stub_decoder:
        raise NotImplementedError(
            "image codecs are not installed; pass use_stub_decoder=True"
        )
    import hashlib

    out_schema = f"{id_col} bigint, data binary, width int, height int"
    n_bytes = width * height * 3

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rid, raw in zip(batch[id_col], batch[binary_col]):
                seed = hashlib.md5(bytes(raw)).digest()
                reps = n_bytes // len(seed) + 1
                rows.append((rid, (seed * reps)[:n_bytes], width, height))
            yield pd.DataFrame(
                rows, columns=[id_col, "data", "width", "height"])

    return df.select(id_col, binary_col).mapInPandas(mapper, schema=out_schema)


def decode_audio(
    df: DataFrame,
    binary_col: str = "data",
    id_col: str = "id",
    use_stub_decoder: bool = False,
) -> DataFrame:
    """binary → (id, duration_sec, sample_rate, rms) audio features.

    Real implementation needs librosa/ffmpeg; the stub derives duration
    from byte length (16 kHz 16-bit mono model) and an rms from the byte
    histogram — deterministic and content-dependent.
    """
    if not use_stub_decoder:
        raise NotImplementedError(
            "audio codecs are not installed; pass use_stub_decoder=True"
        )
    out_schema = f"{id_col} bigint, duration_sec double, sample_rate int, rms double"

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rid, raw in zip(batch[id_col], batch[binary_col]):
                data = np.frombuffer(bytes(raw), dtype=np.uint8)
                duration = len(data) / (16_000 * 2)
                rms = float(np.sqrt(np.mean(
                    (data.astype(np.float64) - 127.5) ** 2))) if len(data) else 0.0
                rows.append((rid, duration, 16_000, rms))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "duration_sec", "sample_rate", "rms"])

    return df.select(id_col, binary_col).mapInPandas(mapper, schema=out_schema)


def sample_frames(
    df: DataFrame,
    binary_col: str = "data",
    id_col: str = "id",
    every_nth: int = 10,
    use_stub_decoder: bool = False,
) -> DataFrame:
    """video binary → exploded (id, frame_idx, frame_bytes) rows.

    Stub emits ``ceil(len(bytes)/1000)`` fake frames so the explode/
    fan-out plumbing (row multiplication, schema) is exercised.
    """
    if not use_stub_decoder:
        raise NotImplementedError(
            "video codecs are not installed; pass use_stub_decoder=True"
        )
    out_schema = f"{id_col} bigint, frame_idx int, frame bytes".replace(
        "bytes", "binary"
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rid, raw in zip(batch[id_col], batch[binary_col]):
                data = bytes(raw)
                n_frames = max(1, len(data) // 1000)
                for i in range(0, n_frames, every_nth):
                    rows.append((rid, i, data[i : i + 16]))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame"])

    return df.select(id_col, binary_col).mapInPandas(mapper, schema=out_schema)
