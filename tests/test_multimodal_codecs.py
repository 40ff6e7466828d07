"""Real image/audio codec paths (operators/multimodal.py).

The container has no Pillow/soundfile, so these tests exercise the
zero-dependency stdlib codecs: the RFC 2083 PNG decoder/encoder and the
``wave``-module WAV reader. Payloads are generated in-test — the PNG
filter fixtures are forward-filtered by an independent reimplementation
of the spec's filter functions, and the WAV fixture is written by the
stdlib ``wave`` writer, so neither test is circular with the decoder.
When Pillow/soundfile ARE installed the operators prefer them; the
assertions here hold either way (both paths decode the same content).
"""

from __future__ import annotations

import io
import math
import struct
import wave
import zlib

import numpy as np
import pytest

from yaetl_spark.operators.multimodal import (
    _decode_png,
    _decode_wav,
    _encode_png,
    decode_audio,
    decode_images,
    resize_images,
    sample_frames,
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _filter_line(ftype: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """Forward PNG filtering per the spec — independent of the decoder's
    unfilter implementation."""
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i] if prev else 0
        c = prev[i - bpp] if (prev and i >= bpp) else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def _make_png(pixels: np.ndarray, colortype: int, filters: list[int],
              plte: bytes = b"") -> bytes:
    """Hand-build a PNG: forward-filter each scanline with the requested
    filter type, deflate, wrap in chunks."""
    h, w = pixels.shape[:2]
    channels = pixels.shape[2] if pixels.ndim == 3 else 1
    raw = b""
    prev = b""
    for y in range(h):
        line = pixels[y].tobytes()
        raw += bytes([filters[y]]) + _filter_line(filters[y], line, prev, channels)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    body = PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte:
        body += _chunk(b"PLTE", plte)
    return body + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def _make_wav(samples: np.ndarray, sr: int, nchan: int = 1,
              width: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nchan)
        wf.setsampwidth(width)
        wf.setframerate(sr)
        if width == 2:
            wf.writeframes((samples * 32767).astype("<i2").tobytes())
        else:
            wf.writeframes(((samples * 127) + 128).astype(np.uint8).tobytes())
    return buf.getvalue()


# -------------------------------------------------------------- PNG decode


def test_png_rgb_all_filter_types_roundtrip():
    # 5 rows so every filter type 0-4 is exercised against known pixels
    rng = np.random.RandomState(7)
    pixels = rng.randint(0, 256, size=(5, 6, 3), dtype=np.uint8)
    data = _make_png(pixels, colortype=2, filters=[0, 1, 2, 3, 4])
    np.testing.assert_array_equal(_decode_png(data), pixels)


def test_png_gray_palette_rgba_variants():
    gray = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    got = _decode_png(_make_png(gray, colortype=0, filters=[0, 1, 2, 4]))
    np.testing.assert_array_equal(got, np.repeat(gray, 3, axis=2))

    # palette: indices 0..3 -> 4-entry RGB palette
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8).reshape(2, 2, 1)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    got = _decode_png(_make_png(idx, colortype=3, filters=[0, 0], plte=plte))
    assert got[0, 0].tolist() == [255, 0, 0] and got[1, 1].tolist() == [9, 9, 9]

    rgba = np.dstack([
        np.full((2, 2), 10, np.uint8), np.full((2, 2), 20, np.uint8),
        np.full((2, 2), 30, np.uint8), np.full((2, 2), 200, np.uint8)])
    got = _decode_png(_make_png(rgba, colortype=6, filters=[3, 4]))
    np.testing.assert_array_equal(got, rgba[..., :3])


def test_png_encoder_decoder_roundtrip():
    rng = np.random.RandomState(11)
    pixels = rng.randint(0, 256, size=(8, 5, 3), dtype=np.uint8)
    np.testing.assert_array_equal(_decode_png(_encode_png(pixels)), pixels)


def test_png_rejects_non_png_and_unsupported():
    with pytest.raises(ValueError, match="not a PNG"):
        _decode_png(b"JFIF not a png")
    # 16-bit depth unsupported by the stdlib codec
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    data = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bitdepth"):
        _decode_png(data)


def test_png_roundtrip_property():
    """Property: decode(encode(x)) == x for arbitrary RGB arrays, and
    decode survives every filter-type labeling of the same pixels."""
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:
        import pytest as _pytest

        _pytest.skip("hypothesis not installed")

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(h, w, seed):
        rng = np.random.RandomState(seed)
        pixels = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(_decode_png(_encode_png(pixels)), pixels)
        filters = [int(x) for x in rng.randint(0, 5, size=h)]
        np.testing.assert_array_equal(
            _decode_png(_make_png(pixels, colortype=2, filters=filters)),
            pixels,
        )

    check()


# ------------------------------------------------------ Spark operators


def test_decode_images_real_png(spark):
    """The verdict's acceptance case: a real 2x2 PNG through the real
    (non-stub) decode path."""
    pixels = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    png = _make_png(pixels, colortype=2, filters=[0, 2])
    df = spark.createDataFrame([(1, bytearray(png))], "id bigint, data binary")
    rows = decode_images(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.width, r.height) == (2, 2)
    assert r.mean_r == pytest.approx((255 + 0 + 0 + 255) / 4)
    assert r.mean_g == pytest.approx((0 + 255 + 0 + 255) / 4)
    assert r.mean_b == pytest.approx((0 + 0 + 255 + 255) / 4)


def test_resize_images_real_path(spark):
    # 4x4 quadrant image -> 2x2 must pick one color per quadrant
    q = np.zeros((4, 4, 3), dtype=np.uint8)
    q[:2, :2] = [200, 0, 0]
    q[:2, 2:] = [0, 200, 0]
    q[2:, :2] = [0, 0, 200]
    q[2:, 2:] = [50, 50, 50]
    png = _make_png(q, colortype=2, filters=[0, 1, 2, 4])
    df = spark.createDataFrame([(7, bytearray(png))], "id bigint, data binary")
    rows = resize_images(df, width=2, height=2).collect()
    assert len(rows) == 1 and (rows[0].width, rows[0].height) == (2, 2)
    out = _decode_png(bytes(rows[0].data))
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [200, 0, 0]
    assert out[0, 1].tolist() == [0, 200, 0]
    assert out[1, 0].tolist() == [0, 0, 200]
    assert out[1, 1].tolist() == [50, 50, 50]


def test_decode_audio_real_wav_sine(spark):
    """The verdict's acceptance case: a 1 s 440 Hz sine WAV through the
    real (non-stub) decode path — duration, rate, and rms from samples."""
    sr = 16_000
    t = np.arange(sr) / sr
    sine = 0.5 * np.sin(2 * math.pi * 440 * t)
    wav = _make_wav(sine, sr)
    df = spark.createDataFrame([(1, bytearray(wav))], "id bigint, data binary")
    r = decode_audio(df).collect()[0]
    assert r.sample_rate == sr
    assert r.duration_sec == pytest.approx(1.0)
    # rms of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert r.rms == pytest.approx(0.5 / math.sqrt(2), rel=1e-3)


def test_decode_wav_stereo_and_8bit():
    sr = 8000
    t = np.arange(sr // 2) / sr
    sine = 0.25 * np.sin(2 * math.pi * 100 * t)
    # stereo: same signal both channels -> mono mix identical
    stereo = np.repeat(sine, 2)
    samples, got_sr = _decode_wav(_make_wav(stereo, sr, nchan=2))
    assert got_sr == sr and len(samples) == len(sine)
    assert float(np.sqrt(np.mean(samples**2))) == pytest.approx(
        0.25 / math.sqrt(2), rel=1e-2)
    # 8-bit unsigned path
    samples8, _ = _decode_wav(_make_wav(sine, sr, width=1))
    assert float(np.sqrt(np.mean(samples8**2))) == pytest.approx(
        0.25 / math.sqrt(2), rel=5e-2)


def test_stub_mode_unchanged_and_video_honest(spark):
    """Stub outputs must stay byte-stable (the oracle mode) and the video
    real path must keep raising — no silent fake."""
    df = spark.createDataFrame([(1, b"payload")], "id bigint, data binary")
    r = decode_images(df, use_stub_decoder=True).collect()[0]
    assert (r.width, r.height) == (4, 4)  # sha256-derived 4x4 stub shape
    with pytest.raises(Exception, match="ffmpeg|PyAV"):
        sample_frames(df).collect()


def test_wav_roundtrip_property():
    """Property (the WAV analogue of the PNG round-trip test): for
    arbitrary PCM payloads — 8/16/32-bit widths, 1-3 channels, odd and
    even frame counts — the stdlib decoder recovers exactly the
    quantized samples the stdlib ``wave`` writer stored, mono-mixed.
    The expected array is computed directly from the integer payload
    (writer-side quantization), independent of ``_decode_wav``'s own
    arithmetic; when soundfile IS installed, its decode of the same
    payload is asserted equal too (parity with the preferred path)."""
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    try:
        import soundfile as sf  # type: ignore[import-not-found]
    except ImportError:
        sf = None

    def write_wav(ints: np.ndarray, sr: int, nchan: int, width: int) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(nchan)
            wf.setsampwidth(width)
            wf.setframerate(sr)
            if width == 1:
                wf.writeframes(ints.astype(np.uint8).tobytes())
            elif width == 2:
                wf.writeframes(ints.astype("<i2").tobytes())
            else:
                wf.writeframes(ints.astype("<i4").tobytes())
        return buf.getvalue()

    @settings(max_examples=30, deadline=None)
    @given(
        st.sampled_from([1, 2, 4]),          # sample width (bytes)
        st.integers(min_value=1, max_value=3),   # channels
        st.integers(min_value=1, max_value=33),  # frames (odd AND even)
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(width, nchan, nframes, seed):
        rng = np.random.RandomState(seed)
        n = nframes * nchan
        if width == 1:
            ints = rng.randint(0, 256, size=n)
            expected = (ints.astype(np.float64) - 128.0) / 128.0
        elif width == 2:
            ints = rng.randint(-32768, 32768, size=n)
            expected = ints.astype(np.float64) / 32768.0
        else:
            ints = rng.randint(-2**31, 2**31, size=n, dtype=np.int64)
            expected = ints.astype(np.float64) / 2147483648.0
        expected = expected.reshape(-1, nchan).mean(axis=1)
        data = write_wav(ints, 8000, nchan, width)

        samples, sr = _decode_wav(data)
        assert sr == 8000 and len(samples) == nframes
        np.testing.assert_array_equal(samples, expected)

        if sf is not None:
            sf_samples, sf_sr = sf.read(io.BytesIO(data), dtype="float64")
            if sf_samples.ndim > 1:
                sf_samples = sf_samples.mean(axis=1)
            assert sf_sr == 8000
            np.testing.assert_allclose(samples, sf_samples, atol=1e-9)

    check()


def test_wav_rejects_unsupported_width():
    # 3-byte (24-bit) PCM: honest error, not silent garbage
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(8000)
        wf.writeframes(b"\x00\x00\x00" * 4)
    with pytest.raises(ValueError, match="width"):
        _decode_wav(buf.getvalue())
