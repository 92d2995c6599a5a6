"""Real-codec multimodal tests (SURVEY §2.L8): pure-Python PPM + WAV
decode inside the mapInPandas path, asserted against generated fixtures
with closed-form expected features."""

from __future__ import annotations

import numpy as np
import pytest

from oeem_etl_spark.operators import multimodal as mm


def _gradient_ppm(w: int, h: int, seed: int) -> tuple[bytes, np.ndarray]:
    ys, xs = np.mgrid[0:h, 0:w]
    px = np.stack(
        [(xs * 3 + ys * 7 + seed) % 256, (xs * 5 + seed) % 256, (ys * 11 + seed) % 256],
        axis=-1,
    ).astype(np.uint8)
    return mm.encode_ppm(px), px


def test_ppm_roundtrip_exact():
    buf, px = _gradient_ppm(13, 7, 42)
    w, h, got = mm.decode_ppm(buf)
    assert (w, h) == (13, 7)
    assert np.array_equal(got, px)


def test_ppm_header_comments_and_whitespace():
    px = np.full((2, 3, 3), 9, dtype=np.uint8)
    buf = b"P6\n# a comment\n 3  2 # trailing\n255\n" + px.tobytes()
    w, h, got = mm.decode_ppm(buf)
    assert (w, h) == (3, 2)
    assert np.array_equal(got, px)


def test_ppm_rejects_bad_input():
    with pytest.raises(ValueError, match="not a P6"):
        mm.decode_ppm(b"P3\n1 1\n255\n0 0 0")
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_ppm(b"P6\n4 4\n255\n\x00\x01")
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n")


def test_wav_roundtrip_features():
    rate = 8000
    k = np.arange(rate)
    samples = 0.5 * np.where(k % 2 == 0, 1.0, -1.0)  # square wave, |s|=0.5
    buf = mm.encode_wav(samples, rate)
    got_rate, n_ch, got = mm.decode_wav(buf)
    assert (got_rate, n_ch) == (rate, 1)
    assert got.shape == (rate, 1)
    # 16-bit quantization: 0.5 encodes exactly (16384/32768)
    assert np.allclose(np.abs(got), 0.5)


def test_wav_stereo_and_extra_chunk():
    rate = 4000
    frames = np.stack([np.full(100, 0.25), np.full(100, -0.25)], axis=1)
    buf = mm.encode_wav(frames, rate)
    # splice an unknown chunk between fmt and data (odd size → padding)
    fmt_end = buf.index(b"data")
    spliced = buf[:fmt_end] + b"LIST\x03\x00\x00\x00abc\x00" + buf[fmt_end:]
    spliced = spliced[:4] + (len(spliced) - 8).to_bytes(4, "little") + spliced[8:]
    got_rate, n_ch, got = mm.decode_wav(spliced)
    assert (got_rate, n_ch) == (rate, 2)
    assert got.shape == (100, 2)
    assert np.allclose(got[:, 0], 0.25) and np.allclose(got[:, 1], -0.25)


def test_image_features_spark(spark):
    rows = []
    want = {}
    for i in range(6):
        w, h = 4 + i, 3 + (i % 2)
        buf, px = _gradient_ppm(w, h, i)
        rows.append((i, bytearray(buf)))
        want[i] = (w, h, *px.astype(np.float64).mean(axis=(0, 1)).round(6))
    df = spark.createDataFrame(rows, "id long, raw binary")
    assets = mm.to_multimodal(df, "id", "raw", "image/x-portable-pixmap")
    got = {
        r["asset_id"]: (r["width"], r["height"], r["mean_r"], r["mean_g"], r["mean_b"])
        for r in mm.image_features(assets).collect()
    }
    assert got == want


def test_audio_features_spark(spark):
    rate = 8000
    rows, want = [], {}
    for i in range(4):
        n = rate // 2 + i * 100
        amp_q = (i * 4000 + 4000) / 32768.0  # exact in 16-bit
        t = np.arange(n)
        samples = amp_q * np.where(t % 2 == 0, 1.0, -1.0)
        rows.append((i, bytearray(mm.encode_wav(samples, rate))))
        want[i] = (rate, 1, round(n / rate, 6), round(amp_q, 6), round(amp_q, 6))
    df = spark.createDataFrame(rows, "id long, raw binary")
    assets = mm.to_multimodal(df, "id", "raw", "audio/wav")
    got = {
        r["asset_id"]: (
            r["sample_rate"], r["n_channels"], r["duration_s"], r["mean_abs"], r["rms"]
        )
        for r in mm.audio_features(assets).collect()
    }
    assert got == want


def test_resize_image_spark(spark):
    buf, px = _gradient_ppm(8, 6, 7)
    df = spark.createDataFrame([(1, bytearray(buf))], "id long, raw binary")
    assets = mm.to_multimodal(df, "id", "raw", "image/x-portable-pixmap")
    out = mm.resize_image(assets, 4, 3).collect()
    assert len(out) == 1
    w, h, got = mm.decode_ppm(bytes(out[0]["content"]))
    assert (w, h) == (4, 3)
    # nearest-neighbor: output pixel (y, x) = input (2y, 2x)
    assert np.array_equal(got, px[::2, ::2])
    assert out[0]["meta"]["width"] == 4 and out[0]["meta"]["height"] == 3


def test_frame_extract_spark(spark):
    # a "video": 25 concatenated equal-size PPM frames, frame i solid color i
    frames = [
        mm.encode_ppm(np.full((2, 2, 3), i, dtype=np.uint8)) for i in range(25)
    ]
    df = spark.createDataFrame(
        [(1, bytearray(b"".join(frames)))], "id long, raw binary"
    )
    assets = mm.to_multimodal(df, "id", "raw", "video/x-ppm-frames")
    got = {
        r["frame_idx"]: bytes(r["frame"])
        for r in mm.frame_extract(assets, every_n=10).collect()
    }
    assert set(got) == {0, 10, 20}
    for idx, frame in got.items():
        w, h, px = mm.decode_ppm(frame)
        assert (w, h) == (2, 2)
        assert np.all(px == idx)
