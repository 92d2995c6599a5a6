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


# ---------------------------------------------------------------------------
# PNG + baseline JPEG (operators/imagecodec.py)
# ---------------------------------------------------------------------------

from oeem_etl_spark.operators import imagecodec as ic  # noqa: E402


def test_png_roundtrip_exact_all_channel_counts():
    rng = np.random.default_rng(7)
    for shape in [(13, 17, 3), (5, 9), (8, 8, 4), (1, 1, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        w, h, got = ic.decode_png(ic.encode_png(px))
        exp = px if px.ndim == 3 else px[:, :, None]
        assert (w, h) == (exp.shape[1], exp.shape[0])
        assert np.array_equal(got, exp)


def test_png_all_filter_types_reconstruct():
    """Hand-filter each row with types 0-4 against an independent
    reference filterer; the decoder must invert every one."""
    import struct
    import zlib

    rng = np.random.default_rng(3)
    w, h, ch = 6, 5, 3
    ref = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    flat = ref.reshape(h, w * ch).astype(int)
    for y in range(h):
        f = y % 5
        raw.append(f)
        for i in range(w * ch):
            x = flat[y][i]
            left = flat[y][i - ch] if i >= ch else 0
            up = flat[y - 1][i] if y > 0 else 0
            ul = flat[y - 1][i - ch] if (y > 0 and i >= ch) else 0
            if f == 0:
                v = x
            elif f == 1:
                v = x - left
            elif f == 2:
                v = x - up
            elif f == 3:
                v = x - (left + up) // 2
            else:
                v = x - paeth(left, up, ul)
            raw.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        ic._PNG_SIG
        + ic._png_chunk(b"IHDR", ihdr)
        + ic._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + ic._png_chunk(b"IEND", b"")
    )
    got_w, got_h, got = ic.decode_png(png)
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(got, ref)


def test_png_palette_expands():
    import struct
    import zlib

    plte = bytes([250, 0, 0, 0, 250, 0, 0, 0, 250])
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    png = (
        ic._PNG_SIG
        + ic._png_chunk(b"IHDR", ihdr)
        + ic._png_chunk(b"PLTE", plte)
        + ic._png_chunk(b"IDAT", zlib.compress(raw))
        + ic._png_chunk(b"IEND", b"")
    )
    w, h, got = ic.decode_png(png)
    assert got.shape == (2, 2, 3)
    assert tuple(got[0, 0]) == (250, 0, 0)
    assert tuple(got[0, 1]) == (0, 250, 0)
    assert tuple(got[1, 0]) == (0, 0, 250)


def test_png_rejects_bad_input():
    with pytest.raises(ValueError):
        ic.decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        ic.decode_png(ic._PNG_SIG + b"\x00" * 20)


def test_jpeg_solid_color_near_exact():
    px = np.full((16, 16, 3), (200, 30, 90), dtype=np.uint8)
    w, h, got = ic.decode_jpeg(ic.encode_jpeg(px, quality=85))
    assert (w, h) == (16, 16)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 3


def test_jpeg_gradient_tolerance_and_odd_size():
    hh, ww = 10, 13
    yy, xx = np.mgrid[0:hh, 0:ww]
    px = np.stack(
        [(xx * 4) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256], axis=2
    ).astype(np.uint8)
    w, h, got = ic.decode_jpeg(ic.encode_jpeg(px, quality=90))
    assert (w, h) == (ww, hh)
    assert np.abs(got.astype(int) - px.astype(int)).mean() < 4.0


def test_jpeg_grayscale_replicates_channels():
    g = np.tile(np.arange(0, 256, 16, dtype=np.uint8), (8, 1))[:, :16]
    w, h, got = ic.decode_jpeg(ic.encode_jpeg(g, quality=95))
    assert got.shape == (8, 16, 3)
    assert np.array_equal(got[:, :, 0], got[:, :, 1])
    assert np.array_equal(got[:, :, 1], got[:, :, 2])


def test_jpeg_restart_interval_identical_pixels():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    _, _, with_rst = ic.decode_jpeg(ic.encode_jpeg(px, quality=92, restart_interval=3))
    _, _, without = ic.decode_jpeg(ic.encode_jpeg(px, quality=92))
    assert np.array_equal(with_rst, without)


def test_jpeg_rejects_progressive_and_junk():
    with pytest.raises(ValueError):
        ic.decode_jpeg(b"\x00\x01junk")
    # Forge an SOF2 (progressive) header: decoder must refuse, not garble.
    px = np.full((8, 8, 3), 128, dtype=np.uint8)
    buf = bytearray(ic.encode_jpeg(px))
    sof = buf.find(b"\xff\xc0")
    buf[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        ic.decode_jpeg(bytes(buf))


def test_decode_image_magic_sniffing_all_formats():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(9, 12, 3), dtype=np.uint8)
    for payload in [mm.encode_ppm(px), ic.encode_png(px)]:
        w, h, got = mm.decode_image(payload)
        assert (w, h) == (12, 9)
        assert np.array_equal(got, px)
    w, h, got = mm.decode_image(ic.encode_jpeg(px, quality=95))
    assert (w, h) == (12, 9)
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x00\x00\x00\x20ftypmp42")  # mp4


def test_image_features_spark_mixed_formats(spark):
    """One asset per format through the same mapInPandas feature path;
    PNG/PPM means must be exact, JPEG within tolerance."""
    import pandas as pd

    solid = np.full((6, 4, 3), (10, 20, 30), dtype=np.uint8)
    rows = [
        (1, mm.encode_ppm(solid)),
        (2, ic.encode_png(solid)),
        (3, ic.encode_jpeg(solid, quality=90)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["asset_id", "payload"])
    )
    assets = mm.to_multimodal(df, "asset_id", "payload", "image/mixed")
    out = {
        r["asset_id"]: r
        for r in mm.image_features(assets).collect()
    }
    for aid in (1, 2, 3):
        assert (out[aid]["width"], out[aid]["height"]) == (4, 6)
    for aid in (1, 2):
        assert (out[aid]["mean_r"], out[aid]["mean_g"], out[aid]["mean_b"]) == (
            10.0, 20.0, 30.0,
        )
    assert abs(out[3]["mean_r"] - 10.0) <= 2.0
    assert abs(out[3]["mean_b"] - 30.0) <= 2.0


def test_jpeg_420_subsample_roundtrip():
    """4:2:0 chroma subsampling: multi-block MCUs on the encoder, the
    upsampling path on the decoder; restart markers interleave with the
    4-blocks-per-MCU layout."""
    yy, xx = np.mgrid[0:24, 0:32]
    px = np.stack(
        [(40 + 2 * xx + yy) % 256, (90 + xx) % 256, (10 + yy * 2) % 256], axis=2
    ).astype(np.uint8)
    for rst in (0, 2):
        w, h, out = ic.decode_jpeg(
            ic.encode_jpeg(px, quality=90, subsample=True, restart_interval=rst)
        )
        assert (w, h) == (32, 24)
        assert np.abs(out.astype(int) - px.astype(int)).mean() < 8.0


def test_jpeg_420_odd_dims_and_solid():
    px = np.full((11, 13, 3), (180, 60, 120), np.uint8)
    w, h, out = ic.decode_jpeg(ic.encode_jpeg(px, quality=85, subsample=True))
    assert (w, h) == (13, 11)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 2


def test_bmp_roundtrip_and_padding():
    rng = np.random.default_rng(13)
    for shape in [(7, 10, 3), (1, 1, 3), (5, 3, 3)]:  # odd widths hit row padding
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        w, h, out = ic.decode_bmp(ic.encode_bmp(px))
        assert (w, h) == (shape[1], shape[0])
        assert np.array_equal(out, px)
    with pytest.raises(ValueError):
        ic.decode_bmp(b"not a bmp")


def test_bmp_topdown_and_32bit():
    """Hand-build a top-down 32-bit BMP; decoder must not flip rows and
    must drop alpha."""
    import struct

    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    body = b""
    for y in range(2):  # top-down: natural order
        for x in range(2):
            r, g, b = (int(v) for v in px[y, x])
            body += bytes([b, g, r, 255])
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    hdr += struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 32, 0, len(body), 0, 0, 0, 0)
    w, h, out = ic.decode_bmp(hdr + body)
    assert (w, h) == (2, 2)
    assert np.array_equal(out, px)


def test_gif_roundtrip_single_and_animated():
    rng = np.random.default_rng(17)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(9, 13), dtype=np.uint8)
    w, h, frames = ic.decode_gif_frames(ic.encode_gif(idx, pal))
    assert (w, h) == (13, 9) and len(frames) == 1
    assert np.array_equal(frames[0], pal[idx])
    anim = [np.full((6, 8), i % 16, np.uint8) for i in range(7)]
    _, _, frames = ic.decode_gif_frames(ic.encode_gif(anim, pal))
    assert len(frames) == 7
    for i, f in enumerate(frames):
        assert np.array_equal(f, pal[anim[i]])


def test_gif_256_colors_exercises_lzw_width_growth():
    rng = np.random.default_rng(19)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(21, 17), dtype=np.uint8)
    _, _, frames = ic.decode_gif_frames(ic.encode_gif(idx, pal))
    assert np.array_equal(frames[0], pal[idx])


def test_gif_interlaced_deinterlaces():
    """Interlace flag set: rows arrive in 8/8/4/2 pass order; the decoder
    must reassemble natural order. Re-pack an encoded GIF's index stream
    in pass order and flip the flag."""
    pal = np.stack([np.arange(0, 256, 17)] * 3, axis=1).astype(np.uint8)
    idx = np.arange(16, dtype=np.uint8).reshape(16, 1) % 16  # row y = index y
    passes = [r for s, st in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(s, 16, st)]
    scrambled = idx[passes]
    data = bytearray(ic.encode_gif(scrambled, pal))
    desc = data.index(b"\x2c")
    data[desc + 9] |= 0x40  # set interlace flag in the image descriptor
    _, _, frames = ic.decode_gif_frames(bytes(data))
    assert np.array_equal(frames[0], pal[idx])


def test_codecs_reject_truncation_cleanly():
    """Corrupt/truncated payloads must raise (ValueError family), never
    hang or return garbage silently."""
    rng = np.random.default_rng(23)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    payloads = [
        ic.encode_png(px),
        ic.encode_jpeg(px),
        ic.encode_bmp(px),
        ic.encode_gif(rng.integers(0, 16, size=(8, 8), dtype=np.uint8), pal),
    ]
    for data in payloads:
        for cut in (len(data) // 3, len(data) // 2):
            try:
                mm.decode_image(data[:cut])
            except (ValueError, zlib_error, IndexError, struct_error):
                pass  # clean, typed failure
            # a short-circuit "successful" decode of a truncated stream is
            # only acceptable if dims still parse (e.g. BMP body padding)


import struct as _struct  # noqa: E402
import zlib as _zlib  # noqa: E402

zlib_error = _zlib.error
struct_error = _struct.error


def test_frame_extract_gif_spark(spark):
    """GIF path through the Spark frame_extract + image_features chain."""
    import pandas as pd

    pal = np.stack([np.arange(0, 256, 17)] * 3, axis=1).astype(np.uint8)
    frames = [np.full((4, 5), i, np.uint8) for i in range(6)]
    gif = ic.encode_gif(frames, pal)
    df = spark.createDataFrame(pd.DataFrame([(1, gif)], columns=["asset_id", "payload"]))
    assets = mm.to_multimodal(df, "asset_id", "payload", "image/gif")
    out = mm.frame_extract(assets, every_n=3).collect()
    assert [(r["frame_idx"]) for r in out] == [0, 3]
    for r in out:
        w, h, px = mm.decode_image(bytes(r["frame"]))
        assert (w, h) == (5, 4)
        assert px[0, 0, 0] == 17 * r["frame_idx"]


def _wav_with_format(fmt_code: int, payload: bytes, rate: int = 8000) -> bytes:
    fmt = (
        fmt_code.to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + rate.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(payload).to_bytes(4, "little") + payload
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_wav_g711_mulaw_anchors():
    """G.711 µ-law anchor codes (from the standard's expansion segments):
    0xFF = silence = exactly 0, 0x00 = −32124 (max negative),
    0x80 = +32124; decode is odd-symmetric around the complement pair."""
    payload = bytes([0xFF, 0x00, 0x80, 0x7F])
    rate, n_ch, samples = mm.decode_wav(_wav_with_format(7, payload))
    vals = (samples[:, 0] * 32768.0).round().astype(int).tolist()
    assert vals == [0, -32124, 32124, -0], vals
    # all 256 codes decode within int16 range, monotone per sign segment
    rate, _, s = mm.decode_wav(_wav_with_format(7, bytes(range(256))))
    assert np.abs(s).max() <= 32124 / 32768.0


def test_wav_g711_alaw_anchors():
    """A-law anchors: 0x55 → −8, 0xD5 → +8 (quietest codes),
    0x2A → −32256, 0xAA → +32256 (loudest)."""
    payload = bytes([0x55, 0xD5, 0x2A, 0xAA])
    rate, n_ch, samples = mm.decode_wav(_wav_with_format(6, payload))
    vals = (samples[:, 0] * 32768.0).round().astype(int).tolist()
    assert vals == [-8, 8, -32256, 32256], vals


def test_wav_unknown_format_raises():
    with pytest.raises(ValueError, match="format=2"):
        mm.decode_wav(_wav_with_format(2, b"\x00\x01"))


# ---------------------------------------------------------------------------
# perceptual hash
# ---------------------------------------------------------------------------


def _gradient_image(seed: int, h: int = 48, w: int = 48):
    import numpy as np

    y = np.arange(h)[:, None]
    x = np.arange(w)[None, :]
    base = ((seed * 37) % 200 + (y * 255) // h + (x * 128) // w) % 256
    px = np.stack([base, (base * 2) % 256, (base * 3) % 256], axis=2)
    return px.astype(np.uint8)


def test_phash_identical_and_perturbed_and_distinct():
    import numpy as np

    from oeem_etl_spark.operators.multimodal import phash64

    def ham(a, b):
        return bin((a[0] ^ b[0]) | ((a[1] ^ b[1]) << 32)).count("1")

    a = _gradient_image(1)
    assert phash64(a) == phash64(a.copy())
    # a few flipped pixels: visually near-identical -> small distance
    b = a.copy()
    b[5, 5] = 255 - b[5, 5]
    b[20, 33] = 0
    assert ham(phash64(a), phash64(b)) <= 6
    # a structurally different pattern -> far
    c = _gradient_image(9).transpose(1, 0, 2).copy()
    c[::2] = 255 - c[::2]
    assert ham(phash64(a), phash64(c)) > 10


def test_image_phash_pipeline_groups_near_dups(spark):
    """Planted near-dup groups: docs i and i+100 share a pattern (i+100
    carries a tiny perturbation); cross-group images differ. The decode →
    phash → simhash banding pipeline must pair exactly the planted twins."""
    import numpy as np
    import pandas as pd

    from oeem_etl_spark.operators import dedup
    from oeem_etl_spark.operators.multimodal import encode_ppm, image_phash, to_multimodal

    def encode(batches):
        # self-contained: executors cannot import the test module
        def gradient(seed, h=48, w=48):
            y = np.arange(h)[:, None]
            x = np.arange(w)[None, :]
            base = ((seed * 37) % 200 + (y * 255) // h + (x * 128) // w) % 256
            return np.stack(
                [base, (base * 2) % 256, (base * 3) % 256], axis=2
            ).astype(np.uint8)

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                px = gradient(d % 100)
                if d >= 100:  # the near-dup twin: tiny perturbation
                    px = px.copy()
                    px[3, 3, 0] = (int(px[3, 3, 0]) + 16) % 256
                rows.append((d, encode_ppm(px)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    ids = spark.createDataFrame([(i,) for i in [*range(8), *range(100, 108)]], "doc_id long")
    encoded = ids.mapInPandas(encode, "doc_id long, payload binary")
    assets = to_multimodal(encoded, "doc_id", "payload", "image/x-portable-pixmap")
    hashed = image_phash(assets.withColumnRenamed("asset_id", "doc_id"), key="doc_id")
    pairs = dedup.simhash_near_pairs(hashed, "doc_id", max_hamming=6)
    got = {(r["key_a"], r["key_b"]) for r in pairs.collect()}
    assert got == {(i, i + 100) for i in range(8)}


def test_audio_spectral_detects_tone_under_noise(spark):
    """A 440 Hz tone buried under weaker broadband noise must still win
    the FFT argmax; centroid sits near the tone for a dominant peak."""
    import numpy as np
    import pandas as pd

    from oeem_etl_spark.operators.multimodal import (
        audio_spectral_features,
        encode_wav,
        to_multimodal,
    )

    sr, n = 8000, 2000  # bin width 4 Hz; 440 is bin-aligned

    def encode(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                rng = np.random.default_rng(int(d))
                t = np.arange(n) / sr
                x = 0.6 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
                rows.append((int(d), encode_wav(np.clip(x, -1, 1), sr)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    ids = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    encoded = ids.mapInPandas(encode, "doc_id long, payload binary")
    assets = to_multimodal(encoded, "doc_id", "payload", "audio/wav")
    out = audio_spectral_features(assets).collect()
    assert len(out) == 4
    for r in out:
        assert r["dominant_hz"] == 440.0
        # broadband noise alone would centroid near sr/4 = 2000 Hz; the
        # tone pulls it well below
        assert 300 < r["centroid_hz"] < 1900


def test_tiff_roundtrip_and_gray():
    import numpy as np

    from oeem_etl_spark.operators import imagecodec as ic

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (5, 7), (16, 9)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        w2, h2, out = ic.decode_tiff(ic.encode_tiff(px))
        assert (w2, h2) == (w, h) and (out == px).all()


def test_tiff_big_endian_and_multistrip():
    import struct

    import numpy as np

    from oeem_etl_spark.operators import imagecodec as ic

    # hand-build a big-endian ("MM") grayscale TIFF with TWO strips of 2
    # rows each — exercises the endian paths, inline big-endian SHORT
    # values, strip reassembly, and gray->RGB replication
    h, w = 4, 3
    px = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    strip1, strip2 = px[:2].tobytes(), px[2:].tobytes()
    n_tags = 9
    ifd_off = 8
    arrays_off = ifd_off + 2 + n_tags * 12 + 4  # strip offsets/counts arrays
    data1_off = arrays_off + 16
    data2_off = data1_off + len(strip1)
    out = bytearray(struct.pack(">2sHI", b"MM", 42, ifd_off))
    out += struct.pack(">H", n_tags)

    def tag(t, typ, cnt, val):
        out.extend(struct.pack(">HHI", t, typ, cnt))
        # inline SHORT values are LEFT-justified in the 4-byte field
        if typ == 3 and cnt == 1:
            out.extend(struct.pack(">HH", val, 0))
        else:
            out.extend(struct.pack(">I", val))

    tag(256, 4, 1, w)
    tag(257, 4, 1, h)
    tag(258, 3, 1, 8)
    tag(259, 3, 1, 1)
    tag(262, 3, 1, 1)  # BlackIsZero (gray)
    tag(273, 4, 2, arrays_off)  # two strip offsets
    tag(277, 3, 1, 1)
    tag(278, 4, 1, 2)  # rows per strip
    tag(279, 4, 2, arrays_off + 8)
    out += struct.pack(">I", 0)
    out += struct.pack(">II", data1_off, data2_off)
    out += struct.pack(">II", len(strip1), len(strip2))
    out += strip1 + strip2
    w2, h2, rgb = ic.decode_tiff(bytes(out))
    assert (w2, h2) == (w, h)
    assert (rgb[:, :, 0] == px).all() and (rgb[:, :, 1] == px).all()


def test_decode_image_requires_full_tiff_magic():
    # 'II'/'MM' prefixes without the 42 magic are NOT TIFF (e.g. arbitrary
    # binary starting 'MM'): must raise the directed NotImplementedError
    # listing the codec boundary, not decode_tiff's 'bad TIFF magic'.
    for payload in (b"IIXX\x00\x00\x00\x00", b"MMagic-not-tiff!"):
        with pytest.raises(NotImplementedError):
            mm.decode_image(payload)
    # real TIFF magics still dispatch (and fail deeper for truncated data)
    for payload in (b"II*\x00", b"MM\x00*"):
        with pytest.raises(Exception) as ei:
            mm.decode_image(payload + b"\x00" * 4)
        assert not isinstance(ei.value, NotImplementedError)


def test_phash_fixed_cos_table_engine_identical():
    # the fixed-point twin's premise: round(cos*1e4) is identical in
    # numpy and DuckDB (no table entry near a rounding boundary)
    import duckdb

    vals = np.cos(np.pi * (2 * np.arange(32)[None, :] + 1)
                  * np.arange(8)[:, None] / 64) * 10_000
    dist = np.abs(vals - np.floor(vals) - 0.5)
    assert dist.min() > 0.01, "cos table entry too close to a .5 boundary"
    con = duckdb.connect()
    duck = con.sql(
        "SELECT u.range AS u, i.range AS i, "
        "CAST(round(cos(pi()*(2*i.range+1)*u.range/64)*10000) AS BIGINT) c "
        "FROM range(8) u CROSS JOIN range(32) i"
    ).fetchall()
    got = {(u, i): c for u, i, c in duck}
    want = {(u, i): int(np.round(vals[u, i])) for u in range(8) for i in range(32)}
    assert got == want


def test_phash_fixed_close_to_float_phash_on_fixtures():
    # the fixed-point twin is its own exact integer spec, not a bit-exact
    # reimplementation: quantization flips a bit only where a coefficient
    # sits inside the accumulated 1e-4-relative band around the median.
    # On the l45 gradient fixtures that is a handful of bits — assert the
    # hashes stay Hamming-close AND the planted twin is still recovered
    # by the fixed hash within the l45 budget.
    def gradient(seed, h=48, w=48):
        y = np.arange(h)[:, None]
        x = np.arange(w)[None, :]
        g = ((seed * 37) % 200 + (y * 255) // h + (x * 128) // w) % 256
        return np.stack([g, (g * 2) % 256, (g * 3) % 256], axis=2).astype(np.uint8)

    def ham(a, b):
        return bin((a[0] ^ b[0]) | ((a[1] ^ b[1]) << 32)).count("1")

    for seed in range(16):
        px = gradient(seed)
        assert ham(mm.phash64_fixed(px), mm.phash64(px)) <= 8, seed
        twin = px.copy()
        twin[3, 3, 0] = (int(twin[3, 3, 0]) + 16) % 256
        assert ham(mm.phash64_fixed(px), mm.phash64_fixed(twin)) <= 6, seed


def test_thumbnail_box_average_exact(spark):
    # 4x4 -> 2x2: each output channel is the integer-nearest mean of its
    # 2x2 block; non-divisible targets refuse loudly
    import pandas as pd

    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [mm.encode_ppm(px)]})
    )
    assets = mm.to_multimodal(df, "doc_id", "payload", "image/x-portable-pixmap")
    out = mm.thumbnail_box(assets, 2, 2).collect()
    assert (out[0]["width"], out[0]["height"]) == (2, 2)
    _w, _h, got = mm.decode_ppm(bytes(out[0]["frame"]))
    blocks = px.astype(np.int64).reshape(2, 2, 2, 2, 3).sum(axis=(1, 3))
    want = ((blocks + 2) // 4).astype(np.uint8)
    assert np.array_equal(got, want)

    import pytest

    with pytest.raises(Exception, match="integer block factors"):
        mm.thumbnail_box(assets, 3, 3).collect()


def test_try_image_features_classifies(spark):
    """try_image_features (x11's operator): per-row status classes
    instead of task failure — ok / empty (NULL or b'') / unsupported
    (directed NotImplementedError) / corrupt (any other decode error)."""
    solid = np.zeros((3, 4, 3), dtype=np.uint8)
    solid[:, :] = [10, 20, 30]
    png = ic.encode_png(solid)
    rows = [
        (0, bytearray(png)),                    # ok
        (1, bytearray(png[: len(png) // 2])),   # truncated -> corrupt
        (2, bytearray(b"")),                    # zero-byte -> empty
        (3, None),                              # NULL payload -> empty
        (4, bytearray(b"ID3\x04" * 4)),         # mp3 magic -> unsupported
        (5, bytearray(b"\x89PNG\r\n\x1a\nnope")),  # sig-only PNG -> corrupt
    ]
    df = spark.createDataFrame(rows, "id long, raw binary")
    assets = mm.to_multimodal(df, "id", "raw", "application/octet-stream")
    got = {
        r["asset_id"]: (r["status"], r["width"], r["mean_r"])
        for r in mm.try_image_features(assets).collect()
    }
    assert got[0] == ("ok", 4, 10.0)
    assert got[1][0] == "corrupt" and got[1][1] is None
    assert got[2] == ("empty", None, None)
    assert got[3] == ("empty", None, None)
    assert got[4][0] == "unsupported"
    assert got[5][0] == "corrupt"
