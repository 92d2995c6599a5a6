"""VP8 lossy-WebP keyframe codec (operators/vp8codec.py): boolean coder,
token layer, transforms, and end-to-end encode→decode fidelity. The
empirical probability tables are documented stand-ins (module docstring);
everything tested here is the structural machinery, which is exact."""

from __future__ import annotations

import numpy as np
import pytest

from oeem_etl_spark.operators import multimodal, vp8codec as v


def _roundtrip(img, q, **kw):
    data = v.encode_webp_lossy(img, q_index=q, **kw)
    w, h, rgb = multimodal.decode_image(data)  # through container dispatch
    assert (w, h) == (img.shape[1], img.shape[0])
    err = np.abs(rgb.astype(int) - img.astype(int))
    return err.mean(), err.max()


# --- entropy layer ----------------------------------------------------------


def test_bool_coder_roundtrip():
    rng = np.random.RandomState(42)
    probs = rng.randint(1, 255, 5000)
    bits = rng.randint(0, 2, 5000)
    enc = v.BoolEncoder()
    for b, p in zip(bits, probs):
        enc.write(int(b), int(p))
    dec = v.BoolDecoder(enc.flush())
    assert [dec.read(int(p)) for p in probs] == list(bits)


def test_bool_coder_carry_propagation():
    # long all-ones run at extreme prob drives 0xFF output bytes, so the
    # encoder's carry walk across emitted bytes is exercised
    enc = v.BoolEncoder()
    for _ in range(2000):
        enc.write(1, 1)
    enc.write(0, 128)
    data = enc.flush()
    dec = v.BoolDecoder(data)
    assert all(dec.read(1) == 1 for _ in range(2000))
    assert dec.read(128) == 0


def test_literals_and_trees_roundtrip():
    rng = np.random.RandomState(7)
    enc = v.BoolEncoder()
    lits = rng.randint(0, 128, 50)
    ymodes = rng.randint(0, 5, 100)
    bmodes = rng.randint(0, 10, 100)
    for x in lits:
        enc.literal(int(x), 7)
    for s in ymodes:
        enc.tree(v.KF_YMODE_TREE, v.TABLES["kf_ymode_probs"], int(s))
    for s in bmodes:
        enc.tree(v.BMODE_TREE, v.TABLES["kf_b_mode_probs"][0][0], int(s))
    dec = v.BoolDecoder(enc.flush())
    assert [dec.literal(7) for _ in lits] == list(lits)
    assert [
        dec.tree(v.KF_YMODE_TREE, v.TABLES["kf_ymode_probs"]) for _ in ymodes
    ] == list(ymodes)
    assert [
        dec.tree(v.BMODE_TREE, v.TABLES["kf_b_mode_probs"][0][0]) for _ in bmodes
    ] == list(bmodes)


def test_token_layer_roundtrip_all_planes_and_contexts():
    rng = np.random.RandomState(3)
    probs = v.TABLES["coeff_probs"]
    be = v.BoolEncoder()
    blocks, metas = [], []
    for _ in range(800):
        q = np.zeros(16, np.int64)
        nz = rng.randint(0, 16)
        pos = rng.choice(16, nz, replace=False)
        q[pos] = rng.randint(-2100, 2100, nz)
        plane = rng.randint(0, 4)
        first = 1 if plane == 0 else 0
        if first:
            q[0] = 0
        ctx0 = rng.randint(0, 3)
        v._encode_coeffs(be, probs, plane, first, ctx0, q)
        blocks.append(q)
        metas.append((plane, first, ctx0))
    bd = v.BoolDecoder(be.flush())
    for q, (p, f, c) in zip(blocks, metas):
        assert np.array_equal(v._decode_coeffs(bd, probs, p, f, c), q)


# --- transforms -------------------------------------------------------------


def test_wht_roundtrip_within_one():
    rng = np.random.RandomState(1)
    for _ in range(300):
        x = rng.randint(-2048, 2048, (4, 4))
        assert np.abs(v.iwht4x4(v.fwht4x4(x)) - x).max() <= 1


def test_dct_roundtrip_within_one():
    rng = np.random.RandomState(2)
    for _ in range(300):
        x = rng.randint(-255, 256, (4, 4))
        assert np.abs(v.idct4x4(v.fdct4x4(x)) - x).max() <= 1


def test_b4_predictors_all_modes_valid_range():
    rng = np.random.RandomState(5)
    a = rng.randint(0, 256, 4)
    l = rng.randint(0, 256, 4)
    ar = rng.randint(0, 256, 4)
    for mode in range(10):
        p = v._pred_b4(mode, a, l, 77, ar)
        assert p.shape == (4, 4)
        assert p.min() >= 0 and p.max() <= 255


# --- end-to-end -------------------------------------------------------------


def test_solid_color_near_exact():
    img = np.full((32, 48, 3), [200, 60, 90], np.uint8)
    mean, mx = _roundtrip(img, 4)
    assert mx <= 3  # color-space rounding only


def test_gradient_fidelity_scales_with_quantizer():
    yy, xx = np.mgrid[0:48, 0:64]
    img = np.stack([xx * 2, yy * 3, 128 + xx // 2], 2).clip(0, 255).astype(np.uint8)
    m_fine, _ = _roundtrip(img, 2)
    m_coarse, _ = _roundtrip(img, 63)
    assert m_fine < 3
    assert m_coarse < 15
    assert m_fine < m_coarse


def test_all_luma_modes_roundtrip():
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack([xx * 4, yy * 4, xx + yy], 2).clip(0, 255).astype(np.uint8)
    for mode in (v.DC_PRED, v.V_PRED, v.H_PRED, v.TM_PRED, v.B_PRED):
        mean, _ = _roundtrip(img, 8, ymode=mode)
        assert mean < 5, (mode, mean)


def test_odd_dimensions_pad_and_crop():
    rng = np.random.RandomState(9)
    img = (rng.randint(0, 64, (37, 21, 1)) + np.arange(21)[None, :, None] * 3
           ).repeat(3, axis=2).clip(0, 255).astype(np.uint8)
    mean, _ = _roundtrip(img, 8)
    assert mean < 12


def test_simple_loop_filter_runs_and_stays_close():
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack([xx * 8, yy * 8, xx * 4], 2).clip(0, 255).astype(np.uint8)
    m_nofilter, _ = _roundtrip(img, 24, filter_level=0)
    m_filter, _ = _roundtrip(img, 24, filter_level=16)
    assert m_filter < m_nofilter + 4  # smoothing, not corruption


def test_luma_is_high_fidelity_on_noise():
    # chroma 4:2:0 subsampling dominates RGB error on noise; the luma
    # plane itself must stay near-exact at a fine quantizer
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    data = v.encode_webp_lossy(img, q_index=2)
    _, _, dec = multimodal.decode_image(data)
    y_src, _, _ = v._rgb_to_yuv(img)
    y_dec, _, _ = v._rgb_to_yuv(dec)
    assert np.abs(y_dec - y_src).mean() < 4


def test_directed_boundaries():
    img = np.full((16, 16, 3), 128, np.uint8)
    data = bytearray(v.encode_webp_lossy(img, 8))
    payload_off = 20
    data[payload_off] |= 1  # flip keyframe bit -> interframe
    with pytest.raises(NotImplementedError, match="interframe"):
        v.decode_vp8_keyframe(bytes(data[payload_off:]))
    data[payload_off] &= ~1  # keyframe again...
    data[payload_off] &= ~(7 << 1)  # ...but version 0 = real-world VP8
    with pytest.raises(NotImplementedError, match="version 0"):
        v.decode_vp8_keyframe(bytes(data[payload_off:]))
    from oeem_etl_spark.operators import webpcodec

    vp8x = b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + b"VP8X" + (8).to_bytes(4, "little") + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="VP8X"):
        webpcodec.decode_webp(vp8x)


def test_normal_loop_filter_improves_blocky_gradients():
    # deblocking must REDUCE reconstruction error on smooth content coded
    # at a coarse quantizer (DC blocks leave visible 4px steps)
    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack([xx * 5, yy * 6, (xx + yy) * 2], 2).clip(0, 255).astype(np.uint8)
    m_off, _ = _roundtrip(img, 16, filter_level=0)
    m_norm, _ = _roundtrip(img, 16, filter_level=40, filter_type="normal",
                           sharpness=3)
    assert m_norm < m_off


def test_normal_filter_levels_and_sharpness_all_decode():
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack([xx * 8, yy * 8, xx * 4], 2).clip(0, 255).astype(np.uint8)
    for lvl, sh in [(1, 0), (14, 0), (15, 4), (39, 7), (63, 0)]:
        mean, _ = _roundtrip(img, 24, filter_level=lvl, filter_type="normal",
                             sharpness=sh)
        assert mean < 12, (lvl, sh, mean)


def test_filter_limits_keyframe_rule():
    interior, mb, sb, hev = v._filter_limits(40, 0)
    assert (interior, mb, sb, hev) == (40, 124, 120, 2)
    interior, mb, sb, hev = v._filter_limits(14, 5)
    assert interior == min(max(14 >> 2, 1), 4) and hev == 0
