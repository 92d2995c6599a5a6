"""Pure-stdlib WebP-lossless (VP8L) codec — the next member of the
image-codec family beside PPM/PNG/JPEG/BMP/GIF (operators/imagecodec.py).

Implemented from the public WebP Lossless Bitstream Specification:

Decoder:
- RIFF/WEBP container walk, VP8L signature + 14-bit dims header;
- prefix codes in BOTH spec forms: "simple" (1-2 symbols inline) and
  normal (19-symbol code-length code, RLE 16/17/18 — the DEFLATE-style
  machinery, shared canonical construction);
- LZ77 backward references (length/distance prefix + extra bits) and
  the color cache (multiplicative-hash indexed recent pixels);
- inverse transforms: subtract-green, color-indexing (palette,
  incl. sub-byte pixel packing), and the 14-mode spatial predictor
  and cross-channel color transform (entropy-coded transform images);
- meta prefix groups (entropy image partitioning the plane).
  The 120-entry near-distance (2-D offset) shorthand table is the one
  spec table NOT reproduced here (a verbatim constant we cannot
  re-derive or verify offline); distance codes ≤ 120 raise a directed
  NotImplementedError. Encoders (including this module's) can always
  emit the equivalent extended distance (d + 120), which decodes fully.

Encoder (fixture-grade, spec-compliant output any external tool reads):
- literals-only VP8L stream: no transforms, no cache, single prefix
  group, canonical prefix codes emitted via the full code-length code
  (so ANY ARGB image encodes, not just tiny palettes).

Like the other codecs this exists to make the multimodal column plumbing
REAL — bytes decoded inside mapInPandas, features oracle-checked — while
staying inside the no-external-libs environment boundary.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O (LSB-first, per spec)
# ---------------------------------------------------------------------------


class _LsbReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        byte = self.data[self.pos >> 3]
        b = (byte >> (self.pos & 7)) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


class _LsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.cur |= ((value >> i) & 1) << self.nbits
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def done(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur)
        return bytes(self.out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical DEFLATE/VP8L assignment."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _PrefixCode:
    """Decode table: walk bits MSB-of-code-first from the LSB stream."""

    def __init__(self, lengths: list[int] | None, simple_symbols: list[int] | None):
        if simple_symbols is not None:
            self.simple = simple_symbols
            self.tree = None
            return
        self.simple = None
        codes = _canonical_codes(lengths)
        # binary tree as dict keyed by (code_so_far, depth)
        self.tree: dict[tuple[int, int], int] = {}
        for sym, (code, l) in codes.items():
            self.tree[(code, l)] = sym
        self.max_len = max((l for l in lengths if l > 0), default=0)
        if len(codes) == 1:
            # degenerate: single symbol, zero bits
            self.simple = [next(iter(codes))]
            self.tree = None

    def read(self, r: _LsbReader) -> int:
        if self.simple is not None:
            if len(self.simple) == 1:
                return self.simple[0]
            return self.simple[r.bit()]
        code = 0
        for depth in range(1, self.max_len + 1):
            code = (code << 1) | r.bit()
            sym = self.tree.get((code, depth))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(r: _LsbReader, alphabet_size: int) -> _PrefixCode:
    if r.bit():  # simple
        num = r.bit() + 1
        if r.bit():  # first symbol in 8 bits
            s0 = r.bits(8)
        else:
            s0 = r.bit()
        syms = [s0]
        if num == 2:
            syms.append(r.bits(8))
        return _PrefixCode(None, syms)
    # normal: code-length code
    num_codes = r.bits(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CLC_ORDER[i]] = r.bits(3)
    cl = _PrefixCode(cl_lengths, None)
    # max_symbol handling
    if r.bit():
        length_nbits = 2 + 2 * r.bits(3)
        max_symbol = 2 + r.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = cl.read(r)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + r.bits(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + r.bits(3)
        else:  # 18
            i += 11 + r.bits(7)
    return _PrefixCode(lengths, None)


# length/distance prefix decoding (spec: prefix 0..39)


def _lv(r: _LsbReader, prefix: int) -> int:
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + r.bits(extra) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _cache_hash(argb: int, bits: int) -> int:
    return (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - bits)


def _read_entropy_image(r: _LsbReader, w: int, h: int) -> np.ndarray:
    """Transform/entropy sub-images are themselves entropy-coded images
    (no transforms allowed inside)."""
    return _decode_image_data(r, w, h, allow_meta=False)


def _decode_image_data(
    r: _LsbReader, w: int, h: int, allow_meta: bool = True
) -> np.ndarray:
    """Decode a (possibly meta-grouped) entropy-coded ARGB plane of w×h.
    Returns uint32 ARGB array (h, w)."""
    cache_bits = 0
    if r.bit():
        cache_bits = r.bits(4)
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    meta_block_bits = 0
    n_groups = 1
    if allow_meta and r.bit():
        meta_block_bits = r.bits(3) + 2
        mw = (w + (1 << meta_block_bits) - 1) >> meta_block_bits
        mh = (h + (1 << meta_block_bits) - 1) >> meta_block_bits
        meta = _read_entropy_image(r, mw, mh)
        # group index = (red << 8) | green
        n_groups = int(((meta >> 8) & 0xFFFF).max()) + 1

    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(r, 256 + 24 + cache_size)
        red = _read_prefix_code(r, 256)
        blue = _read_prefix_code(r, 256)
        alpha = _read_prefix_code(r, 256)
        dist = _read_prefix_code(r, 40)
        groups.append((green, red, blue, alpha, dist))

    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    while pos < w * h:
        if meta is not None:
            x, y = pos % w, pos // w
            m = int(meta[y >> meta_block_bits, x >> meta_block_bits])
            g_idx = (m >> 8) & 0xFFFF
        else:
            g_idx = 0
        green, red, blue, alpha, dist = groups[g_idx]
        s = green.read(r)
        if s < 256:  # literal
            rr = red.read(r)
            bb = blue.read(r)
            aa = alpha.read(r)
            px = (aa << 24) | (rr << 16) | (s << 8) | bb
            out[pos] = px
            if cache is not None:
                cache[_cache_hash(px, cache_bits)] = px
            pos += 1
        elif s < 256 + 24:  # LZ77 backward reference
            length = _lv(r, s - 256)
            dprefix = dist.read(r)
            dcode = _lv(r, dprefix)
            if dcode <= 120:
                raise NotImplementedError(
                    "VP8L near-distance shorthand table (codes <= 120) is a "
                    "verbatim spec constant not reproduced here; extended "
                    "distances decode fully"
                )
            d = dcode - 120
            for _ in range(length):
                px = int(out[pos - d])
                out[pos] = px
                if cache is not None:
                    cache[_cache_hash(px, cache_bits)] = px
                pos += 1
        else:  # color-cache hit
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out.reshape(h, w)


def _inv_predictor(px: np.ndarray, modes: np.ndarray, block_bits: int) -> np.ndarray:
    """Inverse of the 14-mode spatial predictor transform, scalar loop
    (fixtures are small; a real deployment would vectorize per-row)."""
    h, w = px.shape
    a = px.copy().astype(np.uint32)

    def comp(v, shift):
        return (int(v) >> shift) & 0xFF

    def add(p, pred):
        return (
            (((comp(p, 24) + comp(pred, 24)) & 0xFF) << 24)
            | (((comp(p, 16) + comp(pred, 16)) & 0xFF) << 16)
            | (((comp(p, 8) + comp(pred, 8)) & 0xFF) << 8)
            | ((comp(p, 0) + comp(pred, 0)) & 0xFF)
        )

    def average2(x, y):
        return (
            (((comp(x, 24) + comp(y, 24)) >> 1) << 24)
            | (((comp(x, 16) + comp(y, 16)) >> 1) << 16)
            | (((comp(x, 8) + comp(y, 8)) >> 1) << 8)
            | ((comp(x, 0) + comp(y, 0)) >> 1)
        )

    def clamp_grad(l, t, tl):
        out = 0
        for sh in (24, 16, 8, 0):
            v = comp(l, sh) + comp(t, sh) - comp(tl, sh)
            out |= max(0, min(255, v)) << sh
        return out

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = a[y, x - 1]
            elif x == 0:
                pred = a[y - 1, x]
            else:
                mode = int(modes[y >> block_bits, x >> block_bits] >> 8) & 0xFF
                L, T = a[y, x - 1], a[y - 1, x]
                TL = a[y - 1, x - 1]
                TR = a[y - 1, x + 1] if x + 1 < w else a[y - 1, 0]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = average2(average2(L, TR), T)
                elif mode == 6:
                    pred = average2(L, TL)
                elif mode == 7:
                    pred = average2(L, T)
                elif mode == 8:
                    pred = average2(TL, T)
                elif mode == 9:
                    pred = average2(T, TR)
                elif mode == 10:
                    pred = average2(average2(L, TL), average2(T, TR))
                elif mode == 11:  # select
                    pl = sum(
                        abs(comp(T, sh) - comp(TL, sh)) for sh in (24, 16, 8, 0)
                    )
                    pt = sum(
                        abs(comp(L, sh) - comp(TL, sh)) for sh in (24, 16, 8, 0)
                    )
                    pred = L if pl < pt else T
                elif mode == 12:
                    pred = clamp_grad(L, T, TL)
                elif mode == 13:
                    av = average2(L, T)
                    out2 = 0
                    for sh in (24, 16, 8, 0):
                        v = comp(av, sh) + (comp(av, sh) - comp(TL, sh)) // 2
                        out2 |= max(0, min(255, v)) << sh
                    pred = out2
                else:
                    raise ValueError(f"bad predictor mode {mode}")
            a[y, x] = add(a[y, x], pred)
    return a


def _inv_color_transform(px: np.ndarray, cts: np.ndarray, block_bits: int) -> np.ndarray:
    h, w = px.shape
    a = px.astype(np.uint32).copy()

    def to_s8(v):
        return v - 256 if v >= 128 else v

    def delta(t, c):
        return (to_s8(t) * to_s8(c)) >> 5

    for y in range(h):
        for x in range(w):
            ct = int(cts[y >> block_bits, x >> block_bits])
            g2r = (ct >> 0) & 0xFF
            g2b = (ct >> 8) & 0xFF
            r2b = (ct >> 16) & 0xFF
            p = int(a[y, x])
            al = (p >> 24) & 0xFF
            r = (p >> 16) & 0xFF
            g = (p >> 8) & 0xFF
            b = p & 0xFF
            r = (r + delta(g2r, g)) & 0xFF
            b = (b + delta(g2b, g) + delta(r2b, r)) & 0xFF
            a[y, x] = (al << 24) | (r << 16) | (g << 8) | b
    return a


def decode_webp(content: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a WebP file → (width, height, (h,w,4) RGBA uint8).

    Lossless VP8L decodes here; lossy "VP8 " keyframes route to
    operators/vp8codec.py (keyframe machinery real, empirical probability
    tables are documented stand-ins — see that module's docstring).
    Raises NotImplementedError for VP8X (extended) containers and the
    VP8L near-distance shorthand (see module docstring)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    off = 12
    payload = None
    while off + 8 <= len(content):
        tag = content[off : off + 4]
        (size,) = struct.unpack("<I", content[off + 4 : off + 8])
        if tag == b"VP8L":
            payload = content[off + 8 : off + 8 + size]
            break
        if tag == b"VP8 ":
            from oeem_etl_spark.operators import vp8codec

            w, h, rgb = vp8codec.decode_vp8_keyframe(
                content[off + 8 : off + 8 + size]
            )
            rgba = np.concatenate(
                [rgb, np.full((h, w, 1), 255, np.uint8)], axis=2
            )
            return w, h, rgba
        if tag == b"VP8X":
            raise NotImplementedError(
                "VP8X (extended) WebP not supported; VP8L or VP8 keyframes only"
            )
        off += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("no VP8L chunk")
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    r = _LsbReader(payload[1:])
    w = r.bits(14) + 1
    h = r.bits(14) + 1
    r.bit()  # alpha hint
    if r.bits(3) != 0:
        raise ValueError("unknown VP8L version")

    # transforms (applied in reverse order after pixel decode)
    transforms = []
    xsize = w
    while r.bit():
        ttype = r.bits(2)
        if ttype == 0:  # predictor
            bb = r.bits(3) + 2
            tw = (xsize + (1 << bb) - 1) >> bb
            th = (h + (1 << bb) - 1) >> bb
            transforms.append(("predictor", bb, _read_entropy_image(r, tw, th)))
        elif ttype == 1:  # color transform
            bb = r.bits(3) + 2
            tw = (xsize + (1 << bb) - 1) >> bb
            th = (h + (1 << bb) - 1) >> bb
            transforms.append(("color", bb, _read_entropy_image(r, tw, th)))
        elif ttype == 2:  # subtract green
            transforms.append(("subtract_green",))
        else:  # color indexing
            n_colors = r.bits(8) + 1
            pal = _read_entropy_image(r, n_colors, 1)[0]
            # palette is delta-coded
            for i in range(1, n_colors):
                p, q = int(pal[i]), int(pal[i - 1])
                pal[i] = (
                    (((p >> 24 & 0xFF) + (q >> 24 & 0xFF) & 0xFF) << 24)
                    | (((p >> 16 & 0xFF) + (q >> 16 & 0xFF) & 0xFF) << 16)
                    | (((p >> 8 & 0xFF) + (q >> 8 & 0xFF) & 0xFF) << 8)
                    | ((p & 0xFF) + (q & 0xFF) & 0xFF)
                )
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append(("palette", pal.copy(), width_bits))
            xsize = (xsize + (1 << width_bits) - 1) >> width_bits

    px = _decode_image_data(r, xsize, h)

    for t in reversed(transforms):
        if t[0] == "subtract_green":
            g = (px >> 8) & 0xFF
            r_ = ((px >> 16) + g) & 0xFF
            b_ = (px + g) & 0xFF
            px = (px & 0xFF00FF00) | (r_ << 16) | b_
        elif t[0] == "predictor":
            px = _inv_predictor(px, t[2], t[1])
        elif t[0] == "color":
            px = _inv_color_transform(px, t[2], t[1])
        elif t[0] == "palette":
            _, pal, width_bits = t
            if width_bits:
                per = 1 << width_bits
                bits_px = 8 >> width_bits
                mask = (1 << bits_px) - 1
                idx = np.zeros((h, w), dtype=np.uint32)
                for y in range(h):
                    for x in range(w):
                        packed = int(px[y, x >> width_bits] >> 8) & 0xFF
                        idx[y, x] = (packed >> (bits_px * (x % per))) & mask
            else:
                idx = (px >> 8) & 0xFF
            out = np.zeros((h, w), dtype=np.uint32)
            flat_pal = pal
            for y in range(h):
                for x in range(w):
                    out[y, x] = int(flat_pal[int(idx[y, x])])
            px = out

    rgba = np.zeros((h, w, 4), dtype=np.uint8)
    rgba[:, :, 0] = (px >> 16) & 0xFF
    rgba[:, :, 1] = (px >> 8) & 0xFF
    rgba[:, :, 2] = px & 0xFF
    rgba[:, :, 3] = (px >> 24) & 0xFF
    return w, h, rgba


# ---------------------------------------------------------------------------
# encoder (literals-only, full code-length-code emission)
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Package-merge-free simple Huffman: heap-built tree, then clamp by
    rebuilding with scaled frequencies if a length exceeds max_len
    (fixture alphabets are small; lengths rarely exceed 12)."""
    import heapq
    import itertools

    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    counter = itertools.count()
    heap = [(f, next(counter), {s: 0}) for s, f in freqs.items()]
    heapq.heapify(heap)
    while len(heap) > 1:
        f1, _, d1 = heapq.heappop(heap)
        f2, _, d2 = heapq.heappop(heap)
        merged = {s: l + 1 for s, l in d1.items()}
        merged.update({s: l + 1 for s, l in d2.items()})
        heapq.heappush(heap, (f1 + f2, next(counter), merged))
    lengths = heap[0][2]
    while max(lengths.values()) > max_len:
        freqs = {s: max(1, f >> 1) for s, f in freqs.items()}
        return _huffman_lengths({s: f + 1 for s, f in freqs.items()}, max_len)
    return lengths


def _write_prefix_code(w: _LsbWriter, lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Emit a normal (code-length-coded) prefix code; returns symbol->(code,len)."""
    present = [s for s, l in enumerate(lengths) if l > 0]
    if len(present) <= 2 and all(s < 256 for s in present):
        # simple form
        w.write(1, 1)
        w.write(len(present) - 1, 1)
        s0 = present[0]
        if s0 <= 1:
            w.write(0, 1)
            w.write(s0, 1)
        else:
            w.write(1, 1)
            w.write(s0, 8)
        if len(present) == 2:
            w.write(present[1], 8)
        if len(present) == 1:
            return {present[0]: (0, 0)}
        return {present[0]: (0, 1), present[1]: (1, 1)}
    w.write(0, 1)  # normal
    # code-length code over the 19 CLC symbols; encode lengths verbatim
    # (no 16/17/18 RLE on the emit side — valid, just less compact; a run
    # of zeros still costs one '0' length each, fine for fixtures)
    clc_freq: dict[int, int] = {}
    for l in lengths:
        clc_freq[l] = clc_freq.get(l, 0) + 1
    cl_lengths_map = _huffman_lengths(clc_freq, max_len=7)
    cl_lengths = [0] * 19
    for s, l in cl_lengths_map.items():
        cl_lengths[s] = l
    # num_codes: emit all 19 in _CLC_ORDER
    w.write(19 - 4, 4)
    for s in _CLC_ORDER:
        w.write(cl_lengths[s], 3)
    clc_codes = _canonical_codes(cl_lengths)
    w.write(0, 1)  # no max_symbol trimming
    for l in lengths:
        code, cl = clc_codes[l]
        for i in range(cl - 1, -1, -1):
            w.write((code >> i) & 1, 1)
    return _canonical_codes(lengths)


def encode_webp_lossless(rgba: np.ndarray) -> bytes:
    """Encode (h, w, 3|4) uint8 → lossless WebP (VP8L, literals only)."""
    if rgba.ndim != 3:
        raise ValueError("expected (h, w, c) array")
    h, w0, c = rgba.shape
    if c == 3:
        alpha = np.full((h, w0, 1), 255, dtype=np.uint8)
        rgba = np.concatenate([rgba, alpha], axis=2)
    wtr = _LsbWriter()
    wtr.write(w0 - 1, 14)
    wtr.write(h - 1, 14)
    wtr.write(0, 1)  # alpha hint
    wtr.write(0, 3)  # version
    wtr.write(0, 1)  # no transforms
    wtr.write(0, 1)  # no color cache
    wtr.write(0, 1)  # no meta prefix
    g = rgba[:, :, 1].ravel()
    r_ = rgba[:, :, 0].ravel()
    b = rgba[:, :, 2].ravel()
    a = rgba[:, :, 3].ravel()

    def freqs(vals) -> dict[int, int]:
        u, cnt = np.unique(vals, return_counts=True)
        return {int(s): int(n) for s, n in zip(u, cnt)}

    def lengths_for(vals, size):
        lmap = _huffman_lengths(freqs(vals))
        out = [0] * size
        for s, l in lmap.items():
            out[s] = l
        return out

    green_codes = _write_prefix_code(wtr, lengths_for(g, 256 + 24))
    red_codes = _write_prefix_code(wtr, lengths_for(r_, 256))
    blue_codes = _write_prefix_code(wtr, lengths_for(b, 256))
    alpha_codes = _write_prefix_code(wtr, lengths_for(a, 256))
    _write_prefix_code(wtr, [1, 1] + [0] * 38)  # distance code (unused)

    def put(codes, sym):
        code, l = codes[int(sym)]
        for i in range(l - 1, -1, -1):
            wtr.write((code >> i) & 1, 1)

    for i in range(w0 * h):
        put(green_codes, g[i])
        put(red_codes, r_[i])
        put(blue_codes, b[i])
        put(alpha_codes, a[i])
    payload = b"\x2f" + wtr.done()
    if len(payload) & 1:
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload + b"\x00"
    else:
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
