"""WEBP lossless (VP8L) codec — spec-written from RFC 9649, numpy-only.

The last image-format env-gate falls: VP8L is DEFLATE-family spec work
(canonical prefix codes whose lengths are themselves prefix-coded, LZ77
backward references over ARGB pixels, a multiplicative-hash color cache)
plus four reversible transforms (predictor, color, subtract-green, color
indexing with pixel bundling). Everything here follows the public RFC:
LSB-first bitstream with prefix codes read bit-at-a-time MSB-of-code
first, the 19-symbol code-length code in its fixed permutation order,
the max-symbol short-circuit, meta-prefix entropy images, and inverse
transforms applied in reverse reading order.

Lossy WEBP (``VP8 `` chunks — the actual VP8 video intra codec) raises
``NotImplementedError``; structural damage returns ``None``.

Two honesty notes, both test-visible: (1) the 120-entry short-distance
neighborhood table is transcribed from the RFC — the in-repo encoder only
emits plain distance codes (dist + 120), so tests pin the first, highest-
traffic rows by hand-built streams; (2) predictor-transform edge
conventions (top-right at the last column reads the next row's first
pixel, matching libwebp's contiguous-row addressing) are exercised by
roundtrip, not third-party streams, since no reference decoder ships in
this container.

Scale note: per-row decode inside Arrow-batched ``mapInPandas`` passes,
like every codec in this tier — no shuffle, no driver work.
"""

from __future__ import annotations

import numpy as np

_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

#: RFC 9649 short-distance (dx, dy) neighborhood, codes 1..120 in order.
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (4, 6), (-4, 6), (6, 4), (-6, 4),
    (7, 1), (-7, 1), (2, 7), (-2, 7), (7, 2), (-7, 2), (3, 7), (-3, 7),
    (7, 3), (-7, 3), (5, 5), (-5, 5), (8, 0), (4, 7), (-4, 7), (7, 4),
    (-7, 4), (8, 1), (8, 2), (6, 5), (-6, 5), (5, 6), (-5, 6), (8, 3),
    (9, 0), (6, 6), (-6, 6), (8, 4), (9, 1), (9, 2), (8, 5), (9, 3),
    (9, 4), (9, 5),
]


class _Bad(Exception):
    pass


class _LSBReader:
    def __init__(self, b: bytes):
        self.b = b
        self.pos = 0  # bit position

    def bits(self, k: int) -> int:
        v = 0
        for i in range(k):
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(self.b):
                raise _Bad
            v |= ((self.b[byte_i] >> bit_i) & 1) << i
            self.pos += 1
        return v

    def code_bit(self) -> int:
        byte_i, bit_i = divmod(self.pos, 8)
        if byte_i >= len(self.b):
            raise _Bad
        self.pos += 1
        return (self.b[byte_i] >> bit_i) & 1


class _LSBWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put_bits(self, v: int, k: int):  # integer, LSB-first
        for i in range(k):
            self.acc |= ((v >> i) & 1) << self.n
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def put_code(self, code: int, length: int):  # prefix code, MSB-first
        for i in range(length - 1, -1, -1):
            self.put_bits((code >> i) & 1, 1)

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _build_canonical(lengths):
    """Canonical prefix table {(len, code): sym}; {'single': sym} for a
    one-symbol alphabet; None on Kraft violation."""
    live = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
    if not live:
        return None
    if len(live) == 1:
        return {"single": live[0][1]}
    if max(ln for ln, _ in live) > 15:
        return None
    kraft = sum(1 << (15 - ln) for ln, _ in live)
    if kraft != 1 << 15:
        return None
    live.sort()
    table = {}
    code, prev_len = 0, live[0][0]
    for ln, sym in live:
        code <<= ln - prev_len
        table[(ln, code)] = sym
        code += 1
        prev_len = ln
    return table


def _read_sym(r: _LSBReader, table) -> int:
    if "single" in table:
        return table["single"]
    code = ln = 0
    while ln < 16:
        code = (code << 1) | r.code_bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise _Bad


def _read_prefix_code(r: _LSBReader, alphabet: int):
    if r.bits(1):  # simple
        two = r.bits(1)
        first_wide = r.bits(1)
        s0 = r.bits(8 if first_wide else 1)
        if not two:
            return {"single": s0}
        s1 = r.bits(8)
        if max(s0, s1) >= alphabet:
            raise _Bad
        return {(1, 0): s0, (1, 1): s1}
    num_codes = 4 + r.bits(4)
    cl = [0] * 19
    for i in range(num_codes):
        cl[_CL_ORDER[i]] = r.bits(3)
    cl_table = _build_canonical(cl)
    if cl_table is None:
        raise _Bad
    if r.bits(1):
        length_nbits = 2 + 2 * r.bits(3)
        max_symbol = 2 + r.bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths = []
    prev = 8
    while len(lengths) < alphabet:
        if max_symbol <= 0:
            lengths += [0] * (alphabet - len(lengths))
            break
        max_symbol -= 1
        sym = _read_sym(r, cl_table)
        if sym < 16:
            lengths.append(sym)
            if sym:
                prev = sym
        elif sym == 16:
            lengths += [prev] * (3 + r.bits(2))
        elif sym == 17:
            lengths += [0] * (3 + r.bits(3))
        else:
            lengths += [0] * (11 + r.bits(7))
    if len(lengths) > alphabet:
        raise _Bad
    table = _build_canonical(lengths)
    if table is None:
        raise _Bad
    return table


def _prefix_value(r: _LSBReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + r.bits(extra) + 1


def _value_to_prefix(v: int):
    """Inverse of _prefix_value: value >= 1 → (code, extra_bits, extra_val)."""
    x = v - 1
    if x < 4:
        return x, 0, 0
    extra = x.bit_length() - 2
    base = x >> extra  # 2 or 3
    code = 2 * extra + base  # inverse of: extra = (code-2)>>1, base = 2+(code&1)
    offset = base << extra
    return code, extra, x - offset


def _decode_image(r: _LSBReader, w: int, h: int, is_main: bool):
    """Decode one spatially-coded VP8L image → (argb uint32 array of h*w,
    transforms list). Sub-images (entropy/transform/palette) recurse with
    is_main=False (no transforms, no meta prefix codes)."""
    transforms = []
    xsize = w
    if is_main:
        while r.bits(1):
            ttype = r.bits(2)
            if any(t[0] == ttype for t in transforms):
                raise _Bad  # each transform at most once
            if ttype == 2:  # subtract green
                transforms.append((2, None))
            elif ttype in (0, 1):  # predictor / color
                size_bits = 2 + r.bits(3)
                bw = -(-xsize // (1 << size_bits))
                bh = -(-h // (1 << size_bits))
                sub, _ = _decode_image(r, bw, bh, False)
                transforms.append((ttype, (size_bits, sub, bw)))
            elif ttype == 3:  # color indexing
                pal_size = 1 + r.bits(8)
                pal, _ = _decode_image(r, pal_size, 1, False)
                pal = pal.astype(np.uint32)
                # palette entries are delta-coded per channel
                out = np.zeros(pal_size, dtype=np.uint32)
                prev = np.uint32(0)
                for i in range(pal_size):
                    a = ((prev >> 24) + (pal[i] >> 24)) & 0xFF
                    rr = (((prev >> 16) & 0xFF) + ((pal[i] >> 16) & 0xFF)) & 0xFF
                    g = (((prev >> 8) & 0xFF) + ((pal[i] >> 8) & 0xFF)) & 0xFF
                    bb = ((prev & 0xFF) + (pal[i] & 0xFF)) & 0xFF
                    prev = np.uint32((a << 24) | (rr << 16) | (g << 8) | bb)
                    out[i] = prev
                if pal_size <= 2:
                    pack = 3
                elif pal_size <= 4:
                    pack = 2
                elif pal_size <= 16:
                    pack = 1
                else:
                    pack = 0
                transforms.append((3, (out, pack, xsize)))
                if pack:
                    xsize = -(-xsize // (1 << pack))
            else:
                raise _Bad

    cache_bits = 0
    if r.bits(1):
        cache_bits = r.bits(4)
        if not 1 <= cache_bits <= 11:
            raise _Bad
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = 0
    ngroups = 1
    if is_main and r.bits(1):
        meta_bits = 2 + r.bits(3)
        mw = -(-xsize // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        msub, _ = _decode_image(r, mw, mh, False)
        # meta index rides the red+green channels
        meta = (((msub >> 16) & 0xFF) << 8 | ((msub >> 8) & 0xFF)).astype(np.int64)
        ngroups = int(meta.max()) + 1
        meta_w = mw
    groups = []
    for _g in range(ngroups):
        green = _read_prefix_code(r, 256 + 24 + cache_size)
        red = _read_prefix_code(r, 256)
        blue = _read_prefix_code(r, 256)
        alpha = _read_prefix_code(r, 256)
        dist = _read_prefix_code(r, 40)
        groups.append((green, red, blue, alpha, dist))

    npix = xsize * h
    out = np.zeros(npix, dtype=np.uint32)
    cache = [0] * cache_size
    pos = 0
    while pos < npix:
        if meta is not None:
            x, y = pos % xsize, pos // xsize
            g_idx = int(meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])
            if g_idx >= len(groups):
                raise _Bad
            green_t, red_t, blue_t, alpha_t, dist_t = groups[g_idx]
        else:
            green_t, red_t, blue_t, alpha_t, dist_t = groups[0]
        s = _read_sym(r, green_t)
        if s < 256:
            g = s
            rr = _read_sym(r, red_t)
            bb = _read_sym(r, blue_t)
            aa = _read_sym(r, alpha_t)
            px = (aa << 24) | (rr << 16) | (g << 8) | bb
            out[pos] = px
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 280:
            length = _prefix_value(r, s - 256)
            dcode = _read_sym(r, dist_t)
            dval = _prefix_value(r, dcode)
            if dval > 120:
                d = dval - 120
            else:
                dx, dy = _DIST_MAP[dval - 1]
                d = dy * xsize + dx
                if d < 1:
                    d = 1
            if d > pos or pos + length > npix:
                raise _Bad
            for _i in range(length):
                px = int(out[pos - d])
                out[pos] = px
                if cache_size:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
                pos += 1
        else:
            if not cache_size or s - 280 >= cache_size:
                raise _Bad
            out[pos] = cache[s - 280]
            pos += 1
    return out, transforms


def _avg2(a, b):
    return ((a >> 24) + (b >> 24) >> 1) << 24 | \
           ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16 | \
           ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8 | \
           (((a & 0xFF) + (b & 0xFF)) >> 1)


def _ch(p):
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _predict(mode: int, L: int, T: int, TR: int, TL: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select
        la, lr, lg, lb = _ch(L)
        ta, tr_, tg, tb = _ch(T)
        tla, tlr, tlg, tlb = _ch(TL)
        pa, pr, pg, pb = la + ta - tla, lr + tr_ - tlr, lg + tg - tlg, lb + tb - tlb
        pL = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
        pT = abs(pa - ta) + abs(pr - tr_) + abs(pg - tg) + abs(pb - tb)
        return L if pL < pT else T
    if mode == 12:  # ClampAddSubtractFull
        out = 0
        for sh in (24, 16, 8, 0):
            v = ((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) - ((TL >> sh) & 0xFF)
            out |= max(0, min(255, v)) << sh
        return out
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(L, T)
        out = 0
        for sh in (24, 16, 8, 0):
            a = (ave >> sh) & 0xFF
            b = (TL >> sh) & 0xFF
            v = a + (a - b) // 2 if a >= b else a - (b - a) // 2  # trunc toward zero
            out |= max(0, min(255, v)) << sh
        return out
    raise _Bad


def _apply_inverse_transforms(argb: np.ndarray, w: int, h: int, transforms):
    for ttype, data in reversed(transforms):
        if ttype == 3:  # color indexing
            pal, pack, full_w = data
            if pack:
                per = 1 << pack
                bits = 8 >> pack
                bw = -(-full_w // per)
                idx = ((argb.reshape(h, bw) >> 8) & 0xFF).astype(np.int64)
                cols = []
                for j in range(per):
                    cols.append((idx >> (j * bits)) & ((1 << bits) - 1))
                wide = np.stack(cols, axis=2).reshape(h, bw * per)[:, :full_w]
            else:
                wide = ((argb.reshape(h, w) >> 8) & 0xFF).astype(np.int64)
            if int(wide.max()) >= pal.shape[0]:
                raise _Bad
            argb = pal[wide].reshape(-1)
            w = full_w
        elif ttype == 2:  # subtract green
            g = (argb >> 8) & 0xFF
            rr = (((argb >> 16) & 0xFF) + g) & 0xFF
            bb = ((argb & 0xFF) + g) & 0xFF
            argb = (argb & 0xFF00FF00) | (rr << 16) | bb
        elif ttype == 1:  # color transform
            size_bits, sub, bw = data
            img = argb.reshape(h, w).astype(np.int64)
            def s8(v):  # two's-complement int8 view, pure Python
                return v - 256 if v >= 128 else v

            for y in range(h):
                for x in range(w):
                    cte = int(sub[(y >> size_bits) * bw + (x >> size_bits)])
                    g2r = s8(cte & 0xFF)
                    g2b = s8((cte >> 8) & 0xFF)
                    r2b = s8((cte >> 16) & 0xFF)
                    px = int(img[y, x])
                    g = (px >> 8) & 0xFF
                    rr = (px >> 16) & 0xFF
                    bb = px & 0xFF
                    rr = (rr + ((g2r * s8(g)) >> 5)) & 0xFF
                    bb = (bb + ((g2b * s8(g)) >> 5)) & 0xFF
                    bb = (bb + ((r2b * s8(rr)) >> 5)) & 0xFF
                    img[y, x] = (px & 0xFF00FF00) | (rr << 16) | bb
            argb = img.reshape(-1).astype(np.uint32)
        elif ttype == 0:  # predictor
            size_bits, sub, bw = data
            img = argb.reshape(h, w).astype(np.int64)
            for y in range(h):
                for x in range(w):
                    if x == 0 and y == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = int(img[0, x - 1])  # L
                    elif x == 0:
                        pred = int(img[y - 1, 0])  # T
                    else:
                        mode = (int(sub[(y >> size_bits) * bw + (x >> size_bits)]) >> 8) & 0xFF
                        if mode > 13:
                            raise _Bad
                        L = int(img[y, x - 1])
                        T = int(img[y - 1, x])
                        TL = int(img[y - 1, x - 1])
                        # last column: TR addresses the next row start
                        # (libwebp's contiguous-row convention)
                        TR = int(img[y, 0]) if x == w - 1 else int(img[y - 1, x + 1])
                        pred = _predict(mode, L, T, TR, TL)
                    px = int(img[y, x])
                    out = 0
                    for sh in (24, 16, 8, 0):
                        out |= (((px >> sh) + (pred >> sh)) & 0xFF) << sh
                    img[y, x] = out
            argb = img.reshape(-1).astype(np.uint32)
    return argb


def decode_webp(b: bytes):
    """WEBP decode: plain ``VP8L`` (and ``VP8X``-wrapped VP8L) lossless
    streams → (h, w, 4) RGBA uint8. Lossy ``VP8 `` raises
    NotImplementedError (a real video-intra codec); damage → None."""
    b = bytes(b)
    if len(b) < 20 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        ln = int.from_bytes(b[i + 4 : i + 8], "little")
        payload = b[i + 8 : i + 8 + ln]
        if len(payload) < ln:
            return None
        if cid == b"VP8L":
            return _decode_vp8l(payload)
        if cid == b"VP8 ":
            raise NotImplementedError(
                "lossy WEBP (VP8 intra-frame codec) not available in this environment"
            )
        i += 8 + ln + (ln % 2)
    return None


def _decode_vp8l(p: bytes):
    if not p or p[0] != 0x2F:
        return None
    r = _LSBReader(p[1:])
    try:
        w = r.bits(14) + 1
        h = r.bits(14) + 1
        r.bits(1)  # alpha hint
        if r.bits(3) != 0:
            return None  # version must be 0
        argb, transforms = _decode_image(r, w, h, True)
        argb = _apply_inverse_transforms(argb, w, h, transforms)
    except _Bad:
        return None
    a = (argb >> 24) & 0xFF
    rr = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    bb = argb & 0xFF
    return np.stack([rr, g, bb, a], axis=1).astype(np.uint8).reshape(h, w, 4)


# --- encoder ---------------------------------------------------------------


def _huffman_lengths(counts, max_len: int):
    """Code lengths for a complete canonical prefix code. Huffman via
    pairwise merge; if the depth exceeds max_len, falls back to the
    always-complete two-level uniform code (lengths L-1 and L)."""
    import heapq

    live = [s for s, c in enumerate(counts) if c > 0]
    if not live:
        return None
    n = len(counts)
    if len(live) == 1:
        out = [0] * n
        out[live[0]] = 1
        return out  # handled as simple/degenerate by the writer
    heap = [(counts[s], id([]), (s,)) for s in live]
    heapq.heapify(heap)
    depth = dict.fromkeys(live, 0)
    while len(heap) > 1:
        c1, _, g1 = heapq.heappop(heap)
        c2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (c1 + c2, id(g1), g1 + g2))
    if max(depth.values()) > max_len:
        k = len(live)
        lvl = max(1, (k - 1).bit_length())
        short = (1 << lvl) - k  # this many symbols at lvl-1 keeps Kraft exact
        depth = {}
        for j, s in enumerate(sorted(live, key=lambda s: -counts[s])):
            depth[s] = lvl - 1 if j < short else lvl
    out = [0] * n
    for s, d in depth.items():
        out[s] = d
    return out


def _canonical_from_lengths(lengths):
    live = sorted((ln, s) for s, ln in enumerate(lengths) if ln > 0)
    codes = {}
    code, prev = 0, live[0][0]
    for ln, sym in live:
        code <<= ln - prev
        codes[sym] = (code, ln)
        code += 1
        prev = ln
    return codes


def _write_prefix_code(wtr: _LSBWriter, lengths):
    """Serialize one prefix code: simple form for 1-2 symbols, else the
    code-length-coded normal form (no RLE — plain literals, valid if
    suboptimal; repeat-zero 17/18 still used for long gaps)."""
    live = [s for s, ln in enumerate(lengths) if ln > 0]
    if len(live) <= 2 and max(live, default=0) < 256:
        wtr.put_bits(1, 1)  # simple
        wtr.put_bits(len(live) - 1, 1)
        first = live[0] if live else 0
        if first > 1:
            wtr.put_bits(1, 1)
            wtr.put_bits(first, 8)
        else:
            wtr.put_bits(0, 1)
            wtr.put_bits(first, 1)
        if len(live) == 2:
            wtr.put_bits(live[1], 8)
        return
    # normal form: emit lengths as literals + zero-runs
    seq = []  # (cl_symbol, extra_bits, extra_val)
    i, n = 0, len(lengths)
    while i < n:
        if lengths[i] == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            # trailing zeros must be explicit: with no max_symbol field
            # the decoder keeps reading until the whole alphabet is
            # assigned, so an implicit tail would desync the stream
            while run >= 11:
                take = min(run, 138)
                seq.append((18, 7, take - 11))
                run -= take
            while run >= 3:
                take = min(run, 10)
                seq.append((17, 3, take - 3))
                run -= take
            seq += [(0, 0, 0)] * run
            i = j
        else:
            seq.append((lengths[i], 0, 0))
            i += 1
    cl_counts = [0] * 19
    for s, _, _ in seq:
        cl_counts[s] += 1
    cl_lengths = _huffman_lengths(cl_counts, 7)
    # degenerate single-symbol code-length code: give it length 1 plus a
    # dummy partner so the canonical table is complete
    if sum(1 for x in cl_lengths if x) == 1:
        only = cl_lengths.index(1)
        partner = 0 if only != 0 else 1
        cl_lengths[partner] = 1
    cl_codes = _canonical_from_lengths(cl_lengths)
    wtr.put_bits(0, 1)  # not simple
    # emit in _CL_ORDER, covering every nonzero slot
    last_needed = max(i for i, s in enumerate(_CL_ORDER) if cl_lengths[s] > 0)
    num_codes = max(4, last_needed + 1)
    wtr.put_bits(num_codes - 4, 4)
    for i in range(num_codes):
        wtr.put_bits(cl_lengths[_CL_ORDER[i]], 3)
    wtr.put_bits(0, 1)  # no explicit max_symbol: trailing zeros implicit
    for s, eb, ev in seq:
        code, ln = cl_codes[s]
        wtr.put_code(code, ln)
        if eb:
            wtr.put_bits(ev, eb)


def mux_webp_lossless(img, *, use_cache: bool = True, use_lz77: bool = True,
                      subtract_green: bool = False) -> bytes:
    """WEBP-lossless writer (fixture sibling of the other mux_*):
    (h, w, 3) RGB or (h, w, 4) RGBA uint8 → a real VP8L stream with
    histogram-built prefix codes, optional dist-1 LZ77 run coding
    (plain distance codes), optional 2^4 color cache, and optionally the
    subtract-green transform."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("mux_webp_lossless needs (h, w, 3|4)")
    h, w = img.shape[0], img.shape[1]
    rr = img[:, :, 0].astype(np.uint32)
    g = img[:, :, 1].astype(np.uint32)
    bb = img[:, :, 2].astype(np.uint32)
    a = img[:, :, 3].astype(np.uint32) if img.shape[2] == 4 else np.full((h, w), 255, np.uint32)
    if subtract_green:
        rr = (rr - g) & 0xFF
        bb = (bb - g) & 0xFF
    argb = ((a << 24) | (rr << 16) | (g << 8) | bb).reshape(-1)

    cache_bits = 4 if use_cache else 0
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size

    # tokenize: (kind, payload) with kind in {lit, len, cache}
    tokens = []
    npix = argb.shape[0]
    pos = 0
    while pos < npix:
        px = int(argb[pos])
        if use_lz77 and pos > 0 and px == int(argb[pos - 1]):
            run = 1
            while pos + run < npix and int(argb[pos + run]) == px and run < 4096:
                run += 1
            if run >= 3:
                tokens.append(("len", run, 1))
                # copied pixels land in the cache too
                if cache_size:
                    for _i in range(run):
                        cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
                pos += run
                continue
        if cache_size:
            slot = (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[slot] == px:
                tokens.append(("cache", slot))
                pos += 1
                continue
            cache[slot] = px
        tokens.append(("lit", px))
        pos += 1

    green_n = 256 + 24 + cache_size
    counts = {"green": [0] * green_n, "red": [0] * 256, "blue": [0] * 256,
              "alpha": [0] * 256, "dist": [0] * 40}
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            counts["green"][(px >> 8) & 0xFF] += 1
            counts["red"][(px >> 16) & 0xFF] += 1
            counts["blue"][px & 0xFF] += 1
            counts["alpha"][(px >> 24) & 0xFF] += 1
        elif t[0] == "len":
            lcode, _, _ = _value_to_prefix(t[1])
            counts["green"][256 + lcode] += 1
            dcode, _, _ = _value_to_prefix(t[2] + 120)
            counts["dist"][dcode] += 1
        else:
            counts["green"][280 + t[1]] += 1
    # every alphabet needs at least one countable symbol
    for k in counts:
        if not any(counts[k]):
            counts[k][0] = 1
    lengths = {k: _huffman_lengths(counts[k], 15) for k in counts}
    codes = {k: _canonical_from_lengths(lengths[k]) for k in counts}

    wtr = _LSBWriter()
    wtr.put_bits(w - 1, 14)
    wtr.put_bits(h - 1, 14)
    wtr.put_bits(1 if img.shape[2] == 4 else 0, 1)
    wtr.put_bits(0, 3)  # version
    if subtract_green:
        wtr.put_bits(1, 1)  # transform present
        wtr.put_bits(2, 2)  # subtract-green
    wtr.put_bits(0, 1)  # no more transforms
    if cache_bits:
        wtr.put_bits(1, 1)
        wtr.put_bits(cache_bits, 4)
    else:
        wtr.put_bits(0, 1)
    wtr.put_bits(0, 1)  # no meta prefix codes
    for k in ("green", "red", "blue", "alpha", "dist"):
        # degenerate one-symbol codes go out in simple form
        live = [s for s, ln in enumerate(lengths[k]) if ln > 0]
        if len(live) == 1 and live[0] < 256:
            wtr.put_bits(1, 1)
            wtr.put_bits(0, 1)  # one symbol
            if live[0] > 1:
                wtr.put_bits(1, 1)
                wtr.put_bits(live[0], 8)
            else:
                wtr.put_bits(0, 1)
                wtr.put_bits(live[0], 1)
            codes[k] = {live[0]: (0, 0)}
        else:
            _write_prefix_code(wtr, lengths[k])

    def put(k, sym):
        code, ln = codes[k][sym]
        if ln:
            wtr.put_code(code, ln)

    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            put("green", (px >> 8) & 0xFF)
            put("red", (px >> 16) & 0xFF)
            put("blue", px & 0xFF)
            put("alpha", (px >> 24) & 0xFF)
        elif t[0] == "len":
            lcode, leb, lev = _value_to_prefix(t[1])
            put("green", 256 + lcode)
            if leb:
                wtr.put_bits(lev, leb)
            dcode, deb, dev = _value_to_prefix(t[2] + 120)
            put("dist", dcode)
            if deb:
                wtr.put_bits(dev, deb)
        else:
            put("green", 280 + t[1])
    payload = b"\x2f" + wtr.flush()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
