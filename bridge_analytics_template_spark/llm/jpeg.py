"""JPEG (ITU-T T.81) codec — baseline AND progressive, spec-written,
numpy-only.

Everything here is from the public spec: marker segments, DQT/DHT table
parsing, canonical Huffman code construction (Annex C), the zigzag scan,
DC prediction + magnitude-category "extend" coding, per-MCU interleaving
with arbitrary sampling factors (4:4:4 / 4:2:0 / 4:2:2), restart markers,
dequantize → 2-D IDCT (float64 separable, orthonormal 8x8 DCT matrix) →
level shift, chroma upsample, and the JFIF YCbCr↔RGB transform.
Progressive (SOF2, Annex G.1/G.2) decodes in full: multi-scan coefficient
accumulation with spectral selection, successive approximation (DC and AC
refinement with correction bits), EOB-run coding, interleaved DC /
non-interleaved AC block orders, and mid-stream DHT redefinition. The
encoder (``mux_jpeg``) writes real baseline streams with the Annex K
standard Huffman tables — and, with ``progressive=True``, real SOF2
streams with per-scan histogram-built tables (standard tables lack the
EOBn symbols progressive needs; the all-ones code is reserved via the
deepest-phantom canonical build).

Decode policy mirrors the rest of the multimodal tier: structural damage
returns ``None`` (quarantine); valid-but-unimplemented coding processes —
lossless (SOF3/7/11), hierarchical, arithmetic (SOF9/10/13/14), 12-bit
precision — raise ``NotImplementedError`` loudly.

Determinism note: with quantization tables of all ones and block-constant
input, the only nonzero coefficient is DC = 8·(v-128) (the AC cosine sums
cancel exactly; float64 noise ~1e-14 rounds to zero), so mux→demux is
EXACTLY lossless — that is the property the SQL oracle pins. The entropy
loop is plain Python (fixture-scale by design; a production deployment
swaps in a SIMD decoder behind the same function signature).

Scale note: like the other codecs this runs inside Arrow-batched
``mapInPandas`` passes — per-row decode, no shuffle, no driver work.
"""

from __future__ import annotations

import numpy as np

#: zigzag position k -> raster index (T.81 Figure 5).
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: Annex K.1 luminance / K.2 chrominance quantization tables (raster order).
STD_QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
STD_QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K.3 standard Huffman table specs: (BITS[1..16], HUFFVAL).
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: Orthonormal 8x8 DCT-II matrix: C[u, x] = c(u)/2 · cos((2x+1)uπ/16).
_C = np.array([
    [
        (np.sqrt(0.5) if u == 0 else 1.0) / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
])


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _canonical_codes(bits, vals):
    """Annex C code assignment: symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    """(length, code) -> symbol, for the bit-at-a-time reader."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:  # pad with 1-bits per spec
            self.put(1, 1)
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 un-stuffing.
    Raises _ScanEnd on a real marker or exhausted input."""

    def __init__(self, b: bytes, pos: int):
        self.b = b
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.b):
                raise _ScanEnd
            byte = self.b[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.b):
                    raise _ScanEnd
                nxt = self.b[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise _ScanEnd  # a real marker terminates the scan
            self.acc = byte
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self):
        """Byte-align and consume an expected RSTn marker; returns its
        index 0..7 or None if the next bytes are not a restart marker."""
        self.n = 0
        if self.pos + 2 > len(self.b) or self.b[self.pos] != 0xFF:
            return None
        m = self.b[self.pos + 1]
        if 0xD0 <= m <= 0xD7:
            self.pos += 2
            return m - 0xD0
        return None

    def huff(self, table) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise _BadStream


class _ScanEnd(Exception):
    pass


class _BadStream(Exception):
    pass


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.clip(np.round(np.stack([y, cb, cr], axis=2)), 0, 255)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def mux_jpeg(img, quant=None, quant_chroma=None, subsample: bool = False,
             restart_interval: int = 0, progressive: bool = False) -> bytes:
    """JFIF encoder (fixture writer): (h, w) grayscale or (h, w, 3) RGB
    uint8 → a real T.81 stream. Baseline by default with Annex K standard
    Huffman tables; ``progressive=True`` writes SOF2 with spectral
    selection AND successive approximation (DC Al=1 → DC refine, AC bands
    at Al=1 → AC refines with EOB-run and correction-bit coding) using
    per-scan histogram-built Huffman tables (the standard tables lack the
    EOBn symbols progressive needs). ``quant``/``quant_chroma`` are 8x8
    integer tables (default Annex K; pass ``np.ones((8, 8))`` for the
    exactly-lossless block-constant regime the oracle uses). ``subsample``
    writes 4:2:0 (2x2 box-averaged chroma); ``restart_interval`` > 0
    emits DRI + RSTn every that many MCUs (baseline path only)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[0], img.shape[1]
    ql = np.asarray(quant if quant is not None else STD_QUANT_LUM, dtype=np.int64)
    qc = np.asarray(
        quant_chroma if quant_chroma is not None else (quant if quant is not None else STD_QUANT_CHROM),
        dtype=np.int64,
    )
    if not (1 <= ql.min() and ql.max() <= 255 and 1 <= qc.min() and qc.max() <= 255):
        raise ValueError("8-bit quantization tables only")

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qmap, dcmap, acmap = [0], [0], [0]
    else:
        ycc = _rgb_to_ycbcr(img)
        y, cb, cr = ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]
        if subsample:
            ch, cw = -(-h // 2) * 2, -(-w // 2) * 2
            def half(p):
                full = np.empty((ch, cw))
                full[:h, :w] = p
                full[h:, :w] = p[h - 1 :, :]
                full[:, w:] = full[:, w - 1 : w]
                return np.round(
                    (full[0::2, 0::2] + full[1::2, 0::2] + full[0::2, 1::2] + full[1::2, 1::2]) / 4.0
                )
            planes = [y, half(cb), half(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qmap, dcmap, acmap = [0, 1, 1], [0, 1, 1], [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad each plane to its MCU-aligned size (edge replicate)
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph = mcuy * sv * 8
        pw = mcux * sh * 8
        q = np.empty((ph, pw))
        hh, ww = p.shape
        q[:hh, :ww] = p
        q[hh:, :ww] = p[hh - 1 :, :]
        q[:, ww:] = q[:, ww - 1 : ww]
        padded.append(q)

    if progressive:
        return _mux_progressive(padded, samp, qmap, ql, qc, h, w, gray, mcux, mcuy)

    dc_tabs = [_canonical_codes(*_DC_LUM), _canonical_codes(*_DC_CHROM)]
    ac_tabs = [_canonical_codes(*_AC_LUM), _canonical_codes(*_AC_CHROM)]
    qzz = [ql.reshape(64)[ZIGZAG], qc.reshape(64)[ZIGZAG]]

    bw = _BitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    rst = 0
    body_parts = []
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                body_parts.append(bw.flush())
                body_parts.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) & 7
                bw = _BitWriter()
                pred = [0] * len(planes)
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = np.round(_fdct(block) / (
                            ql if qmap[ci] == 0 else qc
                        )).astype(np.int64)
                        zz = coef.reshape(64)[ZIGZAG]
                        # DC
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        size = _category(diff)
                        code, ln = dc_tabs[dcmap[ci]][size]
                        bw.put(code, ln)
                        if size:
                            bw.put(diff if diff > 0 else diff + (1 << size) - 1, size)
                        # AC
                        run = 0
                        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if k > last_nz:
                                code, ln = ac_tabs[acmap[ci]][0x00]  # EOB
                                bw.put(code, ln)
                                break
                            if v == 0:
                                run += 1
                                continue
                            while run >= 16:
                                code, ln = ac_tabs[acmap[ci]][0xF0]  # ZRL
                                bw.put(code, ln)
                                run -= 16
                            size = _category(v)
                            code, ln = ac_tabs[acmap[ci]][(run << 4) | size]
                            bw.put(code, ln)
                            bw.put(v if v > 0 else v + (1 << size) - 1, size)
                            run = 0
            mcu_count += 1
    body_parts.append(bw.flush())
    body = b"".join(body_parts)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00" + bytes([0, 1, 0, 1, 0, 0]))
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qzz[0]))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(int(v) for v in qzz[1]))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qmap[ci]])
    out += _seg(0xC0, sof)

    def dht(cls, tid, spec):
        bits, vals = spec
        return _seg(0xC4, bytes([(cls << 4) | tid] + bits) + bytes(vals))

    out += dht(0, 0, _DC_LUM) + dht(1, 0, _AC_LUM)
    if not gray:
        out += dht(0, 1, _DC_CHROM) + dht(1, 1, _AC_CHROM)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (dcmap[ci] << 4) | acmap[ci]])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += body
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoding (T.81 Annex G.1) --------------------------------


def _jpeg_huffman_spec(counts):
    """Histogram → (BITS[1..16], HUFFVAL) with the all-ones code reserved
    (phantom max-symbol trick, then dropped) — the standard JPEG table
    build. The phantom's heap key sorts BEFORE every real symbol on count
    ties, so it joins the very first merge and is guaranteed a maximum-
    depth leaf; being the largest symbol, canonical ordering then makes it
    the LAST (all-ones) code, and dropping it shifts nothing."""
    import heapq

    n = len(counts)
    ext = list(counts) + [1]
    if not any(counts):
        ext[0] = 1  # empty histogram: one real symbol + the phantom
    live = [s for s, c in enumerate(ext) if c > 0]
    heap = [(ext[s], (0 if s == n else 1 + s), (s,)) for s in live]
    heapq.heapify(heap)
    depth = dict.fromkeys(live, 0)
    while len(heap) > 1:
        c1, t1, g1 = heapq.heappop(heap)
        c2, t2, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (c1 + c2, min(t1, t2), g1 + g2))
    if len(live) == 1:  # only the phantom-pair degenerate case upstream
        depth[live[0]] = 1
    if max(depth.values()) > 16:
        # complete two-level fallback; count-1 phantom (largest symbol)
        # stays in the deep group and thus keeps the all-ones code
        k = len(live)
        lvl = max(1, (k - 1).bit_length())
        short = (1 << lvl) - k
        depth = {}
        for j, s in enumerate(sorted(live, key=lambda s: -ext[s])):
            depth[s] = lvl - 1 if j < short else lvl
    ordered = sorted((ln, s) for s, ln in depth.items())
    bits = [0] * 16
    vals = []
    enc = {}
    code, prev = 0, ordered[0][0]
    for ln, sym in ordered:
        code <<= ln - prev
        if sym < n:  # drop the phantom from the emitted table
            bits[ln - 1] += 1
            vals.append(sym)
            enc[sym] = (code, ln)
        code += 1
        prev = ln
    return bits, vals, enc


class _ScanEmitter:
    """Two-pass sink: pass 1 counts Huffman symbols, pass 2 writes bits."""

    def __init__(self):
        self.counting = True
        self.counts: dict[int, int] = {}
        self.enc = None
        self.bw = None

    def sym(self, s: int):
        if self.counting:
            self.counts[s] = self.counts.get(s, 0) + 1
        else:
            code, ln = self.enc[s]
            self.bw.put(code, ln)

    def raw(self, v: int, nbits: int):
        if not self.counting and nbits:
            self.bw.put(v, nbits)


def _emit_dc_scan(em: _ScanEmitter, sel, coefs, samp, mcux, mcuy, Ah, Al):
    preds = [0] * len(coefs)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in sel:
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        v = int(coefs[ci][my * sv + by, mx * sh + bx, 0])
                        if Ah == 0:
                            t = v >> Al
                            diff = t - preds[ci]
                            preds[ci] = t
                            s = _category(diff)
                            em.sym(s)
                            em.raw(diff if diff > 0 else diff + (1 << s) - 1, s)
                        else:
                            em.raw((v >> Al) & 1, 1)


def _emit_ac_first(em: _ScanEmitter, blocks, Ss, Se, Al):
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            em.sym(nb << 4)
            em.raw(eobrun - (1 << nb), nb)
            eobrun = 0

    for blk in blocks:
        r = 0
        for k in range(Ss, Se + 1):
            v = int(blk[k])
            t = abs(v) >> Al
            if t == 0:
                r += 1
                continue
            flush()
            while r > 15:
                em.sym(0xF0)
                r -= 16
            s = _category(t)
            em.sym((r << 4) | s)
            sv = t if v > 0 else -t
            em.raw(sv if sv > 0 else sv + (1 << s) - 1, s)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _emit_ac_refine(em: _ScanEmitter, blocks, Ss, Se, Al):
    eobrun = 0
    be: list[int] = []  # correction bits pending with the EOB run

    def flush():
        nonlocal eobrun, be
        if eobrun:
            nb = eobrun.bit_length() - 1
            em.sym(nb << 4)
            em.raw(eobrun - (1 << nb), nb)
            for bit in be:
                em.raw(bit, 1)
            eobrun, be = 0, []

    for blk in blocks:
        absv = [abs(int(blk[k])) >> Al for k in range(Ss, Se + 1)]
        eob = Ss - 1
        for i, t in enumerate(absv):
            if t == 1:
                eob = Ss + i
        r = 0
        br: list[int] = []
        for i, k in enumerate(range(Ss, Se + 1)):
            t = absv[i]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush()
                em.sym(0xF0)
                r -= 16
                for bit in br:
                    em.raw(bit, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            flush()
            em.sym((r << 4) | 1)
            em.raw(1 if int(blk[k]) > 0 else 0, 1)
            for bit in br:
                em.raw(bit, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be += br
            if eobrun == 0x7FFF:
                flush()
    flush()


def _mux_progressive(padded, samp, qmap, ql, qc, h, w, gray, mcux, mcuy) -> bytes:
    """SOF2 emission: DC(Al=1) interleaved → per-component AC bands at
    Al=1 (the luma band split 1-5 / 6-63 exercises spectral assembly) →
    DC refine → per-component AC refines. One histogram-built DHT pair
    precedes each scan (the decoder's mid-stream DHT update path)."""
    coefs = []
    for ci, p in enumerate(padded):
        q = ql if qmap[ci] == 0 else qc
        bh, bwid = p.shape[0] // 8, p.shape[1] // 8
        blocks = (p.reshape(bh, 8, bwid, 8).transpose(0, 2, 1, 3) - 128.0)
        co = np.einsum("ub,ijbc,cv->ijuv", _C, blocks, _C.T) / q
        coefs.append(np.round(co).astype(np.int64).reshape(bh, bwid, 64)[..., ZIGZAG])

    ncomp = len(padded)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    def noninterleaved_blocks(ci):
        sh, sv = samp[ci]
        nbw = -(-(-(-w * sh // hmax)) // 8)
        nbh = -(-(-(-h * sv // vmax)) // 8)
        return [coefs[ci][by, bx] for by in range(nbh) for bx in range(nbw)]

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00" + bytes([0, 1, 0, 1, 0, 0]))
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in ql.reshape(64)[ZIGZAG]))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(int(v) for v in qc.reshape(64)[ZIGZAG]))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qmap[ci]])
    out += _seg(0xC2, sof)

    # scan plan: (kind, sel, Ss, Se, Ah, Al)
    plan = [("dc", list(range(ncomp)), 0, 0, 0, 1)]
    if gray:
        plan += [("ac", [0], 1, 63, 0, 1)]
    else:
        plan += [("ac", [0], 1, 5, 0, 1), ("ac", [0], 6, 63, 0, 1),
                 ("ac", [1], 1, 63, 0, 1), ("ac", [2], 1, 63, 0, 1)]
    plan += [("dc", list(range(ncomp)), 0, 0, 1, 0)]
    plan += [("ac", [ci], 1, 63, 1, 0) for ci in range(ncomp)]

    for kind, sel, Ss, Se, Ah, Al in plan:
        em = _ScanEmitter()

        def run(emitter):
            if kind == "dc":
                _emit_dc_scan(emitter, sel, coefs, samp, mcux, mcuy, Ah, Al)
            elif Ah == 0:
                _emit_ac_first(emitter, noninterleaved_blocks(sel[0]), Ss, Se, Al)
            else:
                _emit_ac_refine(emitter, noninterleaved_blocks(sel[0]), Ss, Se, Al)

        run(em)  # pass 1: histograms
        needs_table = not (kind == "dc" and Ah > 0)  # DC refine reads no symbols
        if needs_table:
            n_syms = 12 if kind == "dc" else 256
            counts = [0] * n_syms
            for s, c in em.counts.items():
                counts[s] = c
            bits, vals, enc = _jpeg_huffman_spec(counts)
            cls = 0 if kind == "dc" else 1
            out += _seg(0xC4, bytes([(cls << 4) | 0] + bits) + bytes(vals))
            em.enc = enc
        em.counting = False
        em.bw = _BitWriter()
        run(em)  # pass 2: bits
        sos = bytes([len(sel)])
        for ci in sel:
            sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
        sos += bytes([Ss, Se, (Ah << 4) | Al])
        out += _seg(0xDA, sos)
        out += em.bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


#: SOF markers for coding processes that are valid JPEG but outside this
#: implementation (lossless, hierarchical, arithmetic) — these gate
#: loudly. SOF2 (progressive) left this set when Annex G.1 decode landed.
_SOF_UNSUPPORTED = {0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def decode_jpeg(b: bytes):
    """Baseline JPEG decode: marker walk → DQT/DHT/SOF0-1/DRI/SOS →
    per-MCU Huffman + extend decode with DC prediction and restart
    handling → dequantize → un-zigzag → IDCT → level shift → chroma
    upsample → YCbCr→RGB. Returns (h, w, 1) for grayscale or (h, w, 3)
    RGB uint8; None for structural damage; NotImplementedError for
    progressive/lossless/arithmetic/12-bit streams (valid JPEG this
    engine does not implement)."""
    b = bytes(b)
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    i = 2
    qt: dict[int, np.ndarray] = {}
    ht: dict[tuple[int, int], dict] = {}
    frame = None
    ri = 0
    coef_state = None
    scans_done = 0
    try:
        while i + 2 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0xD9:
                # EOI: progressive frames finish here (baseline returns
                # from inside its single scan)
                if frame is not None and frame.get("progressive") and scans_done:
                    return _reconstruct(frame, qt, coef_state)
                return None
            if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
                i += 2
                continue
            if i + 4 > len(b):
                return None
            ln = int.from_bytes(b[i + 2 : i + 4], "big")
            if ln < 2 or i + 2 + ln > len(b):
                return None
            seg = b[i + 4 : i + 2 + ln]
            if marker == 0xDB:
                j = 0
                while j < len(seg):
                    pq, tq = seg[j] >> 4, seg[j] & 15
                    j += 1
                    if tq > 3 or pq > 1:
                        return None
                    need = 128 if pq else 64
                    if j + need > len(seg):
                        return None
                    if pq:
                        tab = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(np.int64)
                    else:
                        tab = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.int64)
                    raster = np.zeros(64, dtype=np.int64)
                    raster[ZIGZAG] = tab
                    qt[tq] = raster.reshape(8, 8)
                    j += need
            elif marker == 0xC4:
                j = 0
                while j + 17 <= len(seg):
                    cls, tid = seg[j] >> 4, seg[j] & 15
                    bits = list(seg[j + 1 : j + 17])
                    n = sum(bits)
                    if cls > 1 or tid > 3 or j + 17 + n > len(seg):
                        return None
                    ht[(cls, tid)] = _decode_table(bits, list(seg[j + 17 : j + 17 + n]))
                    j += 17 + n
                if j != len(seg):
                    return None
            elif marker in (0xC0, 0xC1, 0xC2):
                if len(seg) < 6:
                    return None
                prec = seg[0]
                if prec != 8:
                    raise NotImplementedError(f"JPEG precision {prec} not implemented (8-bit only)")
                fh = int.from_bytes(seg[1:3], "big")
                fw = int.from_bytes(seg[3:5], "big")
                nc = seg[5]
                if fh == 0 or fw == 0 or nc not in (1, 3) or len(seg) != 6 + 3 * nc:
                    if nc == 4:
                        raise NotImplementedError("4-component (CMYK) JPEG not implemented")
                    return None
                comps = []
                for c in range(nc):
                    cid, sf, tq = seg[6 + 3 * c : 9 + 3 * c]
                    sh, sv = sf >> 4, sf & 15
                    if not (1 <= sh <= 4 and 1 <= sv <= 4):
                        return None
                    comps.append({"id": cid, "sh": sh, "sv": sv, "tq": tq})
                frame = {"h": fh, "w": fw, "comps": comps, "progressive": marker == 0xC2}
                if marker == 0xC2:
                    hmax = max(c["sh"] for c in comps)
                    vmax = max(c["sv"] for c in comps)
                    mcux = -(-fw // (8 * hmax))
                    mcuy = -(-fh // (8 * vmax))
                    coef_state = [
                        np.zeros((mcuy * c["sv"], mcux * c["sh"], 64), dtype=np.int64)
                        for c in comps
                    ]
            elif marker in _SOF_UNSUPPORTED:
                raise NotImplementedError(
                    f"JPEG coding process SOF{marker - 0xC0} (progressive/lossless/"
                    "arithmetic/hierarchical) not implemented — baseline only"
                )
            elif marker == 0xDD:
                if len(seg) != 2:
                    return None
                ri = int.from_bytes(seg, "big")
            elif marker == 0xDA:
                if frame is None or len(seg) < 4:
                    return None
                ns = seg[0]
                if len(seg) != 1 + 2 * ns + 3:
                    return None
                if not frame["progressive"]:
                    if ns != len(frame["comps"]):
                        return None
                    scan = {}
                    for k in range(ns):
                        cid, tt = seg[1 + 2 * k], seg[2 + 2 * k]
                        scan[cid] = (tt >> 4, tt & 15)
                    return _decode_scan(b, i + 2 + ln, frame, scan, qt, ht, ri)
                # progressive: one of possibly many scans
                ids = {c["id"]: ix for ix, c in enumerate(frame["comps"])}
                sel = []
                for k in range(ns):
                    cid, tt = seg[1 + 2 * k], seg[2 + 2 * k]
                    if cid not in ids:
                        return None
                    sel.append((ids[cid], tt >> 4, tt & 15))
                ss, se, aa = seg[-3], seg[-2], seg[-1]
                ah, al = aa >> 4, aa & 15
                if ss > 63 or se > 63 or ss > se or ah > 13 or al > 13:
                    return None
                if (ss == 0) != (se == 0) or (ss > 0 and ns != 1):
                    return None
                i = _progressive_scan(
                    b, i + 2 + ln, frame, sel, ss, se, ah, al, ht, ri, coef_state
                )
                scans_done += 1
                while i < len(b) and b[i] != 0xFF:
                    i += 1  # tolerate pad bytes before the next marker
                continue
            # APPn / COM / anything else with a length: skip
            i += 2 + ln
        return None
    except (_BadStream, _ScanEnd):
        return None


def _decode_scan(b, pos, frame, scan, qt, ht, ri):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["sh"] for c in comps)
    vmax = max(c["sv"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        if c["tq"] not in qt or c["id"] not in scan:
            return None
        dc_id, ac_id = scan[c["id"]]
        if (0, dc_id) not in ht or (1, ac_id) not in ht:
            return None
        planes.append(np.zeros((mcuy * c["sv"] * 8, mcux * c["sh"] * 8)))

    rd = _BitReader(b, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if ri and mcu_count and mcu_count % ri == 0:
                    if rd.align_to_marker() is None:
                        return None
                    pred = [0] * len(comps)
                for ci, c in enumerate(comps):
                    dc_t = ht[(0, scan[c["id"]][0])]
                    ac_t = ht[(1, scan[c["id"]][1])]
                    q = qt[c["tq"]]
                    for by in range(c["sv"]):
                        for bx in range(c["sh"]):
                            zz = np.zeros(64, dtype=np.int64)
                            size = rd.huff(dc_t)
                            if size > 11:
                                return None
                            pred[ci] += _extend(rd.bits(size), size)
                            zz[0] = pred[ci]
                            k = 1
                            while k < 64:
                                sym = rd.huff(ac_t)
                                run, sz = sym >> 4, sym & 15
                                if sz == 0:
                                    if run == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += run
                                if k > 63:
                                    return None
                                zz[k] = _extend(rd.bits(sz), sz)
                                k += 1
                            coef = np.zeros(64, dtype=np.int64)
                            coef[ZIGZAG] = zz
                            block = _idct(coef.reshape(8, 8) * q) + 128.0
                            y0 = (my * c["sv"] + by) * 8
                            x0 = (mx * c["sh"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
                mcu_count += 1
    except (_ScanEnd, _BadStream):
        return None
    out_planes = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["sv"], hmax // c["sh"]
        if vmax % c["sv"] or hmax % c["sh"]:
            return None  # non-integer upsample ratios: corrupt sampling spec
        up = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(up[:h, :w])
    rounded = [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in out_planes]
    if len(rounded) == 1:
        return rounded[0][:, :, None]
    return _ycbcr_to_rgb(*rounded)


def _progressive_scan(b, pos, frame, sel, Ss, Se, Ah, Al, ht, ri, state):
    """Decode one progressive scan (T.81 Annex G.2) into the coefficient
    state, returning the byte position after its entropy data. DC scans
    may interleave components over the MCU grid; AC scans are single-
    component over that component's non-interleaved block grid. Handles
    successive-approximation refinement (correction bits, EOB runs) and
    restart markers."""
    comps = frame["comps"]
    hmax = max(c["sh"] for c in comps)
    vmax = max(c["sv"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    rd = _BitReader(b, pos)
    eobrun = 0
    preds = [0] * len(comps)
    count = 0

    def maybe_restart():
        nonlocal eobrun, preds, count
        if ri and count and count % ri == 0:
            if rd.align_to_marker() is None:
                raise _BadStream
            preds = [0] * len(comps)
            eobrun = 0
        count += 1

    if Ss == 0:
        # DC scan (first or refinement)
        dc_tabs = {}
        for ci, dct, _act in sel:
            if Ah == 0:
                t = ht.get((0, dct))
                if t is None:
                    raise _BadStream
                dc_tabs[ci] = t
        if len(sel) > 1:
            units = [("mcu", my, mx) for my in range(mcuy) for mx in range(mcux)]
        else:
            ci0 = sel[0][0]
            c = comps[ci0]
            nbw = -(-(-(-w * c["sh"] // hmax)) // 8)
            nbh = -(-(-(-h * c["sv"] // vmax)) // 8)
            units = [("blk", by, bx) for by in range(nbh) for bx in range(nbw)]
        for kind, a0, a1 in units:
            maybe_restart()
            if kind == "mcu":
                targets = [
                    (ci, a0 * comps[ci]["sv"] + by, a1 * comps[ci]["sh"] + bx)
                    for ci, _dct, _act in sel
                    for by in range(comps[ci]["sv"])
                    for bx in range(comps[ci]["sh"])
                ]
            else:
                targets = [(sel[0][0], a0, a1)]
            for ci, blky, blkx in targets:
                if Ah == 0:
                    s = rd.huff(dc_tabs[ci])
                    if s > 11:
                        raise _BadStream
                    preds[ci] += _extend(rd.bits(s), s)
                    state[ci][blky, blkx, 0] = preds[ci] << Al
                else:
                    if rd.bits(1):
                        state[ci][blky, blkx, 0] |= 1 << Al
        return rd.pos

    # AC scan: exactly one component, non-interleaved order
    ci, _dct, act = sel[0]
    c = comps[ci]
    ac_t = ht.get((1, act))
    if ac_t is None:
        raise _BadStream
    nbw = -(-(-(-w * c["sh"] // hmax)) // 8)
    nbh = -(-(-(-h * c["sv"] // vmax)) // 8)
    coef = state[ci]
    p1, m1 = 1 << Al, -(1 << Al)
    for by in range(nbh):
        for bx in range(nbw):
            maybe_restart()
            blk = coef[by, bx]
            if Ah == 0:  # first pass for this band
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = Ss
                while k <= Se:
                    sym = rd.huff(ac_t)
                    r, s = sym >> 4, sym & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1 + (rd.bits(r) if r else 0)
                        break
                    k += r
                    if k > Se:
                        raise _BadStream
                    blk[k] = _extend(rd.bits(s), s) << Al
                    k += 1
            else:  # refinement (G.2's correction-bit walk)
                k = Ss
                if eobrun == 0:
                    while k <= Se:
                        sym = rd.huff(ac_t)
                        r, s = sym >> 4, sym & 15
                        val = 0
                        if s == 0:
                            if r < 15:
                                eobrun = (1 << r) + (rd.bits(r) if r else 0)
                                break
                            # ZRL: skip 16 zero-history positions
                        else:
                            if s != 1:
                                raise _BadStream
                            val = p1 if rd.bits(1) else m1
                        while k <= Se:
                            if blk[k] != 0:
                                if rd.bits(1) and (int(blk[k]) & p1) == 0:
                                    blk[k] += p1 if blk[k] >= 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= Se:
                            blk[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= Se:
                        if blk[k] != 0:
                            if rd.bits(1) and (int(blk[k]) & p1) == 0:
                                blk[k] += p1 if blk[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
    return rd.pos


def _reconstruct(frame, qt, state):
    """Coefficient state → pixels: dequantize, un-zigzag, batched IDCT,
    level shift, chroma upsample, color convert — shared by the
    progressive path (the baseline path reconstructs inline)."""
    comps = frame["comps"]
    hmax = max(c["sh"] for c in comps)
    vmax = max(c["sv"] for c in comps)
    w, h = frame["w"], frame["h"]
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            return None
        q = qt[c["tq"]]
        zz = state[ci]
        bh, bw = zz.shape[0], zz.shape[1]
        raster = np.zeros((bh, bw, 64), dtype=np.int64)
        raster[..., ZIGZAG] = zz
        blocks = raster.reshape(bh, bw, 8, 8) * q
        pix = np.einsum("ub,ijbc,cv->ijuv", _C.T, blocks.astype(np.float64), _C) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        ry, rx = vmax // c["sv"], hmax // c["sh"]
        if vmax % c["sv"] or hmax % c["sh"]:
            return None
        up = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(up[:h, :w])
    rounded = [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in planes]
    if len(rounded) == 1:
        return rounded[0][:, :, None]
    return _ycbcr_to_rgb(*rounded)
