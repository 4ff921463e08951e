"""Baseline TIFF 6.0 reader/writer — spec-written, numpy-only.

Covers the stills that document/scientific corpora actually carry: 8-bit
grayscale and RGB, chunky planar layout, strip organization, and the three
byte-level compressions the spec defines without external code: none (1),
LZW (5 — the TIFF variant: MSB-first packing, 256/257 clear/EOI, EARLY
code-width change at table size 2^n - 1, optional horizontal-differencing
predictor tag 317), and PackBits (32773). Both II (little-endian) and MM
(big-endian) byte orders parse. Anything else the spec allows but this
engine does not implement — other bit depths, tiled layout, planar=2,
palette TIFFs, JPEG-in-TIFF — raises ``NotImplementedError`` (the loud
gate convention); structural damage returns ``None`` (quarantine).

Scale note: runs per-row inside Arrow-batched ``mapInPandas`` passes like
every other codec here — no shuffle, no driver work.
"""

from __future__ import annotations

import numpy as np

_TIFF_TAGS = {
    256: "width", 257: "height", 258: "bits", 259: "compression",
    262: "photometric", 273: "strip_offsets", 277: "spp",
    278: "rows_per_strip", 279: "strip_counts", 284: "planar", 317: "predictor",
}
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _packbits_decode(b: bytes, expect: int):
    out = bytearray()
    i = 0
    while i < len(b) and len(out) < expect:
        n = b[i]
        i += 1
        if n < 128:  # literal run of n+1
            if i + n + 1 > len(b):
                return None
            out += b[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(b):
                return None
            out += bytes([b[i]]) * (257 - n)
            i += 1
        # n == 128: no-op per spec
    return bytes(out) if len(out) == expect else None


def _packbits_encode(b: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(b)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and b[j + 1] == b[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out += bytes([257 - run, b[i]])
            i = j + 1
        else:
            # literal stretch until a run of >= 3 starts (2-byte runs are
            # cheaper folded into the literal) or 128 bytes
            k = i
            while k < n and k - i < 128:
                if k + 2 < n and b[k] == b[k + 1] == b[k + 2]:
                    break
                k += 1
            out += bytes([k - i - 1]) + b[i:k]
            i = k
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expect: int):
    """TIFF-variant LZW: MSB-first bitstream, clear=256/EOI=257, initial
    width 9, EARLY width change when the table reaches 2^width - 1."""
    CLEAR, EOI = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    prev = None
    acc = nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out) if len(out) == expect else None
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == EOI:
            return bytes(out) if len(out) == expect else None
        if code < len(table) and (code < 256 or code > 257):
            entry = table[code]
            if not entry and code > 257:
                return None
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1  # TIFF early change
        if len(out) > expect:
            return None


def _tiff_lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, next_code, width = fresh()
    emit(CLEAR, width)
    w = b""
    for k in data:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4094:
            table[wk] = next_code
            next_code += 1
            # early change: bump when the ASSIGNED code is 2^w - 1, one
            # code earlier than GIF (the decoder mirrors at table size
            # 2^w - 1 — its table runs one entry behind the encoder's)
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(CLEAR, width)
            table, next_code, width = fresh()
        w = bytes([k])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def decode_tiff(b: bytes):
    """Strip-organized baseline TIFF → (h, w, spp) uint8 array or None;
    NotImplementedError for valid-but-unimplemented layouts (tiles,
    planar=2, palette, non-8-bit depths, JPEG/deflate compression)."""
    b = bytes(b)
    if len(b) < 8:
        return None
    if b[:2] == b"II":
        bo = "little"
    elif b[:2] == b"MM":
        bo = "big"
    else:
        return None
    if int.from_bytes(b[2:4], bo) != 42:
        return None

    def u(x: bytes) -> int:
        return int.from_bytes(x, bo)

    ifd = u(b[4:8])
    if ifd + 2 > len(b):
        return None
    n = u(b[ifd : ifd + 2])
    if ifd + 2 + 12 * n + 4 > len(b):
        return None
    tags: dict[str, list[int]] = {}
    for k in range(n):
        e = b[ifd + 2 + 12 * k : ifd + 14 + 12 * k]
        tag, typ, cnt = u(e[0:2]), u(e[2:4]), u(e[4:8])
        name = _TIFF_TAGS.get(tag)
        if name is None:
            continue
        if typ not in _TYPE_SIZE or cnt == 0:
            return None
        size = _TYPE_SIZE[typ] * cnt
        if typ == 5:
            return None  # RATIONAL in a structural tag: not expected here
        raw = e[8 : 8 + min(size, 4)] if size <= 4 else b[u(e[8:12]) : u(e[8:12]) + size]
        if len(raw) < size:
            return None
        step = _TYPE_SIZE[typ]
        tags[name] = [u(raw[j : j + step]) for j in range(0, size, step)]

    def one(name, default=None):
        v = tags.get(name)
        if v is None:
            return default
        return v[0]

    w, h = one("width"), one("height")
    if not w or not h:
        return None
    bits = tags.get("bits", [8])
    spp = one("spp", 1)
    comp = one("compression", 1)
    planar = one("planar", 1)
    predictor = one("predictor", 1)
    photometric = one("photometric", 1 if spp == 1 else 2)
    if any(x != 8 for x in bits):
        raise NotImplementedError(f"TIFF bit depths {bits} not implemented (8-bit only)")
    if planar == 2:
        raise NotImplementedError("TIFF planar configuration 2 not implemented")
    if photometric == 3:
        raise NotImplementedError("palette TIFF not implemented")
    if comp in (6, 7, 8, 32946, 2, 3, 4):
        raise NotImplementedError(f"TIFF compression {comp} needs an external codec")
    if comp not in (1, 5, 32773) or spp not in (1, 3) or predictor not in (1, 2):
        return None
    offs = tags.get("strip_offsets")
    cnts = tags.get("strip_counts")
    rps = one("rows_per_strip", h)
    if not offs or not cnts or len(offs) != len(cnts) or rps < 1:
        return None
    if len(offs) != -(-h // rps):
        return None
    rows = []
    for si, (o, c) in enumerate(zip(offs, cnts)):
        if o + c > len(b):
            return None
        nrows = min(rps, h - si * rps)
        expect = nrows * w * spp
        raw = b[o : o + c]
        if comp == 1:
            strip = raw if len(raw) == expect else None
        elif comp == 5:
            strip = _tiff_lzw_decode(raw, expect)
        else:
            strip = _packbits_decode(raw, expect)
        if strip is None:
            return None
        arr = np.frombuffer(strip, dtype=np.uint8).reshape(nrows, w, spp)
        if predictor == 2:  # horizontal differencing: undo by cumsum mod 256
            arr = (arr.astype(np.int64).cumsum(axis=1) & 0xFF).astype(np.uint8)
        rows.append(arr)
    img = np.concatenate(rows, axis=0)
    if photometric == 0 and spp == 1:  # WhiteIsZero: invert
        img = 255 - img
    return img


def mux_tiff(img, compression: int = 1, *, rows_per_strip: int | None = None,
             predictor: int = 1, big_endian: bool = False) -> bytes:
    """TIFF writer (fixture sibling of the other mux_*): (h, w) gray or
    (h, w, 3) RGB uint8 → strip-organized baseline TIFF with compression
    1 (none), 5 (TIFF-LZW, optional horizontal predictor), or 32773
    (PackBits), in either byte order."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if gray:
        img = img[:, :, None]
    h, w, spp = img.shape
    if spp not in (1, 3) or compression not in (1, 5, 32773) or predictor not in (1, 2):
        raise ValueError("unsupported mux_tiff parameters")
    if predictor == 2 and compression != 5:
        raise ValueError("predictor 2 is defined for LZW")
    bo = "big" if big_endian else "little"
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        part = img[y0 : y0 + rps]
        if predictor == 2:
            d = part.astype(np.int64)
            d[:, 1:] = d[:, 1:] - d[:, :-1]
            part = (d & 0xFF).astype(np.uint8)
        raw = part.tobytes()
        if compression == 5:
            strips.append(_tiff_lzw_encode(raw))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            strips.append(raw)

    entries = []  # (tag, type, count, value_or_bytes)
    nstrips = len(strips)

    def u16s(vals):
        return b"".join(v.to_bytes(2, bo) for v in vals)

    def u32s(vals):
        return b"".join(v.to_bytes(4, bo) for v in vals)

    # layout: header(8) + IFD + out-of-line data + strip data
    tag_list = [
        (256, 3, 1, [w]), (257, 3, 1, [h]), (258, 3, spp, [8] * spp),
        (259, 3, 1, [compression]), (262, 3, 1, [1 if gray else 2]),
        (273, 4, nstrips, None),  # strip offsets, filled later
        (277, 3, 1, [spp]), (278, 3, 1, [rps]),
        (279, 4, nstrips, [len(s) for s in strips]),
    ]
    if predictor == 2:
        tag_list.append((317, 3, 1, [2]))
    tag_list.sort()
    n = len(tag_list)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    # out-of-line pools
    pool = bytearray()

    def place(typ, cnt, vals):
        nonlocal pool
        enc = u16s(vals) if typ == 3 else u32s(vals)
        if len(enc) <= 4:
            return None, enc + bytes(4 - len(enc))
        off = data_off + len(pool)
        pool += enc
        return off, None

    # first pass to size the pool (strip offsets need final positions):
    # compute pool size for all tags except 273, then strip data follows.
    tmp_pool = 0
    for tag, typ, cnt, vals in tag_list:
        size = _TYPE_SIZE[typ] * cnt
        if size > 4:
            tmp_pool += size
    strips_start = data_off + tmp_pool
    offsets = []
    pos = strips_start
    for s in strips:
        offsets.append(pos)
        pos += len(s)

    out = bytearray()
    out += (b"MM" if big_endian else b"II") + (42).to_bytes(2, bo) + ifd_off.to_bytes(4, bo)
    out += n.to_bytes(2, bo)
    for tag, typ, cnt, vals in tag_list:
        if tag == 273:
            vals = offsets
        off, inline = place(typ, cnt, vals)
        out += tag.to_bytes(2, bo) + typ.to_bytes(2, bo) + cnt.to_bytes(4, bo)
        out += inline if inline is not None else off.to_bytes(4, bo)
    out += (0).to_bytes(4, bo)  # next IFD
    out += pool
    for s in strips:
        out += s
    return bytes(out)
