"""Multimodal column plumbing (SURVEY.md §2.11 L5; north-star "multimodal
columns").

Images / audio / video are opaque ``binary`` columns with a typed metadata
struct alongside. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested.
Formats with a published byte-level spec decode FOR REAL with no codec
dependency: PPM/BMP pixels, RIFF WAV/AVI demux with every
formula-specified sample coding (integer PCM 8-32, IEEE float, G.711),
PNG (``decode_png`` — stdlib zlib + filter reconstruction + Adam7), GIF
(``decode_gif`` — including the LZW entropy coder), and baseline JPEG
(``llm/jpeg.py`` — Huffman + IDCT, the full T.81 baseline pipeline). The
only codecs still STUBBED genuinely need an external library: WEBP (VP8),
JPEG's progressive/arithmetic processes, ADPCM/MP3 audio.
``decode_stub=True`` computes deterministic features from raw bytes,
``decode_stub=False`` raises ``NotImplementedError`` where a real
PIL/libav call would go.

Scale note: binary payloads ride the Arrow batches; feature extraction is a
``mapInPandas`` pass (no shuffle), so throughput is bounded by IO + codec,
never by row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the feature extractor — fixed, engine-owned.
FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, magic int, content_type string"


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Model a multimodal table: content as ``binary`` + metadata struct.
    (Fixtures carry text; a real corpus reads ``binaryFile`` / parquet
    binary columns — the downstream plumbing is identical.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("content_type"),
        F.length(payload).alias("n_bytes"),
    )
    return df.select(F.col(id_col), payload.alias("content"), meta.alias("meta"))


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    With ``decode_stub`` the "decode" is a deterministic byte-level feature
    set (payload size + magic byte); without it, the call site where a real
    codec (PIL / torchaudio / pyav) would run raises ``NotImplementedError``
    so the gap is explicit, not silent.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real codec decode (PIL/libav) not available in this environment"
                )
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": content.map(len).astype("int64"),
                    "magic": content.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "content_type": pdf["meta"].map(lambda m: m["content_type"]),
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


#: Output schema of the frame sampler — one row per sampled frame.
FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, n_frames bigint, frame_bytes binary"


def sample_frames(
    df: DataFrame, frame_size: int = 1000, every: int = 4, decode_stub: bool = True
) -> DataFrame:
    """Video-style frame sampling: 1→N fan-out inside ``mapInPandas`` (one
    output row per sampled frame). The stub treats the payload as fixed-size
    frames of ``frame_size`` bytes and keeps every ``every``-th; a real
    implementation would hand the container to pyav and decode keyframes.
    The Arrow batch shape (variable rows out per row in) is exactly what a
    real demuxer produces, so the plumbing is load-bearing even stubbed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real demuxer (pyav) not available in this environment")
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "n_frames": [], "frame_bytes": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                n_frames = len(content) // frame_size + 1
                for idx in range(0, n_frames, every):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["n_frames"].append(n_frames)
                    out["frame_bytes"].append(bytes(content[idx * frame_size : (idx + 1) * frame_size]))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


#: Magic prefixes of compressed image codecs this container cannot decode.
#: Now EMPTY: PNG left when the spec-written zlib decoder landed; GIF when
#: the LZW coder did; JPEG with the baseline T.81 codec (llm/jpeg.py);
#: WEBP-lossless with the VP8L decoder (llm/webp.py). The remaining gaps
#: (lossy VP8, progressive JPEG) gate loudly INSIDE their decoders.
_COMPRESSED_MAGIC = ()


def _decode_rgb(b: bytes):
    """REAL image decode, no codec dependency: P6 PPM, 24-bit BI_RGB BMP,
    PNG (stdlib zlib inflate + spec-written filter reconstruction —
    ``decode_png`` below), GIF (fully spec-written including the LZW
    entropy coder — ``decode_gif``), or baseline JPEG (spec-written T.81
    Huffman+IDCT pipeline, ``llm/jpeg.py``) → ``(h, w, 3)`` uint8 array
    (RGB channel order; gray replicates, alpha drops). Returns None for
    anything malformed (callers choose quarantine vs fallback). The
    env-gated stub is now ONLY for WEBP (VP8); JPEG's progressive/
    arithmetic/12-bit coding processes gate loudly inside decode_jpeg."""
    import numpy as np

    if b.startswith(b"GIF8"):
        return decode_gif(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from .webp import decode_webp

        img = decode_webp(b)  # lossy VP8 raises its gate from inside
        if img is None:
            return None
        return np.ascontiguousarray(img[:, :, :3])
    if b.startswith((b"II*\x00", b"MM\x00*")):
        from .tiff import decode_tiff

        img = decode_tiff(b)
        if img is None:
            return None
        return np.repeat(img, 3, axis=2) if img.shape[2] == 1 else img
    if b.startswith(b"\xff\xd8"):
        from .jpeg import decode_jpeg

        img = decode_jpeg(b)
        if img is None:
            return None
        return np.repeat(img, 3, axis=2) if img.shape[2] == 1 else img
    if b.startswith(_PNG_SIG[:4]):
        img = decode_png(b)
        if img is None:
            return None
        c = img.shape[2]
        if c == 1:
            return np.repeat(img, 3, axis=2)
        if c == 2:  # gray + alpha: replicate luma, drop alpha
            return np.repeat(img[:, :, :1], 3, axis=2)
        if c == 4:
            return np.ascontiguousarray(img[:, :, :3])
        return img
    if b.startswith(b"P6"):
        fields, i = [], 2
        while len(fields) < 3 and i < len(b):
            while i < len(b) and b[i : i + 1].isspace():
                i += 1
            if b[i : i + 1] == b"#":
                while i < len(b) and b[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < len(b) and not b[j : j + 1].isspace():
                j += 1
            fields.append(b[i:j])
            i = j
        if len(fields) < 3:
            return None
        try:
            w, h, maxval = (int(x) for x in fields)
        except ValueError:
            return None
        i += 1
        px = b[i : i + w * h * 3]
        if maxval != 255 or w <= 0 or h <= 0 or len(px) != w * h * 3:
            return None
        return np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    if b.startswith(b"BM") and len(b) >= 54:
        # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40): pixel offset at 10,
        # w/h at 18/22, bpp at 28, compression at 30. Rows bottom-up, BGR,
        # padded to 4 bytes.
        off = int.from_bytes(b[10:14], "little")
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        bpp = int.from_bytes(b[28:30], "little")
        comp = int.from_bytes(b[30:34], "little")
        if bpp != 24 or comp != 0 or w <= 0 or h == 0:
            return None
        flip, h = h > 0, abs(h)
        stride = (w * 3 + 3) & ~3
        px = b[off : off + stride * h]
        if len(px) != stride * h:
            return None
        rows = np.frombuffer(px, dtype=np.uint8).reshape(h, stride)[:, : w * 3]
        img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
        return img[::-1] if flip else img
    return None


def encode_ppm(img) -> bytes:
    """Re-encode an ``(h, w, 3)`` uint8 RGB array as binary P6 — the
    deterministic, dependency-free interchange output of the resize path."""
    h, w = img.shape[0], img.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def resize_images(
    df: DataFrame, width: int = 32, height: int = 32, decode_stub: bool = True
) -> DataFrame:
    """Image resize: 1→1 binary transform with new typed metadata.

    Decodable payloads (P6 PPM / 24-bit BMP / PNG / GIF / baseline JPEG)
    decode FOR REAL: nearest-neighbor resample (``src = floor(dst *
    in/out)``, the exact arithmetic the oracle reproduces in SQL) and
    re-encode as P6. WEBP (VP8 — the one codec left needing an external
    library) raises ``NotImplementedError`` —
    that is where a PIL/turbojpeg call goes and this container has none.
    Opaque non-image payloads keep the deterministic byte-tiling fallback
    (``decode_stub=True``) or raise (``decode_stub=False``)."""
    import numpy as np

    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(b: bytes) -> bytes:
                b = bytes(b)
                img = _decode_rgb(b)
                if img is not None:
                    h, w = img.shape[0], img.shape[1]
                    # Pure integer floor(dst*in/out) — float division could
                    # round differently from the SQL oracle's integer form
                    # at extreme dimensions (ADVICE r4).
                    yi = (np.arange(height, dtype=np.int64) * h) // height
                    xi = (np.arange(width, dtype=np.int64) * w) // width
                    return encode_ppm(np.ascontiguousarray(img[yi][:, xi]))
                if b.startswith(_COMPRESSED_MAGIC):
                    raise NotImplementedError(
                        "compressed codec decode (PIL/turbojpeg) not available"
                    )
                if not decode_stub:
                    raise NotImplementedError(
                        "real codec (PIL) not available in this environment"
                    )
                if not b:
                    return bytes(target)
                reps = -(-target // len(b))
                return (b * reps)[:target]

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": pdf["content"].map(one),
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(run, schema="doc_id bigint, content binary, width int, height int")


#: PCM framing geometry: 16-bit mono windows the VAD/silence-trim pass uses.
PCM_FRAME, PCM_STRIDE = 256, 128


def pcm_frame_energy(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    frame: int = PCM_FRAME,
    stride: int = PCM_STRIDE,
) -> DataFrame:
    """REAL audio-shaped compute with no codec dependency: treat the binary
    column as 16-bit little-endian mono PCM, cut overlapping frames, and
    emit per-frame energy — the voice-activity / silence-trim signal an
    audio curation pipeline thresholds on. Unlike the stubbed image/video
    decoders, int16 decoding IS byte arithmetic, so this path runs for
    real: numpy ``frombuffer`` per Arrow batch, a strided window view, and
    an exact int64 sum of squares per frame (|sample| < 2^15 → frame sums
    < 2^38 — combine-order independent). mapInPandas 1→N fan-out, no
    shuffle; output rows are (id, frame_idx, n_samples, energy)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, nsamp, energy = [], [], [], []
            for i, buf in zip(pdf[id_col], pdf[content_col]):
                b = bytes(buf)
                x = np.frombuffer(b[: len(b) - (len(b) % 2)], dtype="<i2").astype(
                    np.int64
                )
                if len(x) == 0:
                    continue
                k = 0
                for start in range(0, max(len(x) - frame, 0) + 1, stride):
                    w = x[start : start + frame]
                    ids.append(i)
                    fidx.append(k)
                    nsamp.append(len(w))
                    energy.append(int((w * w).sum()))
                    k += 1
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "n_samples": pd.Series(nsamp, dtype="int32"),
                    "energy": pd.Series(energy, dtype="int64"),
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(content_col)).mapInPandas(
        run, schema="doc_id bigint, frame_idx int, n_samples int, energy bigint"
    )


def ppm_image_stats(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """REAL image-path compute with no codec dependency: binary P6 PPM
    (uncompressed RGB — the interchange format every imaging tool writes)
    parsed per Arrow batch: header → (width, height), pixel block → exact
    int64 per-channel sums. This is the real shape of an image-curation
    stats pass (resolution filter, black/blank-frame detection, channel
    balance); for compressed formats the numpy block is swapped for a
    PIL/turbojpeg call (env-gated stub, extract_features). Malformed
    payloads produce ok=false rows instead of failing the batch —
    quarantine semantics, one row per input either way. mapInPandas, no
    shuffle."""
    import numpy as np

    def parse(b: bytes):
        # P6 header: magic, whitespace-separated width/height/maxval, one
        # whitespace, then width*height*3 raw bytes.
        if not b.startswith(b"P6"):
            return None
        fields, i = [], 2
        while len(fields) < 3 and i < len(b):
            while i < len(b) and b[i : i + 1].isspace():
                i += 1
            if b[i : i + 1] == b"#":  # comment line
                while i < len(b) and b[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < len(b) and not b[j : j + 1].isspace():
                j += 1
            fields.append(b[i:j])
            i = j
        if len(fields) < 3:
            return None
        try:
            w, h, maxval = (int(x) for x in fields)
        except ValueError:
            return None
        i += 1  # single whitespace after maxval
        px = b[i : i + w * h * 3]
        if maxval != 255 or len(px) != w * h * 3 or w <= 0 or h <= 0:
            return None
        return w, h, np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "ok": [], "width": [], "height": [],
                "sum_r": [], "sum_g": [], "sum_b": [],
            }
            for i, buf in zip(pdf[id_col], pdf[content_col]):
                parsed = parse(bytes(buf))
                out["doc_id"].append(i)
                if parsed is None:
                    out["ok"].append(False)
                    for c in ("width", "height", "sum_r", "sum_g", "sum_b"):
                        out[c].append(0)
                    continue
                w, h, px = parsed
                s = px.astype(np.int64).sum(axis=(0, 1))
                out["ok"].append(True)
                out["width"].append(w)
                out["height"].append(h)
                out["sum_r"].append(int(s[0]))
                out["sum_g"].append(int(s[1]))
                out["sum_b"].append(int(s[2]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "ok": pd.Series(out["ok"], dtype="bool"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "sum_r": pd.Series(out["sum_r"], dtype="int64"),
                    "sum_g": pd.Series(out["sum_g"], dtype="int64"),
                    "sum_b": pd.Series(out["sum_b"], dtype="int64"),
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(content_col)).mapInPandas(
        run,
        schema="doc_id bigint, ok boolean, width int, height int, "
        "sum_r bigint, sum_g bigint, sum_b bigint",
    )


def mux_wav(samples, rate: int = 8000) -> bytes:
    """Build a canonical RIFF/WAVE container around ``(n, channels)`` int16
    samples — the writer half of :func:`demux_wav`, used by fixtures and
    tests. Includes a LIST/INFO chunk before ``fmt `` so a reader that
    assumes fixed offsets (instead of walking chunks) breaks loudly."""
    import numpy as np

    x = np.asarray(samples, dtype="<i2")
    if x.ndim == 1:
        x = x[:, None]
    ch = x.shape[1]
    block = ch * 2
    data = x.tobytes()
    fmt = (
        (1).to_bytes(2, "little")  # PCM
        + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = (
        b"LIST" + (4).to_bytes(4, "little") + b"INFO"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF chunks are word-aligned
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


#: Standard GUID suffix of WAVE_FORMAT_EXTENSIBLE SubFormat (the first two
#: bytes carry the wrapped format tag).
_WAVE_EXT_GUID_TAIL = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


def mux_wav_fmt(
    data: bytes, fmt_tag: int, channels: int, rate: int = 8000, bits: int = 16,
    *, extensible: bool = False,
) -> bytes:
    """Raw-format WAV writer (fixture sibling of ``mux_wav``): wrap an
    already-coded ``data`` payload in a RIFF/WAVE container with the given
    format tag / channel count / bit depth. With ``extensible`` the fmt
    chunk is written as WAVE_FORMAT_EXTENSIBLE wrapping ``fmt_tag`` in the
    SubFormat GUID — exercising the 0xFFFE re-dispatch path."""
    block = max(1, channels * ((bits + 7) // 8))
    if extensible:
        fmt = (
            (0xFFFE).to_bytes(2, "little") + channels.to_bytes(2, "little")
            + rate.to_bytes(4, "little") + (rate * block).to_bytes(4, "little")
            + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
            + (22).to_bytes(2, "little") + bits.to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + fmt_tag.to_bytes(2, "little") + _WAVE_EXT_GUID_TAIL
        )
    else:
        fmt = (
            fmt_tag.to_bytes(2, "little") + channels.to_bytes(2, "little")
            + rate.to_bytes(4, "little") + (rate * block).to_bytes(4, "little")
            + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
        )
    chunks = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def _g711_ulaw_decode(u):
    """G.711 µ-law byte → int16, vectorized (the public-spec expansion:
    complement, 3-bit exponent, 4-bit mantissa, 0x84 bias)."""
    import numpy as np

    u = (~np.asarray(u, dtype=np.int64)) & 0xFF
    mag = ((((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)) - 0x84
    return np.where(u & 0x80, -mag, mag).astype("<i2")


def _g711_alaw_decode(a):
    """G.711 A-law byte → int16, vectorized (0x55 toggle, segment 0 is
    linear, segments 1..7 shift a 0x108-biased mantissa)."""
    import numpy as np

    a = np.asarray(a, dtype=np.int64) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    mag = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, mag, -mag).astype("<i2")


def demux_wav(b: bytes):
    """Pure-Python RIFF/WAVE demuxer (VERDICT r4 task 5): walk the chunk
    list (word-aligned sizes, unknown chunks skipped), validate ``fmt ``,
    and de-interleave ``data`` into an ``(n, channels)`` int16 array.
    Returns ``(rate, channels, samples)``, or ``None`` for non-RIFF/WAVE
    or otherwise-corrupt bytes.

    Every sample coding with a published byte-level formula now decodes
    FOR REAL — no library needed: integer PCM at 8 (unsigned, rebiased) /
    16 / 24 / 32 bits (wide depths keep the top 16 bits, the demuxer's
    fixed output resolution), IEEE float 32/64 (0x0003 — clipped to
    [-1, 1] and scaled to ±32767, ties-to-even like numpy), G.711
    A-law/µ-law (0x0006/0x0007 — exact table expansion), and
    WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolved through its SubFormat GUID
    and re-dispatched. Only genuinely compressed codecs still raise
    ``NotImplementedError``: MS/IMA ADPCM (0x0002/0x0011) and MP3-in-WAV
    (0x0055). UNKNOWN tags — and known tags at bit depths the format
    never uses — are treated as corrupt fmt chunks and quarantined
    (``None``), so a bit-flipped header in an otherwise-fine corpus never
    fails the whole job (ADVICE r5)."""
    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, fmt, data = 12, None, None
    while i + 8 <= len(b):
        cid, size = b[i : i + 4], int.from_bytes(b[i + 4 : i + 8], "little")
        payload = b[i + 8 : i + 8 + size]
        if len(payload) < size:
            return None  # truncated chunk
        if cid == b"fmt ":
            fmt = payload
        elif cid == b"data":
            data = payload
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if channels < 1:
        return None
    if audio_format == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the real tag rides the SubFormat GUID.
        if len(fmt) < 40 or fmt[26:40] != _WAVE_EXT_GUID_TAIL:
            return None
        audio_format = int.from_bytes(fmt[24:26], "little")
        if audio_format == 0xFFFE:
            return None

    def frames(raw: bytes, sample_bytes: int):
        block = channels * sample_bytes
        return raw[: len(raw) - (len(raw) % block)]

    if audio_format == 0x0001:  # integer PCM
        if bits == 16:
            x = np.frombuffer(frames(data, 2), dtype="<i2").reshape(-1, channels)
        elif bits == 8:  # unsigned, 0x80-biased
            u = np.frombuffer(frames(data, 1), dtype=np.uint8).reshape(-1, channels)
            x = ((u.astype(np.int16) - 128) << 8).astype("<i2")
        elif bits == 24:
            raw = np.frombuffer(frames(data, 3), dtype=np.uint8).reshape(-1, 3)
            # top 16 of the signed 24-bit value = the upper two bytes
            x = raw[:, 1:].copy().view("<i2").reshape(-1, channels)
        elif bits == 32:
            w = np.frombuffer(frames(data, 4), dtype="<i4").reshape(-1, channels)
            x = (w >> 16).astype("<i2")
        else:
            return None  # PCM never uses this depth: corrupt header
    elif audio_format == 0x0003:  # IEEE float
        if bits == 32:
            f = np.frombuffer(frames(data, 4), dtype="<f4").reshape(-1, channels)
        elif bits == 64:
            f = np.frombuffer(frames(data, 8), dtype="<f8").reshape(-1, channels)
        else:
            return None
        f = np.nan_to_num(f.astype(np.float64), nan=0.0)
        x = np.round(np.clip(f, -1.0, 1.0) * 32767.0).astype("<i2")
    elif audio_format in (0x0006, 0x0007):  # G.711 A-law / µ-law
        if bits != 8:
            return None
        u = np.frombuffer(frames(data, 1), dtype=np.uint8).reshape(-1, channels)
        x = (_g711_alaw_decode if audio_format == 0x0006 else _g711_ulaw_decode)(u)
    elif audio_format == 0x0011:  # IMA ADPCM: formula-specified, decoded for real
        if bits != 4 or len(fmt) < 20:
            return None
        block_align = int.from_bytes(fmt[12:14], "little")
        samples_per_block = int.from_bytes(fmt[18:20], "little")
        x = ima_adpcm_decode(data, channels, block_align, samples_per_block)
        if x is None:
            return None
    elif audio_format == 0x0002:  # MS ADPCM: formula-specified, decoded for real
        if bits != 4 or len(fmt) < 20:
            return None
        block_align = int.from_bytes(fmt[12:14], "little")
        samples_per_block = int.from_bytes(fmt[18:20], "little")
        x = ms_adpcm_decode(data, channels, block_align, samples_per_block)
        if x is None:
            return None
    elif audio_format == 0x0055:
        # MP3-in-WAV: the one genuinely library-bound audio coding left.
        raise NotImplementedError(
            "WAV format tag 0x0055 (MP3) is a compressed codec "
            "(libav/soundfile) — not available in this environment"
        )
    else:
        return None
    return rate, channels, x


def wav_frame_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    frame: int = 128,
    stride: int = 128,
) -> DataFrame:
    """Per-(channel, window) audio features over RIFF/WAVE payloads: demux
    (:func:`demux_wav`), cut frames of ``frame`` samples every ``stride``,
    and emit exact-integer energy (sum of squares, < 2^38 per frame — no
    float, combine-order free) and zero-crossing counts (transitions of the
    ``x < 0`` predicate between consecutive samples) — the VAD / silence
    trim / speech-music signals an audio curation pass thresholds on.

    ``sample_frames``-style 1→N fan-out inside one Arrow-batched
    ``mapInPandas`` pass: no shuffle, no Python row path, output rows are
    (id, channel, frame_idx, n_samples, energy, zero_crossings). Non-WAV
    payloads are skipped (quarantine-by-omission, like malformed frames in
    ``sample_frames``); non-PCM WAVs propagate the demuxer's explicit
    ``NotImplementedError``."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, chs, fidx, nsamp, energy, zc = [], [], [], [], [], []
            for i, buf in zip(pdf[id_col], pdf[content_col]):
                parsed = demux_wav(bytes(buf))
                if parsed is None:
                    continue
                _rate, channels, x = parsed
                x64 = x.astype(np.int64)
                for c in range(channels):
                    s = x64[:, c]
                    if len(s) == 0:
                        continue
                    k = 0
                    for start in range(0, max(len(s) - frame, 0) + 1, stride):
                        w = s[start : start + frame]
                        neg = w < 0
                        ids.append(i)
                        chs.append(c)
                        fidx.append(k)
                        nsamp.append(len(w))
                        energy.append(int((w * w).sum()))
                        zc.append(int((neg[1:] != neg[:-1]).sum()))
                        k += 1
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "channel": pd.Series(chs, dtype="int32"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "n_samples": pd.Series(nsamp, dtype="int32"),
                    "energy": pd.Series(energy, dtype="int64"),
                    "zero_crossings": pd.Series(zc, dtype="int64"),
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(content_col)).mapInPandas(
        run,
        schema="doc_id bigint, channel int, frame_idx int, n_samples int, "
        "energy bigint, zero_crossings bigint",
    )


def _bgr_rows(frame) -> bytes:
    """One DIB bitmap payload from an ``(h, w, 3)`` uint8 RGB frame:
    bottom-up rows, BGR order, each row padded to a 4-byte boundary —
    the pixel layout shared by BMP files and AVI ``00db`` chunks."""
    import numpy as np

    h, w = frame.shape[0], frame.shape[1]
    stride = (w * 3 + 3) & ~3
    bgr = frame[::-1, :, ::-1]  # bottom-up, RGB -> BGR
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return rows.tobytes()


def _rows_to_rgb(payload: bytes, w: int, h: int):
    """Inverse of :func:`_bgr_rows`: bottom-up padded BGR rows → RGB array,
    or None when the payload length does not match the geometry."""
    import numpy as np

    stride = (w * 3 + 3) & ~3
    if len(payload) != stride * h:
        return None
    rows = np.frombuffer(payload, dtype=np.uint8).reshape(h, stride)[:, : w * 3]
    return rows.reshape(h, w, 3)[:, :, ::-1][::-1]


def mux_avi(frames, usec_per_frame: int = 40_000, audio=None, rate: int = 8000) -> bytes:
    """Build a canonical RIFF/AVI container around ``(n, h, w, 3)`` uint8
    RGB frames as uncompressed 24-bit DIB video — the writer half of
    :func:`demux_avi`, used by fixtures and tests. Structure per the
    public AVI RIFF form: LIST hdrl (avih + LIST strl (strh 'vids'/'DIB '
    + strf BITMAPINFOHEADER)) then LIST movi with one ``00db`` chunk per
    frame. A JUNK chunk of ODD size leads the movi list so a reader that
    skips word alignment breaks loudly (same trap as mux_wav's LIST).

    With ``audio`` (an ``(n_samples, channels)`` int16 matrix) the
    container gains a SECOND stream — 'auds' strl (strh + WAVEFORMATEX
    strf, 16-bit PCM at ``rate``) as stream 01 — and the movi list
    interleaves one ``01wb`` chunk per video frame period, the real A/V
    interleave shape. Readers must then select by stream NUMBER, not
    just take every data chunk (:func:`demux_avi_audio`)."""
    import numpy as np

    x = np.asarray(frames, dtype=np.uint8)
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    stride = (w * 3 + 3) & ~3

    def u32(v):
        return int(v).to_bytes(4, "little")

    def u16(v):
        return int(v).to_bytes(2, "little")

    def chunk(cid, payload):
        return cid + u32(len(payload)) + payload + (b"\x00" if len(payload) % 2 else b"")

    def lst(ltype, payload):
        return chunk(b"LIST", ltype + payload)

    n_streams = 1 if audio is None else 2
    avih = (
        u32(usec_per_frame) + u32(0) + u32(0) + u32(0)  # usec/frame, maxbps, pad, flags
        + u32(n) + u32(0) + u32(n_streams) + u32(stride * h)  # frames, initial, streams, bufsz
        + u32(w) + u32(h) + u32(0) * 4  # width, height, reserved[4]
    )
    strh = (
        b"vids" + b"DIB " + u32(0) + u16(0) + u16(0)  # type, handler, flags, prio, lang
        + u32(0) + u32(usec_per_frame) + u32(1_000_000)  # initial, scale, rate
        + u32(0) + u32(n) + u32(stride * h) + u32(0xFFFFFFFF)  # start, len, bufsz, quality
        + u32(0) + u16(0) + u16(0) + u16(w) + u16(h)  # samplesize, rcFrame
    )
    strf = (
        u32(40) + u32(w) + u32(h) + u16(1) + u16(24)  # biSize..biBitCount (h>0: bottom-up)
        + u32(0) + u32(stride * h) + u32(0) * 4  # BI_RGB, image size, resolution/clr
    )
    strls = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    audio_chunks = b""
    if audio is not None:
        a = np.asarray(audio, dtype="<i2")
        if a.ndim == 1:
            a = a[:, None]
        ch = a.shape[1]
        block = ch * 2
        astrh = (
            b"auds" + b"\x00" * 4 + u32(0) + u16(0) + u16(0)  # type, handler, flags...
            + u32(0) + u32(1) + u32(rate)  # initial, scale, rate (samples/s)
            + u32(0) + u32(a.shape[0]) + u32(0) + u32(0xFFFFFFFF)
            + u32(block) + u16(0) * 4
        )
        astrf = (  # WAVEFORMATEX sans cbSize: PCM, ch, rate, byterate, block, bits
            u16(1) + u16(ch) + u32(rate) + u32(rate * block) + u16(block) + u16(16)
        )
        strls += lst(b"strl", chunk(b"strh", astrh) + chunk(b"strf", astrf))
        per = -(-a.shape[0] // max(n, 1))  # samples per video frame period
        audio_chunks = [
            chunk(b"01wb", a[f * per : (f + 1) * per].tobytes()) for f in range(n)
        ]
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strls)
    movi_body = chunk(b"JUNK", b"odd")  # odd size: word-alignment trap
    index = []  # (chunk_id, offset of the chunk fourcc from the 'movi' fourcc, size)
    for f in range(n):
        payload = _bgr_rows(x[f])
        index.append((b"00db", 4 + len(movi_body), len(payload)))
        movi_body += chunk(b"00db", payload)
        if audio_chunks:
            index.append((b"01wb", 4 + len(movi_body), len(audio_chunks[f][8:])))
            movi_body += audio_chunks[f]
    # idx1: the standard random-access index — one AVIINDEXENTRY per data
    # chunk (id, AVIIF_KEYFRAME, movi-relative offset of the fourcc, size)
    idx1 = b"".join(cid + u32(0x10) + u32(off) + u32(sz) for cid, off, sz in index)
    body = b"AVI " + hdrl + lst(b"movi", movi_body) + chunk(b"idx1", idx1)
    return b"RIFF" + u32(len(body)) + body


def _walk_chunks(b: bytes, i: int, end: int):
    """Collect [(chunk_id, payload), ...] over a RIFF chunk span, honoring
    word alignment. Returns None — not a partial list — when any chunk's
    declared size overruns the span, so corrupt interiors quarantine the
    whole file instead of silently parsing a prefix (a generator here
    would stop early and hand callers a plausible-but-wrong parse)."""
    out = []
    while i + 8 <= end:
        cid, size = b[i : i + 4], int.from_bytes(b[i + 4 : i + 8], "little")
        payload = b[i + 8 : i + 8 + size]
        if len(payload) < size:
            return None  # truncated chunk — caller quarantines the file
        out.append((cid, payload))
        i += 8 + size + (size % 2)
    return out


#: AVI video fourccs / BITMAPINFOHEADER biCompression values this container
#: genuinely cannot decode (real codecs) — the explicit env-gate set, like
#: the WAV coded-format tags. Everything ELSE non-BI_RGB is treated as a
#: corrupt header and quarantined (None).
_KNOWN_VIDEO_CODECS = {b"MJPG", b"mjpg", b"XVID", b"xvid", b"H264", b"h264",
                       b"DIVX", b"divx", b"FMP4", b"IV50", b"cvid"}
_KNOWN_BI_COMPRESSION = {1, 2, 3}  # RLE8, RLE4, BITFIELDS


def demux_avi(b: bytes):
    """Pure-Python RIFF/AVI demuxer (VERDICT r5 task 5) reusing the r5 WAV
    chunk-walk pattern: walk LIST hdrl → avih / LIST strl (strh+strf),
    locate the 'vids' stream, validate uncompressed 24-bit BI_RGB, then
    collect that stream's ``NNdb``/``NNdc`` frame chunks from LIST movi
    and decode each as bottom-up padded BGR rows (shared with the BMP
    path). Returns ``(width, height, usec_per_frame, frames)`` with
    ``frames`` an ``(n, h, w, 3)`` uint8 RGB array, or ``None`` for
    non-AVI / corrupt bytes. KNOWN codec fourccs (MJPG/XVID/H264...) and
    BI_* compressed bitmap modes raise ``NotImplementedError`` — the
    honest env-gate (no libav in this container); unknown garbage
    quarantines as None, so one bit-flipped header never fails a corpus
    job."""
    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    usec, n_streams, vids_idx, stream_no = None, 0, None, 0
    w = h = None
    frame_payloads: list[bytes] = []

    def walk_list(payload):
        nonlocal usec, n_streams, vids_idx, stream_no, w, h
        ltype, body = payload[:4], payload[4:]
        it = _walk_chunks(payload, 4, len(payload))
        if it is None:
            return False
        if ltype == b"strl":
            # one strl per stream, in stream order
            my_no = stream_no
            stream_no += 1
            strh = strf = None
            for cid, pl in it:
                if cid == b"strh":
                    strh = pl
                elif cid == b"strf":
                    strf = pl
            if strh is None or len(strh) < 8:
                return False
            if strh[:4] != b"vids":
                return True  # audio/text stream: ignore, keep walking
            if vids_idx is not None:
                return True  # first video stream wins
            handler = strh[4:8]
            if handler in _KNOWN_VIDEO_CODECS:
                raise NotImplementedError(
                    f"AVI video codec {handler!r} needs a real decoder "
                    "(libav) — not available in this environment"
                )
            if strf is None or len(strf) < 40:
                return False
            bw = int.from_bytes(strf[4:8], "little", signed=True)
            bh = int.from_bytes(strf[8:12], "little", signed=True)
            bits = int.from_bytes(strf[14:16], "little")
            comp = int.from_bytes(strf[16:20], "little")
            if comp != 0 or bits != 24:
                if comp in _KNOWN_BI_COMPRESSION or strf[16:20] in _KNOWN_VIDEO_CODECS:
                    raise NotImplementedError(
                        f"AVI bitmap compression {comp}/{bits}-bit needs a real "
                        "decoder — not available in this environment"
                    )
                return False
            if bw <= 0 or bh <= 0:
                return False
            w, h, vids_idx = bw, bh, my_no
            return True
        for cid, pl in it:
            if cid == b"LIST":
                if walk_list(pl) is False:
                    return False
            elif cid == b"avih" and len(pl) >= 4:
                usec = int.from_bytes(pl[:4], "little")
            elif (
                len(cid) == 4
                and cid[2:4] in (b"db", b"dc")
                and cid[:2].isdigit()
                and vids_idx is not None
                and int(cid[:2]) == vids_idx
            ):
                frame_payloads.append(pl)
        return True

    it = _walk_chunks(b, 12, len(b))
    if it is None:
        return None
    try:
        for cid, pl in it:
            if cid == b"LIST":
                if walk_list(pl) is False:
                    return None
    except RecursionError:
        return None
    if w is None or h is None or usec is None:
        return None
    frames = []
    for pl in frame_payloads:
        f = _rows_to_rgb(pl, w, h)
        if f is None:
            return None  # geometry mismatch: corrupt file
        frames.append(f)
    if not frames:
        return None
    return w, h, usec, np.stack(frames)


def demux_avi_audio(b: bytes):
    """Audio-track demux from a RIFF/AVI container: locate the 'auds'
    stream among the strl lists (selecting by stream NUMBER — an A/V file
    interleaves ``00db`` video and ``01wb`` audio chunks and a reader
    that grabs every data chunk gets garbage), validate 16-bit integer
    PCM via the WAVEFORMATEX strf (same tag policy as :func:`demux_wav`:
    KNOWN coded tags env-gate with ``NotImplementedError``, unknown
    garbage quarantines as None), concatenate that stream's ``NNwb``
    payloads in movi order, and de-interleave. Returns ``(rate,
    channels, samples)`` with ``samples`` an ``(n, channels)`` int16
    array, or ``None`` for non-AVI / corrupt / audio-less files.

    Deliberately independent of :func:`demux_avi`'s video validation: an
    MJPG-video + PCM-audio container must still yield its audio (and
    vice versa a DIB-video + MP3-audio file still yields frames)."""
    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    auds_idx, stream_no = None, 0
    rate = channels = None
    payloads: list[bytes] = []

    def walk_list(payload):
        nonlocal auds_idx, stream_no, rate, channels
        ltype = payload[:4]
        it = _walk_chunks(payload, 4, len(payload))
        if it is None:
            return False
        if ltype == b"strl":
            my_no = stream_no
            stream_no += 1
            strh = strf = None
            for cid, pl in it:
                if cid == b"strh":
                    strh = pl
                elif cid == b"strf":
                    strf = pl
            if strh is None or len(strh) < 8:
                return False
            if strh[:4] != b"auds":
                return True  # video/text stream: ignore, keep walking
            if auds_idx is not None:
                return True  # first audio stream wins
            if strf is None or len(strf) < 16:
                return False
            tag = int.from_bytes(strf[0:2], "little")
            ch = int.from_bytes(strf[2:4], "little")
            sr = int.from_bytes(strf[4:8], "little")
            bits = int.from_bytes(strf[14:16], "little")
            if tag != 1 or bits != 16:
                known_coded = {0x0003, 0x0006, 0x0007, 0x0055, 0xFFFE}
                if tag in known_coded or (tag == 1 and bits in (8, 24, 32)):
                    raise NotImplementedError(
                        f"AVI audio format 0x{tag:04x}/{bits}-bit needs a real "
                        "audio codec — not available in this environment"
                    )
                return False
            if ch < 1:
                return False
            rate, channels, auds_idx = sr, ch, my_no
            return True
        for cid, pl in it:
            if cid == b"LIST":
                if walk_list(pl) is False:
                    return False
            elif (
                len(cid) == 4
                and cid[2:4] == b"wb"
                and cid[:2].isdigit()
                and auds_idx is not None
                and int(cid[:2]) == auds_idx
            ):
                payloads.append(pl)
        return True

    it = _walk_chunks(b, 12, len(b))
    if it is None:
        return None
    try:
        for cid, pl in it:
            if cid == b"LIST":
                if walk_list(pl) is False:
                    return None
    except RecursionError:
        return None
    if auds_idx is None or not payloads:
        return None
    data = b"".join(payloads)
    block = channels * 2
    usable = len(data) - (len(data) % block)
    x = np.frombuffer(data[:usable], dtype="<i2").reshape(-1, channels)
    return rate, channels, x


def avi_frame_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-frame video features over RIFF/AVI payloads: demux
    (:func:`demux_avi`), then per frame emit exact-int64 channel sums
    (r/g/b — the brightness/color-cast signals an image curation pass
    thresholds on) and the sum of absolute differences vs the previous
    frame (``delta_sad`` — the classic scene-cut / static-clip detector;
    NULL for frame 0). 1→N fan-out inside one Arrow-batched mapInPandas
    pass, no shuffle, no Python row path outside the batch loop. Non-AVI
    payloads are skipped (quarantine-by-omission); known compressed codecs
    propagate the demuxer's explicit ``NotImplementedError``."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, hs, ws, rs, gs, bs, sad = [], [], [], [], [], [], [], []
            for i, buf in zip(pdf[id_col], pdf[content_col]):
                parsed = demux_avi(bytes(buf))
                if parsed is None:
                    continue
                w, h, _usec, frames = parsed
                x = frames.astype(np.int64)
                sums = x.sum(axis=(1, 2))  # (n, 3)
                deltas = np.abs(x[1:] - x[:-1]).sum(axis=(1, 2, 3))
                for f in range(x.shape[0]):
                    ids.append(i)
                    fidx.append(f)
                    hs.append(h)
                    ws.append(w)
                    rs.append(int(sums[f, 0]))
                    gs.append(int(sums[f, 1]))
                    bs.append(int(sums[f, 2]))
                    sad.append(None if f == 0 else int(deltas[f - 1]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "h": pd.Series(hs, dtype="int32"),
                    "w": pd.Series(ws, dtype="int32"),
                    "r_sum": pd.Series(rs, dtype="int64"),
                    "g_sum": pd.Series(gs, dtype="int64"),
                    "b_sum": pd.Series(bs, dtype="int64"),
                    "delta_sad": pd.Series(sad, dtype="Int64"),
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(content_col)).mapInPandas(
        run,
        schema="doc_id bigint, frame_idx int, h int, w int, "
        "r_sum bigint, g_sum bigint, b_sum bigint, delta_sad bigint",
    )


def av_sync_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Aligned audio+video features from ONE interleaved A/V container:
    demux both streams (:func:`demux_avi` + :func:`demux_avi_audio`),
    split the audio track into per-video-frame windows (the mux's
    interleave period: ceil(n_samples / n_frames)), and emit one row per
    frame with the exact int64 pixel sum, SAD delta vs the previous frame
    (NULL on frame 0), and the aligned window's audio energy — the
    soundtrack-aware scene table an A/V curation pass joins against
    (silent scene cuts, talking-head detection). One Arrow-batched
    mapInPandas pass, 1→N fan-out, no shuffle. Files missing either
    stream (or corrupt) quarantine by omission; known compressed codecs
    in EITHER stream propagate ``NotImplementedError``."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, psum, sad, aen = [], [], [], [], []
            for i, buf in zip(pdf[id_col], pdf[content_col]):
                b = bytes(buf)
                vid = demux_avi(b)
                aud = demux_avi_audio(b)
                if vid is None or aud is None:
                    continue
                _w, _h, _usec, frames = vid
                _rate, _ch, samples = aud
                x = frames.astype(np.int64)
                a = samples.astype(np.int64)
                n = x.shape[0]
                per = -(-a.shape[0] // max(n, 1))
                sums = x.sum(axis=(1, 2, 3))
                deltas = np.abs(x[1:] - x[:-1]).sum(axis=(1, 2, 3))
                for f in range(n):
                    w = a[f * per : (f + 1) * per]
                    ids.append(i)
                    fidx.append(f)
                    psum.append(int(sums[f]))
                    sad.append(None if f == 0 else int(deltas[f - 1]))
                    aen.append(int((w * w).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "pixel_sum": pd.Series(psum, dtype="int64"),
                    "delta_sad": pd.Series(sad, dtype="Int64"),
                    "audio_energy": pd.Series(aen, dtype="int64"),
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(content_col)).mapInPandas(
        run,
        schema="doc_id bigint, frame_idx int, pixel_sum bigint, "
        "delta_sad bigint, audio_energy bigint",
    )


# ---------------------------------------------------------------------------
# PNG (ISO/IEC 15948) — the first COMPRESSED codec this engine decodes for
# real. DEFLATE is stdlib (zlib), so the whole format is spec work: an
# 8-byte signature, CRC-checked chunks, zlib-compressed scanlines each led
# by a filter byte (None/Sub/Up/Average/Paeth), optional Adam7 interlacing,
# optional PLTE indexing. Everything below is written from the public spec;
# nothing remains of the "PNG needs PIL" env-gate except bit depths != 8
# (1/2/4/16 — valid-but-unimplemented, so NotImplementedError per the
# quarantine convention: known-valid coded variants gate loudly, garbage
# returns None).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type at bit depth 8 (3 = palette indices).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: Adam7 interlace passes as (x0, y0, dx, dy), spec order.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_chunks(b: bytes):
    """Signature + CRC-checked chunk walk → [(chunk_id, payload), ...] up to
    and including IEND, or None on any structural damage (bad signature,
    truncation, CRC mismatch, missing IEND)."""
    import zlib

    if not b.startswith(_PNG_SIG):
        return None
    i, chunks = len(_PNG_SIG), []
    while i + 12 <= len(b):
        ln = int.from_bytes(b[i : i + 4], "big")
        cid = b[i + 4 : i + 8]
        if ln > len(b) - i - 12:
            return None
        payload = b[i + 8 : i + 8 + ln]
        crc = int.from_bytes(b[i + 8 + ln : i + 12 + ln], "big")
        if zlib.crc32(cid + payload) & 0xFFFFFFFF != crc:
            return None
        chunks.append((cid, payload))
        i += 12 + ln
        if cid == b"IEND":
            return chunks
    return None  # ran out of bytes before IEND


def _png_unfilter(stream: bytes, ph: int, pw: int, bpp: int):
    """Reconstruct one (sub-)image's scanlines: ``ph`` rows of a filter
    byte + ``pw * bpp`` filtered bytes → (ph, pw*bpp) uint8, or None on a
    length mismatch / unknown filter type. Sub is a strided cumsum (mod
    distributes over the sum); Average/Paeth carry a true left-to-right
    dependency, so those rows walk pixel groups — bounded by the row, never
    the corpus."""
    import numpy as np

    stride = pw * bpp
    if len(stream) != ph * (1 + stride):
        return None
    out = np.empty((ph, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int64)
    pos = 0
    for y in range(ph):
        ft = stream[pos]
        row = np.frombuffer(stream[pos + 1 : pos + 1 + stride], dtype=np.uint8).astype(np.int64)
        pos += 1 + stride
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub: recon[x] = sum(filt[..x]) mod 256 per byte lane
            rec = row.reshape(pw, bpp).cumsum(axis=0).reshape(stride) & 0xFF
        elif ft == 2:  # Up
            rec = (row + prior) & 0xFF
        elif ft == 3:  # Average
            rec = np.empty(stride, dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            for x in range(pw):
                s = slice(x * bpp, (x + 1) * bpp)
                rec[s] = (row[s] + ((left + prior[s]) >> 1)) & 0xFF
                left = rec[s]
        elif ft == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            upleft = np.zeros(bpp, dtype=np.int64)
            for x in range(pw):
                s = slice(x * bpp, (x + 1) * bpp)
                up = prior[s]
                p = left + up - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
                pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
                rec[s] = (row[s] + pred) & 0xFF
                left = rec[s]
                upleft = up
        else:
            return None
        out[y] = rec.astype(np.uint8)
        prior = rec
    return out


def _adam7_passes(w: int, h: int):
    """Non-empty Adam7 passes for a w×h image as (x0, y0, dx, dy, pw, ph)."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw, ph = (w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            out.append((x0, y0, dx, dy, pw, ph))
    return out


def decode_png(b: bytes):
    """REAL PNG decode, stdlib-only: chunk walk → IHDR validation → IDAT
    concatenation → zlib inflate → filter reconstruction (all five filter
    types) → optional Adam7 de-interlace → optional PLTE lookup.

    Returns an (h, w, channels) uint8 array — channels follows the color
    type (1 gray, 2 gray+alpha, 3 RGB for truecolor AND palette, 4 RGBA) —
    or None for malformed payloads (quarantine). Bit depths 1/2/4/16 are
    valid PNG this engine does not implement: NotImplementedError, the
    loud-gate convention shared with the coded WAV/AVI tags."""
    import zlib

    import numpy as np

    chunks = _png_chunks(bytes(b))
    if not chunks or chunks[0][0] != b"IHDR" or len(chunks[0][1]) != 13:
        return None
    ih = chunks[0][1]
    w = int.from_bytes(ih[0:4], "big")
    h = int.from_bytes(ih[4:8], "big")
    depth, ctype, comp, filt, inter = ih[8], ih[9], ih[10], ih[11], ih[12]
    if w <= 0 or h <= 0 or comp != 0 or filt != 0 or inter > 1 or ctype not in _PNG_CHANNELS:
        return None
    if depth != 8:
        if depth in (1, 2, 4, 16):
            raise NotImplementedError(f"PNG bit depth {depth} not implemented (8-bit paths only)")
        return None
    bpp = _PNG_CHANNELS[ctype]
    idat = b"".join(p for cid, p in chunks if cid == b"IDAT")
    if not idat:
        return None
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    if inter == 0:
        rows = _png_unfilter(raw, h, w, bpp)
        if rows is None:
            return None
        img = rows.reshape(h, w, bpp)
    else:
        img = np.zeros((h, w, bpp), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy, pw, ph in _adam7_passes(w, h):
            n = ph * (1 + pw * bpp)
            sub = _png_unfilter(raw[pos : pos + n], ph, pw, bpp)
            if sub is None:
                return None
            img[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
            pos += n
        if pos != len(raw):
            return None
    if ctype == 3:
        plte = next((p for cid, p in chunks if cid == b"PLTE"), None)
        if plte is None or not plte or len(plte) % 3:
            return None
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = img[:, :, 0]
        if int(idx.max()) >= pal.shape[0]:
            return None
        return pal[idx]
    return img


def mux_png(img, *, interlace: int = 0, filters=None, palette=None) -> bytes:
    """PNG encoder (test/fixture writer, same role as ``mux_wav``/
    ``mux_avi``): (h, w) gray, (h, w, c) for c in {1, 2, 3, 4}, or — with
    ``palette`` (n≤256, 3) — an (h, w) index array written as color type 3.
    The per-scanline filter type defaults to ``y % 5`` so every fixture
    exercises ALL FIVE reconstruction paths; pass ``filters=[0]`` etc. to
    pin one. ``interlace=1`` writes Adam7 (each pass filtered
    independently, per spec)."""
    import zlib

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if palette is not None:
        pal = np.asarray(palette, dtype=np.uint8)
        if c != 1 or pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
            raise ValueError("palette mux needs (h, w) indices and an (n<=256, 3) palette")
        ctype = 3
    else:
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def filter_pass(sub) -> bytes:
        sub = np.ascontiguousarray(sub)
        ph, pw = sub.shape[0], sub.shape[1]
        rows = sub.reshape(ph, pw * c).astype(np.int64)
        out = bytearray()
        prior = np.zeros(pw * c, dtype=np.int64)
        for y in range(ph):
            ft = filters[y % len(filters)] if filters else y % 5
            cur = rows[y]
            left = np.zeros_like(cur)
            left[c:] = cur[:-c]
            upleft = np.zeros_like(prior)
            upleft[c:] = prior[:-c]
            if ft == 0:
                f = cur
            elif ft == 1:
                f = cur - left
            elif ft == 2:
                f = cur - prior
            elif ft == 3:
                f = cur - ((left + prior) >> 1)
            elif ft == 4:
                p = left + prior - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - upleft)
                pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, upleft))
                f = cur - pred
            else:
                raise ValueError(f"unknown PNG filter type {ft}")
            out.append(ft)
            out += (f & 0xFF).astype(np.uint8).tobytes()
            prior = cur
        return bytes(out)

    if interlace:
        stream = b"".join(
            filter_pass(img[y0::dy, x0::dx]) for x0, y0, dx, dy, _pw, _ph in _adam7_passes(w, h)
        )
    else:
        stream = filter_pass(img)

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return (
            len(payload).to_bytes(4, "big")
            + cid
            + payload
            + (zlib.crc32(cid + payload) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, ctype, 0, 0, 1 if interlace else 0])
    body = chunk(b"IHDR", ihdr)
    if palette is not None:
        body += chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    return _PNG_SIG + body + chunk(b"IDAT", zlib.compress(stream)) + chunk(b"IEND", b"")


def rgb_image_stats(df: DataFrame, content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """Codec-general image stats pass: any payload ``_decode_rgb`` handles
    (P6 PPM, 24-bit BMP, and now real PNG) → exact int64 per-channel sums;
    malformed payloads quarantine as ok=false rows. Same shape/contract as
    ``ppm_image_stats`` with the decoder swapped for the dispatching one.
    mapInPandas, no shuffle."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "ok": [], "width": [], "height": [],
                "sum_r": [], "sum_g": [], "sum_b": [],
            }
            for i, buf in zip(pdf[id_col], pdf[content_col]):
                img = _decode_rgb(bytes(buf))
                out["doc_id"].append(i)
                if img is None:
                    out["ok"].append(False)
                    for col in ("width", "height", "sum_r", "sum_g", "sum_b"):
                        out[col].append(0)
                    continue
                s = img.astype(np.int64).sum(axis=(0, 1))
                out["ok"].append(True)
                out["width"].append(img.shape[1])
                out["height"].append(img.shape[0])
                out["sum_r"].append(int(s[0]))
                out["sum_g"].append(int(s[1]))
                out["sum_b"].append(int(s[2]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "ok": pd.Series(out["ok"], dtype="bool"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "sum_r": pd.Series(out["sum_r"], dtype="int64"),
                    "sum_g": pd.Series(out["sum_g"], dtype="int64"),
                    "sum_b": pd.Series(out["sum_b"], dtype="int64"),
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(content_col)).mapInPandas(
        run,
        schema="doc_id bigint, ok boolean, width int, height int, "
        "sum_r bigint, sum_g bigint, sum_b bigint",
    )


# ---------------------------------------------------------------------------
# GIF (GIF87a/GIF89a) — second compressed codec decoded for real. GIF's
# only compression is LZW with variable-width codes (3..12 bits, LSB-first
# bitstream, clear/EOI codes, dictionary growth with the KwKwK case) — no
# external decompressor needed at all, so unlike PNG this one is 100%
# spec-written including the entropy coder. Still images decode fully
# (global/local color tables, extension-block skipping, 4-pass interlace);
# an animated GIF decodes as its FIRST frame, the conventional still
# interpretation. Garbage quarantines as None; there is nothing left to
# env-gate for this format.
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int):
    """GIF-flavor LZW: LSB-first variable-width codes. Returns the index
    bytestream or None on any stream damage (bad code, missing growth
    sync). Code width grows when the dict hits 1<<width (mirroring the
    encoder's post-assignment bump); 12-bit cap, clear resets."""
    if not 2 <= min_code_size <= 8:
        return None
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    table = list(base)
    width = min_code_size + 1
    prev = None
    acc = nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return None  # ran out before EOI
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table) and code != clear and code != eoi:
            entry = table[code]
            if not entry and code >= clear:
                return None  # referenced a never-assigned slot
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None and len(table) < 4096:
            entry = prev + prev[:1]  # KwKwK
            table.append(entry)
        else:
            return None
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW compressor (fixture writer): real dictionary build so
    roundtrips exercise the decoder's growth/KwKwK paths; emits clear+reset
    when the table fills. LSB-first packing, clear upfront, EOI last."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    emit(clear, width)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table, next_code, width = fresh()
        w = bytes([k])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


#: GIF interlace passes as (y0, dy), spec order.
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(b: bytes):
    """REAL GIF decode, fully spec-written (header + logical screen
    descriptor, global/local color tables, extension skipping, image
    descriptor, LZW index stream, 4-pass interlace). Returns the first
    frame as (h, w, 3) uint8 RGB, or None for malformed payloads."""
    import numpy as np

    b = bytes(b)
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    packed = b[10]
    gct = None
    i = 13
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if i + 3 * n > len(b):
            return None
        gct = np.frombuffer(b[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
        i += 3 * n
    while i < len(b):
        marker = b[i]
        if marker == 0x3B:  # trailer before any image
            return None
        if marker == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            if i >= len(b):
                return None
            i += 1
            continue
        if marker != 0x2C:
            return None
        if i + 10 > len(b):
            return None
        w = int.from_bytes(b[i + 5 : i + 7], "little")
        h = int.from_bytes(b[i + 7 : i + 9], "little")
        ipacked = b[i + 9]
        i += 10
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if i + 3 * n > len(b):
                return None
            ct = np.frombuffer(b[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
            i += 3 * n
        if ct is None or w <= 0 or h <= 0 or i >= len(b):
            return None
        min_code = b[i]
        i += 1
        data = bytearray()
        while i < len(b) and b[i] != 0:
            ln = b[i]
            if i + 1 + ln > len(b):
                return None
            data += b[i + 1 : i + 1 + ln]
            i += 1 + ln
        if i >= len(b):
            return None
        idx = _lzw_decode(bytes(data), min_code)
        if idx is None or len(idx) < w * h:
            return None
        px = np.frombuffer(idx[: w * h], dtype=np.uint8).reshape(h, w)
        if ipacked & 0x40:  # de-interlace
            out = np.empty_like(px)
            row = 0
            for y0, dy in _GIF_INTERLACE:
                n_rows = len(range(y0, h, dy))
                out[y0::dy] = px[row : row + n_rows]
                row += n_rows
            px = out
        if int(px.max()) >= ct.shape[0]:
            return None
        return ct[px]
    return None


def mux_gif(indices, palette, *, interlace: int = 0) -> bytes:
    """GIF89a encoder (fixture writer): (h, w) uint8 index array + (n≤256,
    3) palette → single-frame GIF with a REAL LZW-compressed index stream,
    a graphic-control extension (so decoders must skip extension blocks),
    and optional 4-pass interlacing."""
    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
        raise ValueError("mux_gif needs (h, w) indices and an (n<=256, 3) palette")
    h, w = idx.shape
    if int(idx.max()) >= pal.shape[0]:
        raise ValueError("index out of palette range")
    size_bits = max(1, (pal.shape[0] - 1).bit_length())
    n_slots = 1 << size_bits
    table = np.zeros((n_slots, 3), dtype=np.uint8)
    table[: pal.shape[0]] = pal
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | ((size_bits - 1) & 0x07) | 0x70, 0, 0])
    out += table.tobytes()
    out += bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])  # graphic control ext, no transparency
    out += bytes([0x2C]) + (0).to_bytes(2, "little") * 2
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])
    if interlace:
        idx = np.concatenate([idx[y0::dy] for y0, dy in _GIF_INTERLACE], axis=0)
    min_code = max(2, size_bits)
    stream = _lzw_encode(idx.tobytes(), min_code)
    out += bytes([min_code])
    for j in range(0, len(stream), 255):
        blk = stream[j : j + 255]
        out += bytes([len(blk)]) + blk
    out += bytes([0, 0x3B])
    return bytes(out)


def wav_sample_moments(df: DataFrame, content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """Whole-clip audio moments over RIFF/WAVE payloads of ANY decodable
    sample coding (integer PCM 8/16/24/32, IEEE float, G.711 A-law/µ-law,
    extensible): demux → exact int64 sample count / sum / energy across
    all channels. Undecodable payloads quarantine by omission; known
    compressed codings (ADPCM/MP3) propagate the documented
    NotImplementedError. mapInPandas, no shuffle."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, sums, energies = [], [], [], []
            for i, buf in zip(pdf[id_col], pdf[content_col]):
                out = demux_wav(bytes(buf))
                if out is None:
                    continue
                _rate, _ch, samples = out
                x = samples.astype(np.int64)
                ids.append(i)
                ns.append(int(x.size))
                sums.append(int(x.sum()))
                energies.append(int((x * x).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "s_sum": pd.Series(sums, dtype="int64"),
                    "s_energy": pd.Series(energies, dtype="int64"),
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(content_col)).mapInPandas(
        run, schema="doc_id bigint, n_samples bigint, s_sum bigint, s_energy bigint"
    )


# ---------------------------------------------------------------------------
# IMA ADPCM (WAV format tag 0x0011) — the first compressed AUDIO coding
# decoded for real. The algorithm is fully formula-specified in the public
# IMA/DVI spec (89-entry step table, 8-entry index-adaptation table, 4-bit
# nibbles reconstructing a clamped predictor), so like JPEG it is pure spec
# work. WAV framing: per block and channel a 4-byte header (int16
# predictor = sample 0, step index, reserved), then nibble data in 4-byte
# per-channel groups (low nibble first). Only MS ADPCM (0x0002) and
# MP3-in-WAV (0x0055) remain env-gated on the audio side.
# ---------------------------------------------------------------------------

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(predictor: int, index: int, nibble: int):
    """One IMA ADPCM reconstruction step → (new_predictor, new_index)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    predictor = predictor - diff if nibble & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _IMA_INDEX[nibble & 7]))
    return predictor, index


def _ima_decode_block(block: bytes, channels: int, samples_per_block: int):
    """Decode one IMA WAV block → (samples_per_block, channels) int16
    list-of-lists, or None on structural damage."""
    if len(block) < 4 * channels:
        return None
    preds, idxs = [], []
    for c in range(channels):
        h = block[4 * c : 4 * c + 4]
        pred = int.from_bytes(h[0:2], "little", signed=True)
        index = h[2]
        if index > 88 or h[3] != 0:
            return None
        preds.append(pred)
        idxs.append(index)
    out = [[p] for p in preds]  # header predictor IS sample 0
    data = block[4 * channels :]
    # nibble stream: 4-byte groups per channel, low nibble first
    need = samples_per_block - 1
    pos = 0
    while any(len(o) < samples_per_block for o in out):
        for c in range(channels):
            chunk = data[pos : pos + 4]
            pos += 4
            if len(chunk) < 4:
                return None
            for byte in chunk:
                for nib in (byte & 0x0F, byte >> 4):
                    if len(out[c]) <= need:
                        preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                        out[c].append(preds[c])
    return out


def ima_adpcm_decode(data: bytes, channels: int, block_align: int, samples_per_block: int):
    """Full IMA ADPCM data-chunk decode → (n, channels) int16 array or
    None. Trailing partial blocks are dropped (quarantine-by-truncation,
    the same policy the PCM path applies to partial frames)."""
    import numpy as np

    if channels < 1 or block_align < 4 * channels or samples_per_block < 1:
        return None
    expect = 4 * channels + ((samples_per_block - 1) * channels + 1) // 2
    if block_align < expect:
        return None
    cols = [[] for _ in range(channels)]
    for off in range(0, len(data) - block_align + 1, block_align):
        block = _ima_decode_block(data[off : off + block_align], channels, samples_per_block)
        if block is None:
            return None
        for c in range(channels):
            cols[c].extend(block[c])
    if not cols[0]:
        return np.zeros((0, channels), dtype="<i2")
    return np.stack([np.array(c, dtype="<i2") for c in cols], axis=1)


def ima_adpcm_encode(samples, rate: int = 8000, samples_per_block: int = 505) -> bytes:
    """IMA ADPCM WAV writer (fixture sibling of ``mux_wav``): (n,) or
    (n, channels) int16 → a complete fmt-0x0011 RIFF/WAVE file using the
    canonical greedy nibble chooser; input is zero-padded to whole
    blocks. ``samples_per_block`` must be odd (nibble pairs)."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if samples_per_block % 2 == 0:
        raise ValueError("samples_per_block must be odd")
    block_align = 4 * channels + (samples_per_block - 1) * channels // 2
    nblocks = max(1, -(-n // samples_per_block))
    pad = nblocks * samples_per_block - n
    if pad:
        x = np.vstack([x, np.zeros((pad, channels), dtype=np.int64)])

    out = bytearray()
    idxs = [0] * channels
    for bi in range(nblocks):
        seg = x[bi * samples_per_block : (bi + 1) * samples_per_block]
        preds = [int(seg[0, c]) for c in range(channels)]
        for c in range(channels):
            out += int(preds[c]).to_bytes(2, "little", signed=True)
            out += bytes([idxs[c], 0])
        nibs: list[list[int]] = [[] for _ in range(channels)]
        for c in range(channels):
            for s in seg[1:, c]:
                step = _IMA_STEPS[idxs[c]]
                diff = int(s) - preds[c]
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                tmp = step
                if diff >= tmp:
                    nib |= 4
                    diff -= tmp
                tmp >>= 1
                if diff >= tmp:
                    nib |= 2
                    diff -= tmp
                tmp >>= 1
                if diff >= tmp:
                    nib |= 1
                preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                nibs[c].append(nib)
        # pack: 4-byte groups per channel, low nibble first
        per = len(nibs[0])
        pos = 0
        while pos < per:
            for c in range(channels):
                group = nibs[c][pos : pos + 8] + [0] * max(0, 8 - (per - pos))
                for j in range(0, 8, 2):
                    out.append(group[j] | (group[j + 1] << 4))
            pos += 8
    data = bytes(out)
    fmt = (
        (0x0011).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block_align // samples_per_block).to_bytes(4, "little")
        + block_align.to_bytes(2, "little") + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little") + samples_per_block.to_bytes(2, "little")
    )
    chunks = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"fact" + (4).to_bytes(4, "little") + (nblocks * samples_per_block).to_bytes(4, "little")
        + b"data" + len(data).to_bytes(4, "little") + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


# ---------------------------------------------------------------------------
# MS ADPCM (WAV format tag 0x0002) — like IMA, fully formula-specified in
# the public format docs: 7 fixed prediction-coefficient pairs, a 16-entry
# delta-adaptation table, 4-bit signed nibbles over a two-tap predictor.
# With this one, MP3-in-WAV (0x0055) is the ONLY audio coding left gated.
# ---------------------------------------------------------------------------

_MS_COEFFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208), (392, -232)]
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230]


def _ms_adpcm_step(nib: int, samp1: int, samp2: int, delta: int, c1: int, c2: int):
    """One MS ADPCM reconstruction step → (sample, new_delta)."""
    signed = nib - 16 if nib >= 8 else nib
    pred = ((samp1 * c1 + samp2 * c2) >> 8) + signed * delta
    pred = max(-32768, min(32767, pred))
    delta = max(16, (_MS_ADAPT[nib] * delta) >> 8)
    return pred, delta


def ms_adpcm_decode(data: bytes, channels: int, block_align: int, samples_per_block: int):
    """MS ADPCM data-chunk decode → (n, channels) int16 array or None.
    Block layout per the public spec: per-channel predictor index byte
    (0..6), per-channel initial delta / sample1 / sample2 (int16 LE; the
    two header samples are emitted oldest-first), then interleaved signed
    nibbles high-nibble-first. Trailing partial blocks drop."""
    import numpy as np

    head = 7 * channels
    if channels < 1 or block_align < head or samples_per_block < 2:
        return None
    cols = [[] for _ in range(channels)]
    for off in range(0, len(data) - block_align + 1, block_align):
        blk = data[off : off + block_align]
        preds = list(blk[:channels])
        if any(p > 6 for p in preds):
            return None
        def i16(base, c):
            return int.from_bytes(
                blk[base + 2 * c : base + 2 * c + 2], "little", signed=True
            )
        deltas = [i16(channels, c) for c in range(channels)]
        samp1 = [i16(3 * channels, c) for c in range(channels)]
        samp2 = [i16(5 * channels, c) for c in range(channels)]
        if any(d <= 0 for d in deltas):
            return None
        for c in range(channels):
            cols[c].append(samp2[c])  # oldest first
            cols[c].append(samp1[c])
        need = samples_per_block - 2
        nib_idx = 0
        body = blk[head:]
        emitted = [2] * channels
        while any(e < samples_per_block for e in emitted):
            byte_i, hi = divmod(nib_idx, 2)
            if byte_i >= len(body):
                return None
            nib = (body[byte_i] >> 4) if hi == 0 else (body[byte_i] & 0x0F)
            c = nib_idx % channels if channels > 1 else 0
            nib_idx += 1
            if emitted[c] >= samples_per_block:
                continue
            c1, c2 = _MS_COEFFS[preds[c]]
            s, deltas[c] = _ms_adpcm_step(nib, samp1[c], samp2[c], deltas[c], c1, c2)
            samp2[c], samp1[c] = samp1[c], s
            cols[c].append(s)
            emitted[c] += 1
        _ = need
    if not cols[0]:
        return np.zeros((0, channels), dtype="<i2")
    return np.stack([np.array(c, dtype="<i2") for c in cols], axis=1)


def ms_adpcm_encode(samples, rate: int = 8000, samples_per_block: int = 500,
                    predictor: int = 0) -> bytes:
    """MS ADPCM WAV writer (fixture sibling of ``ima_adpcm_encode``):
    int16 (n,) or (n, channels) → complete fmt-0x0002 RIFF/WAVE using one
    fixed predictor for every block and the canonical quantize-by-delta
    nibble chooser. Input zero-pads to whole blocks."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if not 0 <= predictor <= 6 or samples_per_block < 2:
        raise ValueError("bad MS ADPCM encode parameters")
    block_align = 7 * channels + ((samples_per_block - 2) * channels + 1) // 2
    nblocks = max(1, -(-n // samples_per_block))
    pad = nblocks * samples_per_block - n
    if pad:
        x = np.vstack([x, np.zeros((pad, channels), dtype=np.int64)])
    c1, c2 = _MS_COEFFS[predictor]

    out = bytearray()
    for bi in range(nblocks):
        seg = x[bi * samples_per_block : (bi + 1) * samples_per_block]
        samp2 = [int(seg[0, c]) for c in range(channels)]
        samp1 = [int(seg[1, c]) for c in range(channels)]
        deltas = [max(16, int(np.abs(np.diff(seg[:16, c])).mean() // 4) if len(seg) > 2 else 16)
                  for c in range(channels)]
        out += bytes([predictor] * channels)
        for arr in (deltas, samp1, samp2):
            for c in range(channels):
                out += int(arr[c]).to_bytes(2, "little", signed=True)
        nibs = []
        state = [(samp1[c], samp2[c], deltas[c]) for c in range(channels)]
        for t in range(2, samples_per_block):
            for c in range(channels):
                s1, s2, d = state[c]
                pred = (s1 * c1 + s2 * c2) >> 8
                err = int(seg[t, c]) - pred
                nib = max(-8, min(7, (err + (d // 2 if err >= 0 else -(d // 2))) // d))
                nib &= 0x0F
                rec, nd = _ms_adpcm_step(nib, s1, s2, d, c1, c2)
                state[c] = (rec, s1, nd)
                nibs.append(nib)
        if len(nibs) % 2:
            nibs.append(0)
        for j in range(0, len(nibs), 2):
            out.append((nibs[j] << 4) | nibs[j + 1])
        # pad block to block_align
        used = 7 * channels + len(nibs) // 2
        out += bytes(block_align - used)
    data = bytes(out)
    fmt = (
        (0x0002).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block_align // samples_per_block).to_bytes(4, "little")
        + block_align.to_bytes(2, "little") + (4).to_bytes(2, "little")
        + (32).to_bytes(2, "little") + samples_per_block.to_bytes(2, "little")
        + (7).to_bytes(2, "little")
        + b"".join(a.to_bytes(2, "little", signed=True) + b_.to_bytes(2, "little", signed=True)
                    for a, b_ in _MS_COEFFS)
    )
    chunks = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def mux_bmp(img) -> bytes:
    """24-bit BI_RGB BMP writer (fixture sibling of ``encode_ppm``):
    (h, w, 3) uint8 RGB → bottom-up, BGR, 4-byte-padded rows — the exact
    layout ``_decode_rgb`` parses."""
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[0], img.shape[1]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    return (
        b"BM" + (54 + stride * h).to_bytes(4, "little") + bytes(4) + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little") + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") + bytes(24)
        + rows.tobytes()
    )


def image_dhash(df: DataFrame, content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """Perceptual difference-hash over DECODED image payloads (any format
    ``_decode_rgb`` handles): integer luma ``(r+g+b)//3`` → 8x8
    nearest-neighbor resample (``src = floor(dst*in/out)``, the oracle's
    arithmetic) → 56-bit row-wise gradient hash (bit ``ry*7+rx`` set when
    ``gray[ry, rx+1] > gray[ry, rx]``; 56 bits keeps the value positive
    in an int64 on every engine). Undecodable payloads quarantine by
    omission. mapInPandas, no shuffle — the hash is the scale handle:
    downstream near-dup joins band THIS value instead of touching pixels."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, buf in zip(pdf[id_col], pdf[content_col]):
                img = _decode_rgb(bytes(buf))
                if img is None:
                    continue
                gray = img.astype(np.int64).sum(axis=2) // 3
                h, w = gray.shape
                yi = (np.arange(8, dtype=np.int64) * h) // 8
                xi = (np.arange(8, dtype=np.int64) * w) // 8
                g8 = gray[yi][:, xi]
                bits = (g8[:, 1:] > g8[:, :-1]).reshape(-1)  # 8 rows x 7 cols
                val = 0
                for j, b in enumerate(bits):
                    if b:
                        val |= 1 << j
                ids.append(i)
                hashes.append(val)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(content_col)).mapInPandas(
        run, schema="doc_id bigint, dhash bigint"
    )


def dhash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Banded Hamming self-join over 56-bit dHashes: 4 bands of 14 bits —
    pigeonhole-exact for ``max_hamming`` <= 3 (one band must match) — then
    an exact ``bit_count(xor)`` verify. The 100 TB shape: candidates are
    bounded by band-bucket sizes, never all-pairs."""
    bands = [
        F.struct(
            F.lit(i).alias("band"),
            (F.shiftright(F.col("dhash"), 14 * i) % (1 << 14)).alias("key"),
        )
        for i in range(4)
    ]
    exploded = hashes.select("doc_id", "dhash", F.explode(F.array(*bands)).alias("b"))
    a = exploded.select(
        F.col("doc_id").alias("doc_a"), F.col("dhash").alias("h_a"), "b"
    )
    bdf = exploded.select(
        F.col("doc_id").alias("doc_b"), F.col("dhash").alias("h_b"), "b"
    )
    pairs = (
        a.join(bdf, ["b"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def audio_fingerprint(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id",
    window: int = 16, n_windows: int = 57,
) -> DataFrame:
    """Perceptual audio fingerprint over DECODED WAV payloads (any coding
    ``demux_wav`` handles): channel-0 exact int64 energy per ``window``
    samples → 56-bit energy-gradient hash (bit w set when
    ``energy[w+1] > energy[w]`` — the audio twin of ``image_dhash``, and
    the same shape real audio-fingerprint systems band on). Payloads too
    short for ``n_windows`` windows, or undecodable ones, quarantine by
    omission. mapInPandas, no shuffle; downstream joins band the hash."""
    import numpy as np

    need = window * n_windows

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, buf in zip(pdf[id_col], pdf[content_col]):
                out = demux_wav(bytes(buf))
                if out is None:
                    continue
                _rate, _ch, samples = out
                x = samples[:, 0].astype(np.int64)
                if x.shape[0] < need:
                    continue
                e = (x[:need].reshape(n_windows, window) ** 2).sum(axis=1)
                bits = e[1:] > e[:-1]
                val = 0
                for j, b in enumerate(bits[:56]):
                    if b:
                        val |= 1 << j
                ids.append(i)
                hashes.append(val)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(content_col)).mapInPandas(
        run, schema="doc_id bigint, dhash bigint"
    )


def video_fingerprint(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id",
    n_frames: int = 57,
) -> DataFrame:
    """Perceptual video fingerprint over DECODED AVI payloads: exact
    int64 pixel sum per frame → 56-bit brightness-gradient hash (bit f
    set when ``sum[f+1] > sum[f]`` — the temporal twin of
    ``image_dhash``/``audio_fingerprint``; real systems band exactly this
    kind of temporal signature). Wrong frame counts and undecodable
    payloads quarantine by omission; coded fourccs propagate their
    documented gate. mapInPandas, no shuffle."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, buf in zip(pdf[id_col], pdf[content_col]):
                out = demux_avi(bytes(buf))
                if out is None:
                    continue
                _w, _h, _usec, frames = out
                if frames.shape[0] < n_frames:
                    continue
                sums = frames[:n_frames].astype(np.int64).sum(axis=(1, 2, 3))
                bits = sums[1:] > sums[:-1]
                val = 0
                for j, b in enumerate(bits[:56]):
                    if b:
                        val |= 1 << j
                ids.append(i)
                hashes.append(val)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.select(F.col(id_col).alias("doc_id"), F.col(content_col)).mapInPandas(
        run, schema="doc_id bigint, dhash bigint"
    )


def avi_seek_frames(b: bytes, frame_indices):
    """idx1-based RANDOM ACCESS into an AVI: jump straight to the
    requested video frames through the standard index instead of walking
    the movi list linearly — the seek path a player or frame-sampling
    pipeline uses on multi-GB files. Offsets are detected as
    movi-relative (the common convention this writer emits) or absolute
    by checking that the fourcc at the target matches the entry. Returns
    ``(w, h, {frame_index: rgb_array})`` or None; files WITHOUT an idx1
    fall back to the linear :func:`demux_avi` walk (same result, no
    random access), and a corrupt index quarantines."""
    import numpy as np

    b = bytes(b)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    total = min(len(b), 8 + int.from_bytes(b[4:8], "little"))
    i = 12
    movi_fourcc_pos = None
    idx1 = None
    w = h = None
    while i + 8 <= total:
        cid, size = b[i : i + 4], int.from_bytes(b[i + 4 : i + 8], "little")
        if i + 8 + size > total:
            return None
        if cid == b"LIST":
            ltype = b[i + 8 : i + 12]
            if ltype == b"movi":
                movi_fourcc_pos = i + 8
            elif ltype == b"hdrl" and w is None:
                inner = _walk_chunks(b, i + 12, i + 8 + size)
                if inner is None:
                    return None
                for icid, ipay in inner:
                    if icid != b"LIST" or ipay[:4] != b"strl":
                        continue
                    strl = _walk_chunks(ipay, 4, len(ipay))
                    if strl is None:
                        return None
                    kinds = {c: p for c, p in strl}
                    strh = kinds.get(b"strh", b"")
                    if strh[:4] == b"vids" and b"strf" in kinds:
                        strf = kinds[b"strf"]
                        if len(strf) >= 12:
                            w = int.from_bytes(strf[4:8], "little", signed=True)
                            h = int.from_bytes(strf[8:12], "little", signed=True)
        elif cid == b"idx1":
            idx1 = b[i + 8 : i + 8 + size]
        i += 8 + size + (size % 2)
    if idx1 is None:
        full = demux_avi(b)  # no index: linear fallback, same answer
        if full is None:
            return None
        fw, fh, _usec, frames = full
        want = {f: frames[f] for f in frame_indices if 0 <= f < frames.shape[0]}
        return fw, fh, want
    if movi_fourcc_pos is None or w is None or not w or not h:
        return None
    # collect video ('..db'/'..dc' stream 00) entries in index order
    entries = []
    for off in range(0, len(idx1) - 15, 16):
        cid = idx1[off : off + 4]
        pos = int.from_bytes(idx1[off + 8 : off + 12], "little")
        if cid[:2] == b"00" and cid[2:4] in (b"db", b"dc"):
            entries.append((cid, pos))
    out = {}
    flip = h > 0
    hh = abs(h)
    for f in frame_indices:
        if not 0 <= f < len(entries):
            continue
        cid, pos = entries[f]
        for base in (movi_fourcc_pos, 0):  # movi-relative, then absolute
            at = base + pos
            if b[at : at + 4] == cid:
                size = int.from_bytes(b[at + 4 : at + 8], "little")
                frame = _rows_to_rgb(b[at + 8 : at + 8 + size], w, hh)
                if frame is None:
                    return None
                out[f] = frame if flip else frame[::-1]
                break
        else:
            return None  # index points at garbage: quarantine
    return w, hh, out
