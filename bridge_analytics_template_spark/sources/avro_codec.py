"""Avro Object Container File codec — spec-written, stdlib-only.

The container's spark-avro datasource module is not in this environment
(`spark.read.format("avro")` fails; only the core avro-*.jar ships), so —
same pattern as the image/audio codec tier — the format is implemented
from the PUBLIC specification (Apache Avro 1.12.0 spec, "Object Container
Files" + "Binary Encoding"): no library, no JVM, parseable inside
Arrow-batched mapInPandas lanes.

Supported schema subset (the flat-record shape analytics interchange
actually uses): records whose fields are primitives (null, boolean, int,
long, float, double, string, bytes), nullable unions ["null", T] (either
order), and arrays of primitives. Codecs: ``null`` and ``deflate`` (raw
DEFLATE, wbits=-15, per spec).

Encoding facts implemented (spec §Binary Encoding):
* int/long: zigzag then little-endian base-128 varint;
* float/double: 4/8 bytes little-endian IEEE;
* string/bytes: long length prefix + bytes;
* union: long branch index then the value;
* array: blocks of (count, items...) terminated by a 0 count (negative
  counts with a block-size long are accepted on read);
* container: magic ``Obj\\x01``, a map<string,bytes> of metadata
  (avro.schema JSON + avro.codec), a 16-byte sync marker, then blocks of
  (record count, byte size, payload, sync marker).
"""

from __future__ import annotations

import json
import struct
import zlib

MAGIC = b"Obj\x01"


# --- primitive encoders ------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _enc_long(n: int) -> bytes:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc), pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _enc_value(v, typ) -> bytes:
    if isinstance(typ, list):  # union — pick the branch by value
        if v is None:
            idx = typ.index("null")
            return _enc_long(idx)
        idx = next(i for i, t in enumerate(typ) if t != "null")
        return _enc_long(idx) + _enc_value(v, typ[idx])
    if isinstance(typ, dict) and typ.get("type") == "array":
        if not v:
            return _enc_long(0)
        body = b"".join(_enc_value(x, typ["items"]) for x in v)
        return _enc_long(len(v)) + body + _enc_long(0)
    if typ == "null":
        return b""
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ in ("int", "long"):
        return _enc_long(int(v))
    if typ == "float":
        return struct.pack("<f", float(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "string":
        raw = str(v).encode("utf-8")
        return _enc_long(len(raw)) + raw
    if typ == "bytes":
        raw = bytes(v)
        return _enc_long(len(raw)) + raw
    raise ValueError(f"unsupported avro type: {typ!r}")


def _dec_value(buf: bytes, pos: int, typ):
    if isinstance(typ, list):
        idx, pos = _dec_long(buf, pos)
        if not 0 <= idx < len(typ):
            raise ValueError("union branch out of range")
        if typ[idx] == "null":
            return None, pos
        return _dec_value(buf, pos, typ[idx])
    if isinstance(typ, dict) and typ.get("type") == "array":
        out = []
        while True:
            count, pos = _dec_long(buf, pos)
            if count == 0:
                return out, pos
            if count < 0:  # spec: negative count is followed by a byte size
                count = -count
                _, pos = _dec_long(buf, pos)
            for _ in range(count):
                v, pos = _dec_value(buf, pos, typ["items"])
                out.append(v)
    if typ == "null":
        return None, pos
    if typ == "boolean":
        if pos >= len(buf):
            raise ValueError("truncated boolean")
        return buf[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return _dec_long(buf, pos)
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "string":
        n, pos = _dec_long(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("truncated string")
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if typ == "bytes":
        n, pos = _dec_long(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("truncated bytes")
        return bytes(buf[pos : pos + n]), pos + n
    raise ValueError(f"unsupported avro type: {typ!r}")


# --- container ----------------------------------------------------------------

_SYNC = bytes(range(16))  # deterministic sync marker (any 16 bytes per spec)


def encode_avro(
    records: list[dict],
    schema: dict,
    codec: str = "null",
    records_per_block: int = 1000,
    sync: bytes = _SYNC,
) -> bytes:
    """Records + record schema → one Avro Object Container File."""
    fields = schema["fields"]
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(MAGIC)
    out += _enc_long(len(meta))
    for k, v in sorted(meta.items()):
        out += _enc_value(k, "string") + _enc_value(v, "bytes")
    out += _enc_long(0)
    out += sync
    for i in range(0, max(len(records), 1), records_per_block):
        chunk = records[i : i + records_per_block]
        if not chunk:
            break
        body = b"".join(
            b"".join(_enc_value(r.get(f["name"]), f["type"]) for f in fields)
            for r in chunk
        )
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            body = co.compress(body) + co.flush()
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        out += _enc_long(len(chunk)) + _enc_long(len(body)) + body + sync
    return bytes(out)


def decode_avro(blob: bytes) -> tuple[dict, list[dict]]:
    """Avro Object Container File → (schema, records). Raises ValueError
    on ANY corrupt container (bad magic, sync mismatch, truncation,
    mangled metadata/varints/compressed bodies) — a hostile byte stream
    must fail cleanly, never escape as a codec-internal exception type
    (fuzz-pinned in tests/test_sources.py)."""
    try:
        return _decode_avro_inner(blob)
    except ValueError:
        raise
    except Exception as ex:  # struct.error, zlib.error, KeyError, ...
        raise ValueError(f"corrupt avro container: {type(ex).__name__}: {ex}") from ex


def _decode_avro_inner(blob: bytes) -> tuple[dict, list[dict]]:
    if blob[:4] != MAGIC:
        raise ValueError("not an avro container (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        count, pos = _dec_long(blob, pos)
        if count == 0:
            break
        if count < 0:
            count = -count
            _, pos = _dec_long(blob, pos)
        for _ in range(count):
            k, pos = _dec_value(blob, pos, "string")
            v, pos = _dec_value(blob, pos, "bytes")
            meta[k] = v
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    fields = schema["fields"]
    sync = blob[pos : pos + 16]
    if len(sync) != 16:
        raise ValueError("truncated header sync marker")
    pos += 16
    records: list[dict] = []
    while pos < len(blob):
        count, pos = _dec_long(blob, pos)
        size, pos = _dec_long(blob, pos)
        if count < 0 or size < 0 or pos + size + 16 > len(blob):
            raise ValueError("truncated block")
        body = blob[pos : pos + size]
        pos += size
        if blob[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch")
        pos += 16
        if codec == "deflate":
            body = zlib.decompress(body, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        # a record can be as small as 0 bytes only for all-null schemas;
        # bound the claimed count so a mangled varint can't loop forever
        if count > len(body) + 1:
            raise ValueError("block record count exceeds body size")
        bpos = 0
        for _ in range(count):
            rec = {}
            for f in fields:
                rec[f["name"]], bpos = _dec_value(body, bpos, f["type"])
            records.append(rec)
        if bpos != len(body):
            raise ValueError("trailing bytes in block")
    return schema, records
