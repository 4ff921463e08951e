"""Pure-Python re-implementations of the two public hash algorithms Spark's
hash expressions use — XXH64 (xxhash64(), seed 42) and Murmur3 x86_32
(hash(), seed 42) — written from the published algorithm specs so the
oracle side of f_hash_xxhash / SimHash / hash-rank seeding is derived by an
implementation that shares no code with the JVM one.

Spark specifics the specs leave open (and tests/test_oracle_hashes.py pins
against the real engine):

* A LONG column hashes as its 8-byte little-endian value via the
  fixed-width fast path (one mix round), identical to hashing the 8 bytes.
* A STRING column hashes its UTF-8 bytes.
* Murmur3's tail handling in Spark mixes each remaining byte as a FULL
  round with the byte value SIGN-EXTENDED (the documented deviation of
  Spark/Guava's hashUnsafeBytes from the canonical tail), and the fixed
  -width long path mixes the two 32-bit halves low-first.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1

_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(h: int) -> int:
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


def _round64(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * _P64_2) & _M64, 31) * _P64_1) & _M64


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _to_signed32(v: int) -> int:
    return v - (1 << 32) if v >= (1 << 31) else v


def xxhash64_bytes(data: bytes, seed: int = 42) -> int:
    """XXH64 over a byte string; returns Spark's signed int64 value."""
    length = len(data)
    seed &= _M64
    if length >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed
        v4 = (seed - _P64_1) & _M64
        i = 0
        while i + 32 <= length:
            v1 = _round64(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round64(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round64(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round64(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round64(0, v)) * _P64_1 + _P64_4) & _M64
    else:
        h = (seed + _P64_5) & _M64
        i = 0
    h = (h + length) & _M64
    while i + 8 <= length:
        k = _round64(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl64(h ^ k, 27) * _P64_1 + _P64_4) & _M64
        i += 8
    if i + 4 <= length:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P64_1) & _M64
        h = (_rotl64(h, 23) * _P64_2 + _P64_3) & _M64
        i += 4
    while i < length:
        h ^= (data[i] * _P64_5) & _M64
        h = (_rotl64(h, 11) * _P64_1) & _M64
        i += 1
    return _to_signed64(_fmix64(h))


def xxhash64_long(value: int, seed: int = 42) -> int:
    """Spark's fixed-width path for a LONG: XXH64 of its 8 LE bytes."""
    seed &= _M64
    h = (seed + _P64_5 + 8) & _M64
    h ^= (_rotl64((value & _M64) * _P64_2 & _M64, 31) * _P64_1) & _M64
    h = (_rotl64(h, 27) * _P64_1 + _P64_4) & _M64
    return _to_signed64(_fmix64(h))


def xxhash64_int(value: int, seed: int = 42) -> int:
    """Spark's fixed-width path for an INT: XXH64 of its 4 LE bytes."""
    seed &= _M64
    h = (seed + _P64_5 + 4) & _M64
    h ^= ((value & _M32) * _P64_1) & _M64
    h = (_rotl64(h, 23) * _P64_2 + _P64_3) & _M64
    return _to_signed64(_fmix64(h))


def xxhash64_str(s: str, seed: int = 42) -> int:
    return xxhash64_bytes(s.encode("utf-8"), seed)


_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix32(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def murmur3_32_bytes(data: bytes, seed: int = 42) -> int:
    """Spark's Murmur3_x86_32.hashUnsafeBytes: 4-byte LE words, then each
    TAIL byte sign-extended and mixed as a full round. Returns signed
    int32 (the value of Spark's hash())."""
    h1 = seed & _M32
    length = len(data)
    aligned = length - length % 4
    for i in range(0, aligned, 4):
        h1 = _mix_h1(h1, _mix_k1(int.from_bytes(data[i : i + 4], "little")))
    for i in range(aligned, length):
        b = data[i]
        half = b - 256 if b >= 128 else b  # sign-extended byte
        h1 = _mix_h1(h1, _mix_k1(half & _M32))
    return _to_signed32(_fmix32(h1, length))


def murmur3_32_long(value: int, seed: int = 42) -> int:
    """Spark's fixed-width path for a LONG: low 32 bits then high 32."""
    h1 = seed & _M32
    v = value & _M64
    h1 = _mix_h1(h1, _mix_k1(v & _M32))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & _M32))
    return _to_signed32(_fmix32(h1, 8))


def murmur3_32_str(s: str, seed: int = 42) -> int:
    return murmur3_32_bytes(s.encode("utf-8"), seed)
