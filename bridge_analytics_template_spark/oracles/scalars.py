"""Reference-derived oracle generators for scalar-function queries whose
algorithms SQL cannot express (xxhash64 / murmur3, zlib)."""

from __future__ import annotations

import functools
import zlib

from . import oracle_sf_dir
from .emit import read_fixture, values_sql
from .hashes import murmur3_32_str, xxhash64_str


@functools.lru_cache(maxsize=4)
def _xxhash_sql(sf_dir: str) -> str:
    t = read_fixture("documents", "doc_id", "text")
    rows = [
        (int(i), xxhash64_str(s), murmur3_32_str(s))
        for i, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    ]
    return values_sql(
        rows,
        [("doc_id", "b"), ("text_xx64", "b"), ("text_hash32", "i")],
        order_by="doc_id",
    )


def xxhash_oracle() -> str:
    return _xxhash_sql(oracle_sf_dir())


@functools.lru_cache(maxsize=4)
def _compression_sql(sf_dir: str) -> str:
    t = read_fixture("documents", "doc_id", "text")
    rows = []
    for i, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        raw = s.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        n = len(raw)
        rows.append((int(i), n, comp, comp * 100 // max(n, 1)))
    return values_sql(
        rows,
        [("doc_id", "b"), ("n_bytes", "b"), ("n_compressed", "b"), ("ratio_pct", "b")],
        order_by="doc_id",
    )


def compression_oracle() -> str:
    return _compression_sql(oracle_sf_dir())
