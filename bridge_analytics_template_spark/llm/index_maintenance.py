"""Segment-count compaction policy for the persisted index tier.

All three persisted indexes (MinHash dedup — llm/dedup.py, IVF / IVF-PQ —
llm/ann_index.py, BM25 — llm/text_index.py) grow by immutable Lucene-style
segment appends and expose a compaction that is a pure file rewrite
(segment contents are content-deterministic, so folding them into the base
changes nothing a probe can observe — pinned per index in tests). What was
deliberately left manual is the POLICY: when to fold.

This module is that policy. The trigger is segment COUNT, not size: every
probe unions base + all segments (one multi-path scan per table), so the
cost a segment adds is per-scan file/footers overhead — linear in segment
count and independent of segment size. At 100 TB the background merge job
calls :func:`maybe_compact` after each ingest batch; the threshold bounds
probe fan-in to ``max_segments + 1`` scans per table forever.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

def atomic_write_json(target: str, obj) -> None:
    """Write JSON via tmp-file + ``os.replace`` — the COMMIT POINT of every
    index mutation. ``os.replace`` is atomic on POSIX, so readers see
    either the old meta or the new one, never a torn file; compaction and
    append order their data writes BEFORE this call and their deletes
    after, making a crash at any instant recoverable (old layout intact,
    or new layout committed with only stale garbage left to sweep)."""
    tmp = target + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
    os.replace(tmp, target)


def next_base_dir(meta: dict) -> str:
    """The next versioned base directory name for a compaction: meta's
    ``base_dir`` is ``""``/absent for the index root (how save_* writes)
    or ``base_vN`` after N compactions."""
    cur = meta.get("base_dir") or ""
    n = int(cur.rsplit("_v", 1)[1]) if cur else 0
    return f"base_v{n + 1}"


def commit_compaction(
    path: str, meta_path: str, meta: dict, superseded: list[str]
) -> None:
    """Atomically commit a compaction, then sweep only the GENERATION
    BEFORE LAST (deferred sweep).

    ``superseded`` lists the relative paths (old base dir — or the
    root-level table dirs for a never-compacted index — plus the folded
    segment dirs) that THIS compaction replaced. They are recorded in
    ``meta['stale']`` and deliberately left on disk until the NEXT
    compaction commits, so a lazily-evaluated probe DataFrame planned
    against the previous meta (this process or a concurrent reader) keeps
    resolving its files across one full compaction cycle — the guarantee
    the versioned-base design exists for. Only the PREVIOUS compaction's
    recorded stale list — two metas old, unreachable by any plan younger
    than a full cycle — is physically removed here, best-effort.

    Sweeping names individual segment dirs (never ``segments/``
    wholesale), so a segment appended concurrently after the commit
    instant is never destroyed by the sweep."""
    import shutil

    prev = meta.get("stale", [])
    meta["stale"] = superseded
    atomic_write_json(meta_path, meta)  # COMMIT
    for rel in prev:
        shutil.rmtree(os.path.join(path, rel), ignore_errors=True)


def _compact(spark: SparkSession, path: str, kind: str) -> None:
    # dispatch lazily so importing the policy never drags in all tiers
    if kind == "minhash":
        from .dedup import compact_minhash_index as fn
    elif kind in ("ivf", "ivfpq"):
        from .ann_index import compact_ann_index as fn
    elif kind == "bm25":
        from .text_index import compact_bm25_index as fn
    else:
        raise ValueError(f"unknown index kind {kind!r} at {path}")
    fn(spark, path)


def maybe_compact(spark: SparkSession, path: str, max_segments: int = 8) -> bool:
    """Compact the index at ``path`` iff it has grown past ``max_segments``
    appended segments. Returns True when a compaction ran. Kind-agnostic:
    reads ``meta.json`` (every persisted index writes ``kind`` and
    ``segments``) and dispatches to that tier's compactor."""
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    if len(meta.get("segments", [])) <= max_segments:
        return False
    _compact(spark, path, meta["kind"])
    return True
