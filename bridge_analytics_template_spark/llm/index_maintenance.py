"""Segment-count compaction policy for the persisted index tier.

All three persisted indexes (MinHash dedup — llm/dedup.py, IVF / IVF-PQ —
llm/ann_index.py, BM25 — llm/text_index.py) grow by immutable Lucene-style
segment appends and expose a compaction that is a pure file rewrite
(segment contents are content-deterministic, so folding them into the base
changes nothing a probe can observe — pinned per index in tests). What was
deliberately left manual is the POLICY: when to fold.

This module is that policy, plus the shared TOMBSTONE layer (r8): id
deletions (GDPR-style erasure) land as immutable parquet deltas committed
through the same atomic meta replace, probes anti-join the committed
union out of the stored side, and compaction drops tombstoned rows
physically — probe-after-delete equals rebuild-without-deleted exactly
(oracled in llm_dedup_index_erasure / llm_bm25_erasure, pinned per tier
in tests/test_index_erasure.py).

The compaction trigger is segment COUNT, not size: every probe unions
base + all segments (one multi-path scan per table), so the cost a
segment adds is per-scan file/footers overhead — linear in segment count
and independent of segment size. Tombstone deltas count the same way
(each is one anti-join branch). At 100 TB the background merge job calls
:func:`maybe_compact` after each ingest batch; the thresholds bound probe
fan-in forever.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


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


def add_tombstones(spark: SparkSession, path: str, ids) -> str:
    """Record id deletions against a persisted index (GDPR-style erasure)
    WITHOUT rewriting it. Kind-agnostic: every persisted index stores rows
    keyed by a long id (MinHash ``doc``, ANN ``neighbor_id``, BM25
    ``doc_id``); a tombstone is that id.

    The delta lands as an immutable parquet dir
    ``{path}/tombstones/del_N`` (single ``id`` long column) and is then
    COMMITTED by appending its name to ``meta['tombstones']`` via the
    atomic meta replace — the same crash discipline as segment append: a
    crash after the data write but before the commit leaves an
    unreferenced dir that no reader resolves (and the retry overwrites
    it). Probes anti-join the committed tombstone union out of the stored
    side, so a delete is visible to every subsequent probe immediately and
    costs O(deletes) — no index rewrite. The next COMPACTION drops
    tombstoned rows physically and retires the delta dirs through the
    deferred-sweep path.

    ``ids`` is an iterable of ints or a single-column DataFrame. Returns
    the committed delta name."""
    meta_path = os.path.join(path, "meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    existing = meta.get("tombstones", [])
    # MONOTONIC sequence, never len(existing): compaction clears the
    # tombstone list while the folded del_N dirs live on under
    # meta['stale'] for one deferred-sweep cycle — a length-derived name
    # would overwrite a dir that old-meta probe plans still resolve
    # (review finding r8).
    seq = meta.get("tombstone_seq", len(existing))
    name = f"del_{seq}"
    if hasattr(ids, "toDF") or hasattr(ids, "select"):  # DataFrame
        df = ids.select(F.col(ids.columns[0]).cast("long").alias("id"))
    else:
        df = spark.createDataFrame([(int(i),) for i in ids], "id long")
    df.write.mode("overwrite").parquet(os.path.join(path, "tombstones", name))
    meta["tombstones"] = existing + [name]
    meta["tombstone_seq"] = seq + 1
    atomic_write_json(meta_path, meta)  # COMMIT
    return name


def read_tombstones(spark: SparkSession, path: str, meta: dict):
    """Union of the COMMITTED tombstone deltas as a single-column ``id``
    DataFrame, or None when the index has none (the common case — probes
    skip the anti-join entirely)."""
    names = meta.get("tombstones", [])
    if not names:
        return None
    parts = [
        spark.read.parquet(os.path.join(path, "tombstones", n)) for n in names
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


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


def maybe_compact(
    spark: SparkSession,
    path: str,
    max_segments: int = 8,
    max_tombstone_deltas: int = 8,
) -> bool:
    """Compact the index at ``path`` iff it has grown past ``max_segments``
    appended segments OR accumulated more than ``max_tombstone_deltas``
    tombstone deltas (each delta is one anti-join branch on every probe —
    the deletion-side analogue of segment fan-in). Returns True when a
    compaction ran. Kind-agnostic: reads ``meta.json`` (every persisted
    index writes ``kind``/``segments``/``tombstones``) and dispatches to
    that tier's compactor."""
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    if (
        len(meta.get("segments", [])) <= max_segments
        and len(meta.get("tombstones", [])) <= max_tombstone_deltas
    ):
        return False
    _compact(spark, path, meta["kind"])
    return True
