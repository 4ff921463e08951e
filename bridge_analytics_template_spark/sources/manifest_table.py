"""Manifest-versioned parquet table: snapshot isolation, copy-on-write row
erasure, vacuum — the lakehouse commit protocol reduced to what a governed
100 TB lake actually needs to EXECUTE a deletion request (the reference's
data-governance surface is ACL curation, `/root/reference/src/
copy_from_template.py:244-277`; this module is the row-level enforcement
side of the same governance story, and the table-level completion of the
r8 index-erasure tier).

Layout::

    base/files/part-<uuid>.parquet   immutable data files, content-addressed
                                     names — a file is NEVER rewritten in
                                     place, only referenced or replaced
    base/v=N.manifest.json           snapshot N = the member-file list with
                                     per-file row counts and key bounds

Why manifests and not directories (``sources/versioning.py`` keeps the
directory-per-version form for full-replacement publishes): a deletion that
touches 0.1% of files must not copy the other 99.9%. A manifest snapshot
references unchanged files VERBATIM — copy-on-write at file granularity,
which is exactly the Iceberg/Delta data-file reuse contract. The commit
point is one ``tmp + os.replace`` of the manifest (the same atomicity
discipline as the persisted-index ``meta.json`` and the Python DataSource
sink): a crash mid-erase leaves orphan data files and the OLD snapshot
fully intact; ``vacuum`` collects the orphans.

Erasure plan at scale (``erase_rows``):

1. FILE PRUNING from bounded metadata — the per-file [min, max] key bounds
   stored in the manifest (the embedded form of ``sources/fileindex.py``'s
   standalone bounds index) range-semi-join the tombstone keys; a file whose
   envelope contains no tombstone is reused by reference without being
   opened. Range-clustered publishes make the bounds tight.
2. EXACT AFFECTED SET — scan only the candidate files, semi-join the
   tombstones, collect the distinct file list (bounded by file count,
   never rows).
3. REWRITE survivors of affected files only (one distributed anti-join
   write), ingest the new parts with fresh stats.
4. COMMIT a new manifest: untouched entries verbatim + replacement entries.

Old snapshots stay readable (audit/time-travel) until ``vacuum`` drops
their exclusive files — GDPR practice: the deletion SLA is met at commit
time by the new snapshot, physical destruction completes at vacuum, both
timestamps auditable.

Constraint: the table key must be a numeric or string column — its
per-file min/max bounds are stored as JSON in the manifest (a timestamp
key would need an epoch-micros surrogate column).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_MANIFEST = re.compile(r"^v=(\d+)\.manifest\.json$")


def _versions(base: str) -> list[int]:
    if not os.path.isdir(base):
        return []
    return sorted(
        int(m.group(1)) for d in os.listdir(base) if (m := _MANIFEST.match(d))
    )


def _manifest_path(base: str, version: int) -> str:
    return os.path.join(base, f"v={version}.manifest.json")


def read_manifest(base: str, version: int | None = None) -> dict:
    vs = _versions(base)
    if not vs:
        raise FileNotFoundError(f"no snapshots under {base}")
    v = version if version is not None else vs[-1]
    if v not in vs:
        raise FileNotFoundError(f"snapshot v={v} not in {vs}")
    with open(_manifest_path(base, v)) as fh:
        return json.load(fh)


class CommitConflict(Exception):
    """Another writer committed this version first — re-read the table
    state and retry the operation (optimistic concurrency)."""


def _commit_manifest(base: str, version: int, manifest: dict) -> None:
    """Atomic compare-and-swap commit: the manifest for ``version`` is
    created EXCLUSIVELY (write tmp, then ``os.link`` — link fails if the
    target exists), so two writers that both read snapshot N and try to
    commit N+1 cannot both win; the loser gets :class:`CommitConflict`
    and must re-read + retry. This is the version-file CAS every
    manifest-log table format builds its isolation on (on object stores
    the same contract comes from if-none-match puts)."""
    tmp = _manifest_path(base, version) + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    try:
        os.link(tmp, _manifest_path(base, version))
    except FileExistsError:
        raise CommitConflict(
            f"snapshot v={version} was committed concurrently at {base}; "
            "re-read and retry"
        ) from None
    finally:
        os.unlink(tmp)


def _ingest_parts(
    spark: SparkSession, base: str, staging: str, key_col: str
) -> list[dict]:
    """Move a staged parquet write's parts into ``files/`` under fresh
    content-addressed names and return their manifest entries. Stats come
    from ONE re-read of the staged parts grouped by file (column-pruned to
    the key — bounded metadata out, |files| rows); at real scale the same
    numbers come free from write-time observed metrics, the re-read keeps
    this implementation honest and simple."""
    parts = [
        f
        for f in os.listdir(staging)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    if not parts:
        return []
    stats = {
        os.path.basename(
            r["file"].removeprefix("file://").removeprefix("file:")
        ): r
        for r in spark.read.parquet(staging)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min(key_col).alias("lo"),
            F.max(key_col).alias("hi"),
        )
        .collect()
    }
    files_dir = os.path.join(base, "files")
    os.makedirs(files_dir, exist_ok=True)
    entries = []
    for p in parts:
        if p not in stats:
            # a zero-row partition still writes a part file; an empty part
            # has no stats group — drop it rather than manifest it
            os.remove(os.path.join(staging, p))
            continue
        final = f"part-{uuid.uuid4().hex}.parquet"
        os.rename(os.path.join(staging, p), os.path.join(files_dir, final))
        s = stats[p]
        entries.append(
            {"file": final, "rows": s["rows"], "lo": s["lo"], "hi": s["hi"]}
        )
    return entries


def publish_snapshot(
    df: DataFrame, base: str, key_col: str, n_files: int | None = None
) -> int:
    """Publish ``df`` as a full new snapshot; returns its version. When
    ``n_files`` is given the write is RANGE-CLUSTERED on the key first —
    tight per-file bounds are what make erase-time file pruning selective
    (same layout argument as operators/zorder.py)."""
    os.makedirs(base, exist_ok=True)
    staging = os.path.join(base, f"_staging_{uuid.uuid4().hex}")
    out = df.repartitionByRange(n_files, F.col(key_col)) if n_files else df
    out.write.parquet(staging)
    try:
        entries = _ingest_parts(df.sparkSession, base, staging, key_col)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    vs = _versions(base)
    v = (vs[-1] + 1) if vs else 1
    _commit_manifest(
        base,
        v,
        {
            "key_col": key_col,
            "schema": df.schema.json(),
            "files": entries,
            "rows": sum(e["rows"] for e in entries),
            "epochs": [],
        },
    )
    return v


def read_snapshot(
    spark: SparkSession, base: str, version: int | None = None
) -> DataFrame:
    """Read a pinned snapshot (default latest): exactly the manifested
    files — an uncommitted/orphan part can never leak into a read."""
    m = read_manifest(base, version)
    paths = [os.path.join(base, "files", e["file"]) for e in m["files"]]
    if not paths:
        return spark.createDataFrame([], StructType.fromJson(json.loads(m["schema"])))
    return spark.read.parquet(*paths)


def erase_rows(
    spark: SparkSession, base: str, tombstones: DataFrame, key_col: str | None = None
) -> int:
    """Copy-on-write DELETE: commit a new snapshot in which every row whose
    key appears in ``tombstones`` is gone. Files whose key bounds exclude
    all tombstones are reused BY REFERENCE (never opened); only files that
    actually hold a tombstoned row are rewritten. Returns the new version —
    or the CURRENT version unchanged when nothing matches (idempotent
    re-issue of a deletion request is a no-op, not a new snapshot)."""
    m = read_manifest(base)
    if not m["files"]:
        return _versions(base)[-1]
    key = key_col or m["key_col"]
    tomb = tombstones.select(F.col(tombstones.columns[0]).alias(key)).distinct()

    # 1. prune candidates from the manifest's bounded stats: |files| × |tomb|
    # range semi-join where the stats side is tiny by construction
    stats = spark.createDataFrame(
        [(e["file"], e["lo"], e["hi"]) for e in m["files"]],
        ["file", "lo", "hi"],
    )
    cand = [
        r["file"]
        for r in stats.join(
            tomb,
            (F.col(key) >= F.col("lo")) & (F.col(key) <= F.col("hi")),
            "left_semi",
        )
        .select("file")
        .collect()
    ]
    if not cand:
        return _versions(base)[-1]

    # 2. exact affected files: scan candidates ONLY; collect is bounded by
    # the file count, never by rows
    files_dir = os.path.join(base, "files")
    cand_paths = [os.path.join(files_dir, f) for f in cand]
    scan = spark.read.parquet(*cand_paths).withColumn("_f", F.input_file_name())
    affected = {
        os.path.basename(r["_f"].removeprefix("file://").removeprefix("file:"))
        for r in scan.join(tomb, key, "left_semi").select("_f").distinct().collect()
    }
    if not affected:
        return _versions(base)[-1]

    # 3. rewrite survivors of the affected files in one distributed pass
    staging = os.path.join(base, f"_staging_{uuid.uuid4().hex}")
    survivors = spark.read.parquet(
        *(os.path.join(files_dir, f) for f in affected)
    ).join(tomb, key, "left_anti")
    survivors.write.parquet(staging)
    try:
        new_entries = _ingest_parts(spark, base, staging, key)
    finally:
        shutil.rmtree(staging, ignore_errors=True)

    # 4. the commit: untouched entries verbatim + replacements; the
    # manifest replace is the single visibility flip
    entries = [e for e in m["files"] if e["file"] not in affected] + new_entries
    v = _versions(base)[-1] + 1
    _commit_manifest(
        base,
        v,
        {
            "key_col": m["key_col"],
            "schema": m["schema"],
            "files": entries,
            "rows": sum(e["rows"] for e in entries),
            # the epoch registry survives every commit kind: an erase or
            # merge mid-stream must not reopen replayed appends
            "epochs": m.get("epochs", []),
        },
    )
    return v


def append_rows(df: DataFrame, base: str, epoch: str | None = None) -> int:
    """Atomic APPEND: new data files + a manifest that unions them with the
    current snapshot's list. With ``epoch`` set, the append is IDEMPOTENT
    under replay: an epoch tag already recorded in the manifest makes the
    call a no-op returning the current version — the exactly-once
    discipline a streaming foreachBatch sink needs (a retried micro-batch
    must not double its rows)."""
    m = read_manifest(base)
    if epoch is not None and epoch in m.get("epochs", []):
        return _versions(base)[-1]
    staging = os.path.join(base, f"_staging_{uuid.uuid4().hex}")
    df.write.parquet(staging)
    try:
        new_entries = _ingest_parts(df.sparkSession, base, staging, m["key_col"])
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    entries = m["files"] + new_entries
    v = _versions(base)[-1] + 1
    _commit_manifest(
        base,
        v,
        {
            "key_col": m["key_col"],
            "schema": m["schema"],
            "files": entries,
            "rows": sum(e["rows"] for e in entries),
            "epochs": m.get("epochs", []) + ([epoch] if epoch is not None else []),
        },
    )
    return v


def merge_rows(spark: SparkSession, base: str, source: DataFrame) -> int:
    """Atomic MERGE / upsert: rows of ``source`` REPLACE current rows with
    the same key; source keys absent from the table are inserts. One
    snapshot commit covers both — the storage-level transactional form of
    ``operators/merge.py::merge_upsert`` (which computes the merged
    RELATION; this commits it with copy-on-write file granularity). The
    delete half reuses erase_rows' plan shape: bounds-prune candidate
    files against the source keys, rewrite only files holding a matched
    key, reference the rest verbatim; the insert half is one staged write
    of the full source. A crash anywhere before the manifest replace
    leaves the old snapshot intact and only orphan files behind."""
    m = read_manifest(base)
    key = m["key_col"]
    src_keys = source.select(key).distinct()

    affected: set[str] = set()
    files_dir = os.path.join(base, "files")
    if m["files"]:
        stats = spark.createDataFrame(
            [(e["file"], e["lo"], e["hi"]) for e in m["files"]],
            ["file", "lo", "hi"],
        )
        cand = [
            r["file"]
            for r in stats.join(
                src_keys,
                (F.col(key) >= F.col("lo")) & (F.col(key) <= F.col("hi")),
                "left_semi",
            )
            .select("file")
            .collect()
        ]
        if cand:
            scan = spark.read.parquet(
                *(os.path.join(files_dir, f) for f in cand)
            ).withColumn("_f", F.input_file_name())
            affected = {
                os.path.basename(
                    r["_f"].removeprefix("file://").removeprefix("file:")
                )
                for r in scan.join(src_keys, key, "left_semi")
                .select("_f")
                .distinct()
                .collect()
            }

    staging = os.path.join(base, f"_staging_{uuid.uuid4().hex}")
    if affected:
        survivors = spark.read.parquet(
            *(os.path.join(files_dir, f) for f in affected)
        ).join(src_keys, key, "left_anti")
        out = survivors.unionByName(source.select(*survivors.columns))
    else:
        cols = [
            f.name
            for f in StructType.fromJson(json.loads(m["schema"])).fields
        ]
        out = source.select(*cols)
    out.write.parquet(staging)
    try:
        new_entries = _ingest_parts(spark, base, staging, key)
    finally:
        shutil.rmtree(staging, ignore_errors=True)

    entries = [e for e in m["files"] if e["file"] not in affected] + new_entries
    v = _versions(base)[-1] + 1
    _commit_manifest(
        base,
        v,
        {
            "key_col": key,
            "schema": m["schema"],
            "files": entries,
            "rows": sum(e["rows"] for e in entries),
            "epochs": m.get("epochs", []),
        },
    )
    return v


def compact_snapshot(
    spark: SparkSession, base: str, target_file_bytes: int = 128 << 20
) -> int:
    """Transactional OPTIMIZE: bin-pack the current snapshot's small files
    into ~``target_file_bytes`` files, committed as a new snapshot that is
    CONTENT-IDENTICAL (pure file rewrite — the lakehouse answer to the
    small-files problem a streaming append sink creates; readers of the
    old snapshot are never blocked, and the superseded parts stay on disk
    for them until vacuum). Range-clusters on the key while rewriting, so
    compaction also restores tight per-file bounds for later erases.
    Returns the new version; a snapshot that is already one file (or
    empty) is left alone."""
    m = read_manifest(base)
    files_dir = os.path.join(base, "files")
    if len(m["files"]) <= 1:
        return _versions(base)[-1]
    total = sum(
        os.path.getsize(os.path.join(files_dir, e["file"])) for e in m["files"]
    )
    n_files = max(1, -(-total // target_file_bytes))
    if n_files >= len(m["files"]):
        return _versions(base)[-1]
    df = read_snapshot(spark, base)
    staging = os.path.join(base, f"_staging_{uuid.uuid4().hex}")
    df.repartitionByRange(n_files, F.col(m["key_col"])).write.parquet(staging)
    try:
        entries = _ingest_parts(spark, base, staging, m["key_col"])
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    v = _versions(base)[-1] + 1
    _commit_manifest(
        base,
        v,
        {
            "key_col": m["key_col"],
            "schema": m["schema"],
            "files": entries,
            "rows": sum(e["rows"] for e in entries),
            "epochs": m.get("epochs", []),
        },
    )
    return v


def vacuum(base: str, keep_versions: int = 1) -> list[str]:
    """Physically drop everything no KEPT snapshot references: old
    manifests beyond the retention, their exclusive data files, and any
    orphan parts from crashed commits or staging. Until vacuum runs, every
    retained snapshot stays readable — the audit window between logical
    deletion (erase_rows commit) and physical destruction. Returns the
    deleted file names."""
    vs = _versions(base)
    keep = vs[-keep_versions:] if keep_versions > 0 else []
    referenced: set[str] = set()
    for v in keep:
        referenced.update(e["file"] for e in read_manifest(base, v)["files"])
    removed = []
    files_dir = os.path.join(base, "files")
    if os.path.isdir(files_dir):
        for f in os.listdir(files_dir):
            if f not in referenced:
                os.remove(os.path.join(files_dir, f))
                removed.append(f)
    for v in vs:
        if v not in keep:
            os.remove(_manifest_path(base, v))
            removed.append(f"v={v}.manifest.json")
    for d in os.listdir(base):
        if d.startswith("_staging_"):
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)
            removed.append(d)
        elif ".tmp." in d:
            # a crash between CAS link and tmp unlink leaves the tmp copy
            os.remove(os.path.join(base, d))
            removed.append(d)
    return removed
