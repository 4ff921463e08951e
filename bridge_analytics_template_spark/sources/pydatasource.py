"""Custom batch source via the Python DataSource API (Spark 4).

The reference's ingest boundary is a REST/S3 client pull
(`/root/reference/src/copy_from_template.py:298-327`); the engine's analog
for "a source Spark has no built-in connector for" is a DataSource V2
implementation: declare partitions up front (parallelism = partition list,
planned on the driver), then each executor reads only its split.

`synthetic_events` here is a deterministic generator (row fields derived
from the row index via md5 prefixes and integer arithmetic), which makes a
custom-source read ORACLE-CHECKABLE: DuckDB reproduces the same rows from
``generate_series``. The mechanics — option handling, split planning,
per-partition iteration — are exactly what a real REST/queue connector
implements.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _kind(i: int) -> str:
    h = hashlib.md5(str(i).encode()).hexdigest()[:2]
    return "a" if h <= "55" else ("b" if h <= "aa" else "c")


def _val(i: int) -> int:
    return (i * 2654435761) % 1000


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("synthetic_events").option("num_rows", N)
    .option("partitions", P)` — N rows split into P planned splits."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, kind string, val bigint"

    def reader(self, schema) -> DataSourceReader:
        return _Reader(int(self.options.get("num_rows", 1000)), int(self.options.get("partitions", 8)))


class _Reader(DataSourceReader):
    def __init__(self, num_rows: int, partitions: int):
        self.num_rows, self.n_parts = num_rows, max(1, partitions)

    def partitions(self):
        step = -(-self.num_rows // self.n_parts)
        return [
            _Range(lo, min(lo + step, self.num_rows)) for lo in range(0, self.num_rows, step)
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield (i, _kind(i), _val(i))


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


# --- streaming form ---------------------------------------------------------
# The same deterministic generator as an incremental STREAM: offsets are row
# indices, each micro-batch reads [start, end) — the protocol a real queue /
# REST-poll connector implements (initialOffset / latestOffset / read).
# SimpleDataSourceStreamReader is the driver-side form (no partition
# planning per batch); the rows it yields are identical to the batch source,
# so stream==batch equivalence is testable end-to-end.

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class _StreamReader(SimpleDataSourceStreamReader):
    def __init__(self, num_rows: int, batch_rows: int):
        self.num_rows, self.batch_rows = num_rows, max(1, batch_rows)

    def initialOffset(self):
        return {"index": 0}

    def read(self, start: dict):
        lo = start["index"]
        hi = min(lo + self.batch_rows, self.num_rows)
        return (
            iter([(i, _kind(i), _val(i)) for i in range(lo, hi)]),
            {"index": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([(i, _kind(i), _val(i)) for i in range(start["index"], end["index"])])


class SyntheticEventsStreamDataSource(DataSource):
    """`spark.readStream.format("synthetic_events_stream")` — the generator
    as an exhaustible micro-batch stream."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return "event_id bigint, kind string, val bigint"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _StreamReader(
            int(self.options.get("num_rows", 1000)),
            int(self.options.get("batch_rows", 100)),
        )


def register_stream(spark) -> None:
    spark.dataSource.register(SyntheticEventsStreamDataSource)


# --- writer form -------------------------------------------------------------
# The OTHER half of the custom-connector surface: a Python DataSource WRITER
# with the two-phase commit protocol a real external sink implements —
# executors write independently and return commit messages, the DRIVER
# decides atomicity: only files recorded in the commit manifest exist as far
# as any reader is concerned. A crashed/aborted job leaves staged files but
# no manifest entry — invisible, exactly-once for idempondent readers.

import json as _json
import os as _os
import uuid as _uuid

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


class _FileCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path, self.rows = path, rows


class _ManifestWriter(DataSourceWriter):
    def __init__(self, path: str, overwrite: bool):
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator):
        """Runs ON EXECUTORS: stage this partition's rows to a uniquely
        named JSONL file; report it to the driver. Nothing written here is
        visible until the driver commits the manifest."""
        _os.makedirs(self.path, exist_ok=True)
        fname = _os.path.join(self.path, f"part-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileCommit(fname, n)

    def commit(self, messages):
        """Runs ON THE DRIVER, once, after every task succeeded — the
        atomic commit point (tmp + os.replace, same discipline as the
        index tier's meta.json).

        Save-mode semantics (ADVICE r8): append MERGES the previously
        committed file list into the new manifest — a second
        ``.mode('append').save()`` must not hide earlier rows or leak
        their staged parts; overwrite commits only the new files, then
        deletes the superseded parts AFTER the manifest replace (the
        replace is the visibility flip, so a crash between the two leaves
        only invisible garbage, never a manifest pointing at deleted
        files)."""
        new_files = sorted(_os.path.basename(m.path) for m in messages)
        new_rows = sum(m.rows for m in messages)
        old_files: list[str] = []
        old_rows = 0
        manifest_path = _os.path.join(self.path, "_manifest.json")
        if _os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                prev = _json.load(fh)
            old_files = list(prev.get("files", []))
            old_rows = prev.get("rows", 0)
        if self.overwrite:
            manifest = {"files": new_files, "rows": new_rows}
        else:
            manifest = {
                "files": sorted(set(old_files) | set(new_files)),
                "rows": old_rows + new_rows,
            }
        tmp = _os.path.join(self.path, "_manifest.json.tmp")
        with open(tmp, "w") as fh:
            _json.dump(manifest, fh)
        _os.replace(tmp, manifest_path)
        if self.overwrite:
            for f in set(old_files) - set(new_files):
                try:
                    _os.remove(_os.path.join(self.path, f))
                except OSError:
                    pass

    def abort(self, messages):
        """Any task failed: remove what the SUCCESSFUL tasks staged; the
        manifest is never written, so partial output cannot leak. The
        messages list carries None for each FAILED task (the PySpark
        abort contract) — and abort only runs when at least one task
        failed, so the None check is load-bearing (review finding r8)."""
        for m in messages:
            if m is None:
                continue
            try:
                _os.remove(m.path)
            except OSError:
                pass


class JsonlManifestSink(DataSource):
    """`df.write.format("jsonl_manifest").option("path", dir).save()` —
    a manifest-committed JSONL directory sink. Read back ONLY the
    manifested files with :func:`read_manifested`."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def schema(self) -> str:  # writers receive the input schema at runtime
        return "placeholder string"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _ManifestWriter(self.options["path"], overwrite)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlManifestSink)


def read_manifested(spark, path: str, schema: str):
    """The reader side of the manifest contract: list ONLY the files the
    commit recorded (staged leftovers from aborted writes are invisible),
    then one distributed JSON scan over that list."""
    with open(_os.path.join(path, "_manifest.json")) as fh:
        files = _json.load(fh)["files"]
    if not files:
        # A zero-partition commit records an empty file list; spark.read
        # .json([]) raises 'path not specified' — return the declared
        # empty relation instead (ADVICE r8).
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json([_os.path.join(path, f) for f in files])
