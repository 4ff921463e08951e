"""Spark-native read API for the manifest-versioned table: a Python
DataSource (`spark.read.format("manifest_table")`) over
``sources/manifest_table.py``'s snapshot layout — the connector form of
``read_snapshot``, so the table plugs into any tool that only speaks
``spark.read`` (the reference's consumers read published datasets through
the platform's generic read surface, `/root/reference/src/
copy_from_template.py:316-327`; this is that surface for our table).

What the connector adds over a plain parquet read:

- SNAPSHOT RESOLUTION from options: ``versionAsOf`` (pinned version),
  ``timestampAsOf`` (epoch seconds — the commit that was current then),
  ``tag`` (named reproducibility pin); default = latest. Only manifested
  files are ever listed — orphans from crashed commits are invisible.
- ONE InputPartition PER DATA FILE, so a 10k-file snapshot reads with
  10k-way parallelism and Spark's scheduler does the balancing.
- PUSHED-FILTER FILE PRUNING (`pushFilters`): comparison/In/EqualTo
  filters on the table key prune partitions against the manifest's
  per-file [lo, hi] bounds, and on any ``stats_cols`` column against its
  recorded envelope — the planner never schedules a task for a file the
  metadata rules out. Pruning is containment-based, so every filter is
  RETURNED as unsupported (Spark re-applies it post-scan); the connector
  uses it purely to shrink the partition list, which keeps correctness
  independent of the pruning logic.
- GENERATION RECONCILIATION inside ``read``: each partition reads its
  parquet file with pyarrow and projects the snapshot's column spec —
  a column comes from bytes only when the file's write generation is >=
  the column's ``since``, else its default (identical rule to
  ``manifest_table._read_entries``), so evolved tables read correctly
  through the connector too.

The executor-side read is pyarrow (the Python DataSource contract); for
the JVM-speed path use ``read_snapshot`` — this connector is the API
surface, priced accordingly and tested value-identical.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from .manifest_table import (
    _columns_of,
    _spec_from_schema,
    read_manifest,
    resolve_tag,
    version_as_of,
)

FORMAT_NAME = "manifest_table"


def _resolve_manifest(options: dict) -> tuple[str, dict]:
    base = options["path"]
    # option keys arrive lowercased from the Spark side
    if options.get("versionasof") is not None:
        version = int(options["versionasof"])
    elif options.get("timestampasof") is not None:
        version = version_as_of(base, float(options["timestampasof"]))
    elif options.get("tag") is not None:
        version = resolve_tag(base, options["tag"])
    else:
        version = None
    return base, read_manifest(base, version)


def _spec_of(m: dict) -> list[dict]:
    cols = _columns_of(m)
    if cols is not None:
        return cols
    from pyspark.sql.types import StructType

    return _spec_from_schema(StructType.fromJson(json.loads(m["schema"])), 1)


@dataclass
class _FilePartition(InputPartition):
    path: str
    schema_id: int


class _Bound:
    """Conjunctive [lo, hi] interval accumulated from pushed filters for
    one column (None = open side)."""

    def __init__(self):
        self.lo = None
        self.hi = None
        self.in_values = None  # tightest: an explicit candidate set

    def narrow_lo(self, v):
        self.lo = v if self.lo is None else max(self.lo, v)

    def narrow_hi(self, v):
        self.hi = v if self.hi is None else min(self.hi, v)

    def may_intersect(self, flo, fhi) -> bool:
        if flo is None or fhi is None:
            return True  # no recorded envelope -> cannot prune
        if self.in_values is not None and not any(
            flo <= v <= fhi for v in self.in_values
        ):
            return False
        if self.lo is not None and fhi < self.lo:
            return False
        if self.hi is not None and flo > self.hi:
            return False
        return True


class _ManifestReader(DataSourceReader):
    def __init__(self, options: dict):
        self._base, self._manifest = _resolve_manifest(options)
        self._spec = _spec_of(self._manifest)
        self._bounds: dict[str, _Bound] = {}

    def pushFilters(self, filters):
        """Remember prunable predicates; return EVERY filter as
        unsupported so Spark re-applies them — file skipping here is a
        pure optimization, never a correctness dependency."""
        key = self._manifest["key_col"]
        statted = set(self._manifest.get("stats_cols", []))
        for f in filters:
            col = getattr(f, "attribute", (None,))
            col = col[0] if isinstance(col, tuple) and len(col) == 1 else None
            if col != key and col not in statted:
                continue
            b = self._bounds.setdefault(col, _Bound())
            if isinstance(f, EqualTo):
                b.narrow_lo(f.value)
                b.narrow_hi(f.value)
            elif isinstance(f, In):
                vs = [v for v in f.value if v is not None]
                if vs:
                    b.in_values = (
                        vs
                        if b.in_values is None
                        else [v for v in b.in_values if v in set(vs)]
                    )
                    b.narrow_lo(min(vs))
                    b.narrow_hi(max(vs))
            elif isinstance(f, GreaterThan) or isinstance(f, GreaterThanOrEqual):
                b.narrow_lo(f.value)
            elif isinstance(f, LessThan) or isinstance(f, LessThanOrEqual):
                b.narrow_hi(f.value)
        return filters  # all re-applied by Spark post-scan

    def partitions(self):
        key = self._manifest["key_col"]
        out = []
        for e in self._manifest["files"]:
            keep = True
            for col, b in self._bounds.items():
                if col == key:
                    flo, fhi = e["lo"], e["hi"]
                else:
                    st = (e.get("stats") or {}).get(col)
                    flo, fhi = (st[0], st[1]) if st else (None, None)
                if not b.may_intersect(flo, fhi):
                    keep = False
                    break
            if keep:
                out.append(
                    _FilePartition(
                        os.path.join(self._base, "files", e["file"]),
                        e.get("schema_id", 1),
                    )
                )
        # zero surviving files: Spark requires >= 1 partition; emit one
        # sentinel whose read yields nothing
        return out or [_FilePartition("", 1)]

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not partition.path:
            return
        t = pq.read_table(partition.path)
        n = t.num_rows
        arrays, names = [], []
        for c in self._spec:
            names.append(c["name"])
            typ = _arrow_type(c["type"])
            if c["name"] in t.column_names and partition.schema_id >= c["since"]:
                arrays.append(t.column(c["name"]).cast(typ))
            else:
                arrays.append(pa.array([c["default"]] * n, type=typ))
        for batch in pa.table(arrays, names=names).to_batches():
            yield batch


def _arrow_type(spark_type: str):
    import pyarrow as pa

    m = {
        "bigint": pa.int64(),
        "long": pa.int64(),
        "int": pa.int32(),
        "integer": pa.int32(),
        "double": pa.float64(),
        "float": pa.float32(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    if spark_type not in m:
        raise NotImplementedError(
            f"manifest_table connector: unmapped column type {spark_type!r} "
            "(extend _arrow_type)"
        )
    return m[spark_type]


class ManifestTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        _, m = _resolve_manifest(self.options)
        return ", ".join(f"`{c['name']}` {c['type']}" for c in _spec_of(m))

    def reader(self, schema) -> DataSourceReader:
        return _ManifestReader(dict(self.options))


def register(spark) -> None:
    """Register the format and enable Python-source filter pushdown (a
    runtime conf, off by default in 4.1 — Spark refuses to plan a reader
    that implements pushFilters while it is disabled, so the two must
    travel together)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ManifestTableDataSource)
