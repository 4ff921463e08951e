"""File-level min/max manifest index + query-time scan pruning.

The Iceberg/Delta idea re-expressed on plain parquet: keep a tiny manifest
table of per-FILE column bounds, and plan selective scans from the manifest
instead of listing + footer-probing every file. Parquet row-group statistics
already prune WITHIN a file the reader opens; the manifest prunes the file
LIST itself — at 100 TB (millions of objects) the listing/open round-trips
are the cost, and a bounds manifest turns a full-prefix scan into an exact
file set before the first byte of data is read.

Pairs with the layout contract: range-clustered or Z-ordered writes
(`operators/zorder.py`) make per-file bounds tight, which is what makes the
manifest selective. The manifest itself is one row per file — bounded
metadata, safe to collect/broadcast by construction.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_file_index(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """One distributed pass over the dataset: per-file row count plus
    min/max bounds for ``cols``, keyed by ``input_file_name()``. At scale
    this is a scan of only the indexed columns (column pruning applies) and
    one hash aggregate on |files| keys."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def prune_files(index: DataFrame, predicates: dict[str, tuple]) -> list[str]:
    """Files whose per-column [min, max] envelope intersects every
    ``col: (lo, hi)`` range (None = unbounded on that side). The manifest is
    one row per file, so the collect is bounded metadata, not data."""
    conds = []
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            conds.append(F.col(f"max_{c}") >= lo)
        if hi is not None:
            conds.append(F.col(f"min_{c}") <= hi)
    cond = reduce(lambda a, b: a & b, conds) if conds else F.lit(True)
    return [r["file"] for r in index.filter(cond).select("file").collect()]


def pruned_read(
    spark: SparkSession,
    index: DataFrame,
    predicates: dict[str, tuple],
    schema_from: str,
) -> DataFrame:
    """Read ONLY the manifest-selected files and re-apply the ranges as a
    residual filter (the manifest prunes at file granularity; the residual
    keeps row-level exactness). An empty selection short-circuits to an
    empty frame with the dataset's schema — no listing, no scan."""
    files = prune_files(index, predicates)
    if not files:
        empty = spark.read.parquet(schema_from).schema
        return spark.createDataFrame([], empty)
    df = spark.read.parquet(*files)
    for c, (lo, hi) in predicates.items():
        if lo is not None:
            df = df.filter(F.col(c) >= lo)
        if hi is not None:
            df = df.filter(F.col(c) <= hi)
    return df


def update_file_index(
    spark: SparkSession, index: DataFrame, path: str, cols: list[str]
) -> DataFrame:
    """Incremental manifest upkeep for an append-only dataset: bound-scan
    ONLY files absent from the existing manifest and union their rows in.
    The existing manifest is the anti-join's broadcast side (bounded
    metadata); appended files are discovered from the listing, so upkeep
    cost is proportional to NEW data, never a re-index of the corpus."""
    df = spark.read.parquet(path)
    known = index.select("file")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    fresh = (
        df.withColumn("file", F.input_file_name())
        .join(F.broadcast(known), "file", "left_anti")
        .groupBy("file")
        .agg(*aggs)
    )
    return index.unionByName(fresh)
