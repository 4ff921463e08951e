"""Partitioning utilities.

At cluster scale, inputs arrive in many partitions and these helpers are
no-ops; on small/local inputs (one parquet file → one partition) they unlock
the CPU-bound operators (hashing, shingling, vector folds) that would
otherwise run single-threaded regardless of cores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _parquet_row_groups(files: list[str]) -> int | None:
    """Total row-group count across the plan's parquet leaves, or None when
    it can't be determined cheaply (non-local scheme, non-parquet files).
    Row groups — not Spark's byte-range splits — are parquet's real
    parallelism unit: a single-row-group file reports 32 input splits but
    31 of them are empty."""
    try:
        import pyarrow.parquet as pq

        total = 0
        for f in files:
            if not f.endswith(".parquet"):
                return None
            path = f[7:] if f.startswith("file://") else f
            total += pq.ParquetFile(path).metadata.num_row_groups
        return total
    except Exception:
        return None


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan can't actually execute at the
    session's parallelism. A shuffle of the (small) input buys full-width
    execution of every CPU-heavy stage after it; when the input is already
    wide, returns the plan untouched.

    Two narrowness signals, both cheap driver-side checks:

    * fewer planned partitions than the target (classic small input);
    * enough BYTE-RANGE splits but too few parquet ROW GROUPS — Spark
      plans ``maxPartitionBytes`` splits over a single-row-group file, but
      every split except one is empty, so the scan still runs one task.
      Detected from the parquet footers of the plan's leaves (skipped when
      the leaf count already reaches the target: many files ⇒ already
      parallel, and footer probing 100k objects would itself be a cost).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    # Parquet-footer probe FIRST: it answers from local metadata, while the
    # ``df.rdd`` fallback pays a full logical→RDD plan translation (~50 ms
    # of driver latency per query build). Many leaves ⇒ already parallel;
    # few row groups ⇒ repartition — both decided without touching df.rdd.
    files = df.inputFiles()
    if files:
        if len(files) >= target:
            return df
        row_groups = _parquet_row_groups(files)
        if row_groups is not None and row_groups < target:
            return df.repartition(target)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
