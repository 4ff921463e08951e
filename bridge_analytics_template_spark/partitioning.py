"""Partitioning utilities.

At cluster scale, inputs arrive in many partitions and these helpers are
no-ops; on small/local inputs (one parquet file → one partition) they unlock
the CPU-bound operators (hashing, shingling, vector folds) that would
otherwise run single-threaded regardless of cores.
"""

from __future__ import annotations

import os

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


def _parse_bytes(s: str) -> int:
    """Spark byte-size conf strings: bare ints or with b/k/m/g suffixes
    (``conf.get`` on an unset size conf returns e.g. ``"134217728b"``)."""
    s = s.strip().lower()
    units = {"pb": 1 << 50, "tb": 1 << 40, "gb": 1 << 30, "mb": 1 << 20,
             "kb": 1 << 10, "p": 1 << 50, "t": 1 << 40, "g": 1 << 30,
             "m": 1 << 20, "k": 1 << 10, "b": 1}
    for suf, mult in units.items():
        if s.endswith(suf):
            return int(s[: -len(suf)]) * mult
    return int(s)


def _packed_partition_estimate(
    df: DataFrame, files: list[str], target: int
) -> int | None:
    """Estimate how many partitions Spark's FilePartition packing will plan
    for these leaves, using the same formula as
    ``FilePartition.maxSplitBytes`` (size + openCostInBytes padding packed
    into maxSplitBytes bins). Returns None when file sizes aren't locally
    stat-able (remote scheme) or there are too many leaves to probe cheaply
    (>10k ⇒ the probe itself would cost more than the answer is worth)."""
    if len(files) > 10_000:
        return None
    try:
        conf = df.sparkSession.conf
        max_part = _parse_bytes(
            conf.get("spark.sql.files.maxPartitionBytes", str(128 << 20))
        )
        open_cost = _parse_bytes(
            conf.get("spark.sql.files.openCostInBytes", str(4 << 20))
        )
        cores = df.sparkSession.sparkContext.defaultParallelism
        total = 0
        for f in files:
            path = f[7:] if f.startswith("file://") else f
            total += os.stat(path).st_size + open_cost
        bytes_per_core = max(total // max(cores, 1), open_cost)
        max_split = min(max_part, bytes_per_core)
        return max(1, -(-total // max(max_split, 1)))
    except Exception:
        return None


def estimated_scan_rows(df: DataFrame) -> int | None:
    """Exact total row count of the plan's parquet leaves from footer
    metadata — a driver-side stat, NO Spark job. Returns None when the
    leaves aren't locally stat-able parquet files or there are too many to
    probe cheaply (>10k ⇒ the probe would cost more than the answer).
    Counts FILE rows, i.e. pre-filter: an upper bound on what any
    downstream operator can see, which is exactly what memory sizing
    wants."""
    files = df.inputFiles()
    if not files or len(files) > 10_000:
        return None
    try:
        import pyarrow.parquet as pq

        total = 0
        for f in files:
            if not f.endswith(".parquet"):
                return None
            path = f[7:] if f.startswith("file://") else f
            total += pq.ParquetFile(path).metadata.num_rows
        return total
    except Exception:
        return None


def adaptive_group_buckets(
    df: DataFrame, floor: int, target_rows_per_bucket: int = 1_000_000
) -> int:
    """Bucket count for hash-bucketed ``groupBy(...).applyInPandas`` ops:
    at least ``floor`` (keep every core busy), and GROWING with the input
    so one bucket's pandas frame stays bounded at roughly
    ``target_rows_per_bucket`` rows regardless of corpus size (VERDICT
    r10: a cores-only bucket count makes per-bucket memory O(N/cores) —
    a multi-GB pandas frame in one Python worker at 100 TB). Returns
    ``floor`` when the input size can't be estimated without a job.
    Bucket count never changes RESULTS for per-key ops (the grouping key
    only sets shuffle granularity), only memory/balance."""
    est = estimated_scan_rows(df)
    if est is None:
        return floor
    return max(floor, -(-est // max(target_rows_per_bucket, 1)))


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
            # Many leaves does NOT mean many scan partitions: Spark
            # bin-packs small files (maxPartitionBytes/openCostInBytes), so
            # 500 tiny files can plan as 4 tasks (ADVICE r5). Estimate the
            # packed partition count from local file sizes — one os.stat
            # per file, no plan translation; only when the estimate (or a
            # failed stat) says "narrow" do we pay the df.rdd fallback.
            packed = _packed_partition_estimate(df, files, target)
            if packed is not None and packed >= target:
                return df
        else:
            row_groups = _parquet_row_groups(files)
            if row_groups is not None and row_groups < target:
                return df.repartition(target)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
