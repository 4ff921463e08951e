"""Partitioning utilities.

At cluster scale, inputs arrive in many partitions and these helpers are
no-ops; on small/local inputs (one parquet file → one partition) they unlock
the CPU-bound operators (hashing, shingling, vector folds) that would
otherwise run single-threaded regardless of cores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan has fewer partitions than the
    session's parallelism. A shuffle of the (small) input buys full-width
    execution of every CPU-heavy stage after it; when the input is already
    wide, returns the plan untouched."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
