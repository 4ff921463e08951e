"""Dataset maintenance: small-file compaction.

Streaming sinks and frequent incremental batches leave thousands of tiny
parquet files per partition; at 100 TB the resulting listing + open overhead
dominates scan time long before bytes do. Compaction rewrites a prefix to
~``target_file_bytes`` files and atomically swaps it in.

Cites the reference's layout contract: the analytics copy lives under a
deterministic prefix (`/root/reference/src/copy_from_template.py:316-327`),
so compaction is a per-prefix rewrite, parallelizable across `{app}/{study}`
partitions.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 << 20
) -> int:
    """Rewrite the parquet dataset at ``path`` into ``ceil(bytes/target)``
    files and swap it in place. Returns the new file count.

    Local-FS implementation of the swap (rename); an object-store deployment
    swaps a catalog pointer or writes to a versioned prefix instead —
    rename-as-commit is not atomic on S3."""
    n_files = max(1, -(-_tree_bytes(path) // target_file_bytes))
    df = spark.read.parquet(path)
    tmp = f"{path}__compacting"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    old = f"{path}__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files
