"""Partitioned Parquet sink — the reference's S3 analytics layout.

The reference declares its analytics copy at
``bridge-downstream/{app}/{study}/parquet/``
(/root/reference/src/copy_from_template.py:316-327). The engine writes the
same deterministic layout with ``partitionBy``: directory-level partition
values give static + dynamic partition pruning on read-back, which is the
mechanism that keeps per-study queries from scanning 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    base_path: str,
    partition_cols: tuple[str, ...] = ("app", "study"),
    mode: str = "overwrite",
) -> str:
    """Write ``df`` under ``base_path`` partitioned by the layout columns
    (defaults mirror the reference's ``{app}/{study}``)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(base_path)
    return base_path


def read_partitioned(spark: SparkSession, base_path: str) -> DataFrame:
    """Read the layout back; Spark discovers the partition columns from the
    directory structure, so filters on them prune before any file IO."""
    return spark.read.parquet(base_path)
