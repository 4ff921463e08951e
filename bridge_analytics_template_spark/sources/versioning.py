"""Versioned dataset snapshots.

Training reproducibility needs "the corpus as of run N", not "the corpus
now". Cheap immutable versioning over plain parquet: each publish writes a
new ``v=N`` subdirectory (never rewriting old ones), readers pin a version
or take the latest. The directory-per-version layout is the same contract a
table format (Delta/Iceberg) provides via metadata, reduced to what a
training pipeline actually pins: an immutable snapshot id.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

_V = re.compile(r"^v=(\d+)$")


def _versions(base: str) -> list[int]:
    if not os.path.isdir(base):
        return []
    return sorted(int(m.group(1)) for d in os.listdir(base) if (m := _V.match(d)))


def write_version(df: DataFrame, base: str) -> int:
    """Publish a new immutable snapshot; returns its version number."""
    v = (_versions(base)[-1] + 1) if _versions(base) else 1
    df.write.mode("errorifexists").parquet(f"{base}/v={v}")
    return v


def read_version(spark: SparkSession, base: str, version: int | None = None) -> DataFrame:
    """Read a pinned snapshot (default: latest)."""
    vs = _versions(base)
    if not vs:
        raise FileNotFoundError(f"no versions under {base}")
    v = version if version is not None else vs[-1]
    if v not in vs:
        raise FileNotFoundError(f"version {v} not in {vs}")
    return spark.read.parquet(f"{base}/v={v}")


def snapshot_diff(
    spark: SparkSession, base: str, v_old: int, v_new: int, key_cols: list[str]
) -> DataFrame:
    """Change feed between two snapshots: one row per key that was inserted,
    deleted, or updated (any non-key column differs), tagged ``change``.
    FULL OUTER join on the key + a row-hash comparison — the CDC read a
    table format derives from its log, computed directly from the immutable
    snapshot pair."""
    from pyspark.sql import functions as F

    old = read_version(spark, base, v_old)
    new = read_version(spark, base, v_new)
    value_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(
        *[F.col(c).alias(f"k_{c}") for c in key_cols],
        F.xxhash64(*[F.col(c) for c in value_cols]).alias("old_hash"),
    )
    n = new.select(
        *[F.col(c).alias(f"k_{c}") for c in key_cols],
        F.xxhash64(*[F.col(c) for c in value_cols]).alias("new_hash"),
    )
    j = o.join(n, [f"k_{c}" for c in key_cols], "full_outer")
    return (
        j.select(
            *[F.col(f"k_{c}").alias(c) for c in key_cols],
            F.when(F.col("old_hash").isNull(), "insert")
            .when(F.col("new_hash").isNull(), "delete")
            .when(F.col("old_hash") != F.col("new_hash"), "update")
            .alias("change"),
        )
        .filter(F.col("change").isNotNull())
    )
