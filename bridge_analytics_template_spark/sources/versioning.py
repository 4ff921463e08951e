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
