"""Bucketed tables: co-located joins and aggregations without shuffles.

At 100 TB the dominant cost of ``fact ⋈ fact`` is the shuffle of both
sides. Bucketing pre-partitions the stored table by join key
(``bucketBy(n, key)`` + ``saveAsTable``): two tables bucketed the same way
join with ZERO exchanges — the sort-merge join reads co-located buckets
directly. The same layout serves repeated aggregations on the bucket key.

This is the storage-level complement of the ``{app}/{study}`` directory
layout (sink.py): directories give partition *pruning*, buckets give join
*co-location*; production tables use both.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _drop_table_and_location(spark: SparkSession, table: str) -> None:
    """Drop a managed table AND its on-disk location.

    A killed session can leave the warehouse directory behind without the
    catalog entry; ``saveAsTable`` then fails with LOCATION_ALREADY_EXISTS.
    """
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    path = urlparse(warehouse).path or warehouse
    shutil.rmtree(f"{path.rstrip('/')}/{table.lower()}", ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.
    Sorting within buckets lets the sort-merge join skip its sort too."""
    if mode == "overwrite":
        _drop_table_and_location(df.sparkSession, table)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
