"""SparkSession factory tuned for this engine.

Local-mode settings mirror what a cluster deployment would set per-executor:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
shuffle partitions sized to cores rather than the 200 default, Arrow enabled
for the Pandas-UDF slow path, and a UTC session timezone so timestamp
semantics match columnar stores (and the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "bridge-analytics-spark", cores: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` or all local cores. On a real
    cluster the ``master`` local[) line is replaced by the cluster manager;
    every other conf below is cluster-appropriate as-is.
    """
    n = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Debug-only call-site capture costs 3-4 extra py4j round trips per
        # DataFrame method — measured 0.4-0.8 s of pure driver latency on
        # plan-heavy queries (the dedup cascade builds ~700 jvm calls).
        # Production clusters run with it off; errors still carry the full
        # Python traceback.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
