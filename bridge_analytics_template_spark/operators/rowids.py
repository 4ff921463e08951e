"""Contiguous global row ids without a single-partition sort.

``row_number()`` over an unpartitioned window funnels the whole dataset
through ONE task — the canonical scale cliff. The distributed recipe:
range-partition + sort by the order key, count rows per partition, prefix-sum
the counts into per-partition offsets (a driver-side op over num_partitions
integers), then add offset + local index in a single mapInPandas pass.
Deterministic for a unique order key.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_contiguous_ids(
    df: DataFrame,
    order_col: str | list[str],
    id_name: str = "row_id",
    num_partitions: int = 32,
) -> DataFrame:
    """Add ``id_name`` = 0..n-1 in ``order_col`` order, fully distributed.

    ``order_col`` may be a list of column names for a composite order; the
    columns must form a TOTAL order (unique key) — rows with equal keys can
    straddle a range-partition boundary, which would make their relative ids
    partition-order-dependent.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    # persist: the partitioned+sorted form is read twice (offsets job, then
    # the id pass) — caching both skips the second sort AND pins one range
    # partitioning for both passes instead of leaning on RangePartitioner's
    # deterministic re-sampling. Freed by the harness clearCache.
    parts = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .persist()
    )
    counts = (
        parts.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_pid = {r["_pid"]: r["n"] for r in counts}
    offsets, acc = {}, 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]
    spark = df.sparkSession
    b_offsets = spark.sparkContext.broadcast(offsets)
    out_schema = parts.withColumn(id_name, F.lit(0).cast("long")).schema

    def add_ids(pdf_iter):
        # mapInPandas sees one partition as a stream of Arrow batches; the
        # partition id rides in on a column so the offset survives batching.
        local = 0
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            pid = int(pdf["_pid"].iloc[0])
            base = b_offsets.value.get(pid, 0) + local
            out = pdf.drop(columns=["_pid"])
            out[id_name] = pd.RangeIndex(base, base + len(out)).astype("int64")
            local += len(out)
            yield out

    with_pid = parts.withColumn("_pid", F.spark_partition_id())
    return with_pid.mapInPandas(add_ids, schema=out_schema)
