"""Distributed prefix aggregation (cumulative sum) without the
single-partition window.

``SUM(...) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`` with no PARTITION BY
funnels the whole dataset through ONE task — same cliff as global
``row_number`` (operators/rowids.py). The distributed recipe is identical:
range-partition + sort by the order key, sum values per partition, prefix-sum
those totals into per-partition offsets (driver-side over num_partitions
numbers), then one mapInPandas pass adds offset + local running sum.

Deterministic when the order columns form a total order. Exact for integer
value columns (the engine's money columns are int64 units); float cumsums are
sequential left-to-right within the global order, matching the
single-partition window's summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partitioned_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    cum_name: str = "cum",
    total_name: str | None = None,
    num_partitions: int = 32,
) -> DataFrame:
    """Add ``cum_name`` = running sum of ``value_col`` in ``order_cols``
    order, fully distributed. When ``total_name`` is given, also add the
    grand total as a constant column (it falls out of the offset pass for
    free — no extra job, no unpartitioned window)."""
    # persist: read twice (offsets job, then the cumsum pass) — see the
    # matching note in operators/rowids.py.
    parts = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .persist()
    )
    with_pid = parts.withColumn("_pid", F.spark_partition_id())
    sums = with_pid.groupBy("_pid").agg(F.sum(value_col).alias("s")).collect()
    by_pid = {r["_pid"]: r["s"] for r in sums}
    offsets, acc = {}, 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid] or 0
    total = acc
    spark = df.sparkSession
    b_offsets = spark.sparkContext.broadcast(offsets)

    out = parts.withColumn(cum_name, F.col(value_col))
    if total_name is not None:
        out = out.withColumn(total_name, F.col(value_col))
    out_schema = out.schema

    def add_cumsum(pdf_iter):
        # One partition arrives as a stream of Arrow batches; the running
        # sum carries across batches, the partition offset rides in on _pid.
        run = 0
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            pid = int(pdf["_pid"].iloc[0])
            base = b_offsets.value.get(pid, 0) + run
            res = pdf.drop(columns=["_pid"])
            res[cum_name] = res[value_col].cumsum() + base
            if total_name is not None:
                res[total_name] = total
            run += pdf[value_col].sum()
            yield res

    return with_pid.mapInPandas(add_cumsum, schema=out_schema)
