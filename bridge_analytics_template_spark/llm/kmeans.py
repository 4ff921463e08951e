"""Lloyd's k-means over an embedding column — the iterative-clustering
counterpart of the one-shot IVF coarse quantizer (`similarity.py::ivf_knn`).

Scale design (100 TB of vectors, 1000 executors):
* Each iteration is ONE distributed pass: a `mapInPandas` batch kernel
  assigns every vector to its nearest centroid with a numpy GEMM and emits
  per-batch partial sums `(cluster, n, vec_sum)` — the map-side combine.
  Only ~(batches × k) tiny partial rows are collected; the driver reduce
  is O(k·d), exactly how MLlib's treeAggregate pattern terminates.
* Centroids travel executor-ward via a Spark broadcast, never a join.
* No shuffle at all in the loop — the only shuffle in the whole operator
  is none; partial collection is a collect of k rows per task.
* Determinism: seeds are the k rows with the lowest ``xxhash64(id)``
  (hash-rank, no RNG), argmin ties break to the lowest centroid index
  (numpy argmin), and empty clusters keep their previous centroid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _partial_sums_kernel(bc, vec_col: str):
    def run(batches):
        cm = bc.value  # (k, d) float64
        c_sq = (cm * cm).sum(axis=1)
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            d2 = -2.0 * (m @ cm.T) + c_sq  # ||x||^2 constant per row: dropped
            a = np.argmin(d2, axis=1)
            for c in np.unique(a):
                sel = m[a == c]
                yield pd.DataFrame(
                    {
                        "cluster": [int(c)],
                        "n": [int(len(sel))],
                        "vec_sum": [sel.sum(axis=0).tolist()],
                    }
                )

    return run


def _assign_kernel(bc, id_col: str, vec_col: str):
    def run(batches):
        cm = bc.value
        c_sq = (cm * cm).sum(axis=1)
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            a = np.argmin(-2.0 * (m @ cm.T) + c_sq, axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "cluster": a.astype(np.int64)})

    return run


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iterations`` Lloyd steps; return ``(id_col, cluster)``."""
    spark = df.sparkSession
    sc = spark.sparkContext
    seeds = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(k)
        .collect()
    )
    centroids = np.array([list(r[vec_col]) for r in seeds], dtype=np.float64)

    data = df.select(id_col, vec_col)
    for _ in range(iterations):
        bc = sc.broadcast(centroids)
        partials = data.mapInPandas(
            _partial_sums_kernel(bc, vec_col),
            schema="cluster long, n long, vec_sum array<double>",
        ).collect()
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids), dtype=np.int64)
        for r in partials:
            sums[r["cluster"]] += np.array(r["vec_sum"], dtype=np.float64)
            counts[r["cluster"]] += r["n"]
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        bc.destroy()

    bc = sc.broadcast(centroids)
    return data.mapInPandas(
        _assign_kernel(bc, id_col, vec_col), schema=f"{id_col} long, cluster long"
    )
