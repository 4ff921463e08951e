"""Semantic deduplication (SemDeDup-style): cluster embeddings, then drop
within-cluster near-duplicates above a cosine threshold.

Published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"): k-means the embedding space so
candidate comparisons are confined to small clusters, then within each
cluster keep one representative of every near-duplicate group. Complexity
drops from O(n²) to O(n²/k) with k clusters — the property that makes
embedding dedup feasible at 100 TB: clusters shard across executors and
each pairwise block fits in one task's memory.

Spark shape: reuse the zero-shuffle Lloyd's loop (llm/kmeans.py) for
assignment, then ONE `applyInPandas` over `groupBy(cluster)` for the
within-cluster pairwise block — numpy GEMM per cluster, no cross-cluster
traffic. Keep-rule: a vector is dropped iff some *kept lower-id* vector in
its cluster is within the threshold (greedy keep-first by id — the same
deterministic rule the exact dedup family uses)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .kmeans import kmeans_assign


def semdedup(
    df: DataFrame,
    threshold: float = 0.95,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Return ``(id_col, cluster, keep)`` — ``keep=false`` marks semantic
    duplicates of an earlier kept vector in the same cluster."""
    assigned = kmeans_assign(df, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col)
    with_vec = df.select(id_col, vec_col).join(assigned, id_col)

    def dedup_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        n = len(pdf)
        keep = np.ones(n, dtype=bool)
        # Greedy keep-first by ascending id: O(n_cluster²) on the GEMM
        # result; the scan itself is O(n²) bit-ops but branch-cheap.
        for i in range(n):
            if not keep[i]:
                continue
            dups = sims[i, i + 1 :] >= threshold
            keep[i + 1 :] &= ~dups
        return pd.DataFrame(
            {id_col: pdf[id_col], "cluster": pdf["cluster"], "keep": keep}
        )

    return with_vec.groupBy("cluster").applyInPandas(
        dedup_cluster, schema=f"{id_col} long, cluster long, keep boolean"
    )
