"""k-means: assignments match a global numpy reference run from the same
hash-rank seeds, and clusters are non-trivial."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bridge_analytics_template_spark.catalog import load
from bridge_analytics_template_spark.llm.kmeans import kmeans_assign

K, ITERS = 8, 5


def _numpy_kmeans(vecs: np.ndarray, seeds: np.ndarray, iters: int) -> np.ndarray:
    cm = seeds.astype(np.float64).copy()
    for _ in range(iters):
        d2 = ((vecs[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for c in range(len(cm)):
            if (a == c).any():
                cm[c] = vecs[a == c].mean(axis=0)
    d2 = ((vecs[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1)


def test_kmeans_matches_numpy(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(e, k=K, iterations=ITERS).collect()
    }
    seed_rows = (
        e.select("vec_id", "embedding")
        .orderBy(F.xxhash64(F.col("vec_id")), F.col("vec_id"))
        .limit(K)
        .collect()
    )
    seeds = np.array([list(r["embedding"]) for r in seed_rows])
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    want = _numpy_kmeans(vecs, seeds, ITERS)
    assert len(got) == len(pdf)
    mism = sum(
        got[v] != w for v, w in zip(pdf["vec_id"].tolist(), want.tolist())
    )
    assert mism == 0
    assert len(set(got.values())) > 1  # clusters actually separate
