"""Distributed PCA over an embedding column.

Two stages, both GEMM-shaped:

* :func:`covariance_moments` — exact int64 co-moment partials: each Arrow
  batch contributes ``Xq^T Xq`` (one numpy int64 GEMM) plus per-dimension
  sums, reduced by a d²-keyed hash aggregate. Quantizing to ``2^-20`` grid
  BEFORE the cross-row sums makes the moments exact integers on any combine
  order (the repo-wide float discipline, NOTES.md), so the covariance matrix
  is bit-reproducible and DuckDB-oracle-checkable.
* :func:`pca_project` — eigendecomposition of the d×d moment matrix on the
  driver (d² numbers — bounded metadata, not data), then one broadcast GEMM
  pass projecting every row onto the top components.

The corpus never funnels through one task: stage 1 is map-side GEMM partials
+ a 2080-key aggregate, stage 2 is an embarrassingly parallel mapInPandas.
int64 bound: |v| <= 8 → vq² < 2^47; ~2^16 rows per executor batch stay exact,
and the d²-key aggregate itself is exact int64 to ~4e5 vectors at these
magnitudes — a corpus-scale run widens the partial sums to DECIMAL(38,0)
(same discipline, wider accumulator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Quantization grid: values land on multiples of 2^-20 (exact in binary).
QSCALE = 1 << 20
#: Product scale: vq_i * vq_j is on the 2^-40 grid.
QSCALE2 = float((1 << 20) * (1 << 20))


def covariance_moments(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Upper-triangle exact co-moments of the quantized embedding matrix.

    Returns one row per (dim_i <= dim_j): ``n`` vectors, exact int64
    ``sxy_q`` = Σ vq_i·vq_j, ``sx_q`` = Σ vq_i, ``sy_q`` = Σ vq_j, and the
    derived ``cov`` — a fixed IEEE expression of the exact integers, so it
    is identical on any engine computing the same formula.
    """
    import numpy as np
    import pandas as pd

    iu0, iu1 = np.triu_indices(dim)

    def partials(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            xq = np.floor(x * QSCALE).astype(np.int64)
            g = xq.T @ xq
            s = xq.sum(axis=0)
            yield pd.DataFrame(
                {
                    "dim_i": iu0.astype(np.int32),
                    "dim_j": iu1.astype(np.int32),
                    "n_part": np.int64(len(pdf)),
                    "g_part": g[iu0, iu1],
                    "si_part": s[iu0],
                    "sj_part": s[iu1],
                }
            )

    part = df.select(vec_col).mapInPandas(
        partials,
        schema="dim_i int, dim_j int, n_part long, g_part long, si_part long, sj_part long",
    )
    agg = part.groupBy("dim_i", "dim_j").agg(
        F.sum("n_part").alias("n"),
        F.sum("g_part").alias("sxy_q"),
        F.sum("si_part").alias("sx_q"),
        F.sum("sj_part").alias("sy_q"),
    )
    cov = (
        F.col("sxy_q").cast("double") / F.col("n")
        - (F.col("sx_q").cast("double") / F.col("n"))
        * (F.col("sy_q").cast("double") / F.col("n"))
    ) / F.lit(QSCALE2)
    return agg.select("dim_i", "dim_j", "n", "sxy_q", "sx_q", "sy_q", cov.alias("cov"))


def principal_components(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64, p: int = 8
):
    """Driver-side eigendecomposition of the exact moment matrix.

    Returns ``(mean, components, eigenvalues)`` as numpy arrays; components
    are the top-``p`` eigenvectors (rows), eigenvalue-descending, each
    sign-fixed so its largest-magnitude coordinate is positive — the
    standard determinism convention (eigenvectors are only defined up to
    sign).
    """
    import numpy as np

    rows = covariance_moments(df, vec_col, dim).collect()
    n = rows[0]["n"]
    c = np.zeros((dim, dim))
    s = np.zeros(dim)
    for r in rows:
        c[r["dim_i"], r["dim_j"]] = c[r["dim_j"], r["dim_i"]] = r["cov"]
        s[r["dim_i"]] = r["sx_q"]
    mean = s / n / QSCALE
    evals, evecs = np.linalg.eigh(c)
    order = np.argsort(-evals)[:p]
    comps = evecs[:, order].T.copy()
    for i in range(p):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    p: int = 8,
) -> DataFrame:
    """Project every row onto the top-``p`` principal components: one
    broadcast of the (p × d) component matrix, one numpy GEMM per Arrow
    batch — the same embarrassingly-parallel shape as brute-force KNN
    scoring. Output is long-form (vec_id, component, score)."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    mean, comps, _ = principal_components(df, vec_col, dim, p)
    b = spark.sparkContext.broadcast((mean, comps))

    def run(batches):
        mu, w = b.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            xq = np.floor(x * QSCALE) / QSCALE  # same grid as the moments
            y = (xq - mu) @ w.T
            n, k = y.shape
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf[id_col].to_numpy(dtype=np.int64), k),
                    "component": np.tile(np.arange(k, dtype=np.int32), n),
                    "score": y.ravel(),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, component int, score double"
    )
