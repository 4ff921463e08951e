"""PCA operator (operators/pca.py): exact moments vs numpy, projection vs a
full-matrix numpy reference, and the documented determinism conventions."""

from __future__ import annotations

import numpy as np

from bridge_analytics_template_spark.catalog import load
from bridge_analytics_template_spark.operators.pca import (
    QSCALE,
    covariance_moments,
    pca_project,
    principal_components,
)

from conftest import SF_SMALL


def _matrix(spark):
    rows = load(spark, SF_SMALL, "embeddings").select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    x = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    return ids, x


def test_covariance_moments_exact(spark):
    ids, x = _matrix(spark)
    xq = np.floor(x * QSCALE).astype(np.int64)
    got = {
        (r.dim_i, r.dim_j): (r.n, r.sxy_q, r.sx_q, r.sy_q)
        for r in covariance_moments(load(spark, SF_SMALL, "embeddings")).collect()
    }
    d = x.shape[1]
    assert len(got) == d * (d + 1) // 2
    g = xq.T @ xq
    s = xq.sum(axis=0)
    for i in range(d):
        for j in range(i, d):
            assert got[(i, j)] == (len(ids), g[i, j], s[i], s[j])


def test_pca_projection_matches_numpy_reference(spark):
    ids, x = _matrix(spark)
    xq = np.floor(x * QSCALE) / QSCALE
    mean, comps, evals = principal_components(load(spark, SF_SMALL, "embeddings"))
    # components are orthonormal, eigenvalue-descending, sign-fixed
    assert np.allclose(comps @ comps.T, np.eye(len(comps)), atol=1e-9)
    assert all(evals[i] >= evals[i + 1] - 1e-12 for i in range(len(evals) - 1))
    for c in comps:
        assert c[int(np.argmax(np.abs(c)))] > 0
    want = (xq - mean) @ comps.T
    got = np.zeros_like(want)
    rows = pca_project(load(spark, SF_SMALL, "embeddings")).collect()
    pos = {v: i for i, v in enumerate(ids)}
    assert len(rows) == len(ids) * len(comps)
    for r in rows:
        got[pos[r.vec_id], r.component] = r.score
    assert np.allclose(got, want, atol=1e-12)
    # the top component actually dominates: its sample variance is maximal
    proj_var = want.var(axis=0)
    assert proj_var[0] == proj_var.max()
