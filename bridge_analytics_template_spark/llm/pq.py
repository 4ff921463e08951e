"""Product-quantization ANN (SURVEY.md §2.11 L3 family — the memory-bound
scale path next to sign-LSH and IVF).

PQ (Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011 — public literature) compresses each vector into ``m`` one-byte
codes: the vector is split into ``m`` subspaces and each subspace is
vector-quantized against its own ``ks``-entry codebook. A 64-d float32
embedding (256 B) becomes 8 B of codes — the difference between an index
that fits executor memory at corpus scale and one that does not.

Search is asymmetric distance computation (ADC): each query builds an
``m × ks`` table of subspace dot products against the codebooks (tiny,
driver-free), and a candidate's approximate similarity is ``m`` table
lookups summed — no float vector is ever touched at scan time.

Spark mapping:
* codebooks train driver-side on a DETERMINISTIC hash-ordered sample
  (bounded rows — same precondition as every ANN trainer here), then
  broadcast;
* encoding is one Arrow-batched mapInPandas pass (argmin per subspace via
  one GEMM against the codebook);
* scoring is one mapInPandas pass over the CODES (the float embeddings are
  not read), summing table lookups; exact top-k per query over the
  surviving per-batch partials, same shape as knn_bruteforce_np.

Cosine ranking: vectors are L2-normalized before quantization, so summed
subspace inner products approximate the full cosine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _train_codebooks(sample, m, ks, iters):
    """Per-subspace Lloyd's k-means on the normalized sample. Deterministic:
    init = first ks sample rows (already hash-ordered), empty clusters keep
    their previous centroid."""
    import numpy as np

    n, d = sample.shape
    dsub = d // m
    books = np.empty((m, ks, dsub), dtype=np.float64)
    for s in range(m):
        x = sample[:, s * dsub : (s + 1) * dsub]
        cents = x[:ks].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ks):
                members = x[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[s] = cents
    return books


def pq_knn(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 16,
    ks: int = 64,
    train_iters: int = 5,
    sample_size: int = 2048,
) -> DataFrame:
    """Approximate cosine top-k per query via PQ codes + ADC tables.
    Returns (query_id, neighbor_id, rank, sim_adc); ranks tie-break on the
    neighbor id, so output is deterministic."""
    import numpy as np
    import pandas as pd

    spark = candidates.sparkSession

    # --- train: deterministic hash-ordered sample, driver-side k-means ----
    sample_rows = (
        candidates.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), id_col)
        .limit(sample_size)
        .collect()
    )
    sm = np.array([list(r[1]) for r in sample_rows], dtype=np.float64)
    sm = sm / np.linalg.norm(sm, axis=1, keepdims=True)
    books = _train_codebooks(sm, m, ks, train_iters)
    b_books = spark.sparkContext.broadcast(books)
    d = sm.shape[1]
    dsub = d // m

    # --- encode candidates: argmin per subspace, one mapInPandas pass -----
    def encode(batches):
        bks = b_books.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            x = x / np.linalg.norm(x, axis=1, keepdims=True)
            codes = np.empty((len(x), m), dtype=np.int32)
            for s in range(m):
                xs = x[:, s * dsub : (s + 1) * dsub]
                d2 = ((xs[:, None, :] - bks[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"neighbor_id": pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    encoded = candidates.select(id_col, vec_col).mapInPandas(
        encode, schema="neighbor_id long, codes array<int>"
    )

    # --- search: ADC tables for the broadcast probe set -------------------
    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qm = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    # tables[q, s, c] = dot(q_sub_s, codebook[s][c])
    tables = np.einsum("qsd,scd->qsc", qm.reshape(len(qm), m, dsub), books)
    b_search = spark.sparkContext.broadcast((qids, tables))

    def score(batches):
        qids_l, tabs = b_search.value
        nq = len(qids_l)
        for pdf in batches:
            if pdf.empty:
                continue
            cids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
            # sims[c, q] = sum_s tabs[q, s, codes[c, s]]
            sims = np.zeros((len(cids), nq), dtype=np.float64)
            for s in range(m):
                sims += tabs[:, s, codes[:, s]].T
            kk = min(k + 1, len(cids))
            top = np.argpartition(-sims, kth=kk - 1, axis=0)[:kk]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids_l, kk),
                    "neighbor_id": cids[top.T.ravel()],
                    "sim_adc": np.take_along_axis(sims, top, axis=0).T.ravel(),
                }
            )

    partial = encoded.mapInPandas(
        score, schema="query_id long, neighbor_id long, sim_adc double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_adc"), F.col("neighbor_id"))
    return (
        partial.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim_adc")
    )


def ivfpq_knn(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 16,
    ks: int = 64,
    train_iters: int = 5,
    sample_size: int = 2048,
) -> DataFrame:
    """IVF-PQ: coarse inverted-file quantizer + product quantization of the
    RESIDUALS (v − centroid) — the composite index structure of the public
    FAISS/Jégou-2011 lineage, and the standard billion-scale ANN layout:
    the coarse assignment prunes the candidate list (× nprobe/n_centroids),
    the residual codes shrink memory ~32×, and residuals quantize far
    better than raw vectors because each inverted list is centered.

    score(q, c) ≈ dot(q, centroid[c]) + Σ_s T_q[s, code_s(c)] where
    T_q[s, j] = dot(q_sub_s, book[s][j]) — one table per query, built once,
    m lookups per candidate. Candidates outside the query's nprobe probed
    lists are masked out. Training (coarse centroids + shared residual
    codebooks) runs driver-side on the deterministic hash-ordered sample;
    encoding and scoring are each one Arrow-batched mapInPandas pass."""
    import numpy as np
    import pandas as pd

    spark = candidates.sparkSession
    sample_rows = (
        candidates.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), id_col)
        .limit(sample_size)
        .collect()
    )
    sm = np.array([list(r[1]) for r in sample_rows], dtype=np.float64)
    sm = sm / np.linalg.norm(sm, axis=1, keepdims=True)
    # Coarse quantizer: full-vector Lloyd == _train_codebooks with m=1.
    cents = _train_codebooks(sm, 1, n_centroids, train_iters)[0]  # (ncent, d)
    s_assign = (sm @ cents.T).argmax(axis=1)
    books = _train_codebooks(sm - cents[s_assign], m, ks, train_iters)
    b_enc = spark.sparkContext.broadcast((cents, books))
    d = sm.shape[1]
    dsub = d // m

    def encode(batches):
        cents_l, books_l = b_enc.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            x = x / np.linalg.norm(x, axis=1, keepdims=True)
            assign = (x @ cents_l.T).argmax(axis=1)
            res = x - cents_l[assign]
            codes = np.empty((len(x), m), dtype=np.int32)
            for s in range(m):
                rs = res[:, s * dsub : (s + 1) * dsub]
                d2 = ((rs[:, None, :] - books_l[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf[id_col].to_numpy(),
                    "cent_id": assign.astype(np.int64),
                    "codes": list(codes),
                }
            )

    encoded = candidates.select(id_col, vec_col).mapInPandas(
        encode, schema="neighbor_id long, cent_id long, codes array<int>"
    )

    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qm = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    qc = qm @ cents.T  # (nq, ncent): the dot(q, centroid) term
    order = np.argsort(-qc, axis=1, kind="stable")[:, :nprobe]
    probed = np.zeros_like(qc, dtype=bool)
    np.put_along_axis(probed, order, True, axis=1)
    tables = np.einsum("qsd,scd->qsc", qm.reshape(len(qm), m, dsub), books)
    b_search = spark.sparkContext.broadcast((qids, qc, probed, tables))

    def score(batches):
        qids_l, qc_l, probed_l, tabs = b_search.value
        nq = len(qids_l)
        for pdf in batches:
            if pdf.empty:
                continue
            cids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            cent = pdf["cent_id"].to_numpy(dtype=np.int64)
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)
            sims = qc_l[:, cent].T.copy()  # (n_cand, nq): centroid term
            for s in range(m):
                sims += tabs[:, s, codes[:, s]].T
            sims[~probed_l[:, cent].T] = -np.inf  # not in any probed list
            kk = min(k + 1, len(cids))
            top = np.argpartition(-sims, kth=kk - 1, axis=0)[:kk]
            vals = np.take_along_axis(sims, top, axis=0).T.ravel()
            keep = np.isfinite(vals)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids_l, kk)[keep],
                    "neighbor_id": cids[top.T.ravel()][keep],
                    "sim_adc": vals[keep],
                }
            )

    partial = encoded.mapInPandas(
        score, schema="query_id long, neighbor_id long, sim_adc double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_adc"), F.col("neighbor_id"))
    return (
        partial.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim_adc")
    )
