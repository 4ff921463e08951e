"""Persistent ANN indexes — build once, probe many times (SURVEY.md §2.11 L3).

The in-query ANN paths (:mod:`similarity` IVF, :mod:`pq` IVF-PQ) retrain
their coarse quantizer and codebooks on every call — fine for a one-shot
query, wrong for a production corpus where the index is built once per
corpus snapshot and probed by every downstream job (dedup sweeps,
retrieval evals, incremental-ingest lookups). This module splits the two
phases around a stored layout:

* ``{path}/meta.json`` — the bounded driver state: coarse centroids,
  residual codebooks, dims and params. Kilobytes; read once per probe job
  and broadcast.
* ``{path}/lists/`` — the inverted lists as parquet PARTITIONED BY
  ``centroid_id``: at probe time the ``centroid_id IN (probed…)`` filter
  becomes *partition pruning*, so a 100 TB index reads only
  nprobe/n_centroids of its files — the scan-level analogue of FAISS's
  inverted-list seek. IVF lists store the raw vectors (exact re-scoring);
  IVF-PQ lists store only the m one-byte residual codes (~32× smaller, ADC
  scoring, no float vector touched at probe time).

Probe-from-disk is pinned equal to build-and-probe in
tests/test_merge_ivf.py: the stored index reproduces ``ivf_knn`` /
``ivfpq_knn`` ids and ranks exactly (same deterministic trainer, same
scoring kernels). New documents can probe a stored index without touching
the corpus that built it — the incremental-ingest pairing of
``llm_dedup_incremental``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import as_double
from ..partitioning import ensure_parallelism
from .similarity import _nearest_centroids_np


def _meta_path(path: str) -> str:
    return os.path.join(path, "meta.json")


def _lists_path(path: str, meta: dict | None = None) -> str:
    """Base lists location. After a compaction the base lives in a
    versioned subdir recorded in meta ("base_dir") — meta.json is the
    atomic commit point, so readers resolve through it and a crashed
    compaction can never leave them pointing at half-deleted data."""
    base = (meta or {}).get("base_dir") or ""
    return os.path.join(path, base, "lists") if base else os.path.join(path, "lists")


# --- IVF: inverted lists of raw vectors -------------------------------------


def save_ivf_index(
    candidates: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
) -> None:
    """Train + assign + persist an IVF index. Same deterministic build as
    :func:`similarity.ivf_knn` (hash-ordered centroid sample, GEMM
    assignment), so a probe against the stored index reproduces it
    exactly. The assignment pass is one distributed write; only the
    n_centroids-row quantizer touches the driver."""
    c = ensure_parallelism(candidates).select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    cents_rows = (
        candidates.select(
            F.col(id_col).alias("centroid_id"), as_double(F.col(vec_col)).alias("cent")
        )
        .orderBy(F.xxhash64(F.col("centroid_id")), "centroid_id")
        .limit(n_centroids)
        .orderBy("centroid_id")
        .collect()
    )
    assigned = _nearest_centroids_np(c, "neighbor_id", "cv", cents_rows, 1)
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(_lists_path(path))
    meta = {
        "kind": "ivf",
        "n_centroids": n_centroids,
        "centroid_ids": [int(r["centroid_id"]) for r in cents_rows],
        "centroids": [list(map(float, r["cent"])) for r in cents_rows],
        "segments": [],
    }
    from .index_maintenance import atomic_write_json

    atomic_write_json(_meta_path(path), meta)


def compact_ann_index(spark: SparkSession, path: str) -> None:
    """Fold appended segments back into an IVF or IVF-PQ base index —
    assignments/codes are already final (the stored quantizer never moves
    on append), so compaction is a pure file rewrite: read base+segments,
    write a NEW versioned base dir, then atomically commit meta to point
    at it (base_dir + cleared segments). The superseded layout is
    DEFER-SWEPT — kept on disk until the NEXT compaction commits
    (index_maintenance.commit_compaction) — so probe DataFrames planned
    against the old meta keep resolving their files for a full cycle; a
    crash at any instant leaves either the old index fully intact or the
    new one committed with only stale dirs pending sweep. Works for both
    kinds (the partition column differs: centroid_id vs cent_id)."""
    from .index_maintenance import commit_compaction, next_base_dir, read_tombstones

    with open(_meta_path(path)) as fh:
        meta = json.load(fh)
    segs = meta.get("segments", [])
    tombs = meta.get("tombstones", [])
    if not segs and not tombs:
        return
    tomb = read_tombstones(spark, path, meta)
    part_col = "centroid_id" if meta["kind"] == "ivf" else "cent_id"
    roots = [_lists_path(path, meta)] + [
        os.path.join(path, "segments", s, "lists") for s in segs
    ]
    parts = [
        spark.read.parquet(r).withColumn(part_col, F.col(part_col).cast("long"))
        for r in roots
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    if tomb is not None:  # tombstoned vectors drop PHYSICALLY here
        union = union.join(tomb, union["neighbor_id"] == tomb["id"], "left_anti")
    old_base = meta.get("base_dir") or ""
    new_base = next_base_dir(meta)
    union.write.mode("overwrite").partitionBy(part_col).parquet(
        os.path.join(path, new_base, "lists")
    )
    superseded = (
        ([old_base] if old_base else ["lists"])
        + [os.path.join("segments", s) for s in segs]
        + [os.path.join("tombstones", t) for t in tombs]
    )
    meta["base_dir"] = new_base
    meta["segments"] = []
    meta["tombstones"] = []
    commit_compaction(path, _meta_path(path), meta, superseded)


def append_ivf_segment(
    new_vectors: DataFrame,
    path: str,
    segment: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """GROW a stored IVF index: the new batch is assigned with the STORED
    coarse quantizer (the centroids never move — quantizer drift is a
    rebuild decision, not an append) and lands as an immutable segment
    ``{path}/segments/{segment}/lists``, centroid-partitioned like the
    base. Probes union base + segments; daily ingest is O(new batch)."""
    from pyspark.sql import Row

    with open(_meta_path(path)) as fh:
        meta = json.load(fh)
    if segment in meta.get("segments", []):
        raise ValueError(f"segment {segment!r} already exists in {path}")
    if os.path.join("segments", segment) in meta.get("stale", []):
        # the name's dir is deferred-swept garbage of the previous
        # compaction — writing into it would break old-meta probe plans
        # (same hazard as tombstone-name reuse; review finding r8)
        raise ValueError(f"segment name {segment!r} is pending deferred sweep in {path}; pick a fresh name")
    cents_rows = [
        Row(centroid_id=cid, cent=cent)
        for cid, cent in zip(meta["centroid_ids"], meta["centroids"])
    ]
    c = ensure_parallelism(new_vectors).select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    assigned = _nearest_centroids_np(c, "neighbor_id", "cv", cents_rows, 1)
    seg_lists = os.path.join(path, "segments", segment, "lists")
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(seg_lists)
    meta["segments"] = meta.get("segments", []) + [segment]
    from .index_maintenance import atomic_write_json

    atomic_write_json(_meta_path(path), meta)


def probe_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
) -> DataFrame:
    """Top-k against a stored IVF index. The probed-centroid filter reaches
    the parquet scan as partition pruning — only nprobe/n_centroids of the
    stored lists are read. Scoring is the same per-list GEMM as ivf_knn
    (shared `_score_ivf_lists_np`), so probe-from-disk stays bit-identical
    to build-and-probe. Committed tombstones (index_maintenance.
    add_tombstones) are anti-joined out of the pruned lists before
    scoring, so an erased vector can never be returned as a neighbor —
    probe-after-delete == rebuild-without-deleted, test-pinned."""
    from pyspark.sql import Row

    from .index_maintenance import read_tombstones

    with open(_meta_path(path)) as fh:
        meta = json.load(fh)
    # Row supports both r["centroid_id"] and positional r[1], matching the
    # collected-Row shape _nearest_centroids_np expects.
    cents_rows = [
        Row(centroid_id=cid, cent=cent)
        for cid, cent in zip(meta["centroid_ids"], meta["centroids"])
    ]
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    probes = _nearest_centroids_np(q, "query_id", "qv", cents_rows, nprobe)
    # The probe set is broadcast-small by precondition (same as every ANN
    # probe path), so the union of probed list ids is bounded driver state
    # — and, pushed into the scan, prunes whole partitions of the index.
    probed_cents = sorted({r["centroid_id"] for r in probes.select("centroid_id").collect()})
    roots = [_lists_path(path, meta)] + [
        os.path.join(path, "segments", s, "lists") for s in meta.get("segments", [])
    ]
    # one pruned read per segment root, unioned by name (multi-path reads
    # trip partition discovery at mixed depths)
    parts = [
        spark.read.parquet(r)
        .withColumn("centroid_id", F.col("centroid_id").cast("long"))
        .filter(F.col("centroid_id").isin(probed_cents))
        for r in roots
    ]
    lists = parts[0]
    for p in parts[1:]:
        lists = lists.unionByName(p)
    tomb = read_tombstones(spark, path, meta)
    if tomb is not None:
        lists = lists.join(tomb, lists["neighbor_id"] == tomb["id"], "left_anti")
    from .similarity import _score_ivf_lists_np

    return _score_ivf_lists_np(lists, probes, k)


# --- IVF-PQ: inverted lists of residual codes --------------------------------


def save_ivfpq_index(
    candidates: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    m: int = 16,
    ks: int = 64,
    train_iters: int = 5,
    sample_size: int = 2048,
) -> None:
    """Train + encode + persist an IVF-PQ index: coarse centroids and the
    shared residual codebooks go to meta.json (bounded driver state), the
    per-vector m-byte code rows go to parquet partitioned by their coarse
    list. Identical deterministic training to :func:`pq.ivfpq_knn`."""
    import numpy as np
    import pandas as pd

    from .pq import _train_codebooks

    spark = candidates.sparkSession
    sample_rows = (
        candidates.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), id_col)
        .limit(sample_size)
        .collect()
    )
    sm = np.array([list(r[1]) for r in sample_rows], dtype=np.float64)
    sm = sm / np.linalg.norm(sm, axis=1, keepdims=True)
    cents = _train_codebooks(sm, 1, n_centroids, train_iters)[0]
    s_assign = (sm @ cents.T).argmax(axis=1)
    books = _train_codebooks(sm - cents[s_assign], m, ks, train_iters)
    encoded = _encode_ivfpq(candidates, cents, books, id_col, vec_col)
    encoded.write.mode("overwrite").partitionBy("cent_id").parquet(_lists_path(path))
    meta = {
        "kind": "ivfpq",
        "n_centroids": n_centroids,
        "m": m,
        "ks": ks,
        "dim": int(sm.shape[1]),
        "centroids": cents.tolist(),
        "codebooks": books.tolist(),
        "segments": [],
    }
    from .index_maintenance import atomic_write_json

    atomic_write_json(_meta_path(path), meta)


def _encode_ivfpq(candidates, cents, books, id_col, vec_col):
    """Residual-PQ encode against a FIXED quantizer (coarse centroids +
    codebooks) — one Arrow pass; shared by the initial build and segment
    appends so grown and rebuilt indexes carry identical codes."""
    import numpy as np
    import pandas as pd

    spark = candidates.sparkSession
    m = books.shape[0]
    dsub = books.shape[2]
    b_enc = spark.sparkContext.broadcast((cents, books))

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

    return candidates.select(id_col, vec_col).mapInPandas(
        encode, schema="neighbor_id long, cent_id long, codes array<int>"
    )


def append_ivfpq_segment(
    new_vectors: DataFrame,
    path: str,
    segment: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """GROW a stored IVF-PQ index: encode the new batch with the STORED
    centroids and codebooks (no retraining — drift is a rebuild decision)
    into an immutable centroid-partitioned segment of code rows."""
    import numpy as np

    with open(_meta_path(path)) as fh:
        meta = json.load(fh)
    if segment in meta.get("segments", []):
        raise ValueError(f"segment {segment!r} already exists in {path}")
    if os.path.join("segments", segment) in meta.get("stale", []):
        # the name's dir is deferred-swept garbage of the previous
        # compaction — writing into it would break old-meta probe plans
        # (same hazard as tombstone-name reuse; review finding r8)
        raise ValueError(f"segment name {segment!r} is pending deferred sweep in {path}; pick a fresh name")
    cents = np.array(meta["centroids"], dtype=np.float64)
    books = np.array(meta["codebooks"], dtype=np.float64)
    encoded = _encode_ivfpq(new_vectors, cents, books, id_col, vec_col)
    encoded.write.mode("overwrite").partitionBy("cent_id").parquet(
        os.path.join(path, "segments", segment, "lists")
    )
    meta["segments"] = meta.get("segments", []) + [segment]
    from .index_maintenance import atomic_write_json

    atomic_write_json(_meta_path(path), meta)


def probe_ivfpq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
) -> DataFrame:
    """Top-k against a stored IVF-PQ index: ADC tables built per query from
    the stored codebooks, partition-pruned scan of only the probed lists,
    the same masked scoring kernel as ivfpq_knn (so ids/ranks match
    build-and-probe exactly)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    with open(_meta_path(path)) as fh:
        meta = json.load(fh)
    cents = np.array(meta["centroids"], dtype=np.float64)
    books = np.array(meta["codebooks"], dtype=np.float64)
    m = meta["m"]
    dsub = meta["dim"] // m

    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qm = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    qc = qm @ cents.T
    order = np.argsort(-qc, axis=1, kind="stable")[:, : min(nprobe, len(cents))]
    probed = np.zeros_like(qc, dtype=bool)
    np.put_along_axis(probed, order, True, axis=1)
    tables = np.einsum("qsd,scd->qsc", qm.reshape(len(qm), m, dsub), books)
    b_search = spark.sparkContext.broadcast((qids, qc, probed, tables))

    probed_cents = sorted(int(c) for c in np.unique(order))
    roots = [_lists_path(path, meta)] + [
        os.path.join(path, "segments", s, "lists") for s in meta.get("segments", [])
    ]
    parts = [
        spark.read.parquet(r)
        .withColumn("cent_id", F.col("cent_id").cast("long"))
        .filter(F.col("cent_id").isin(probed_cents))
        for r in roots
    ]
    codes_df = parts[0]
    for p in parts[1:]:
        codes_df = codes_df.unionByName(p)
    from .index_maintenance import read_tombstones

    tomb = read_tombstones(spark, path, meta)
    if tomb is not None:  # erased vectors never reach the ADC scorer
        codes_df = codes_df.join(
            tomb, codes_df["neighbor_id"] == tomb["id"], "left_anti"
        )

    def score(batches):
        qids_l, qc_l, probed_l, tabs = b_search.value
        for pdf in batches:
            if pdf.empty:
                continue
            cids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            cent = pdf["cent_id"].to_numpy(dtype=np.int64)
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)
            sims = qc_l[:, cent].T.copy()
            for s in range(m):
                sims += tabs[:, s, codes[:, s]].T
            sims[~probed_l[:, cent].T] = -np.inf
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

    partial = codes_df.mapInPandas(
        score, schema="query_id long, neighbor_id long, sim_adc double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_adc"), F.col("neighbor_id"))
    return (
        partial.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim_adc")
    )
