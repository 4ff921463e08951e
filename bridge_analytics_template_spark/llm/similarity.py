"""Similarity search over embedding columns (SURVEY.md §2.11 L3).

Two paths:

* :func:`knn_bruteforce` — exact top-k per query by cosine; correct baseline,
  O(|Q|·|C|). Sensible when |Q| is small (a probe set) or as the verifier.
* :func:`knn_lsh` — sign-bucket LSH pruning: candidates are restricted to
  buckets within a Hamming radius of the query's bucket, turning the cross
  join into a band-keyed join. The scale path for |Q| ≈ |C| ≈ corpus.

Both compute cosine JVM-side via higher-order folds (functions/vectors.py);
no Python, no collect. Ranks tie-break on the candidate id, so output is
fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine, sign_bucket
from ..partitioning import ensure_parallelism


def _ranked(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def knn_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query (self-matches excluded). The query side
    is broadcast — at scale the probe set is the small side by design."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = ensure_parallelism(candidates).select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    pairs = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    )
    return _ranked(pairs, k)


def knn_bruteforce_np(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_ceiling: float | None = None,
) -> DataFrame:
    """Arrow-vectorized exact top-k: one numpy GEMM per candidate Arrow
    batch against the broadcast (normalized) query matrix, partial top-k
    inside the batch, exact global top-k via one window over |batches|·|Q|·k
    survivors.

    This is the 100 TB shape for brute-force scoring: the per-pair
    higher-order-fold cosine (knn_bruteforce) evaluates its lambdas
    interpreted per element, while BLAS does the same arithmetic at memory
    bandwidth — same ids/ranks, ~10× the throughput. The query side is
    collected+broadcast by design (a probe set small enough to broadcast is
    the precondition for ANY brute-force path).

    ``sim_ceiling`` (optional): exclude candidates with cosine >=
    ceiling BEFORE the per-batch partial top-k — the hard-negative-mining
    mask (near-duplicates and the positive itself must not be "negatives").
    Applying it inside the kernel keeps the partial-top-k exact: masked
    candidates can never crowd true survivors out of a batch's partial."""
    import numpy as np
    import pandas as pd

    spark = queries.sparkSession
    qrows = queries.select(id_col, vec_col).collect()
    qids_l = np.array([r[0] for r in qrows], dtype=np.int64)
    qm_l = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qm_l = qm_l / np.linalg.norm(qm_l, axis=1, keepdims=True)
    bq = spark.sparkContext.broadcast((qids_l, qm_l))

    def run(batches):
        qids, qm = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            cm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = cm @ qm.T  # (n_cand, n_q)
            if sim_ceiling is not None:
                sims[sims >= sim_ceiling] = -np.inf
            kk = min(k + 1, len(cids))  # +1: self-match removed downstream
            top = np.argpartition(-sims, kth=kk - 1, axis=0)[:kk]  # (kk, n_q)
            vals = np.take_along_axis(sims, top, axis=0).T.ravel()
            keep = np.isfinite(vals)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, kk)[keep],
                    "neighbor_id": cids[top.T.ravel()][keep],
                    "sim": vals[keep],
                }
            )

    partial = ensure_parallelism(candidates.select(id_col, vec_col)).mapInPandas(
        run, schema="query_id long, neighbor_id long, sim double"
    )
    return _ranked(partial.filter(F.col("query_id") != F.col("neighbor_id")), k)


def knn_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    radius: int = 1,
    tables: int = 4,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Approximate top-k via multi-table sign LSH: table *t* buckets on the
    sign pattern of dimensions ``[t·n_bits, (t+1)·n_bits)``; a candidate is
    scored if it shares a probe bucket with the query in ANY table (plus
    ``radius``-bit-flip multi-probing per table). High-cosine pairs agree on
    most signs, so they collide with probability → 1 as tables grow; for
    near-orthogonal (random) vectors, collisions — and therefore recall —
    are low by construction. The guarantee tested in tests/test_llm_ops.py
    is planted-near-neighbor retrieval, not top-k on noise.

    ``bucket_cap`` (optional, OFF by default) bounds each (table, bucket)
    index list to its ``bucket_cap`` lowest-id members before the probe
    join — the dup-dense-corpus knob: a bucket holding c colliding copies
    contributes c candidates per probe, so total candidate volume is
    Θ(probes x bucket size); capping trades recall on mega-buckets for a
    HARD bound on join fan-out. The skinny-pair dedup already keeps the
    uncapped path disk-safe (measured at the 100x replica), so the cap is
    a latency/recall dial, not a correctness requirement; cap ≥ every
    bucket's size is exactly the uncapped result (pinned in tests)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
    )
    c = ensure_parallelism(candidates).select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
    )

    def table_bucket(vec, t):
        # Slice this table's dimensions, then bucket on their signs.
        window = F.slice(vec, t * n_bits + 1, n_bits)
        return sign_bucket(window, n_bits)

    c_bucketed = c.select(
        "neighbor_id",
        "cv",
        F.posexplode_outer(F.array(*[table_bucket(F.col("cv"), t) for t in range(tables)])).alias(
            "table", "bucket"
        ),
    )
    # Materialize one bucket column per table first: inlining the
    # sign-bucket CASE chain into every probe struct blows past the JVM
    # method-size limit (codegen falls back to interpreted, ~5× slower).
    q_bucketed = q.select(
        "query_id",
        "qv",
        *[table_bucket(F.col("qv"), t).alias(f"qb{t}") for t in range(tables)],
    )
    # Probe set per table: own bucket plus every radius-1 bit flip — now
    # cheap column references, not repeated expressions.
    probe_structs = []
    for t in range(tables):
        base = F.col(f"qb{t}")
        probe_structs.append(F.struct(F.lit(t).alias("table"), base.alias("bucket")))
        if radius >= 1:
            probe_structs += [
                F.struct(
                    F.lit(t).alias("table"),
                    base.bitwiseXOR(F.lit(1 << i).cast("long")).alias("bucket"),
                )
                for i in range(n_bits)
            ]
    q_probed = q_bucketed.select(
        "query_id", "qv", F.explode_outer(F.array(*probe_structs)).alias("probe")
    ).select("query_id", "qv", F.col("probe.table").alias("table"), F.col("probe.bucket").alias("bucket"))

    # Dedup on SKINNY id pairs, then re-attach vectors for scoring. The
    # obvious form (carry qv+cv through the bucket join and dropDuplicates
    # the fat rows) shuffles ~1 KB/pair; at dup-dense corpora the
    # candidate set is huge by construction (the 100x replica: ~100
    # colliding copies per probe bucket → 10^8 pairs ≈ 100+ GB spill —
    # measured disk-full on this box, r6). Deduping 16-byte id pairs
    # first cuts that shuffle ~70x; cv re-attaches via one linear join
    # against the candidate relation, qv via the broadcast probe set (a
    # probe set small enough to broadcast is the precondition of this
    # path, same as knn_bruteforce_np).
    c_index = c_bucketed.select("neighbor_id", "table", "bucket")
    if bucket_cap is not None:
        wcap = Window.partitionBy("table", "bucket").orderBy("neighbor_id")
        c_index = (
            c_index.withColumn("_rn", F.row_number().over(wcap))
            .filter(F.col("_rn") <= bucket_cap)
            .drop("_rn")
        )
    pair_ids = (
        c_index
        .join(F.broadcast(q_probed.select("query_id", "table", "bucket")), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])  # collide in several tables — score once
    )
    pairs = (
        pair_ids.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    )
    return _ranked(pairs, k)


def _nearest_centroids_np(
    df: DataFrame, id_alias: str, vec_alias: str, cents_rows, topn: int
) -> DataFrame:
    """(id, vec, centroid_id) for each row's ``topn`` nearest centroids by
    cosine — one numpy GEMM per Arrow batch against the driver-collected
    centroid matrix (centroids are broadcast-tiny by construction)."""
    import numpy as np
    import pandas as pd

    cids = np.array([r["centroid_id"] for r in cents_rows], dtype=np.int64)
    cm = np.array([list(r[1]) for r in cents_rows], dtype=np.float64)
    cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((cids, cm))
    topn = min(topn, len(cents_rows))

    def run(batches):
        cids_l, cm_l = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(pdf[vec_alias].tolist(), dtype=np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ cm_l.T
            order = np.argsort(-sims, axis=1, kind="stable")[:, :topn]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_alias: pdf[id_alias].to_numpy().repeat(topn),
                    vec_alias: [v for v in pdf[vec_alias] for _ in range(topn)],
                    "centroid_id": cids_l[order.ravel()],
                }
            )

    return df.mapInPandas(
        run, schema=f"{id_alias} long, {vec_alias} array<double>, centroid_id long"
    )


def _score_ivf_lists_np(
    assigned: DataFrame, probes: DataFrame, k: int, block_size: int = 4096
) -> DataFrame:
    """Score probed IVF lists by per-list GEMM, equi-joining packed list
    blocks with the queries probing them and scoring each (block,
    probing-queries) pair as one BLAS matmul that emits per-query
    top-(k+1) partials. Exact: a candidate lives in exactly ONE list
    (topn=1 assignment), so partials are disjoint across lists AND across
    a list's blocks, and the global rank window sees every true survivor.
    Replaces the per-pair interpreted JVM cosine fold, which at the 100x
    replica put emb_ivf_index_probe at 209 s — the same fold-vs-GEMM
    lesson as knn_bruteforce_np (NOTES.md lesson 4).

    Lists are SUB-BLOCKED at ``block_size`` rows (a centroid-partitioned
    row_number, same exchange the packing group-by needs anyway), so a
    skewed or under-quantized corpus can never materialize a mega-list as
    one unbounded collect_list row — the packed-row memory cliff is
    bounded at block_size·dim·8 bytes regardless of list skew."""
    import numpy as np
    import pandas as pd

    blocked = assigned.select(
        "centroid_id",
        "neighbor_id",
        "cv",
        (
            (F.row_number().over(
                Window.partitionBy("centroid_id").orderBy("neighbor_id")
            ) - 1) / F.lit(block_size)
        ).cast("long").alias("_blk"),
    )
    packed = blocked.groupBy("centroid_id", "_blk").agg(
        F.collect_list(F.struct("neighbor_id", "cv")).alias("rows")
    )
    qpacked = probes.groupBy("centroid_id").agg(
        F.collect_list(F.struct("query_id", "qv")).alias("qrows")
    )
    joined = packed.join(qpacked, "centroid_id")

    def run(batches):
        for pdf in batches:
            for rows, qrows in zip(pdf["rows"], pdf["qrows"]):
                cids = np.array([r["neighbor_id"] for r in rows], dtype=np.int64)
                cm = np.array([list(r["cv"]) for r in rows], dtype=np.float64)
                cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
                qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
                qm = np.array([list(r["qv"]) for r in qrows], dtype=np.float64)
                qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
                sims = cm @ qm.T  # (n_cand, n_q)
                kk = min(k + 1, len(cids))
                top = np.argpartition(-sims, kth=kk - 1, axis=0)[:kk]
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(qids, kk),
                        "neighbor_id": cids[top.T.ravel()],
                        "sim": np.take_along_axis(sims, top, axis=0).T.ravel(),
                    }
                )

    partial = joined.mapInPandas(run, schema="query_id long, neighbor_id long, sim double")
    return _ranked(partial.filter(F.col("query_id") != F.col("neighbor_id")), k)


def ivf_knn(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the other scale path next to
    :func:`knn_lsh`.

    Build: a deterministic pseudo-random sample of ``n_centroids`` vectors
    (ordered by ``xxhash64(id)``) acts as the coarse quantizer; every
    candidate is assigned to its nearest centroid (one broadcast join — the
    "inverted lists" are just a ``centroid_id`` column, which at corpus
    scale would also be the partition/bucket key of the stored table).
    Search: each query probes its ``nprobe`` nearest centroids and ranks
    only candidates in those lists. Cost drops from |Q|·|C| to
    |Q|·|C|·nprobe/n_centroids plus the assignment pass.
    """
    c = ensure_parallelism(candidates).select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    cents_rows = (
        candidates.select(F.col(id_col).alias("centroid_id"), as_double(F.col(vec_col)).alias("cent"))
        .orderBy(F.xxhash64(F.col("centroid_id")), "centroid_id")
        .limit(n_centroids)
        .orderBy("centroid_id")
        .collect()
    )
    # Coarse quantization is a dense |rows|×|centroids| scoring pass —
    # numpy GEMM against the broadcast (tiny) centroid matrix instead of an
    # interpreted per-pair fold (see knn_bruteforce_np). Stable argsort on
    # -sims breaks ties toward the lower centroid_id, same as the SQL
    # row_number ordering it replaces.
    assigned = _nearest_centroids_np(c, "neighbor_id", "cv", cents_rows, 1)
    q = queries.select(F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv"))
    probes = _nearest_centroids_np(q, "query_id", "qv", cents_rows, nprobe)
    return _score_ivf_lists_np(assigned, probes, k)


def _auto_block_size(n: int) -> int:
    """Corpus-adaptive block size for the blocked-GEMM joins. Total
    shuffle volume is n²·d/B (each block replicated once per partner
    block), so B must GROW with the corpus; the opposing pressure is task
    granularity (block-pair count (n/B)²/2 should stay ≥ cores) and
    per-task emission batch size. MEASURED on the replicas (d=64,
    warm min-of-2, identical pair sets at every B — r7 NOTES):

        n=20k:  B=128→17.5s  256→10.3  512→4.0  1024→4.1  2048→4.1
        n=200k: B=512→114s   1024→48.9 2048→69  4096→80.6
        (B=128 at n=200k is INFEASIBLE here: ~160 GB shuffle > disk)

    The minimum tracks B ≈ 2·√n rounded up to a power of two — that is
    what this returns, clamped to [128, 4096]: 128 reproduces the
    historical fixture-scale plans exactly (2·√2000 rounds to 128), and
    the cap bounds the packed row at B·d·8 bytes. Any B yields the same
    output; explicit ``block_size`` overrides for tests/tuning."""
    import math

    b = 1 << max(7, int(math.ceil(math.log2(max(1.0, 2.0 * math.sqrt(n))))))
    return min(b, 4096)


def _pack_blocks(vectors, id_col, vec_col, block_size, blk_name, rows_name, n_rows=None):
    """Contiguous block ids in id order (operators/rowids.py — range
    partition, no global window), each block packed into ONE row
    (collect_list of (id, vec): B·d doubles ≈ block_size·dim·8 bytes).
    Shared packing stage of the blocked-GEMM joins below. ``n_rows``: the
    callers below always just counted the input for block sizing — passing
    it through skips the id-assign's internal sizing job (r10)."""
    from ..operators.rowids import assign_contiguous_ids

    v = vectors.select(F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("v"))
    ranked = assign_contiguous_ids(v, "vid", id_name="_rk", n_rows=n_rows)
    return (
        ranked.withColumn(blk_name, (F.col("_rk") / F.lit(block_size)).cast("long"))
        .groupBy(blk_name)
        .agg(F.collect_list(F.struct(F.col("vid"), F.col("v"))).alias(rows_name))
    )


def _unpack_block(cell):
    """Packed block cell → (ids, row-normalized matrix). All-zero vectors
    normalize to NaN rows; every comparison against NaN is False, so such
    vectors simply never pair (cosine is undefined for the zero vector) —
    consistent with the all-pairs verifier, where the SQL cosine is
    null/NaN for them too."""
    import numpy as np

    ids = np.array([row["vid"] for row in cell], dtype=np.int64)
    m = np.array([list(row["v"]) for row in cell], dtype=np.float64)
    return ids, m / np.linalg.norm(m, axis=1, keepdims=True)


def _gemm_block_pairs(joined, threshold, mask_ordered, out_a, out_b):
    """Shared BLAS kernel of the blocked-GEMM joins: score each joined
    block pair, keep entries ≥ threshold (plus the id_a < id_b mask for
    the self form), emit only surviving pairs."""
    import numpy as np
    import pandas as pd

    def gemm(batches):
        for pdf in batches:
            for rows_a, rows_b in zip(pdf["rows_a"], pdf["rows_b"]):
                ids_a, ma = _unpack_block(rows_a)
                ids_b, mb = _unpack_block(rows_b)
                sims = ma @ mb.T
                hit = sims >= threshold
                if mask_ordered:
                    hit &= ids_a[:, None] < ids_b[None, :]
                ii, jj = np.nonzero(hit)
                if len(ii):
                    yield pd.DataFrame(
                        {out_a: ids_a[ii], out_b: ids_b[jj], "sim": sims[ii, jj]}
                    )

    return joined.mapInPandas(gemm, schema=f"{out_a} long, {out_b} long, sim double")


def blocked_cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int | None = None,
) -> DataFrame:
    """EXACT cosine-threshold self-join via blocked GEMM — the distributed
    shape for exhaustive similarity joins.

    Sign-LSH pruning cannot guarantee recall 1 (and on this corpus's
    moderate-similarity pairs its recall is far below 1), so the exact
    entry-point does the O(n²) *flops* — unavoidable for an exact answer —
    while avoiding the O(n²) *rows*: no cartesian join, no per-pair row
    materialization before the filter.

    Plan: pack blocks (_pack_blocks), equi-join a driver-free block-pair
    index (nb(nb+1)/2 rows from one spark.range fan-out — at corpus scale
    nb can reach 1e4+ and nb²/2 pairs on the driver would be a memory
    cliff) against the packed blocks twice, and GEMM each block pair in an
    Arrow-batched mapInPandas kernel that emits ONLY pairs ≥ threshold
    (_gemm_block_pairs).

    Shuffle volume is n²d/B (each block replicated n/B times) instead of
    the n²d a pair-materializing join moves — with B=4096 that is three
    orders of magnitude less traffic, and the flops run at BLAS speed
    instead of per-pair interpreted folds. Block ids ascend with the vector
    id, so blk_a ≤ blk_b plus an elementwise id_a < id_b mask yields each
    unordered pair exactly once.

    Sizing (r11): ``n`` feeds the block size, the grid bound and the
    id-assign balance — never the pair set (an OVER-estimate only adds
    empty grid rows the inner block join drops) — so it comes from the
    parquet-footer row count (no job) and falls back to ``count()`` when
    leaves aren't stat-able.
    """
    from ..partitioning import estimated_scan_rows

    spark = vectors.sparkSession
    n = estimated_scan_rows(vectors)
    if n is None:
        n = vectors.count()
    if block_size is None:
        block_size = _auto_block_size(n)
    n_blocks = max(1, -(-n // block_size))
    packed = _pack_blocks(vectors, id_col, vec_col, block_size, "_blk", "rows", n_rows=n)
    pair_index = spark.range(n_blocks).select(
        F.col("id").alias("blk_a"),
        F.explode(F.sequence(F.col("id"), F.lit(n_blocks - 1))).alias("blk_b"),
    )
    a = packed.select(F.col("_blk").alias("blk_a"), F.col("rows").alias("rows_a"))
    b = packed.select(F.col("_blk").alias("blk_b"), F.col("rows").alias("rows_b"))
    joined = a.join(F.broadcast(pair_index), "blk_a").join(b, "blk_b")
    return _gemm_block_pairs(joined, threshold, mask_ordered=True, out_a="id_a", out_b="id_b")


def blocked_cosine_cross_pairs(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int | None = None,
) -> DataFrame:
    """EXACT bipartite cosine-threshold join via blocked GEMM — the
    cross-relation form of :func:`blocked_cosine_pairs` (new batch vs
    stored corpus, queries vs candidates), sharing its packing and BLAS
    kernel (_pack_blocks / _gemm_block_pairs). Differences from the self
    form: the block-pair index is the full nb_l × nb_r grid (every left
    block meets every right block exactly once) and no id-ordering mask —
    the two relations are disjoint by contract, so (id_l, id_r) already
    names each cross pair once. Shuffle volume is (n_l·n_r/B)·d, never
    n_l·n_r rows.

    Sizing (r11): footer row counts like :func:`blocked_cosine_pairs` —
    for filtered sides the footer count is an UPPER bound (the whole
    file), which only costs empty grid rows and a possibly one-step-larger
    block size; the pair set is invariant."""
    from ..partitioning import estimated_scan_rows

    spark = left.sparkSession
    n_l, n_r = estimated_scan_rows(left), estimated_scan_rows(right)
    if n_l is None:
        n_l = left.count()
    if n_r is None:
        n_r = right.count()
    if block_size is None:
        # size to the LARGER side — it dominates both shuffle and flops
        block_size = _auto_block_size(max(n_l, n_r))
    nb_l = max(1, -(-n_l // block_size))
    nb_r = max(1, -(-n_r // block_size))
    a = _pack_blocks(left, id_col, vec_col, block_size, "blk_a", "rows_a", n_rows=n_l)
    b = _pack_blocks(right, id_col, vec_col, block_size, "blk_b", "rows_b", n_rows=n_r)
    pair_index = spark.range(nb_l).select(
        F.col("id").alias("blk_a"),
        F.explode(F.sequence(F.lit(0), F.lit(nb_r - 1))).alias("blk_b"),
    )
    joined = a.join(F.broadcast(pair_index), "blk_a").join(b, "blk_b")
    return _gemm_block_pairs(joined, threshold, mask_ordered=False, out_a="id_l", out_b="id_r")


def near_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, id_a < id_b.
    All-pairs formulation (the verifier for :func:`blocked_cosine_pairs`,
    which is the shipped scale path)."""
    vectors = ensure_parallelism(vectors)
    a = vectors.select(F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("va"))
    b = vectors.select(F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
