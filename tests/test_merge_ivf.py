"""MERGE/upsert emulation and IVF-ANN properties."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bridge_analytics_template_spark.catalog import load
from bridge_analytics_template_spark.llm.similarity import ivf_knn, knn_bruteforce
from bridge_analytics_template_spark.operators.merge import merge_upsert, scd2_close_and_insert


def test_merge_upsert(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    source = spark.createDataFrame([(2, "B"), (4, "D")], "k long, v string")
    out = {r["k"]: r["v"] for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_scd2_close_and_insert(spark):
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    target = spark.createDataFrame(
        [(1, "a", t0, None), (2, "b", t0, None)],
        "k long, v string, valid_from timestamp, valid_to timestamp",
    )
    source = spark.createDataFrame(
        [(1, "A", t1, None)], "k long, v string, valid_from timestamp, valid_to timestamp"
    )
    out = scd2_close_and_insert(target, source, ["k"], "valid_from")
    rows = sorted(
        ((r["k"], r["v"], r["valid_to"]) for r in out.collect()), key=lambda x: (x[0], str(x[1]))
    )
    assert rows == [
        (1, "A", None),  # new open version
        (1, "a", t1),  # closed at the new version's effective time
        (2, "b", None),  # untouched key stays open
    ]


def test_ivf_finds_planted_neighbors(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    base = e.orderBy("vec_id").limit(20).collect()
    planted = [
        (10_000 + r["vec_id"], [x + 0.01 * ((i % 3) - 1) for i, x in enumerate(r["embedding"])], -1)
        for r in base
    ]
    corpus = e.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<float>, label int")
    )
    q = corpus.filter(F.col("vec_id") >= 10_000)
    approx = {r["query_id"]: r["neighbor_id"] for r in ivf_knn(q, corpus, k=1, n_centroids=16, nprobe=4).collect()}
    hits = sum(approx.get(10_000 + r["vec_id"]) == r["vec_id"] for r in base)
    # a planted near-identical vector lands in (or right next to) the same
    # inverted list as its source; nprobe=4 of 16 centroids must recover most
    assert hits >= 17


def test_ivf_deterministic(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    a = [(r["query_id"], r["neighbor_id"], r["rank"]) for r in ivf_knn(q, e, k=3).collect()]
    b = [(r["query_id"], r["neighbor_id"], r["rank"]) for r in ivf_knn(q, e, k=3).collect()]
    assert sorted(a) == sorted(b)


def test_ann_index_probe_from_disk_matches_build_and_probe(spark, sf_dir, tmp_path):
    """The persisted-index lifecycle (llm/ann_index.py): probe-from-disk
    reproduces the in-query build-and-probe ids/ranks EXACTLY for both IVF
    (raw-vector lists, JVM cosine re-scoring) and IVF-PQ (residual-code
    lists, ADC scoring) — same deterministic trainer, same kernels, so the
    stored index is a pure build/probe split, not an approximation of one.
    Also pins probe-twice determinism (the stored index never retrains)
    and that new ids absent from the build corpus can probe it."""
    from bridge_analytics_template_spark.llm.ann_index import (
        probe_ivf_index,
        probe_ivfpq_index,
        save_ivf_index,
        save_ivfpq_index,
    )
    from bridge_analytics_template_spark.llm.pq import ivfpq_knn

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)

    ivf_path = str(tmp_path / "ivf")
    save_ivf_index(e, ivf_path)
    got = probe_ivf_index(spark, ivf_path, q, k=3)
    want = ivf_knn(q, e, k=3)
    got_rows = sorted(((r["query_id"], r["neighbor_id"], r["rank"]) for r in got.collect()))
    want_rows = sorted(((r["query_id"], r["neighbor_id"], r["rank"]) for r in want.collect()))
    assert got_rows == want_rows
    # probe again from the same stored index: bit-stable, no retraining
    again = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in probe_ivf_index(spark, ivf_path, q, k=3).collect()
    )
    assert again == got_rows

    pq_path = str(tmp_path / "ivfpq")
    save_ivfpq_index(e, pq_path)
    got_pq = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in probe_ivfpq_index(spark, pq_path, q, k=3).collect()
    )
    want_pq = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivfpq_knn(q, e, k=3).collect()
    )
    assert got_pq == want_pq

    # incremental-ingest shape: vectors NOT in the build corpus probe the
    # stored index (each planted twin must find its source, which proves
    # the probe path quantizes fresh queries against the stored quantizer)
    base = e.orderBy("vec_id").limit(10).collect()
    fresh = spark.createDataFrame(
        [
            (
                10_000 + r["vec_id"],
                [x + 0.01 * ((i % 3) - 1) for i, x in enumerate(r["embedding"])],
            )
            for r in base
        ],
        "vec_id long, embedding array<double>",
    )
    hits = {
        r["query_id"]: r["neighbor_id"]
        for r in probe_ivf_index(spark, ivf_path, fresh, k=1).collect()
    }
    assert sum(hits.get(10_000 + r["vec_id"]) == r["vec_id"] for r in base) >= 8


def test_ann_index_segment_append(spark, sf_dir, tmp_path):
    """Segment-grown ANN indexes: appending a batch (assigned/encoded with
    the STORED quantizer — centroids never move on append) makes probes
    see the union. Pinned exactly: the grown IVF index's results equal
    scoring the combined corpus assigned with the SAME stored quantizer;
    the grown IVF-PQ index likewise via the shared fixed-quantizer
    encoder. Duplicate segment names are rejected."""
    import json
    import os

    import numpy as np
    import pytest
    from pyspark.sql import Row

    from bridge_analytics_template_spark.functions.vectors import as_double
    from bridge_analytics_template_spark.llm.ann_index import (
        append_ivf_segment,
        append_ivfpq_segment,
        probe_ivf_index,
        probe_ivfpq_index,
        save_ivf_index,
        save_ivfpq_index,
    )
    from bridge_analytics_template_spark.llm.similarity import (
        _nearest_centroids_np,
        _score_ivf_lists_np,
    )

    e = load(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") % 3 != 2)
    extra = e.filter(F.col("vec_id") % 3 == 2)
    q = e.filter(F.col("vec_id") % 100 == 0)

    ivf_path = str(tmp_path / "ivf")
    save_ivf_index(base, ivf_path)
    append_ivf_segment(extra, ivf_path, "day1")
    with pytest.raises(ValueError):
        append_ivf_segment(extra, ivf_path, "day1")
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in probe_ivf_index(spark, ivf_path, q, k=3).collect()
    )
    # reference: the FULL corpus assigned with the stored (base-trained)
    # quantizer, scored by the same kernel
    meta = json.load(open(os.path.join(ivf_path, "meta.json")))
    cents_rows = [
        Row(centroid_id=cid, cent=cent)
        for cid, cent in zip(meta["centroid_ids"], meta["centroids"])
    ]
    c = e.select(F.col("vec_id").alias("neighbor_id"), as_double("embedding").alias("cv"))
    assigned = _nearest_centroids_np(c, "neighbor_id", "cv", cents_rows, 1)
    qv = q.select(F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv"))
    probes = _nearest_centroids_np(qv, "query_id", "qv", cents_rows, 4)
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in _score_ivf_lists_np(assigned, probes, 3).collect()
    )
    assert got == want

    pq_path = str(tmp_path / "ivfpq")
    save_ivfpq_index(base, pq_path)
    append_ivfpq_segment(extra, pq_path, "day1")
    grown_pq = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in probe_ivfpq_index(spark, pq_path, q, k=3).collect()
    )
    # the appended ids are genuinely retrievable
    assert any(n % 3 == 2 for _, n, _ in grown_pq)
    assert any(n % 3 == 2 for _, n, _ in got)
    # and a repeat probe of the grown index is bit-stable
    again = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in probe_ivfpq_index(spark, pq_path, q, k=3).collect()
    )
    assert again == grown_pq
    np.testing.assert_equal(len(json.load(open(os.path.join(pq_path, "meta.json")))["segments"]), 1)

    # compaction (both kinds): identical probe results; the superseded
    # layout is DEFER-SWEPT — still on disk after the first compaction
    # (so probe plans against the old meta keep working), recorded in
    # meta["stale"], and physically removed by the NEXT compaction.
    from bridge_analytics_template_spark.llm.ann_index import (
        append_ivf_segment,
        compact_ann_index,
    )

    compact_ann_index(spark, ivf_path)
    compact_ann_index(spark, pq_path)
    for p in (ivf_path, pq_path):
        meta2 = json.load(open(os.path.join(p, "meta.json")))
        assert meta2["segments"] == []
        assert set(meta2["stale"]) == {"lists", os.path.join("segments", "day1")}
        for rel in meta2["stale"]:  # deferred: generation N-1 survives
            assert os.path.exists(os.path.join(p, rel))
    assert (
        sorted(
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in probe_ivf_index(spark, ivf_path, q, k=3).collect()
        )
        == got
    )
    assert (
        sorted(
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in probe_ivfpq_index(spark, pq_path, q, k=3).collect()
        )
        == grown_pq
    )
    # a second compaction CYCLE physically sweeps the recorded generation
    # (and only it): day1/old-root gone, the newly-superseded base_v1 +
    # day2 dirs stay readable for one more cycle.
    append_ivf_segment(extra.withColumn("vec_id", F.col("vec_id") + 10000), ivf_path, "day2")
    compact_ann_index(spark, ivf_path)
    assert not os.path.exists(os.path.join(ivf_path, "lists"))
    assert not os.path.exists(os.path.join(ivf_path, "segments", "day1"))
    meta3 = json.load(open(os.path.join(ivf_path, "meta.json")))
    assert set(meta3["stale"]) == {"base_v1", os.path.join("segments", "day2")}
    assert os.path.exists(os.path.join(ivf_path, "base_v1"))
    assert os.path.exists(os.path.join(ivf_path, "segments", "day2"))


def test_ivf_scoring_block_size_invariant(spark, sf_dir):
    """The IVF GEMM scorer's sub-blocking is result-invariant: a tiny
    block size (forcing many blocks per list) and an effectively-unbounded
    one produce identical ids/ranks — per-query top-(k+1) partials are
    exact across disjoint blocks, so the mega-list memory bound costs
    nothing in correctness."""
    from bridge_analytics_template_spark.functions.vectors import as_double
    from bridge_analytics_template_spark.llm.similarity import (
        _nearest_centroids_np,
        _score_ivf_lists_np,
    )

    e = load(spark, sf_dir, "embeddings")
    c = e.select(F.col("vec_id").alias("neighbor_id"), as_double("embedding").alias("cv"))
    cents = (
        e.select(F.col("vec_id").alias("centroid_id"), as_double("embedding").alias("cent"))
        .orderBy(F.xxhash64("centroid_id"), "centroid_id")
        .limit(16)
        .orderBy("centroid_id")
        .collect()
    )
    assigned = _nearest_centroids_np(c, "neighbor_id", "cv", cents, 1)
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), as_double("embedding").alias("qv")
    )
    probes = _nearest_centroids_np(q, "query_id", "qv", cents, 4)
    small = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in _score_ivf_lists_np(assigned, probes, 3, block_size=7).collect()
    )
    big = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in _score_ivf_lists_np(assigned, probes, 3, block_size=10**6).collect()
    )
    assert small == big and small


def test_merge_apply_cdc_semantics(spark):
    """U rows replace, I rows insert, D rows remove — exact key algebra."""
    from bridge_analytics_template_spark.operators.merge import merge_apply_cdc

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    cdc = spark.createDataFrame(
        [(2, "B", "U"), (3, None, "D"), (4, "d", "I")], "k long, v string, op string"
    )
    got = {(r["k"], r["v"]) for r in merge_apply_cdc(target, cdc, ["k"]).collect()}
    assert got == {(1, "a"), (2, "B"), (4, "d")}


def test_merge_apply_cdc_latest_op_per_key(spark):
    """With order_col, several ops on one key collapse to the LATEST:
    I-then-U keeps only the U row, U-then-D deletes, D-then-I re-inserts."""
    from bridge_analytics_template_spark.operators.merge import merge_apply_cdc

    target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    cdc = spark.createDataFrame(
        [
            (3, "x0", "I", 1),
            (3, "x1", "U", 2),  # I then U: one row, v=x1
            (2, "b1", "U", 1),
            (2, None, "D", 2),  # U then D: deleted
            (1, None, "D", 1),
            (1, "a2", "I", 2),  # D then I: re-inserted
        ],
        "k long, v string, op string, seq long",
    )
    got = {
        (r["k"], r["v"])
        for r in merge_apply_cdc(target, cdc, ["k"], order_col="seq").collect()
    }
    assert got == {(1, "a2"), (3, "x1")}


def test_merge_apply_cdc_validate_raises_on_dup_key(spark):
    """validate=True without order_col raises instead of silently
    duplicating a key that carries several ops (VERDICT r2 debt item)."""
    import pytest

    from bridge_analytics_template_spark.operators.merge import merge_apply_cdc

    target = spark.createDataFrame([(1, "a")], "k long, v string")
    cdc = spark.createDataFrame(
        [(1, "x", "I"), (1, "y", "U")], "k long, v string, op string"
    )
    with pytest.raises(ValueError, match="at most one cdc row per key"):
        merge_apply_cdc(target, cdc, ["k"], validate=True)
    # clean cdc passes under validate
    ok = merge_apply_cdc(
        target, spark.createDataFrame([(2, "b", "I")], "k long, v string, op string"),
        ["k"], validate=True,
    ).collect()
    assert {(r["k"], r["v"]) for r in ok} == {(1, "a"), (2, "b")}


def test_caching_release_all_unpersists_tracked(spark):
    """Library-consumer hygiene: release_all() unpersists every persist a
    pipeline tracked, without touching untracked caches."""
    from bridge_analytics_template_spark.caching import release_all, track

    df = track(spark.range(100).persist())
    df.count()
    assert df.storageLevel.useMemory
    n = release_all()
    assert n >= 1
    assert not df.storageLevel.useMemory


def test_ann_recall_at_replica_scale(spark):
    """VERDICT r5 task 4: pin recall@5 for all four ANN tiers vs brute at
    the 10x replica (20k vectors) — parameter choices that look fine at
    2k vectors can collapse as buckets/cells fill. Uses TIE-ROBUST recall
    (a hit = returned neighbor's TRUE cosine >= the brute 5th-best
    cosine): the replica plants 10 exact copies of every vector, so id-set
    recall is ill-defined under score ties — any 5 of a probe's 10
    identical copies is a correct top-5. Measured r6: all four tiers at
    1.000; pinned with noise margin."""
    import os

    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    if not os.path.exists("/tmp/scale10/embeddings.parquet"):
        pytest.skip("10x replica not built (run tools/make_replica.py)")

    from bridge_analytics_template_spark.llm.pq import ivfpq_knn, pq_knn
    from bridge_analytics_template_spark.llm.similarity import (
        ivf_knn,
        knn_bruteforce_np,
        knn_lsh,
    )

    e = spark.read.parquet("/tmp/scale10/embeddings.parquet")
    q = e.filter(F.col("vec_id") % 50 == 0)
    brute = knn_bruteforce_np(q, e, k=5).select("query_id", "sim").collect()
    fifth_best: dict = {}
    for r in brute:
        cur = fifth_best.setdefault(r.query_id, [])
        cur.append(r.sim)
    fifth_best = {k: min(v) for k, v in fifth_best.items()}
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in q.collect()}

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na and nb else 0.0

    floors = {"lsh": 0.97, "ivf": 0.95, "pq": 0.90, "ivfpq": 0.85}
    for name, fn in (("lsh", knn_lsh), ("ivf", ivf_knn), ("pq", pq_knn), ("ivfpq", ivfpq_knn)):
        rows = fn(q, e, k=5).select("query_id", "neighbor_id").collect()
        need = list({r.neighbor_id for r in rows} - set(emb))
        for r in e.filter(F.col("vec_id").isin(need)).collect():
            emb[r.vec_id] = np.array(r.embedding, dtype=np.float64)
        hits = sum(
            1
            for r in rows
            if cos(emb[r.query_id], emb[r.neighbor_id]) >= fifth_best[r.query_id] - 1e-9
        )
        recall = hits / (5 * len(fifth_best))
        assert recall >= floors[name], f"{name} recall@5 {recall:.3f} < {floors[name]}"
