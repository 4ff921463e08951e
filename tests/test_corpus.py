"""Tests for the wave-4 corpus ops (queries/corpus.py): segment dedup
invariants, length-bucket boundary semantics, bloom prefilter exactness,
MMR determinism, fixed-point PageRank conservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridge_analytics_template_spark.queries.corpus import (
    _BLOOM_K,
    _BLOOM_M,
    _SEG,
    graph_pagerank_ppm,
    llm_bloom_dedup,
    llm_mmr_rerank_exact,
    llm_segment_dedup,
    train_length_buckets,
)

from conftest import SF_SMALL


def test_segment_dedup_invariants(spark):
    rows = llm_segment_dedup(spark, SF_SMALL).collect()
    assert rows, "no documents"
    # Every doc keeps at most its own segment count, and the reassembled
    # text has exactly n_kept segments' worth of structure.
    total_segs = sum(r.n_segs for r in rows)
    total_kept = sum(r.n_kept for r in rows)
    assert 0 < total_kept <= total_segs
    for r in rows:
        assert 0 <= r.n_kept <= r.n_segs
        if r.n_kept == 0:
            assert r.kept_text == ""
    # First-occurrence election keeps EXACTLY one copy per distinct segment:
    # total kept count == number of distinct segment texts in the corpus.
    from bridge_analytics_template_spark.catalog import load
    from bridge_analytics_template_spark.functions.text import ws_tokens

    d = load(spark, SF_SMALL, "documents")
    toks = ws_tokens("text")
    n_distinct = (
        d.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
        .select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0).cast("long"),
                        F.greatest(F.ceil(F.col("n") / _SEG), F.lit(1).cast("long")) - 1,
                    ),
                    lambda i: F.array_join(F.slice("toks", (i * _SEG + 1).cast("int"), _SEG), " "),
                )
            ).alias("seg")
        )
        .select("seg")
        .distinct()
        .count()
    )
    assert total_kept == n_distinct


def test_segment_dedup_drops_planted_duplicate(spark, tmp_path):
    # Two docs share an identical 10-token segment; the later doc must lose it.
    seg = " ".join(f"tok{i}" for i in range(_SEG))
    rows = [
        (1, seg + " " + " ".join(f"a{i}" for i in range(_SEG))),
        (2, seg + " " + " ".join(f"b{i}" for i in range(_SEG))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(p)
    out = {r.doc_id: r for r in llm_segment_dedup(spark, str(tmp_path)).collect()}
    assert out[1].n_kept == 2 and out[2].n_kept == 1
    assert out[2].kept_text == " ".join(f"b{i}" for i in range(_SEG))


def test_length_buckets_partition_and_waste(spark):
    rows = train_length_buckets(spark, SF_SMALL).collect()
    assert 1 <= len(rows) <= 4
    # Buckets are ordered, disjoint by construction, and cover all docs.
    n_docs = sum(r.n_docs for r in rows)
    from bridge_analytics_template_spark.catalog import load

    assert n_docs == load(spark, SF_SMALL, "documents").count()
    for r in rows:
        assert r.min_len <= r.max_len
        assert 0 <= r.bucket_waste_ppm <= 1_000_000
        # Bucketed batching can never waste more than one global bucket.
        assert r.bucket_waste_ppm <= r.global_waste_ppm
    # Range monotonicity across buckets.
    for a, b in zip(rows, rows[1:]):
        assert a.max_len <= b.min_len


def test_bloom_dedup_equals_plain_semijoin(spark):
    from bridge_analytics_template_spark.catalog import load
    from bridge_analytics_template_spark.queries.corpus import _bag_fingerprint

    got = [r.doc_id for r in llm_bloom_dedup(spark, SF_SMALL).collect()]
    d = load(spark, SF_SMALL, "documents").select(
        "doc_id", _bag_fingerprint("text").alias("fp")
    )
    ref = d.filter(F.col("doc_id") % 7 == 0).select("fp").distinct()
    want = [
        r.doc_id
        for r in d.filter(F.col("doc_id") % 7 != 0)
        .join(ref, "fp", "semi")
        .select("doc_id")
        .orderBy("doc_id")
        .collect()
    ]
    assert got == want


def test_bloom_bitmap_shape():
    assert _BLOOM_M % 64 == 0 and _BLOOM_K >= 1


def test_mmr_exact_deterministic_and_diverse(spark):
    a = [(r.rank, r.vec_id) for r in llm_mmr_rerank_exact(spark, SF_SMALL).collect()]
    b = [(r.rank, r.vec_id) for r in llm_mmr_rerank_exact(spark, SF_SMALL).collect()]
    assert a == b
    assert [r[0] for r in a] == list(range(1, len(a) + 1))
    assert len({r[1] for r in a}) == len(a)


def test_pagerank_ppm_bounds_and_floor(spark):
    rows = graph_pagerank_ppm(spark, SF_SMALL).collect()
    assert rows
    # Every node rank >= the damping floor; sink-only nodes sit exactly at it.
    assert all(r.rank_ppm >= 150_000 for r in rows)
    # Integer fixed-point: recompute must be bit-identical.
    again = graph_pagerank_ppm(spark, SF_SMALL).collect()
    assert sorted((r.node, r.rank_ppm) for r in rows) == sorted(
        (r.node, r.rank_ppm) for r in again
    )
