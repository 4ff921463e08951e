"""Tombstone-aware deletion in the persisted indexes (r8).

The erasure contract, per tier:

* probe-after-delete == rebuild-without-deleted, EXACTLY (ids and values);
* a tombstone write that crashes before the meta commit changes nothing;
* compaction drops tombstoned rows PHYSICALLY, clears the tombstone list,
  and probes are unchanged;
* the oracled queries (llm_dedup_index_erasure, llm_bm25_erasure) carry
  the same guarantee against DuckDB — these tests pin the pieces the
  SQL gate can't see (on-disk layout, crash windows, the IVF/IVF-PQ tier).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bridge_analytics_template_spark.catalog import load


def _minhash_pairs(spark, path, probe_docs):
    from bridge_analytics_template_spark.llm.dedup import probe_minhash_index

    return sorted(
        (r["doc_a"], r["doc_b"], r["n_inter"])
        for r in probe_minhash_index(spark, path, probe_docs, 0.5).collect()
    )


def test_minhash_erasure_probe_equals_rebuild(spark, sf_dir, tmp_path):
    """Delete half the stored docs via tombstones; the probe must equal a
    fresh index built over only the survivors — and compaction must drop
    the tombstoned rows physically without changing the probe."""
    from bridge_analytics_template_spark.llm.dedup import (
        compact_minhash_index,
        save_minhash_index,
    )
    from bridge_analytics_template_spark.llm.index_maintenance import add_tombstones

    d = load(spark, sf_dir, "documents")
    stored = d.filter(F.col("doc_id") % 2 == 0)
    probe = d.filter(F.col("doc_id") % 2 == 1)

    full = str(tmp_path / "mh_full")
    save_minhash_index(stored, full)
    add_tombstones(spark, full, d.filter(F.col("doc_id") % 4 == 0).select("doc_id"))

    rebuilt = str(tmp_path / "mh_surv")
    save_minhash_index(stored.filter(F.col("doc_id") % 4 != 0), rebuilt)

    got = _minhash_pairs(spark, full, probe)
    want = _minhash_pairs(spark, rebuilt, probe)
    assert got == want
    assert any(b % 4 == 2 for _, b, _ in want)  # survivors genuinely matched
    assert all(b % 4 != 0 for _, b, _ in got)  # no erased doc ever surfaces

    # compaction: physical drop, tombstones cleared, probe identical
    compact_minhash_index(spark, full)
    meta = json.load(open(os.path.join(full, "meta.json")))
    assert meta["tombstones"] == []
    base = os.path.join(full, meta["base_dir"])
    survivors = {
        r["doc"] for r in spark.read.parquet(os.path.join(base, "shingles")).collect()
    }
    assert survivors and all(doc % 4 != 0 for doc in survivors)
    assert _minhash_pairs(spark, full, probe) == want


def test_tombstone_crash_before_commit_changes_nothing(spark, sf_dir, tmp_path):
    """add_tombstones orders the parquet write BEFORE the meta commit: a
    crash between the two leaves an unreferenced delta dir that no probe
    resolves — results identical to never having deleted."""
    from bridge_analytics_template_spark.llm import index_maintenance
    from bridge_analytics_template_spark.llm.dedup import save_minhash_index

    d = load(spark, sf_dir, "documents")
    idx = str(tmp_path / "mh")
    save_minhash_index(d.filter(F.col("doc_id") % 2 == 0), idx)
    probe = d.filter(F.col("doc_id") % 2 == 1)
    before = _minhash_pairs(spark, idx, probe)

    real = index_maintenance.atomic_write_json

    def crash(*a, **k):
        raise RuntimeError("injected crash before tombstone commit")

    index_maintenance.atomic_write_json = crash
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            index_maintenance.add_tombstones(
                spark, idx, d.filter(F.col("doc_id") % 4 == 0).select("doc_id")
            )
    finally:
        index_maintenance.atomic_write_json = real

    # delta dir exists on disk but is NOT committed — probes ignore it
    assert os.path.isdir(os.path.join(idx, "tombstones", "del_0"))
    assert "tombstones" not in json.load(open(os.path.join(idx, "meta.json")))
    assert _minhash_pairs(spark, idx, probe) == before

    # the retry overwrites the orphan delta and commits
    index_maintenance.add_tombstones(
        spark, idx, d.filter(F.col("doc_id") % 4 == 0).select("doc_id")
    )
    assert json.load(open(os.path.join(idx, "meta.json")))["tombstones"] == ["del_0"]
    after = _minhash_pairs(spark, idx, probe)
    assert after == [t for t in before if t[1] % 4 != 0]


def _ivf_top(spark, path, q, k=3):
    from bridge_analytics_template_spark.llm.ann_index import probe_ivf_index

    return sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in probe_ivf_index(spark, path, q, k=k).collect()
    )


def test_ivf_erasure_probe_equals_rebuild_over_survivors(spark, sf_dir, tmp_path):
    """IVF: tombstoned vectors never come back as neighbors and the ranks
    re-pack exactly as an index built over only the survivors (same
    stored quantizer ⇒ same list assignment for every survivor, so the
    anti-join is the only difference — results must be bit-identical).
    Same pin for IVF-PQ (ADC scoring path)."""
    from bridge_analytics_template_spark.llm.ann_index import (
        compact_ann_index,
        probe_ivfpq_index,
        save_ivf_index,
        save_ivfpq_index,
    )
    from bridge_analytics_template_spark.llm.index_maintenance import add_tombstones

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 25 == 7)

    full = str(tmp_path / "ivf_full")
    save_ivf_index(e, full)
    add_tombstones(spark, full, e.filter(F.col("vec_id") % 4 == 0).select("vec_id"))
    got = _ivf_top(spark, full, q)
    assert got and all(n % 4 != 0 for _, n, _ in got)

    # rebuild-over-survivors twin: the quantizer must be the SAME (the
    # erased index keeps its centroids — that's the point of tombstones),
    # so the twin copies the trained meta and filters the lists
    surv = str(tmp_path / "ivf_surv")
    save_ivf_index(e, surv)
    add_tombstones(spark, surv, e.filter(F.col("vec_id") % 4 == 0).select("vec_id"))
    compact_ann_index(spark, surv)  # physical drop
    meta = json.load(open(os.path.join(surv, "meta.json")))
    assert meta["tombstones"] == []
    lists = spark.read.parquet(os.path.join(surv, meta["base_dir"], "lists"))
    ids = {r["neighbor_id"] for r in lists.select("neighbor_id").collect()}
    assert ids and all(i % 4 != 0 for i in ids)
    assert _ivf_top(spark, surv, q) == got  # compacted == tombstone-filtered

    # IVF-PQ: same contract through the ADC scorer
    pq_full = str(tmp_path / "pq_full")
    save_ivfpq_index(e, pq_full)
    add_tombstones(spark, pq_full, e.filter(F.col("vec_id") % 4 == 0).select("vec_id"))
    pq_got = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in probe_ivfpq_index(spark, pq_full, q, k=3).collect()
    )
    assert pq_got and all(n % 4 != 0 for _, n, _ in pq_got)


def test_bm25_erasure_compaction_rederives_stats(spark, sf_dir, tmp_path):
    """BM25 erasure end-state: after compaction the postings/doclen hold
    only survivors, df is recounted from surviving postings, and the
    corpus stats (n_docs/total_len) equal a fresh build over the
    survivors — so a post-compaction probe is bit-equal to both the
    tombstone-filtered probe and the rebuilt index."""
    from bridge_analytics_template_spark.llm.index_maintenance import add_tombstones
    from bridge_analytics_template_spark.llm.text_index import (
        compact_bm25_index,
        probe_bm25_index,
        save_bm25_index,
    )

    d = load(spark, sf_dir, "documents")
    probe = (
        d.filter(F.col("doc_id") == 3)
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )

    full = str(tmp_path / "bm_full")
    save_bm25_index(d, full)
    add_tombstones(spark, full, d.filter(F.col("doc_id") % 4 == 0).select("doc_id"))
    got = [tuple(r) for r in probe_bm25_index(spark, full, probe, k=10).collect()]
    assert got and all(r[0] % 4 != 0 for r in got)

    rebuilt = str(tmp_path / "bm_surv")
    save_bm25_index(d.filter(F.col("doc_id") % 4 != 0), rebuilt)
    want = [tuple(r) for r in probe_bm25_index(spark, rebuilt, probe, k=10).collect()]
    assert got == want  # scores bit-equal, not just the id set

    compact_bm25_index(spark, full)
    meta = json.load(open(os.path.join(full, "meta.json")))
    meta_r = json.load(open(os.path.join(rebuilt, "meta.json")))
    assert meta["tombstones"] == []
    assert (meta["n_docs"], meta["total_len"]) == (meta_r["n_docs"], meta_r["total_len"])
    after = [tuple(r) for r in probe_bm25_index(spark, full, probe, k=10).collect()]
    assert after == want


def test_stream_ingest_erasure_shard_invariant_and_history(spark, sf_dir, tmp_path):
    """The streaming GDPR timeline (ingest evens → erase %4==0 → ingest
    odds): the pair set is shard-count invariant, pairs EMITTED BEFORE the
    erasure keep their deleted participants (history is an output, not the
    index), and no pair emitted after the erasure touches a deleted doc."""
    from bridge_analytics_template_spark.streaming.ingest import (
        stream_ingest_dedup_with_erasure,
    )

    d = load(spark, sf_dir, "documents")
    runs = {}
    for k in (2, 3):
        out = stream_ingest_dedup_with_erasure(
            spark, d, str(tmp_path / f"run_k{k}"), n_shards=k
        )
        runs[k] = sorted(
            (r["doc_a"], r["doc_b"], r["n_inter"]) for r in out.collect()
        )
    assert runs[2] == runs[3]  # shard-count invariance

    # auto-compaction forced MID-STREAM (max_segments=1: the policy trips
    # inside phase 2 while tombstones are live — physical drop + deferred
    # sweep under a continuing stream) must not move the pair set
    out_c = stream_ingest_dedup_with_erasure(
        spark, d, str(tmp_path / "run_compact"), n_shards=3, max_segments=1
    )
    assert (
        sorted((r["doc_a"], r["doc_b"], r["n_inter"]) for r in out_c.collect())
        == runs[2]
    )

    pairs = runs[2]
    assert pairs
    deleted = lambda x: x % 4 == 0
    phase1 = lambda x: x % 2 == 0
    touched_deleted = [(a, b) for a, b, _ in pairs if deleted(a) or deleted(b)]
    # history: deleted docs DO appear — but only in both-phase-1 pairs
    assert touched_deleted
    assert all(phase1(a) and phase1(b) for a, b in touched_deleted)
    # post-erasure emissions: every cross-phase pair's stored side survived
    cross = [(a, b) for a, b, _ in pairs if phase1(a) != phase1(b)]
    assert cross
    for a, b in cross:
        stored = a if phase1(a) else b
        assert stored % 4 == 2


def test_tombstone_names_never_reused_after_compaction(spark, sf_dir, tmp_path):
    """del_N names are a persisted monotonic sequence, not len(tombstones):
    compaction clears the list while the folded delta dirs live on under
    meta['stale'] for one deferred-sweep cycle — a length-derived name
    would overwrite a dir old-meta probe plans still resolve."""
    from bridge_analytics_template_spark.llm.dedup import (
        compact_minhash_index,
        save_minhash_index,
    )
    from bridge_analytics_template_spark.llm.index_maintenance import add_tombstones

    d = load(spark, sf_dir, "documents")
    idx = str(tmp_path / "mh")
    save_minhash_index(d.filter(F.col("doc_id") % 2 == 0), idx)
    first = add_tombstones(spark, idx, d.filter(F.col("doc_id") % 8 == 0).select("doc_id"))
    assert first == "del_0"
    compact_minhash_index(spark, idx)
    meta = json.load(open(os.path.join(idx, "meta.json")))
    assert os.path.join("tombstones", "del_0") in meta["stale"]
    second = add_tombstones(spark, idx, d.filter(F.col("doc_id") % 8 == 4).select("doc_id"))
    assert second == "del_1"  # the deferred del_0 dir is untouched
    assert os.path.isdir(os.path.join(idx, "tombstones", "del_0"))
    meta = json.load(open(os.path.join(idx, "meta.json")))
    assert meta["tombstones"] == ["del_1"] and meta["tombstone_seq"] == 2
    # segment-name reuse is rejected while the old dir awaits its sweep
    import pytest as _pytest

    from bridge_analytics_template_spark.llm.dedup import append_minhash_segment

    append_minhash_segment(d.filter(F.col("doc_id") % 4 == 1), idx, "day1")
    compact_minhash_index(spark, idx)
    with _pytest.raises(ValueError, match="pending deferred sweep"):
        append_minhash_segment(d.filter(F.col("doc_id") % 4 == 3), idx, "day1")
