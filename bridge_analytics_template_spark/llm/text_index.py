"""Persistent lexical (BM25) index — build once, probe many times.

The third build-once/probe-many surface next to the ANN index
(llm/ann_index.py) and the MinHash dedup index (llm/dedup.py): a corpus's
inverted postings are tokenized, counted, and written ONCE; every later
retrieval probe (RAG lookups, decontamination search, eval-set mining)
joins the stored postings instead of re-tokenizing 100 TB of text.

Layout:

* ``{path}/postings/`` — (tok, doc_id, tf) parquet PARTITIONED BY
  ``bucket = pmod(xxhash64(tok), n_buckets)``: a probe computes its
  terms' buckets and reads ONLY those partitions — hash-bucketed
  partition pruning, the scan-level analogue of an inverted index's
  term-dictionary seek. At corpus scale n_buckets grows to a few
  thousand so a probe touches a sliver of the index.
* ``{path}/df/`` — (tok, df) with the same bucketing (document
  frequencies are index-time facts; probing must not rescan postings to
  count them).
* ``{path}/doclen/`` — (doc_id, dl) for the BM25 length normalization.
* ``{path}/meta.json`` — corpus stats (N docs, total length) and
  n_buckets, the bounded driver state.

Scoring follows the engine's cross-engine float discipline (see
llm_bm25_topk): Robertson's rational idf, one identical IEEE expression
tree per term, ppm-floored then integer-summed — so probe-from-disk is
BIT-EQUAL to the live computation, pinned in tests/test_llm_ops.py.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import ws_tokens


def _base(path: str, meta: dict, sub: str) -> str:
    """Base table location. After a compaction the base lives in a
    versioned subdir recorded in meta ("base_dir") — meta.json is the
    atomic commit point, so readers resolve through it and a crashed
    compaction can never leave them pointing at half-deleted data."""
    b = meta.get("base_dir") or ""
    return os.path.join(path, b, sub) if b else os.path.join(path, sub)


def save_bm25_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> None:
    """Tokenize + count + persist the corpus's BM25 index (one pass over
    the text; postings and document frequencies partitioned by token-hash
    bucket, document lengths flat, corpus stats to meta.json)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode_outer(ws_tokens(F.col(text_col))).alias("tok")
    )
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64("tok"), F.lit(n_buckets)))
    )
    tf.write.mode("overwrite").partitionBy("bucket").parquet(os.path.join(path, "postings"))
    # df derives from the just-written postings — reading them back costs
    # one columnar scan and guarantees the two tables can never drift
    spark = docs.sparkSession
    dfreq = (
        spark.read.parquet(os.path.join(path, "postings"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("bucket", F.pmod(F.xxhash64("tok"), F.lit(n_buckets)))
    )
    dfreq.write.mode("overwrite").partitionBy("bucket").parquet(os.path.join(path, "df"))
    docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws_tokens(F.col(text_col))).cast("long").alias("dl"),
    ).write.mode("overwrite").parquet(os.path.join(path, "doclen"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(ws_tokens(F.col(text_col)))).cast("long").alias("l"),
    ).first()
    from .index_maintenance import atomic_write_json

    atomic_write_json(
        os.path.join(path, "meta.json"),
        {
            "kind": "bm25",
            "n_buckets": n_buckets,
            "n_docs": int(stats["n"]),
            "total_len": int(stats["l"]),
            "segments": [],
        },
    )


def append_bm25_segment(
    new_docs: DataFrame,
    path: str,
    segment: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """GROW a stored BM25 index without rewriting it (the Lucene segment
    model, same as ``append_minhash_segment``): the new batch's postings,
    per-segment document frequencies, and doc lengths land under
    ``{path}/segments/{segment}/`` bucketed with the STORED n_buckets;
    per-segment corpus stats go to meta.json. A probe SUMS df and corpus
    stats across base+segments — document frequency and BM25's N/avgdl
    are integer sums, so a grown index scores BIT-EQUAL to one rebuilt
    over the combined corpus (test-pinned). Daily ingest is O(new
    batch); the base files are never touched."""
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    if any(s["name"] == segment for s in meta.get("segments", [])):
        raise ValueError(f"segment {segment!r} already exists in {path}")
    if os.path.join("segments", segment) in meta.get("stale", []):
        # the name's dir is deferred-swept garbage of the previous
        # compaction — writing into it would break old-meta probe plans
        # (same hazard as tombstone-name reuse; review finding r8)
        raise ValueError(f"segment name {segment!r} is pending deferred sweep in {path}; pick a fresh name")
    n_buckets = meta["n_buckets"]
    seg_dir = os.path.join(path, "segments", segment)
    toks = new_docs.select(
        F.col(id_col).alias("doc_id"), F.explode_outer(ws_tokens(F.col(text_col))).alias("tok")
    )
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64("tok"), F.lit(n_buckets)))
    )
    tf.write.mode("overwrite").partitionBy("bucket").parquet(os.path.join(seg_dir, "postings"))
    spark = new_docs.sparkSession
    (
        spark.read.parquet(os.path.join(seg_dir, "postings"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("bucket", F.pmod(F.xxhash64("tok"), F.lit(n_buckets)))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(seg_dir, "df"))
    )
    new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws_tokens(F.col(text_col))).cast("long").alias("dl"),
    ).write.mode("overwrite").parquet(os.path.join(seg_dir, "doclen"))
    stats = new_docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(ws_tokens(F.col(text_col)))).cast("long").alias("l"),
    ).first()
    meta["segments"] = meta.get("segments", []) + [
        {"name": segment, "n_docs": int(stats["n"]), "total_len": int(stats["l"])}
    ]
    from .index_maintenance import atomic_write_json

    atomic_write_json(os.path.join(path, "meta.json"), meta)


def compact_bm25_index(spark: SparkSession, path: str) -> None:
    """Fold appended segments back into the base BM25 index: postings and
    doclen concatenate, per-token document frequencies SUM (an integer
    merge, so the compacted index scores bit-equal to the grown one), and
    per-segment corpus stats fold into the base stats. Pure file rewrite
    plus an atomic meta COMMIT: the new base is written into a fresh
    versioned dir and meta.json flips to it via os.replace; the
    superseded layout is DEFER-SWEPT — kept on disk until the NEXT
    compaction commits (index_maintenance.commit_compaction) — so probe
    DataFrames planned against the old meta keep resolving their files
    for a full cycle, and a crash leaves either the old index fully
    intact or the new one committed with only stale dirs pending sweep."""
    from .index_maintenance import commit_compaction, next_base_dir, read_tombstones

    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    segs = meta.get("segments", [])
    tombs = meta.get("tombstones", [])
    if not segs and not tombs:
        return
    tomb = read_tombstones(spark, path, meta)
    seg_dirs = [os.path.join(path, "segments", s["name"]) for s in segs]
    n_buckets = meta["n_buckets"]
    old_base = meta.get("base_dir") or ""
    new_base = next_base_dir(meta)
    tmp = os.path.join(path, new_base)

    def _read_all(sub):
        parts = [spark.read.parquet(_base(path, meta, sub))] + [
            spark.read.parquet(os.path.join(s, sub)) for s in seg_dirs
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _live(df, key="doc_id"):
        if tomb is None:
            return df
        return df.join(tomb, df[key] == tomb["id"], "left_anti")

    postings = _live(
        _read_all("postings").withColumn("bucket", F.col("bucket").cast("long"))
    )
    if tomb is not None:
        # persist only when a SECOND consumer exists (the df recount
        # below); the no-tombstone branch consumes postings exactly once
        # — caching it there just evicts other executor storage for
        # nothing (review finding r8)
        postings = postings.persist()
    postings.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(tmp, "postings")
    )
    if tomb is None:
        # no deletions: df is a pure integer merge of the stored tables
        df_new = _read_all("df").groupBy("tok").agg(F.sum("df").alias("df"))
    else:
        # deletions: recompute df from the surviving postings (one row per
        # (tok, doc) == one df unit) — exactly what a rebuild would count
        df_new = postings.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    (
        df_new.withColumn("bucket", F.pmod(F.xxhash64("tok"), F.lit(n_buckets)))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(tmp, "df"))
    )
    doclen = _live(_read_all("doclen"))
    doclen.write.mode("overwrite").parquet(os.path.join(tmp, "doclen"))
    if tomb is None:
        meta["n_docs"] += sum(s["n_docs"] for s in segs)
        meta["total_len"] += sum(s["total_len"] for s in segs)
    else:
        # corpus stats re-derived from the surviving doclen (1-row action)
        stats = doclen.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("l"),
        ).collect()[0]
        meta["n_docs"] = int(stats["n"])
        meta["total_len"] = int(stats["l"])
    postings.unpersist()
    superseded = (
        ([old_base] if old_base else ["postings", "df", "doclen"])
        + [os.path.join("segments", s["name"]) for s in segs]
        + [os.path.join("tombstones", t) for t in tombs]
    )
    meta["segments"] = []
    meta["tombstones"] = []
    meta["base_dir"] = new_base
    commit_compaction(path, os.path.join(path, "meta.json"), meta, superseded)


def probe_bm25_index(
    spark: SparkSession,
    path: str,
    probe_terms: DataFrame,
    k: int = 10,
) -> DataFrame:
    """BM25 top-k against a stored index for a probe term set (a DataFrame
    with a ``tok`` column; broadcast-small by precondition). Reads only
    the probed token-hash buckets of postings/df; never touches corpus
    text. Scores are ppm-floored per term and integer-summed — bit-equal
    to the live llm_bm25_topk computation for the same probe."""
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    n_buckets = meta["n_buckets"]
    segs = meta.get("segments", [])
    seg_dirs = [os.path.join(path, "segments", s["name"]) for s in segs]
    terms = probe_terms.select("tok").distinct()
    bucket_rows = terms.select(
        F.pmod(F.xxhash64("tok"), F.lit(n_buckets)).alias("bucket")
    ).collect()
    probed = sorted({r["bucket"] for r in bucket_rows})

    # one read per segment root unioned by name (a single multi-path read
    # trips partition discovery at mixed depths — same lesson as the
    # MinHash index); bucket pruning applies to every root
    def _read_all(sub):
        parts = [spark.read.parquet(_base(path, meta, sub))] + [
            spark.read.parquet(os.path.join(s, sub)) for s in seg_dirs
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    postings = (
        _read_all("postings")
        .filter(F.col("bucket").cast("long").isin(probed))
        .join(F.broadcast(terms), "tok")
    )
    # df is an integer sum across base + segments — exactly the df a
    # rebuild over the combined corpus would count
    dfreq = (
        _read_all("df")
        .filter(F.col("bucket").cast("long").isin(probed))
        .join(F.broadcast(terms), "tok")
        .groupBy("tok")
        .agg(F.sum("df").alias("df"))
    )
    dl = _read_all("doclen")
    n_total = meta["n_docs"] + sum(s["n_docs"] for s in segs)
    l_total = meta["total_len"] + sum(s["total_len"] for s in segs)

    from .index_maintenance import read_tombstones

    tomb = read_tombstones(spark, path, meta)
    if tomb is None:
        n, l = F.lit(n_total).cast("long"), F.lit(l_total).cast("long")
        joined = postings.join(F.broadcast(dfreq), "tok").join(dl, "doc_id")
    else:
        # Erasure must adjust EVERY stat BM25 reads, or the surviving
        # docs' scores drift from a rebuild-without-deleted:
        # 1. per-token df decrement — each postings row of a tombstoned
        #    doc is one df unit, counted on the SAME pruned scan (only the
        #    probe's buckets are touched);
        del_df = (
            postings.join(tomb, postings["doc_id"] == tomb["id"], "left_semi")
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("df_del"))
        )
        dfreq = dfreq.join(del_df, "tok", "left").select(
            "tok",
            (F.col("df") - F.coalesce(F.col("df_del"), F.lit(0))).alias("df"),
        )
        # 2. the tombstoned postings themselves;
        postings = postings.join(
            tomb, postings["doc_id"] == tomb["id"], "left_anti"
        )
        # 3. corpus stats (N docs, total length) — a 1-row aggregate over
        #    the tombstoned doclen rows, broadcast into the score (the
        #    scalar-totals crossJoin pattern). Integer arithmetic
        #    throughout, so scores stay bit-equal to a rebuild over the
        #    surviving corpus (oracled in llm_bm25_erasure).
        adj = dl.join(tomb, dl["doc_id"] == tomb["id"], "left_semi").agg(
            (F.lit(n_total) - F.count(F.lit(1))).cast("long").alias("n_live"),
            (F.lit(l_total) - F.coalesce(F.sum("dl"), F.lit(0)))
            .cast("long")
            .alias("l_live"),
        )
        n, l = F.col("n_live"), F.col("l_live")
        joined = (
            postings.join(F.broadcast(dfreq), "tok")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(adj))
        )
    num = (
        (2 * n - 2 * F.col("df") + 1).cast("double")
        * (22 * F.col("tf")).cast("double")
        * l.cast("double")
    )
    den = (2 * F.col("df") + 1).cast("double") * (
        10 * F.col("tf") * l + 3 * l + 9 * F.col("dl") * n
    ).cast("double")
    contrib = joined.select("doc_id", F.floor(num / den * 1000000.0).alias("c_ppm"))
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.sum("c_ppm").cast("long").alias("score_ppm"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .orderBy(F.desc("score_ppm"), "doc_id")
        .limit(k)
    )
