"""Round-11 experiment variants, preserved so ab.py can interleave them
against HEAD in one process:

    python tools/ab.py llm_ann_recall_report tools.experiments_r11:recall_report_serial --action noop

Each callable is the PRE-r11 formulation, copied verbatim from the r10
registry code.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bridge_analytics_template_spark.catalog import load
from bridge_analytics_template_spark.llm.similarity import knn_bruteforce_np, knn_lsh


def bootstrap_narrow_scan(spark, sf_dir):
    """r10 q_bootstrap_ci: the 32-replica hash aggregate evaluated directly
    over the single-file scan — one task does all 32 md5/row."""
    from bridge_analytics_template_spark.functions.numeric import spark_hash60
    from bridge_analytics_template_spark.queries.stats import _BOOT_B, money_units

    o = load(spark, sf_dir, "orders")
    base = o.select("o_orderkey", money_units("o_totalprice").alias("price_u"))
    aggs = [
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price_u").alias("total_u"),
    ]
    for r in range(_BOOT_B):
        h = spark_hash60(f"CONCAT('{r}|', CAST(o_orderkey AS STRING))")
        inc = F.expr(f"({h}) % 2 = 0")
        aggs.append(F.sum(F.when(inc, F.col("price_u")).otherwise(F.lit(0))).alias(f"s{r}"))
        aggs.append(F.sum(F.when(inc, F.lit(1)).otherwise(F.lit(0))).alias(f"c{r}"))
    agg = base.agg(*aggs)
    means = F.sort_array(
        F.array(*[F.expr(f"s{r} * 100 div c{r}") for r in range(_BOOT_B)])
    )
    return agg.select(
        F.col("n_orders").cast("long").alias("n_orders"),
        F.lit(_BOOT_B).cast("long").alias("n_replicas"),
        F.expr("total_u * 100 div n_orders").alias("mean_centicents"),
        means.getItem(1).alias("ci_lo_centicents"),
        means.getItem(_BOOT_B - 2).alias("ci_hi_centicents"),
    )


def dedup_cascade_serial_actions(spark, sf_dir):
    """r10 llm_dedup_cascade: the sizes aggregate and the near-dup count
    run back to back as two serial driver-blocking actions."""
    from pyspark.sql import Window

    from bridge_analytics_template_spark.functions.text import normalized_fingerprint
    from bridge_analytics_template_spark.llm.dedup import _shingle_arrays, exact_jaccard_pairs

    d = load(spark, sf_dir, "documents")
    fp = normalized_fingerprint(F.col("text"))
    sizes = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_k1"),
        F.countDistinct(fp).alias("n_k2"),
    ).collect()[0]
    n_docs, n_k1, n_k2 = int(sizes["n_docs"]), int(sizes["n_k1"]), int(sizes["n_k2"])
    w_norm = Window.partitionBy(fp).orderBy("doc_id")
    k2 = d.withColumn("rn", F.row_number().over(w_norm)).filter("rn = 1").drop("rn")
    arrays = _shingle_arrays(k2, "text", "doc_id", 5, hashed=True)
    near = exact_jaccard_pairs(arrays, min_jaccard=0.5).select("doc_b").distinct()
    n_near = near.count()
    return spark.createDataFrame(
        [(n_docs, n_docs - n_k1, n_k1 - n_k2, n_near, n_k2 - n_near)],
        "n_docs long, n_exact_removed long, n_norm_removed long, n_neardup_removed long, n_final long",
    )


def _cumsum_count_sized(df, order_cols, value_col, cum_name="cum", total_name=None,
                        num_partitions=32):
    """r10 partitioned_cumsum: exact count() sizing job + unconditional
    per-bucket sums job (two driver-blocking actions per build)."""
    from bridge_analytics_template_spark.operators.rowids import (
        bucket_expression,
        deterministic_bounds,
    )

    n = df.count()
    if n == 0:
        out = df.withColumn(cum_name, F.col(value_col))
        if total_name is not None:
            out = out.withColumn(total_name, F.col(value_col))
        return out.where(F.lit(False))
    bounds = deterministic_bounds(df, order_cols, num_partitions, n)
    bucket_expr = bucket_expression(df, order_cols, bounds)
    sums = (
        df.select(bucket_expr.alias("_bkt"), F.col(value_col))
        .groupBy("_bkt")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    )
    by_bkt = {r["_bkt"]: r["s"] for r in sums}
    offsets, acc = {}, 0
    for bkt in sorted(by_bkt):
        offsets[bkt] = acc
        acc += by_bkt[bkt] or 0
    total = acc
    spark = df.sparkSession
    b_offsets = spark.sparkContext.broadcast(offsets)
    out = df.withColumn(cum_name, F.col(value_col))
    if total_name is not None:
        out = out.withColumn(total_name, F.col(value_col))
    out_schema = out.schema

    def add_cumsum(pdf_iter):
        run: dict = {}
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            res = pdf.drop(columns=["_bkt"])
            grouped = pdf[value_col].groupby(pdf["_bkt"]).cumsum()
            base = pdf["_bkt"].map(lambda b: b_offsets.value.get(int(b), 0) + run.get(int(b), 0))
            res[cum_name] = grouped + base
            if total_name is not None:
                res[total_name] = total
            for bkt, s in pdf.groupby("_bkt")[value_col].sum().items():
                run[int(bkt)] = run.get(int(bkt), 0) + s
            yield res

    routed = (
        df.withColumn("_bkt", bucket_expr)
        .repartition(max(1, num_partitions), "_bkt")
        .sortWithinPartitions("_bkt", *order_cols)
    )
    return routed.mapInPandas(add_cumsum, schema=out_schema)


def curation_e2e_count_sizing(spark, sf_dir):
    """r10 pipeline_curation_e2e: the budget cumsum sized by an exact
    count() job plus the sums job — each re-executing the full
    filter+segment-dedup+join lineage at plan build."""
    from bridge_analytics_template_spark.queries.corpus import _E2E_QT, _segment_dedup

    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "text",
        F.expr(
            "(length(text) - length(regexp_replace(text, '[A-Za-z]', ''))) * 1000000"
            " DIV greatest(length(text), 1)"
        ).alias("score_ppm"),
    )
    kept = scored.filter(F.col("score_ppm") >= _E2E_QT)
    seg = _segment_dedup(kept.select("doc_id", "text"))
    tok = (
        kept.select("doc_id", "score_ppm")
        .join(seg.select("doc_id", "kept_text"), "doc_id", "left")
        .select(
            "doc_id",
            "score_ppm",
            F.when(
                F.col("kept_text").isNull() | (F.col("kept_text") == ""), F.lit(0).cast("long")
            )
            .otherwise(F.size(F.split("kept_text", " ")).cast("long"))
            .alias("n_tok"),
        )
        .withColumn("neg_score", -F.col("score_ppm"))
    )
    c = _cumsum_count_sized(
        tok,
        order_cols=["neg_score", "doc_id"],
        value_col="n_tok",
        cum_name="cum_tokens",
        total_name="total_tokens",
    )
    return (
        c.filter(F.col("cum_tokens") * 2 <= F.col("total_tokens"))
        .select("doc_id", "score_ppm", "n_tok", "cum_tokens")
        .orderBy(F.desc("score_ppm"), "doc_id")
    )


def decontaminate_narrow_scan(spark, sf_dir):
    """r10 llm_decontaminate: the tokenize+hash gram build evaluated
    directly over the single-file scan — one task builds every gram."""
    from bridge_analytics_template_spark.functions.text import (
        hashed_word_shingles_expr,
        ws_tokens,
    )

    d = load(spark, sf_dir, "documents")
    eval_pred = F.col("doc_id") % 50 == 0
    grams = (
        d.select("doc_id", ws_tokens("text").alias("toks"))
        .select("doc_id", F.expr("transform(toks, t -> xxhash64(t))").alias("th"))
        .select("doc_id", F.explode_outer(F.expr(hashed_word_shingles_expr(8))).alias("gram"))
    )
    eval_grams = grams.filter(eval_pred).select("gram").distinct()
    hits = (
        grams.filter(~eval_pred)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        d.filter(~eval_pred)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def winnowing_narrow_scan(spark, sf_dir):
    """r10 llm_winnowing: winnowing fingerprints evaluated directly over
    the single-file scan — one task does every md5+window-min."""
    from pyspark.sql import functions as FF

    from bridge_analytics_template_spark.caching import track
    from bridge_analytics_template_spark.functions.text import word_shingles, ws_tokens
    from bridge_analytics_template_spark.queries.advanced import _WIN_K, _WIN_W

    d = load(spark, sf_dir, "documents")
    hsdf = d.select("doc_id", ws_tokens("text").alias("toks")).select(
        "doc_id",
        FF.transform(
            word_shingles(FF.col("toks"), _WIN_K), lambda s: FF.substring(FF.md5(s), 1, 16)
        ).alias("hs"),
    )
    hs = FF.col("hs")
    m = FF.size(hs)
    wins = FF.when(
        m >= _WIN_W,
        FF.transform(
            FF.sequence(FF.lit(1), m - (_WIN_W - 1)),
            lambda i: FF.array_min(FF.slice(hs, i, _WIN_W)),
        ),
    ).otherwise(FF.array().cast("array<string>"))
    fps = hsdf.select(
        "doc_id",
        FF.array_join(FF.array_sort(FF.array_distinct(wins)), ",").alias("fp"),
    )
    return track(fps.persist()).orderBy("doc_id")


def semantic_decontaminate_narrow_scan(spark, sf_dir):
    """r10 llm_semantic_decontaminate: the train×eval cosine folds
    evaluated directly over the single-file scan — one task."""
    from bridge_analytics_template_spark.queries.corpus import _MMR_Q, _SEM_TAU

    e = load(spark, sf_dir, "embeddings")
    qv = F.transform("embedding", lambda x: F.floor(x.cast("double") * _MMR_Q).cast("long"))
    nn = F.aggregate(
        F.transform("v", lambda x: x * x), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    base = e.select("vec_id", qv.alias("v")).select("vec_id", "v", nn.alias("nn"))
    evals = (
        base.filter(F.col("vec_id") % 50 == 0)
        .select(
            F.col("vec_id").alias("eval_id"), F.col("v").alias("qv"), F.col("nn").alias("qnn")
        )
    )
    train = base.filter(F.col("vec_id") % 50 != 0)
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sims = train.join(F.broadcast(evals)).select(
        "vec_id",
        "eval_id",
        (
            dot.cast("double")
            / (F.sqrt(F.col("nn").cast("double")) * F.sqrt(F.col("qnn").cast("double")))
        ).alias("cos"),
    )
    best = sims.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cos").alias("c"), (-F.col("eval_id")).alias("nid"))).alias("b")
    )
    return (
        best.select(
            "vec_id",
            (-F.col("b.nid")).alias("best_eval_id"),
            F.col("b.c").alias("max_cos"),
            (F.col("b.c") >= _SEM_TAU).alias("contaminated"),
        )
        .orderBy("vec_id")
    )


def recall_report_serial(spark, sf_dir):
    """r10 llm_ann_recall_report: the five method pipelines built
    sequentially — each trainer's driver-blocking collect jobs (probe set,
    hash-ordered samples, centroids) run back to back."""
    from bridge_analytics_template_spark.llm.pq import ivfpq_knn, pq_knn
    from bridge_analytics_template_spark.llm.similarity import ivf_knn

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    brute = knn_bruteforce_np(q, e, k=5).select("query_id", "neighbor_id")
    methods = {
        "lsh": knn_lsh(q, e, k=5),
        "ivf": ivf_knn(q, e, k=5),
        "pq": pq_knn(q, e, k=5),
        "ivfpq": ivfpq_knn(q, e, k=5),
    }
    reports = []
    for name, df in methods.items():
        hits = brute.join(df.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        reports.append(
            brute.agg(F.count(F.lit(1)).alias("n_brute"))
            .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
            .select(
                F.lit(name).alias("method"),
                "n_brute",
                "n_hits",
                (F.col("n_hits").cast("double") / F.col("n_brute")).alias("recall_at_5"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("method")


def vocab_encode_narrow_scan(spark, sf_dir):
    """r11 NEGATIVE RESULT — this is the SHIPPED (narrow-scan) form, kept
    so the widened experiment stays reproducible: adding
    ensure_parallelism before tokenize+posexplode was SLOWER sign-stable
    5/5 under the bench's count action (widened min 1.157 vs narrow
    0.910 s at sf0.1) — the round-robin exchange of the full text payload
    costs more than the single-task tokenization it parallelizes at this
    corpus size, and the vocab aggregate's own exchange already spreads
    everything downstream. Revisit only with a fixture whose tokenize
    pass dominates the added shuffle."""
    from bridge_analytics_template_spark.caching import track
    from bridge_analytics_template_spark.functions.text import ws_tokens
    from bridge_analytics_template_spark.operators.rowids import assign_contiguous_ids
    from bridge_analytics_template_spark.queries.training import VOCAB_BROADCAST_MAX_ROWS

    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.posexplode_outer(ws_tokens("text")).alias("pos", "tok"))
    counts = track(
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("_negcnt", -F.col("cnt"))
        .persist()
    )
    n_types = counts.count()
    vocab = assign_contiguous_ids(
        counts, ["_negcnt", "tok"], id_name="id", n_rows=n_types
    ).select("tok", F.col("id").cast("int").alias("id"))
    if n_types <= VOCAB_BROADCAST_MAX_ROWS:
        vocab = F.broadcast(vocab)
    sample = toks.filter(F.col("doc_id") % 20 == 0)
    encoded = (
        sample.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.to_json(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "id"))), lambda s: s["id"]
                )
            ).alias("ids")
        )
    )
    return encoded.orderBy("doc_id")


def bitext_mine_blockjoin(spark, sf_dir):
    """r11 EXPERIMENT, measured a WASH and NOT shipped: pass 2 attaches
    r(y) to the already-packed target blocks by a block-id join (shuffling
    only (y, ry) pairs) instead of re-joining ry to the target rows and
    repacking via assign_contiguous_ids. At corpus scale the shipped form
    moves the vector payload through one extra join+repack, so this shape
    should win on bytes (guide §8) — but at every measurable SF here it is
    latency-bound and interleaved A/B came out a wash with flipping signs
    (sf0.1 noop: new 3.713 vs old 3.554 min, 3/5 slower; 10x replica run 1
    new 12.31 vs 13.64, run 2 new 7.56 vs 6.13). Kept for a future round
    with a fixture large enough to expose the byte difference; subtract()
    both ways empty at sf0.001/0.01/0.1."""
    import numpy as np
    import pandas as pd

    from bridge_analytics_template_spark.caching import track
    from bridge_analytics_template_spark.operators.rowids import assign_contiguous_ids
    from bridge_analytics_template_spark.queries.corpus import _MMR_Q

    e = load(spark, sf_dir, "embeddings")
    qv = F.transform("embedding", lambda v: F.floor(v.cast("double") * _MMR_Q).cast("long"))
    nn = F.aggregate(
        F.transform("v", lambda v: v * v), F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    base = e.select("vec_id", qv.alias("v")).select("vec_id", "v", nn.alias("nn"))
    _B = 1024
    side_counts = {
        r["par"]: r["n"]
        for r in e.select((F.col("vec_id") % 2).alias("par"))
        .groupBy("par")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_src, n_tgt = int(side_counts.get(0, 0)), int(side_counts.get(1, 0))

    def packed(side, blk, rows, n):
        ranked = assign_contiguous_ids(side, "vec_id", id_name="_rk", n_rows=n)
        p = (
            ranked.withColumn(blk, (F.col("_rk") / F.lit(_B)).cast("long"))
            .groupBy(blk)
            .agg(F.collect_list(F.struct("vec_id", "v", "nn")).alias(rows))
        )
        return p, max(1, -(-n // _B))

    src, tgt = base.filter(F.col("vec_id") % 2 == 0), base.filter(F.col("vec_id") % 2 == 1)
    pa, na = packed(src, "blk_a", "rows_a", n_src)
    pb, nb = packed(tgt, "blk_b", "rows_b", n_tgt)
    pa, pb = track(pa.persist()), track(pb.persist())
    grid = spark.range(na).select(
        F.col("id").alias("blk_a"),
        F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("blk_b"),
    )
    joined = pa.join(F.broadcast(grid), "blk_a").join(pb, "blk_b")

    def unpack(cell):
        ids = np.array([r["vec_id"] for r in cell], dtype=np.int64)
        m = np.array([list(r["v"]) for r in cell], dtype=np.float64)
        rt = np.sqrt(np.array([r["nn"] for r in cell], dtype=np.float64))
        return ids, m, rt

    def unpack_memo(cache, key, cell):
        hit = cache.get(key)
        if hit is None:
            if len(cache) >= 512:
                cache.clear()
            hit = cache[key] = unpack(cell)
        return hit

    def top2(cos):
        if cos.shape[1] < 2:
            return cos
        return -np.partition(-cos, kth=1, axis=1)[:, :2]

    def top2_partials(batches):
        cache: dict = {}
        for pdf in batches:
            for ba, bb, ra, rb in zip(pdf["blk_a"], pdf["blk_b"], pdf["rows_a"], pdf["rows_b"]):
                ia, ma, rta = unpack_memo(cache, ("a", int(ba)), ra)
                ib, mb, rtb = unpack_memo(cache, ("b", int(bb)), rb)
                cos = (ma @ mb.T) / (rta[:, None] * rtb[None, :])
                xa = top2(cos)
                xb = top2(np.ascontiguousarray(cos.T))
                k_a, k_b = xa.shape[1], xb.shape[1]
                yield pd.DataFrame(
                    {
                        "side": ["x"] * (len(ia) * k_a) + ["y"] * (len(ib) * k_b),
                        "blk": np.concatenate(
                            [
                                np.full(len(ia) * k_a, int(ba), dtype=np.int64),
                                np.full(len(ib) * k_b, int(bb), dtype=np.int64),
                            ]
                        ),
                        "id": np.concatenate([ia.repeat(k_a), ib.repeat(k_b)]),
                        "c": np.concatenate([xa.ravel(), xb.ravel()]),
                    }
                )

    partials = joined.mapInPandas(
        top2_partials, schema="side string, blk long, id long, c double"
    )
    top2_col = F.slice(F.sort_array(F.collect_list("c"), asc=False), 1, 2)
    means = partials.groupBy("side", "blk", "id").agg(
        ((F.element_at(top2_col, 1) + F.element_at(top2_col, 2)) / 2).alias("r")
    )
    rx = means.filter(F.col("side") == "x").select(F.col("id").alias("x"), F.col("r").alias("rx"))
    ry_b = (
        means.filter(F.col("side") == "y")
        .groupBy(F.col("blk").alias("blk_b"))
        .agg(F.collect_list(F.struct(F.col("id").alias("y"), F.col("r").alias("ry"))).alias("rys"))
    )
    pb2 = pb.join(ry_b, "blk_b")
    joined2 = pb2.join(F.broadcast(grid), "blk_b").join(pa, "blk_a")

    def best_margin(batches):
        cache: dict = {}
        for pdf in batches:
            for ba, bb, ra, rb, rys in zip(
                pdf["blk_a"], pdf["blk_b"], pdf["rows_a"], pdf["rows_b"], pdf["rys"]
            ):
                ia, ma, rta = unpack_memo(cache, ("a", int(ba)), ra)
                ib, mb, rtb = unpack_memo(cache, ("b", int(bb)), rb)
                key = ("ry", int(bb))
                ryv = cache.get(key)
                if ryv is None:
                    yids = np.array([r["y"] for r in rys], dtype=np.int64)
                    rvals = np.array([r["ry"] for r in rys], dtype=np.float64)
                    order = np.argsort(yids)
                    if len(cache) >= 512:
                        cache.clear()
                    ryv = cache[key] = rvals[order][np.searchsorted(yids[order], ib)]
                cos = (ma @ mb.T) / (rta[:, None] * rtb[None, :])
                m = cos + cos - ryv[None, :]
                mx = m.max(axis=1)
                best_y = np.where(m == mx[:, None], ib[None, :], np.iinfo(np.int64).max).min(axis=1)
                yield pd.DataFrame({"x": ia, "m": mx, "y": best_y})

    block_best = joined2.mapInPandas(best_margin, schema="x long, m double, y long")
    best = block_best.groupBy("x").agg(
        F.max(F.struct(F.col("m").alias("c"), (-F.col("y")).alias("nid"))).alias("b")
    )
    return (
        best.join(rx, "x")
        .select(
            F.col("x").alias("src_id"),
            (-F.col("b.nid")).alias("tgt_id"),
            (F.col("b.c") - F.col("rx")).alias("csls"),
            ((F.col("b.c") - F.col("rx")) > 0).alias("mined"),
        )
        .orderBy("src_id")
    )
