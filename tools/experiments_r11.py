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
