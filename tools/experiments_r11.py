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
