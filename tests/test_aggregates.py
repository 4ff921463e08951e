"""Aggregate properties: approx sketches vs exact, salted aggregation
equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridge_analytics_template_spark.catalog import load
from bridge_analytics_template_spark.functions.numeric import dmoney
from bridge_analytics_template_spark.operators.skew import salted_agg


def test_approx_count_distinct_accuracy(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    exact = l.select(F.countDistinct("l_orderkey")).collect()[0][0]
    approx = l.select(F.approx_count_distinct("l_orderkey", 0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05


def test_hll_sketch_union_accuracy(spark, sf_dir):
    """Per-group HLL estimates AND the merged-union estimate stay within 5%
    of exact — the union path re-aggregates stored sketches, so its accuracy
    is the whole point (approx_count_distinct can't do this)."""
    o = load(spark, sf_dir, "orders")
    exact_total = o.select(F.countDistinct("o_custkey")).collect()[0][0]
    per = o.groupBy("o_orderpriority").agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    union_est = per.select(F.hll_sketch_estimate(F.hll_union_agg("sk"))).collect()[0][0]
    assert abs(union_est - exact_total) / exact_total < 0.05
    exact_per = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for r in per.select("o_orderpriority", F.hll_sketch_estimate("sk").alias("est")).collect():
        assert abs(r["est"] - exact_per[r["o_orderpriority"]]) / exact_per[r["o_orderpriority"]] < 0.05


def test_approx_percentile_accuracy(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    exact = l.select(F.percentile("l_extendedprice", 0.5)).collect()[0][0]
    approx = l.select(F.percentile_approx("l_extendedprice", 0.5, 10000)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.01


def test_salted_agg_matches_plain(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem")
    plain = {
        r["l_returnflag"]: (r["n"], r["s"])
        for r in l.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dmoney("l_quantity")).cast("double").alias("s"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], r["s"])
        for r in salted_agg(
            l,
            ["l_returnflag"],
            aggs=[F.count(F.lit(1)).alias("n"), F.sum(dmoney("l_quantity")).alias("s_dec")],
            merges=[F.sum("n").alias("n"), F.sum("s_dec").cast("double").alias("s")],
            salt_buckets=16,
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark, sf_dir):
    from bridge_analytics_template_spark.catalog import load
    from bridge_analytics_template_spark.operators.skew import salted_join

    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = l.join(o, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("s")
    ).collect()[0]
    salted = salted_join(l, o, ["l_orderkey"], salt_buckets=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("s")
    ).collect()[0]
    assert plain["n"] == salted["n"] and plain["s"] == salted["s"]


def test_corr_matches_numpy(spark, sf_dir):
    import numpy as np

    from bridge_analytics_template_spark.catalog import load
    from bridge_analytics_template_spark.queries.registry import QUERIES

    out = {r["l_returnflag"]: r for r in QUERIES["agg_corr"](spark, sf_dir).collect()}
    pdf = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity", "l_extendedprice").toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        expected = np.corrcoef(grp["l_quantity"], grp["l_extendedprice"])[0, 1]
        assert abs(out[flag]["qty_price_corr"] - expected) < 1e-9


def test_hll_intersect_estimate_accuracy(spark, sf_dir):
    """The query's own bound flags hold, and its exact columns agree with
    an independently-collected set intersection."""
    from pyspark.sql import functions as F

    from bridge_analytics_template_spark.catalog import load
    from bridge_analytics_template_spark.queries import QUERIES

    row = QUERIES["agg_hll_intersect"](spark, sf_dir).collect()[0]
    assert row["singles_ok"] and row["union_ok"] and row["overlap_ok"]
    o = load(spark, sf_dir, "orders")
    half = F.when(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"), "early").otherwise("late")
    sets = {
        r["half"]: set(r["cs"])
        for r in o.groupBy(half.alias("half"))
        .agg(F.collect_set("o_custkey").alias("cs"))
        .collect()
    }
    assert row["exact_overlap"] == len(sets["early"] & sets["late"]) > 0
    assert row["exact_early"] == len(sets["early"])
    assert row["exact_late"] == len(sets["late"])
