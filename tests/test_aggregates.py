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
