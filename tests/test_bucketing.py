"""Bucketed join executes with zero shuffle exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridge_analytics_template_spark.catalog import load
from bridge_analytics_template_spark.sources.bucketing import read_table, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(l, "li_bucketed", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(o, "ord_bucketed", ["o_orderkey"], 8, sort_cols=["o_orderkey"])

    lb, ob = read_table(spark, "li_bucketed"), read_table(spark, "ord_bucketed")
    # hint merge: at fixture scale Spark would broadcast (and skip bucket
    # use entirely); the bucketed-SMJ path is the one that exists at 100 TB
    joined = lb.join(ob.hint("merge"), lb.l_orderkey == ob.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located buckets: the join needs no shuffle of either side
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" in plan

    # and the result matches the plain (shuffling) join
    plain = l.join(o, l.l_orderkey == o.o_orderkey)
    assert joined.count() == plain.count()
    a = joined.agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")).collect()[0][0]
    b = plain.agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")).collect()[0][0]
    assert a == b
