"""The r10 small-graph driver fast path must be bit-identical to the
distributed iterative loops it short-circuits (operators/graph_local.py).
Forcing the distributed path goes through the monkeypatchable
SMALL_GRAPH_ARCS bound (resolved at call time in try_collect_arcs)."""

from __future__ import annotations

import pytest

from bridge_analytics_template_spark.operators import graph_local
from bridge_analytics_template_spark.queries.corpus import (
    graph_hits_ppm,
    graph_pagerank_ppm,
)
from bridge_analytics_template_spark.queries.pipeline import graph_pagerank

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "fn", [graph_pagerank, graph_pagerank_ppm, graph_hits_ppm],
    ids=["pagerank_full", "pagerank_ppm", "hits_ppm"],
)
def test_fast_path_matches_distributed(spark, fn, monkeypatch):
    q = getattr(fn, "__wrapped__", fn)
    fast = [tuple(r) for r in q(spark, SF).collect()]
    assert fast, "fixture graph must be non-empty"
    monkeypatch.setattr(graph_local, "SMALL_GRAPH_ARCS", 0)
    slow = [tuple(r) for r in q(spark, SF).collect()]
    spark.catalog.clearCache()
    assert fast == slow
