"""PageRank: exact agreement with a dense numpy reference on the same
graph, plus the mass-conservation invariant."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bridge_analytics_template_spark.operators.pagerank import pagerank

DAMPING = 0.85
ITERS = 10


def _numpy_pagerank(edges: pd.DataFrame) -> dict[int, float]:
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = edges.groupby("src").size().to_dict()
    rank = np.full(n, 1.0 / n)
    for _ in range(ITERS):
        contrib = np.zeros(n)
        for s, d in zip(edges["src"], edges["dst"]):
            contrib[idx[d]] += rank[idx[s]] / out_deg[s]
        dangling = sum(rank[idx[v]] for v in nodes if v not in out_deg)
        rank = (1 - DAMPING) / n + DAMPING * (contrib + dangling / n)
    return {v: rank[i] for v, i in idx.items()}


@pytest.fixture(scope="module")
def chain_edges(spark):
    # src chain 0->1->2->0 plus a hub and a dangling sink (node 9)
    rows = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 0), (3, 1), (3, 9), (4, 3)]
    return rows


def test_pagerank_matches_numpy(spark, chain_edges):
    edges = spark.createDataFrame(chain_edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=ITERS).collect()}
    want = _numpy_pagerank(pd.DataFrame(chain_edges, columns=["src", "dst"]))
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_pagerank_mass_conserved(spark, chain_edges):
    edges = spark.createDataFrame(chain_edges, "src long, dst long")
    total = pagerank(edges, iterations=3).agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)


def test_pagerank_query_against_numpy(spark, sf_dir):
    """The full graph_pagerank query on real sf0.001 events vs numpy."""
    from bridge_analytics_template_spark.queries.pipeline import graph_pagerank

    # The query emits int64 fixed-point ranks (1e-12 units of total mass,
    # the r10 oracle contract); rescale to floats for the numpy comparison.
    got = {
        r["node"]: r["rank_e12"] / 1e12 for r in graph_pagerank(spark, sf_dir).collect()
    }
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])
    ev = ev.sort_values("event_id")
    u = ev["user_id"].to_numpy()
    mask = u[:-1] != u[1:]
    edges = pd.DataFrame({"src": u[:-1][mask], "dst": u[1:][mask]})
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_label_propagation_matches_python_reference(spark, sf_dir):
    """Spark LPA == plain-Python synchronous LPA with the same
    (max count, min label) deterministic update, iteration for iteration."""
    import pandas as pd

    from bridge_analytics_template_spark.catalog import load
    from bridge_analytics_template_spark.operators.labelprop import label_propagation
    from pyspark.sql import functions as F

    e = load(spark, sf_dir, "events").select("event_id", "user_id")
    nxt = e.select((F.col("event_id") - 1).alias("event_id"), F.col("user_id").alias("next_user"))
    arcs = (
        e.join(nxt, "event_id")
        .where(F.col("next_user") != F.col("user_id"))
        .select(F.col("user_id").alias("src"), F.col("next_user").alias("dst"))
    )
    got = {r["node"]: r["label"] for r in label_propagation(arcs, iterations=5).collect()}

    pairs = {(r["src"], r["dst"]) for r in arcs.collect()}
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(5):
        new = {}
        for n, nbrs in adj.items():
            counts: dict[int, int] = {}
            for m in nbrs:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[n] = best
        labels = new
    assert got == labels
