"""Iterative PageRank — the representative driver-loop iterative algorithm
(the class the reference's batch ETL cannot express and SQL cannot either:
a fixpoint over a graph).

Scale design (100 TB / 1000 executors):
* The edge relation is joined every iteration on ``src`` — it is
  repartitioned by ``src`` ONCE and persisted, so each iteration pays one
  shuffle (the contribution re-aggregation by ``dst``), not two.
* Rank vectors are persisted per iteration and the previous one unpersisted
  (bounded memory); every ``checkpoint_every`` iterations the lineage is cut
  with ``localCheckpoint`` so the plan does not grow linearly with the
  iteration count (Catalyst re-analysis cost and stack depth stay O(1)).
* Dangling-node mass (nodes with no out-edges) is re-distributed uniformly
  each iteration via a 1-row cross join — kept declarative (broadcast of a
  single row), no per-iteration ``collect`` on the driver.

Reference parity: the reference (copy_from_template.py) has no graph ops;
this belongs to the beyond-§2 training-data extension set (link-graph
quality signals for web-scale corpus filtering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..caching import track


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed multigraph.

    ``edges`` rows are individual arcs (parallel edges = proportionally
    more weight, the classic random-surfer semantics). Returns
    ``(node, rank)`` with ranks summing to 1.
    """
    spark = edges.sparkSession
    n_arcs = edges.count()
    # Size the loop's shuffle width to the graph, not the session default:
    # every iteration shuffles the rank vector, and a 32-way shuffle of a
    # 150-node vector is pure stage overhead, while a 100 TB edge set gets
    # its full width. ~250k arcs per partition target.
    prev_width = spark.conf.get("spark.sql.shuffle.partitions")
    width = max(1, min(int(prev_width), n_arcs // 250_000 + 1))
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    try:
        return _pagerank_loop(edges, src, dst, damping, iterations, checkpoint_every)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_width)


def _pagerank_loop(
    edges: DataFrame,
    src: str,
    dst: str,
    damping: float,
    iterations: int,
    checkpoint_every: int,
) -> DataFrame:
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    track(nodes)
    n = nodes.count()  # one job; the scalar parameterizes the closed form

    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("out_deg"))
    # Arc weight rank/out_deg needs out_deg on every arc; partition by src
    # once so each iteration's rank join is co-located.
    arcs = (
        edges.join(out_deg, src)
        .select(F.col(src).alias("node"), F.col(dst).alias("to"), "out_deg")
        .repartition("node")
        .persist()
    )
    track(arcs)
    arcs.count()  # materialize before the loop so iterations reuse, not rebuild

    # The rank vector carries a has_out flag so dangling mass each
    # iteration is a flag-filtered aggregate over the vector itself — no
    # per-iteration anti-join. The vector is also the "all nodes" frame
    # for the left join with contributions, so each iteration shuffles
    # exactly twice (rank->arc colocation, contribution re-keying); the
    # vector and the contributions both end up hash-partitioned by node,
    # so the final left join is shuffle-free.
    ranks = nodes.join(
        out_deg.select(F.col(src).alias("node"), F.lit(True).alias("has_out")),
        "node",
        "left",
    ).select(
        "node",
        F.lit(1.0 / n).alias("rank"),
        F.coalesce("has_out", F.lit(False)).alias("has_out"),
    )
    for i in range(iterations):
        contribs = (
            arcs.join(ranks.select("node", "rank"), "node")
            .groupBy(F.col("to").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("contrib"))
        )
        # Mass sitting on dangling nodes (no out-arcs) is spread uniformly.
        dangling = ranks.where(~F.col("has_out")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass")
        )
        new_ranks = (
            ranks.select("node", "has_out")
            .join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("dangling_mass") / n)
                ).alias("rank"),
                "has_out",
            )
        )
        # Materialize only at checkpoint rounds: lineage depth stays
        # <= checkpoint_every while the loop launches O(iters/k) jobs,
        # not one per iteration (the per-job fixed cost dominates small
        # graphs; at scale fewer barriers also means better pipelining).
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            new_ranks = new_ranks.localCheckpoint(eager=True)
            ranks.unpersist()
        ranks = new_ranks
    return ranks.select("node", "rank")
