"""Label propagation for community detection — the second driver-loop
iterative graph algorithm (with operators/pagerank.py), used in curation
to group near-duplicate or same-site documents beyond what pure connected
components gives.

Synchronous LPA with a deterministic update: each node adopts the
highest-frequency-then-smallest-id winner among its neighbors' current
labels (orderBy desc(count), asc(label)). Deterministic tie-breaking matters twice over: it makes runs
reproducible on any partitioning (the oracle-style property tests depend
on it), and it is what the classic "random" LPA sacrifices for speed.

Scale shape (same rules as pagerank):
* edges canonicalized + symmetrized ONCE, repartitioned by src, persisted —
  each iteration pays exactly one shuffle (the per-node label-frequency
  aggregate on dst).
* labels persisted per iteration, previous unpersisted; lineage cut with
  localCheckpoint every few iterations so plan depth stays O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..caching import track


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Run ``iterations`` synchronous LPA steps over an undirected graph
    (``edges`` may be directed arcs; they are symmetrized). Returns
    ``(node, label)`` where ``label`` is the community representative id."""
    both = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = both.unionByName(
        both.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym = sym.repartition("a").persist()

    labels = (
        sym.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    ).persist()

    for i in range(iterations):
        # neighbor label frequencies: join edge (a→b) with b's label, count
        # per (a, label); winner = max count, then min label.
        freq = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy("a", "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        w = Window.partitionBy("a").orderBy(F.desc("n"), F.asc("label"))
        new_labels = (
            freq.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("a").alias("node"), "label")
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
            new_labels.count()
        labels.unpersist()
        labels = new_labels
    sym.unpersist()
    return track(labels)
