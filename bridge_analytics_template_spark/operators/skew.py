"""Skew-aware aggregation (SURVEY.md §4: "salting for skew").

At 100 TB a handful of hot keys (one app/study with 100× the data) turn a
hash aggregate's shuffle into a straggler. Two mitigations in this engine:

1. AQE skew-join splitting — enabled by default in `session.get_spark`
   (`spark.sql.adaptive.skewJoin.enabled`); handles skewed *joins* at
   runtime with no code change.
2. :func:`salted_agg` — two-phase aggregation for skewed *group-bys*:
   partial-aggregate on (key, salt) to spread each hot key over N reducers,
   then final-aggregate on key. Works for any algebraic aggregate
   (sum/count/min/max — pass the merge form for the second phase).

Spark's own partial aggregation already handles skew when the map-side
combine ratio is high; salting matters when per-key cardinality *within a
partition* is low but total per-key volume is huge (many partitions all
feeding one reducer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    merges: list[Column],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-proof group-by.

    ``aggs`` aggregate raw rows (aliased); ``merges`` combine the phase-1
    results (referencing the phase-1 aliases, re-aliased to the same names).
    Example::

        salted_agg(df, ["k"],
                   aggs=[F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
                   merges=[F.sum("n").alias("n"), F.sum("s").alias("s")])
    """
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)))
    phase1 = salted.groupBy(*keys, "_salt").agg(*aggs)
    return phase1.groupBy(*keys).agg(*merges)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof equi-join for when AQE's skew splitting can't help (e.g.
    the skewed side feeds a single hot hash partition and the other side is
    too big to broadcast outright).

    The fact side gets a row-local salt (no shuffle to assign); the dim side
    is replicated ``salt_buckets``× via an in-row sequence explode. Joining
    on (key, salt) spreads each hot key over ``salt_buckets`` reducers.
    Replication multiplies the dim shuffle by the bucket count — use for
    mid-sized dims; tiny dims should just broadcast."""
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode_outer(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_fact.join(replicated_dim, [*on, "_salt"], how).drop("_salt")
