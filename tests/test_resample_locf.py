"""Focused equivalence test for the r10 t_resample_locf rewrite.

The query moved from generate-grid (spans agg + sequence explode) +
left-join back to the observed buckets + last_value IGNORE NULLS over the
dense grid, to: LOCF + lead over the observed buckets only, then explode
each observation over its own gap span carrying the filled value. The two
formulations must stay row/value identical — including the edge cases the
join formulation handled implicitly (single-bucket users, NULL bucket
sums carried past gaps, adjacent buckets with no gap).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


def _events(spark):
    """Handcrafted spans: gaps, adjacency, a lone bucket, and a NULL-sum
    bucket mid-span (IGNORE NULLS must carry the older value past it)."""
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        # user 1: three buckets with a 2-bucket gap then adjacency
        (1, 101, ts(0), 10.0),
        (1, 102, ts(5), 2.5),
        (1, 103, ts(45), None),  # NULL-sum bucket: filled_sum carries 12.5
        (1, 104, ts(60), 7.0),
        # user 2: single bucket (lead is NULL -> span of one)
        (2, 201, ts(30), 3.0),
        # user 3: NULL-sum FIRST bucket (filled_sum stays NULL until 3.5)
        (3, 301, ts(0), None),
        (3, 302, ts(90), 3.5),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )


def _old_form(e):
    from pyspark.sql import Window

    from bridge_analytics_template_spark.functions.numeric import dmoney, dsum

    bucket = (F.unix_timestamp("ts") / F.lit(900)).cast("long") * 900
    obs = e.groupBy(F.col("user_id"), bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"), dsum(dmoney("value"), "bucket_sum")
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "user_id", F.explode(F.sequence("lo", "hi", F.lit(900))).alias("bucket")
        )
    )
    w = Window.partitionBy("user_id").orderBy("bucket")
    return (
        grid.join(obs, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            "bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("bucket_sum", ignorenulls=True).over(w).alias("filled_sum"),
        )
        .orderBy("user_id", "bucket")
    )


def _new_form(spark, e, tmpdir):
    """Run the registered query body against a parquet copy of ``e``."""
    import bridge_analytics_template_spark.queries.streaming as S

    e.write.mode("overwrite").parquet(f"{tmpdir}/events.parquet")
    q = S.t_resample_locf
    return getattr(q, "__wrapped__", q)(spark, str(tmpdir))


def test_locf_span_expansion_matches_grid_join(spark, tmp_path):
    e = _events(spark)
    old = _old_form(e)
    new = _new_form(spark, e, tmp_path)
    assert new.columns == old.columns
    assert new.subtract(old).count() == 0
    assert old.subtract(new).count() == 0
    # and the dense grid really is dense: user 1 spans buckets 0..3600+
    rows = {(r.user_id, r.bucket): r for r in new.collect()}
    u1 = sorted(b for (u, b) in rows if u == 1)
    assert u1 == list(range(u1[0], u1[-1] + 900, 900))
    # NULL-sum bucket carries the previous filled value forward
    gap_row = rows[(1, u1[2])]
    assert gap_row.n_events == 0
