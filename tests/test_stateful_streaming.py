"""applyInPandasWithState: final streamed state equals the batch aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridge_analytics_template_spark.catalog import load
from bridge_analytics_template_spark.streaming.stateful import running_user_totals
from bridge_analytics_template_spark.streaming.windows import stream_events


def test_running_totals_match_batch(spark, sf_dir):
    import uuid

    out = running_user_totals(stream_events(spark, sf_dir))
    name = f"state_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode may emit a row per micro-batch per key: keep the last.
    streamed = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.table(name).collect()
    }
    batch = {
        r["user_id"]: (r["n"], round(r["t"], 6))
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    # every user's final streamed state must equal the batch totals
    assert set(batch) == set(streamed)
    for u, (n, t) in batch.items():
        assert streamed[u][0] == n
        assert abs(streamed[u][1] - t) < 1e-6


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


import pytest  # noqa: E402


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python state-server protocol needs "
    "google.protobuf, not shipped in this container",
)
def test_transform_with_state_matches_batch(spark, sf_dir):
    """transformWithStateInPandas (StatefulProcessor): same equivalence."""
    import uuid

    from bridge_analytics_template_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    out = running_user_totals_tws(stream_events(spark, sf_dir))
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.table(name).collect()
    }
    batch = {
        r["user_id"]: (r["n"], round(r["t"], 6))
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(batch) == set(streamed)
    for u, (n, t) in batch.items():
        assert streamed[u][0] == n
        assert abs(streamed[u][1] - t) < 1e-6
