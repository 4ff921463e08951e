"""Streaming inventory T1-T6 (SURVEY.md §2.9).

Oracle strategy: every window op is verified through its batch-equivalent
formulation (identical semantics, SQL-expressible); the genuinely-streaming
executions (readStream → watermark → memory sink) run as rows-only entries
and are asserted stream==batch in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load
from ..functions.numeric import dmoney, dsum
from ..streaming.windows import (
    dedup_stream,
    run_to_memory,
    sessionize_batch,
    stream_events,
    tumbling_counts,
)
from .registry import query


@query(
    "t_tumbling_counts",
    sql="""
    SELECT to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 600) * 600 AS BIGINT))
             AS window_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def t_tumbling_counts(spark, sf_dir):
    """T1 (batch-equivalent): 10-minute tumbling windows per event type.
    `F.window` epoch-aligns window starts, which is exactly the epoch-floor
    bucketing the oracle computes."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(dmoney("value"), "total_value"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n", "total_value")
        .orderBy("window_start", "event_type")
    )


@query(
    "t_sliding_counts",
    sql="""
    SELECT to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 300) * 300 - 300 * k AS BIGINT))
             AS window_start,
           COUNT(*) AS n
    FROM events, unnest([0, 1]) AS u(k)
    GROUP BY 1 ORDER BY 1
    """,
)
def t_sliding_counts(spark, sf_dir):
    """T2 (batch-equivalent): 10-minute windows sliding by 5 — every event
    lands in exactly width/slide = 2 windows."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
        .orderBy("window_start")
    )


@query(
    "t_session_islands",
    sql="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR date_diff('microsecond', LAG(ts) OVER w, ts) > 300000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessioned AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
      FROM flagged)
    SELECT user_id, session_seq,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events
    FROM sessioned GROUP BY 1, 2 ORDER BY user_id, session_seq
    """,
)
def t_session_islands(spark, sf_dir):
    """T3 (batch-equivalent): 5-minute-gap sessionization via lag + cumsum
    islands; semantically identical to `session_window(ts, '5 minutes')`,
    which tests/test_streaming.py asserts."""
    e = load(spark, sf_dir, "events")
    return sessionize_batch(e, gap_seconds=300).orderBy("user_id", "session_seq")


@query(
    "t_dedup_equiv",
    sql="""
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique, COUNT(*) AS n_rows
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def t_dedup_equiv(spark, sf_dir):
    """T5 (batch-equivalent): dedup on event_id — the fixture is already
    unique, so n_unique == n_rows is itself part of the verified result."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("event_id").alias("n_unique"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("event_type")
    )


@query("t_stream_tumbling")  # rows-only: genuinely-streaming execution
def t_stream_tumbling(spark, sf_dir):
    """T1/T4 (streaming execution): readStream over the events parquet with
    a 10-minute watermark, tumbling counts, memory sink driven to
    completion. Stream==batch equality is asserted in tests."""
    agg = tumbling_counts(stream_events(spark, sf_dir))
    return run_to_memory(agg, "complete").orderBy("window_start", "event_type")


@query("t_stream_dedup")  # rows-only: stateful streaming dedup
def t_stream_dedup(spark, sf_dir):
    """T5 (streaming execution): watermarked dropDuplicates over the stream;
    returns the per-type counts of the deduped stream."""
    deduped = dedup_stream(stream_events(spark, sf_dir))
    out = run_to_memory(deduped, "append")
    return out.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).orderBy("event_type")


@query(
    "t_attribution_join",
    sql="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
    ORDER BY purchase_id, click_id
    """,
)
def t_attribution_join(spark, sf_dir):
    """T8 (batch-equivalent): time-bounded attribution self-join — each
    purchase matched to the same user's clicks in the preceding 30 minutes.
    The streaming form (stream_stream_attribution) runs the identical plan
    as a watermarked stream-stream join; equivalence asserted in
    tests/test_streaming.py."""
    from ..streaming.windows import stream_stream_attribution

    e = load(spark, sf_dir, "events")
    return stream_stream_attribution(e).orderBy("purchase_id", "click_id")


@query("t_stream_session")  # rows-only: genuinely-streaming execution
def t_stream_session(spark, sf_dir):
    """T3 (streaming form): native session_window with a 5-minute gap,
    driven through readStream → memory sink. Equivalence with the batch
    island formulation is asserted in tests/test_streaming.py."""
    from ..streaming.windows import session_windows_stream

    sess = session_windows_stream(stream_events(spark, sf_dir))
    return run_to_memory(sess, "complete").orderBy("session_start", "user_id")


@query(
    "t_resample_locf",
    sql="""
    WITH obs AS (
      SELECT user_id,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) * 900 AS BIGINT) AS bucket,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS bucket_sum
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi FROM obs GROUP BY 1
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, 900)) AS bucket FROM spans
    )
    SELECT g.user_id, g.bucket,
           COALESCE(o.n_events, 0) AS n_events,
           last_value(o.bucket_sum IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.bucket) AS filled_sum
    FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.bucket = o.bucket
    ORDER BY g.user_id, g.bucket
    """,
)
def t_resample_locf(spark, sf_dir):
    """Gap-filled downsample (the hypertable-rollup / timeseries-resample
    shape): per user, 15-minute buckets over the user's own observed span,
    empty buckets materialized from a generated grid (sequence+explode, no
    driver loop) and value carried forward (LOCF via last_value IGNORE
    NULLS). Everything partitions by user_id — grid generation, join and
    fill window all co-key, so the whole query is two shuffles at any
    scale. Buckets are epoch-second integers (tz-proof); sums go
    decimal-through."""
    e = load(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts") / F.lit(900)).cast("long") * 900
    obs = e.groupBy(F.col("user_id"), bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"), dsum(dmoney("value"), "bucket_sum")
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.lit(900))).alias("bucket"),
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
