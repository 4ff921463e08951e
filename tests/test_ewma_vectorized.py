"""Focused equivalence test for the r10 ts_ewma_int vectorization.

The query moved from one applyInPandas group per user (Python loop per
row) to hash-bucketed groups with the integer recurrence vectorized
ACROSS users in step-aligned blocks. s_t = x_t + s_{t-1} // 2 must stay
bit-identical for every input shape — the flooring makes the recurrence
non-associative, so the test drives it with negatives (floor-div rounds
toward -inf), ragged group lengths (the searchsorted alignment path),
single-event users, and values that exercise the floor(value*100) edge.
"""

from __future__ import annotations

import datetime
import random

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _reference(rows):
    """Per-user pure-Python recurrence in (ts, event_id) order."""
    by_user: dict[int, list] = {}
    for u, e, ts, v in rows:
        by_user.setdefault(u, []).append((ts, e, v))
    out = {}
    import math

    for u, evs in by_user.items():
        s = 0
        first = True
        for ts, e, v in sorted(evs):
            x = math.floor(v * 100)
            s = x if first else x + s // 2
            first = False
            out[(u, e)] = s
    return out


def test_bucketed_step_vectorized_matches_reference(spark, tmp_path):
    rng = random.Random(42)
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # ragged lengths incl. 1-event users; negative and fractional values
    for u in range(1, 60):
        for k in range(rng.choice([1, 1, 2, 5, 17, 40])):
            eid += 1
            rows.append(
                (
                    u,
                    eid,
                    t0 + datetime.timedelta(seconds=rng.randrange(10**6)),
                    rng.uniform(-500.0, 500.0),
                )
            )
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    import bridge_analytics_template_spark.queries.corpus as C

    q = C.ts_ewma_int
    got = {
        (r.user_id, r.event_id): r.ewma_half_cents
        for r in getattr(q, "__wrapped__", q)(spark, str(tmp_path)).collect()
    }
    want = _reference(rows)
    assert got == want
