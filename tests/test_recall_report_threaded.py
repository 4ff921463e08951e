"""Pin the r11 llm_ann_recall_report restructure (VERDICT r10 next #1).

The query moved from four serial per-method join+crossJoin+aggregate
report branches to: five ANN pipelines built and materialized on driver
threads (bounded |Q|*k fetches — the probe set is already driver-collected
by the brute/PQ precondition), exact set-intersection hit counts, one
local 4-row result. Values must be identical to the serial join+aggregate
form, which tools/experiments_r11.py preserves verbatim.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def test_threaded_report_matches_serial_form(spark):
    from bridge_analytics_template_spark.queries import QUERIES
    from tools.experiments_r11 import recall_report_serial

    q = QUERIES["llm_ann_recall_report"]
    fn = getattr(q, "__wrapped__", q)
    sf = "/root/testdata/sf0.01"
    new = fn(spark, sf)
    old = recall_report_serial(spark, sf)
    assert new.schema.simpleString() == old.schema.simpleString()
    assert new.subtract(old).count() == 0
    assert old.subtract(new).count() == 0
    got = new.collect()
    assert [r["method"] for r in got] == ["ivf", "ivfpq", "lsh", "pq"]
    assert all(r["n_brute"] > 0 for r in got)
    assert all(0.0 <= r["recall_at_5"] <= 1.0 for r in got)
    spark.catalog.clearCache()
