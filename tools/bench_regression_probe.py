"""One-off probe for the r3 bench regression (VERDICT r4 item 5).

Times the two queries the r3 official bench showed 2-3x slower with
unchanged code — t_session_islands and llm_dedup_exact — in two forms:
through the registered wrapper (per-invocation spark.catalog.clearCache)
and via the unwrapped function (no cache hygiene), best-of-5 each, warm
JIT. If the wrapper were the regression, the two forms would diverge;
if they match, the r3 delta was machine/environment noise (NOTES.md r3:
this box measures 1.3-1.6x slower than r2's official runner).

    python tools/bench_regression_probe.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bridge_analytics_template_spark.queries import QUERIES  # noqa: E402
from bridge_analytics_template_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
NAMES = ["t_session_islands", "llm_dedup_exact", "t_tumbling_counts"]


def best_of(fn, spark, n=5):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn(spark, SF_DIR).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
    return round(best, 3)


def main() -> None:
    spark = get_spark("regression-probe")
    out = {}
    for name in NAMES:
        wrapped = QUERIES[name]
        unwrapped = wrapped.__wrapped__
        # warm both plan shapes at the small fixture first
        wrapped(spark, "/root/testdata/sf0.001").count()
        out[name] = {
            "wrapped_clearCache": best_of(wrapped, spark),
            "unwrapped": best_of(unwrapped, spark),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
