"""Noop-sink isolation probe (optimization guide §1.4): time each query's
FULL computation — every column of every row — through the built-in noop
data source, next to the bench's count() action, so per-query cost can be
attributed without the sink and without count()'s column pruning.

This deliberately does NOT replace bench.py's methodology (the driver's
cross-round comparison needs the same timed action every round); it is the
side instrument that answers "does count() hide work the real query does?"
per query. Jobs are labelled for the (disabled-by-default) UI.

    python tools/noop_probe.py QUERY [...] [--n 3] [--sf DIR] [--no-warm]

Prints one JSON line per query:
  {"query": name, "noop": [sec...], "count": [sec...], "build": [sec...]}
where build is the driver-side plan-construction latency (QUERIES[name]
call alone, no action) — the py4j/planning share of every measured pass.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bridge_analytics_template_spark.queries import QUERIES  # noqa: E402
from bridge_analytics_template_spark.session import get_spark  # noqa: E402

WARM_SF = "/root/testdata/sf0.001"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    spark = get_spark("noop-probe")
    sc = spark.sparkContext
    for name in args.names:
        fn = QUERIES[name]
        if not args.no_warm:
            fn(spark, WARM_SF).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        rec = {"query": name, "noop": [], "count": [], "build": []}
        for _ in range(args.n):
            t0 = time.time()
            df = fn(spark, args.sf)
            rec["build"].append(round(time.time() - t0, 3))
            sc.setJobDescription(f"noop:{name}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            rec["noop"].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            sc.setJobDescription(f"count:{name}")
            t0 = time.time()
            df2 = fn(spark, args.sf)
            df2.count()
            rec["count"].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            sc.setJobDescription(None)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
