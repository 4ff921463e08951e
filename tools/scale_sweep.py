"""Scale sweep: execute EVERY queries() entry against a replicated fixture
(default /tmp/scale10 — sf0.1 × 10 with offset ids) and log wall time + row
count. Not a correctness gate (the replica breaks oracle values by
construction — every doc/vector gains copies); it is the cliff detector:
a query that OOMs, one-tasks, or goes quadratic shows up here long before
a cluster run would.

    python tools/scale_sweep.py [--dir /tmp/scale10] [name ...]
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from bridge_analytics_template_spark.queries import QUERIES  # noqa: E402
from bridge_analytics_template_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/scale10")
    ap.add_argument(
        "--budget",
        type=float,
        default=0.0,
        help="per-query wall budget in seconds; exceeding it FAILS the sweep "
        "(0 = no budget, informational SLOW flag at 60s only)",
    )
    ap.add_argument(
        "--list",
        dest="list_file",
        default=None,
        help="file with one query name per line (# comments allowed) — the "
        "standing CI target set (tools/sweep_list.txt)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    spark = get_spark("scale-sweep")
    names = list(args.names)
    budgets: dict[str, float] = {}
    if args.list_file:
        # List lines are "name" or "name <budget-seconds>" — the second form
        # pins a per-query budget (the 100x tier sets these from measured
        # r5 numbers +50%, VERDICT r5 task 2) overriding --budget.
        with open(args.list_file) as fh:
            for ln in fh:
                ln = ln.strip()
                if not ln or ln.startswith("#"):
                    continue
                parts = ln.split()
                names.append(parts[0])
                if len(parts) > 1:
                    budgets[parts[0]] = float(parts[1])
    names = names or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries in sweep list: {unknown}")
        sys.exit(1)
    failures, slow = [], []
    for name in names:
        t0 = time.time()
        try:
            n = QUERIES[name](spark, args.dir).count()
            dt = time.time() - t0
            budget = budgets.get(name, args.budget)
            over = budget and dt > budget
            flag = " OVER-BUDGET" if over else (" SLOW" if dt > 60 else "")
            if over:
                failures.append(name)
            elif dt > 60:
                slow.append(name)
            print(f"[{'FAIL' if over else 'ok'}]   {name:32s} {dt:7.2f}s rows={n}{flag}", flush=True)
        except Exception:
            dt = time.time() - t0
            failures.append(name)
            print(f"[FAIL] {name:32s} {dt:7.2f}s", flush=True)
            traceback.print_exc(limit=2)
        spark.catalog.clearCache()
    print(f"\n{len(names) - len(failures)}/{len(names)} ok; slow(>60s): {slow}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
