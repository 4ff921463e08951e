"""Interleaved A/B benchmark harness — the drift-immune instrument.

This box's wall-clock drifts 1.3-1.6x across hours (NOTES.md "bench
box-drift evidence": identical code measured 7.08-10.39 s across one
round). Sequential before/after comparisons therefore produce phantom
regressions — r6 charged two (+18% jaccard, +14% clusters) of which one
REVERSED under interleaving. This harness is the only trustworthy way to
attribute a perf delta to code on this machine; every perf claim in NOTES
must cite it.

Method (generalizes tools/ab_r7.py, which settled both r6 regressions):

* variants run ROUND-ROBIN (A, B, A, B, ...) so ambient load hits every
  variant equally within each pass;
* each variant is warmed once at sf0.001 to compile its plan shape before
  timing starts;
* the per-variant statistic is the MIN over N passes (min is robust to
  one-sided contention spikes; the cache is cleared between every run);
* with exactly two variants the PAIRED per-pass deltas are printed too —
  if the sign of (B - A) is stable across passes the difference is code,
  if it flips it is noise.

Usage::

    python tools/ab.py QUERY_A [QUERY_B ...] [--n 5] [--sf DIR]

A variant is either a registered query name (the
bridge_analytics_template_spark registry) or ``module:callable`` where the
callable takes ``(spark, sf_dir) -> DataFrame`` — the hook for measuring a
toggled/experimental shape against HEAD without editing the registry.
"""

from __future__ import annotations

import argparse
import importlib
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bridge_analytics_template_spark.queries import QUERIES  # noqa: E402
from bridge_analytics_template_spark.session import get_spark  # noqa: E402

WARM_SF = "/root/testdata/sf0.001"


def resolve(spec: str):
    """A registered query name, or ``module:callable``."""
    if ":" in spec:
        mod, fn = spec.split(":", 1)
        return getattr(importlib.import_module(mod), fn)
    q = QUERIES[spec]
    # time the query body, not the registration wrapper
    return getattr(q, "__wrapped__", q)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("variants", nargs="+", help="query names or module:callable")
    ap.add_argument("--n", type=int, default=5, help="interleaved passes")
    ap.add_argument("--sf", default="/root/testdata/sf0.1", help="data dir to time at")
    ap.add_argument(
        "--action",
        choices=("count", "noop"),
        default="count",
        help="timed action: count() (bench parity) or the noop sink "
        "(optimization guide §1.4 — computes every column of every row, "
        "immune to count()'s subtree pruning)",
    )
    args = ap.parse_args()

    # label by position so duplicate specs stay DISTINCT runs — an A/A
    # calibration (`ab.py q q`) must measure the box's real noise, not
    # collapse both variants onto one timing list and report fabricated
    # perfect stability (review finding r8)
    labels = [
        spec if args.variants.count(spec) == 1 else f"{spec}#{i}"
        for i, spec in enumerate(args.variants)
    ]
    fns = [(lab, resolve(spec)) for lab, spec in zip(labels, args.variants)]
    spark = get_spark("ab")

    def act(df):
        if args.action == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    for _, f in fns:  # compile every plan shape before timing
        act(f(spark, WARM_SF))
        spark.catalog.clearCache()

    times: dict[str, list[float]] = {lab: [] for lab, _ in fns}
    for _ in range(args.n):
        for lab, f in fns:
            t0 = time.time()
            act(f(spark, args.sf))
            times[lab].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()

    out = {lab: {"min": min(v), "passes": v} for lab, v in times.items()}
    if len(labels) == 2:
        a, b = labels
        deltas = [round(tb - ta, 3) for ta, tb in zip(times[a], times[b])]
        out["paired_delta_b_minus_a"] = {
            "per_pass": deltas,
            "sign_stable": len({d > 0 for d in deltas}) == 1,
        }
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
