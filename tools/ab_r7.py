"""Interleaved A/B for the r6→r7 sf0.1 bench regression (VERDICT r6 task 2).

Two suspects, each with the causative r6 change toggled off:

* ``llm_dedup_clusters`` 1.081 → 1.402 s: the distinct-first collapse
  (``collapse_exact_duplicates`` — a window-min over content md5) added in
  r6 is pure overhead on the dup-light sf0.1 corpus. Variant B rebuilds
  the r5 shape (shingle ALL docs, no collapse).
* ``llm_ngram_jaccard`` 0.928 → 1.097 s: the re-persisted prefix index.
  Variant B runs ``prefix_filtered_pairs(..., persist_index=False)``.

Passes are INTERLEAVED (A, B, A, B, …) so box drift hits both variants
equally; per-variant result is the min over N passes, cache cleared
between every pass. Usage::

    python tools/ab_r7.py [N]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from bridge_analytics_template_spark.catalog import load  # noqa: E402
from bridge_analytics_template_spark.llm.dedup import (  # noqa: E402
    _shingle_arrays,
    collapse_exact_duplicates,
    connected_components,
    prefix_filtered_pairs,
)
from bridge_analytics_template_spark.queries import QUERIES  # noqa: E402
from bridge_analytics_template_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def clusters_head(spark, sf_dir):
    return QUERIES["llm_dedup_clusters"].__wrapped__(spark, sf_dir)


def clusters_nocollapse(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    arrays = _shingle_arrays(d, "text", "doc_id", 5, hashed=True)
    pairs = prefix_filtered_pairs(arrays, min_jaccard=0.5).select("doc_a", "doc_b")
    return (
        connected_components(pairs)
        .select(F.col("node").alias("doc_id"), "cluster_id")
        .orderBy("doc_id")
    )


def jaccard_head(spark, sf_dir):
    return QUERIES["llm_ngram_jaccard"].__wrapped__(spark, sf_dir)


def jaccard_nopersist(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    arrays = _shingle_arrays(d, "text", "doc_id", 5, hashed=True)
    return (
        prefix_filtered_pairs(arrays, min_jaccard=0.5, persist_index=False)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


PAIRS = {
    "clusters": (clusters_head, clusters_nocollapse),
    "jaccard": (jaccard_head, jaccard_nopersist),
}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab-r7")
    out = {}
    for name, (fa, fb) in PAIRS.items():
        # warm both plan shapes at the tiny fixture
        for f in (fa, fb):
            f(spark, "/root/testdata/sf0.001").count()
            spark.catalog.clearCache()
        times = {"A_head": [], "B_toggled": []}
        for _ in range(n):
            for key, f in (("A_head", fa), ("B_toggled", fb)):
                t0 = time.time()
                f(spark, SF_DIR).count()
                times[key].append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
        out[name] = {
            k: {"min": min(v), "passes": v} for k, v in times.items()
        }
        print(name, json.dumps(out[name]), flush=True)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
