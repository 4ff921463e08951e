"""Tracked persists for intermediates whose lifetime spans a returned plan.

Several operators ``persist()`` an intermediate that the RETURNED DataFrame
still references (self-join sides, signature tables, sketch halves) — the
function cannot unpersist it before returning. Harnesses (the verification
driver replica, bench.py, the registry wrapper) sweep these with
``spark.catalog.clearCache()`` between queries; a LIBRARY consumer without
those wrappers would accumulate storage memory instead (VERDICT r2).

``track`` records such a persist; ``release_all`` unpersists everything
recorded — call it after the results of a pipeline have been consumed:

    from bridge_analytics_template_spark.caching import release_all
    result = minhash_near_dups(docs).collect()
    release_all()

Unpersisting an already-unpersisted or garbage-collected frame is a no-op,
so harness clearCache and ``release_all`` compose safely.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_TRACKED: list[weakref.ref] = []


def track(df: DataFrame) -> DataFrame:
    """Record a persisted DataFrame for later :func:`release_all`."""
    _TRACKED.append(weakref.ref(df))
    return df


def release_all() -> int:
    """Unpersist every tracked DataFrame still alive; returns the count."""
    released = 0
    for ref in _TRACKED:
        df = ref()
        if df is None:
            continue
        try:
            df.unpersist(blocking=False)
            released += 1
        except Exception:
            pass  # session gone — nothing to release
    _TRACKED.clear()
    return released
