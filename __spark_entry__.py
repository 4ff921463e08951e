"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in ``bridge_analytics_template_spark.queries``
(one module per SURVEY.md §2 family, decorator-registered).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bridge_analytics_template_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted keys are checked
    rows-only (non-SQL-expressible ops).

    Entries registered as callables are LAZY oracle generators — resolved
    here, at the moment the gate asks for them. Generators re-derive the
    expected answer from the fixture with an independent single-node
    reference implementation (pure-Python hashes, numpy ANN/k-means — see
    bridge_analytics_template_spark/oracles/) and emit it as a VALUES
    query, so iterative / hash-seeded operators whose semantics plain SQL
    cannot express still land under the exact value-hash gate. A generator
    that fails (e.g. fixture dir missing) degrades that query to rows-only
    instead of breaking every other oracle."""
    out: dict[str, str] = {}
    for k, v in ORACLES.items():
        if callable(v):
            try:
                out[k] = v()
            except Exception:  # degrade to rows-only, keep the rest intact
                continue
        else:
            out[k] = v
    return out
