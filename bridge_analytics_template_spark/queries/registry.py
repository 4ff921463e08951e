"""Query/oracle registry.

Each query is a callable ``(spark, sf_dir) -> DataFrame``; the optional
``sql`` is the ANSI-SQL equivalent DuckDB runs on the same parquet tables
(views pre-registered by the driver). Column names are aliased identically on
both sides — the driver's comparator sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
# str, or a LAZY generator () -> str for oracles derived from a reference
# computation over the fixture (resolved by __spark_entry__.oracle_sql();
# see bridge_analytics_template_spark/oracles/).
ORACLES: dict[str, str | Callable[[], str]] = {}

try:
    from py4j.protocol import Py4JError as _Py4JError
except ImportError:  # pragma: no cover - py4j ships with pyspark
    _Py4JError = RuntimeError


def query(name: str, sql: str | None = None):
    """Register a query (and its oracle SQL, when SQL-expressible).

    The REGISTERED callable clears leftover cached data before building its
    plan: several operators persist() intermediates whose lifetime spans the
    returned plan (so they cannot unpersist themselves), and a caller
    iterating hundreds of registry entries — the verification driver — would
    otherwise accumulate them in executor storage memory. Clearing BEFORE
    the build only drops previous queries' leftovers, never this query's
    own. Module-level callers (queries composing other queries, tests that
    import the function directly) get the UNWRAPPED function back from the
    decorator, so a composite build never clears its own intermediates.

    CONTRACT (ADVICE r2): registered callables assume build-then-execute,
    one at a time — execute (collect/write) each returned DataFrame before
    invoking the next registered query. A caller that interleaves builds
    and executions would have an earlier query's persisted intermediates
    dropped here; since round 3 every operator whose RESULT depends on a
    persisted intermediate (assign_contiguous_ids) is deterministic under
    recompute, so even that pattern can only cost time, not correctness."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            # A silent overwrite shadows an existing query (and its oracle)
            # for every consumer, including the official driver — fail at
            # import so the collision is caught the moment it's authored.
            raise ValueError(f"duplicate query registration: {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            try:
                spark.catalog.clearCache()
            except (_Py4JError, RuntimeError, AttributeError):
                pass  # session being torn down — proceed without hygiene
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__module__ = fn.__module__
        wrapped.__wrapped__ = fn
        QUERIES[name] = wrapped
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco
