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
ORACLES: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    """Register a query (and its oracle SQL, when SQL-expressible)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco
