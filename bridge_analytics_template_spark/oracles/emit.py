"""Emit a computed reference answer as a DuckDB ``VALUES`` query, and read
fixture tables without Spark (pyarrow) for the reference computations."""

from __future__ import annotations

import functools
import os

import pyarrow.parquet as pq

from . import oracle_sf_dir

# DuckDB type per colspec letter: b=BIGINT, i=INTEGER, d=DOUBLE, s=VARCHAR,
# o=BOOLEAN.
_TYPES = {"b": "BIGINT", "i": "INTEGER", "d": "DOUBLE", "s": "VARCHAR", "o": "BOOLEAN"}


def _lit(v, t: str) -> str:
    if v is None:
        return f"CAST(NULL AS {_TYPES[t]})"
    if t == "s":
        return "'" + str(v).replace("'", "''") + "'"
    if t == "o":
        return "TRUE" if v else "FALSE"
    if t == "d":
        # repr round-trips the exact double; DuckDB parses shortest-repr
        # decimal back to the identical binary64
        return f"CAST({float(v)!r} AS DOUBLE)"
    return f"CAST({int(v)} AS {_TYPES[t]})"


def values_sql(rows, cols: list[tuple[str, str]], order_by: str | None = None) -> str:
    """``rows`` = iterable of tuples; ``cols`` = [(name, typeletter), ...].

    Emits ``SELECT ... FROM (VALUES ...) t(...) ORDER BY ...``. An empty
    row set still carries the schema (WHERE FALSE over typed NULLs)."""
    names = ", ".join(f'"{n}"' for n, _ in cols)
    rows = list(rows)
    if not rows:
        cells = ", ".join(f"{_lit(None, t)} AS \"{n}\"" for n, t in cols)
        return f"SELECT {cells} WHERE FALSE"
    body = ",\n      ".join(
        "(" + ", ".join(_lit(v, t) for v, (_, t) in zip(r, cols)) + ")" for r in rows
    )
    sql = f"SELECT * FROM (VALUES\n      {body}) t({names})"
    if order_by:
        sql += f" ORDER BY {order_by}"
    return sql


@functools.lru_cache(maxsize=32)
def _read(path: str, columns: tuple[str, ...]):
    return pq.read_table(path, columns=list(columns))


def read_fixture(table: str, *columns: str):
    """Read fixture columns (pyarrow Table) from the gate corpus, in the
    file's native row order — the same order a single-partition Spark scan
    delivers."""
    path = os.path.join(oracle_sf_dir(), f"{table}.parquet")
    return _read(path, tuple(columns))
