"""Deterministic numeric aggregation helpers.

Floating-point sums are order-dependent: at 100 TB the combine order of
partial aggregates is nondeterministic across runs (and differs from any
other engine). The fix used throughout this engine: cast the *inputs* of a
monetary expression to DECIMAL (the fixture money/rate columns are exact
2-decimal values, so the cast is unambiguous), do the arithmetic and the SUM
exactly in decimal (decimal addition is associative — combine order cannot
change the result), and cast the final total back to DOUBLE.

Casting the *result* of double arithmetic to decimal is NOT safe across
engines: Spark rounds the double's shortest decimal representation
(java.math.BigDecimal.valueOf) while DuckDB rounds the binary value, and the
two disagree near scale boundaries. Decimal-in / decimal-through avoids the
issue entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Money-like columns (prices, balances, quantities): 2-decimal exact values.
MONEY = "decimal(12,2)"
# Rate-like columns (discount, tax): small 2-decimal fractions.
RATE = "decimal(3,2)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dmoney(col: Column | str) -> Column:
    return _c(col).cast(MONEY)


def drate(col: Column | str) -> Column:
    return _c(col).cast(RATE)


def dsum(expr: Column | str, alias: str | None = None) -> Column:
    """Exact decimal SUM cast back to double (expr must be decimal-typed)."""
    out = F.sum(_c(expr)).cast("double")
    return out.alias(alias) if alias else out


def davg(expr: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum (as double) / count."""
    c = _c(expr)
    out = F.sum(c).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


# --- DuckDB-side renderings for oracle SQL ---------------------------------

def sql_money(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(12,2))"


def sql_rate(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(3,2))"


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) / COUNT({expr}) AS {alias}"
