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


# --- Integer-units fast path ----------------------------------------------
#
# Money/rate columns are exact 2-decimal values, so they embed losslessly in
# int64 "cents". Per-row arithmetic and SUM then run as plain long codegen —
# no BigDecimal accumulator (a decimal(p>18) sum leaves the long-backed fast
# path) — measured ~1.7× faster than decimal-through on the Q1-shape
# aggregate, bit-identical results on both engines. The long accumulator
# bounds the safe domain: scale-4 revenue units average ~4e8 per lineitem
# row, so a single group overflows only past ~2e10 rows. Use these for
# bounded-group aggregates (any groupBy with real keys); keep ``dsum`` for
# planet-scale single-group totals where the decimal accumulator's headroom
# is the point.


def money_units(col: Column | str) -> Column:
    """Money as exact int64 hundredths (scale 2)."""
    return (dmoney(col) * 100).cast("long")


def rate_units(col: Column | str) -> Column:
    """Rate as exact int64 hundredths (scale 2)."""
    return (drate(col) * 100).cast("long")


def usum(expr: Column, scale: int, alias: str | None = None) -> Column:
    """SUM of integer units, rescaled to a double at the end (one exact
    long sum, one IEEE division — order-independent and engine-stable)."""
    out = F.sum(expr).cast("double") / F.lit(float(10**scale))
    return out.alias(alias) if alias else out


def uavg(expr: Column, scale: int, alias: str | None = None) -> Column:
    """AVG via integer-unit sum: sum/count, then rescale (matches
    :func:`sql_uavg` operation-for-operation)."""
    out = (F.sum(expr).cast("double") / F.count(expr)) / F.lit(float(10**scale))
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


def sql_money_units(expr: str) -> str:
    return f"CAST({sql_money(expr)} * 100 AS BIGINT)"


def sql_rate_units(expr: str) -> str:
    return f"CAST({sql_rate(expr)} * 100 AS BIGINT)"


def sql_usum(expr: str, scale: int, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) / {float(10 ** scale)!r} AS {alias}"


def sql_uavg(expr: str, scale: int, alias: str) -> str:
    return f"(CAST(SUM({expr}) AS DOUBLE) / COUNT({expr})) / {float(10 ** scale)!r} AS {alias}"


def sql_hash60(expr: str) -> str:
    """60-bit integer hash of a text expression via md5-nibble packing —
    pure SQL both engines evaluate identically (Spark codegen and DuckDB
    both CSE the repeated md5 call). The shared deterministic hash under
    every oracle-exact sketch/sample (KMV, count-min, shard manifests,
    bootstrap replicas)."""
    return " + ".join(
        f"(instr('0123456789abcdef', substr(md5({expr}), {k + 1}, 1)) - 1)"
        f" * CAST({16 ** (14 - k)} AS BIGINT)"
        for k in range(15)
    )


def spark_hash60(expr: str) -> str:
    """The SAME 60-bit hash as :func:`sql_hash60`, spelled for Spark's
    evaluator: the first 15 md5 hex digits parsed as one base-16 integer
    (``conv``) instead of 15 positional nibble terms. Bit-identical by
    construction — both read the same 15-hex-digit prefix — and pinned by
    tests/test_hash60.py over the fixture key space. Use this form in
    DataFrame plans (one md5 + one conv per evaluation instead of a
    15-term instr/substr tree, which matters most inside higher-order
    lambdas where expressions interpret per element); keep sql_hash60 for
    oracle SQL (DuckDB has no conv)."""
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
