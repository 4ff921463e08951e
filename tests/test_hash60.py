"""Pin the conv-based Spark spellings of the shared md5 hashes to the
portable nibble-sum forms they replaced in r10.

Two packings are in play:

* big-endian (sql_hash60 / spark_hash60): first 15 md5 hex digits read as
  one base-16 integer — hex digit k multiplies 16^(14-k);
* little-endian (the SimHash token hash): hex digit k sits at bits 4k,
  i.e. conv of the REVERSED 15-digit prefix.

Both swaps must be bit-exact for every input or the oracle gate breaks,
so this test evaluates old and new expressions side by side over a
diverse key space (every distinct token/id shape the queries hash) and
requires zero mismatches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bridge_analytics_template_spark.functions.numeric import spark_hash60, sql_hash60

_LE_OLD = " + ".join(
    f"shiftleft(CAST(instr('0123456789abcdef', substr(md5(s), {k + 1}, 1)) - 1"
    f" AS BIGINT), {4 * k})"
    for k in range(15)
)
_LE_NEW = "CAST(conv(reverse(substr(md5(s), 1, 15)), 16, 10) AS BIGINT)"


def _key_space(spark):
    """Integers, salted composites, unicode/empty/whitespace strings."""
    rows = (
        [(str(i),) for i in range(2000)]
        + [(f"{r}|{i}",) for r in range(8) for i in range(250)]
        + [("",), (" ",), ("\t",), ("héllo wörld",), ("€🙂",), ("a" * 500,)]
    )
    return spark.createDataFrame(rows, "s string")


def test_spark_hash60_matches_sql_hash60(spark):
    df = _key_space(spark).select(
        F.expr(f"CAST({sql_hash60('s')} AS BIGINT)").alias("old"),
        F.expr(f"CAST({spark_hash60('s')} AS BIGINT)").alias("new"),
    )
    assert df.filter("old <> new OR old IS NULL OR new IS NULL").count() == 0


def test_reverse_conv_matches_little_endian_packing(spark):
    df = _key_space(spark).select(
        F.expr(f"CAST({_LE_OLD} AS BIGINT)").alias("old"),
        F.expr(_LE_NEW).alias("new"),
    )
    assert df.filter("old <> new OR old IS NULL OR new IS NULL").count() == 0
