"""The pure-Python oracle hashes (oracles/hashes.py) must equal Spark's
xxhash64() / hash() for every length class the algorithms branch on:
empty, sub-word tails (1-3 and 1-7 bytes), exact word widths, the 32-byte
stripe threshold, multi-stripe, and multi-byte UTF-8."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridge_analytics_template_spark.oracles.hashes import (
    murmur3_32_long,
    murmur3_32_str,
    xxhash64_long,
    xxhash64_str,
)

STRINGS = (
    ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh", "abcdefghi"]
    + ["x" * n for n in (15, 16, 17, 31, 32, 33, 63, 64, 100)]
    + ["héllo wörld ñ 中文 🎉", "tab\tnew\nline", "quote'quote"]
)
LONGS = [0, 1, -1, 42, 2**31, -(2**31), 2**62, -(2**62), 123456789012345]


def test_string_hashes_match_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string").select(
        "s", F.xxhash64("s").alias("xx"), F.hash("s").alias("mm")
    )
    for r in df.collect():
        assert xxhash64_str(r["s"]) == r["xx"], repr(r["s"])
        assert murmur3_32_str(r["s"]) == r["mm"], repr(r["s"])


def test_long_hashes_match_spark(spark):
    df = spark.createDataFrame([(v,) for v in LONGS], "v long").select(
        "v", F.xxhash64("v").alias("xx"), F.hash("v").alias("mm")
    )
    for r in df.collect():
        assert xxhash64_long(r["v"]) == r["xx"], r["v"]
        assert murmur3_32_long(r["v"]) == r["mm"], r["v"]
