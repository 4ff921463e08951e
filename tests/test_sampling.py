"""Seeded sampling determinism + raw object sink."""

from __future__ import annotations

import tempfile

from bridge_analytics_template_spark.catalog import load
from bridge_analytics_template_spark.sources.objectstore import claim_marker, put_object


def test_hash_sample_deterministic_and_sized(spark, sf_dir):
    """Content-hash sampling is exactly reproducible (seeded df.sample() is
    not — it varies with input split order, measured in this environment)
    and lands near the nominal 13/256 ≈ 5.1% fraction."""
    from pyspark.sql import functions as F

    l = load(spark, sf_dir, "lineitem")
    key = F.concat(F.col("l_orderkey").cast("string"), F.lit("_"), F.col("l_linenumber").cast("string"))
    pred = F.substring(F.md5(key), 1, 2) <= "0c"
    a = sorted((r["l_orderkey"], r["l_linenumber"]) for r in l.filter(pred).select("l_orderkey", "l_linenumber").collect())
    b = sorted((r["l_orderkey"], r["l_linenumber"]) for r in l.filter(pred).select("l_orderkey", "l_linenumber").collect())
    assert a == b
    total = l.count()
    assert 0.02 < len(a) / total < 0.09


def test_put_object_local_and_claim(tmp_path=None):
    base = tempfile.mkdtemp()
    p = put_object(base, "nested/key.txt", b"hello")
    assert open(p, "rb").read() == b"hello"
    marker = claim_marker(base, "appA", "studyB", "principal:3432808")
    assert marker.endswith("bridge-downstream/appA/studyB/owner.txt")
    assert open(marker).read() == "principal:3432808"
