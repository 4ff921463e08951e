"""Tests for the declarative pipeline-spec compiler (plans/pipeline_spec.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bridge_analytics_template_spark.plans.pipeline_spec import (
    compile_pipeline,
    compile_pipeline_yaml,
)

from conftest import SF_SMALL


def _docs(spark):
    from bridge_analytics_template_spark.catalog import load

    return load(spark, SF_SMALL, "documents")


def test_unknown_op_fails_at_compile(spark):
    with pytest.raises(ValueError, match="unknown op"):
        compile_pipeline(
            {"source": "documents", "stages": [{"op": "nope"}]},
            {"documents": _docs(spark)},
        )
    with pytest.raises(ValueError, match="unknown source"):
        compile_pipeline({"source": "missing"}, {"documents": _docs(spark)})


def test_stage_composition_matches_manual(spark):
    d = _docs(spark)
    spec = {
        "source": "documents",
        "stages": [
            {"op": "filter", "predicate": "lang = 'en'"},
            {"op": "hash_sample", "rate_ppm": 500000, "seed": 3},
            {"op": "select", "columns": ["doc_id", "lang"]},
        ],
    }
    got = compile_pipeline(spec, {"documents": d}).orderBy("doc_id").collect()
    want = (
        d.where("lang = 'en'")
        .where(F.pmod(F.xxhash64(F.col("doc_id"), F.lit(3)), F.lit(1_000_000)) < 500000)
        .select("doc_id", "lang")
        .orderBy("doc_id")
        .collect()
    )
    assert got == want
    assert 0 < len(got)


def test_filters_pushed_through_spec_stages(spark):
    yaml_text = """
source: documents
stages:
  - op: quality_gate
    min_score_ppm: 815000
  - op: filter
    predicate: "lang = 'en'"
  - op: select
    columns: [doc_id, lang]
"""
    df = compile_pipeline_yaml(yaml_text, {"documents": _docs(spark)})
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The lang equality from stage 2 must reach the parquet scan.
    scan_line = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "EqualTo(lang,en)" in scan_line or "lang" in scan_line
    assert "Exchange" not in plan  # pure scan+filter+project, no shuffle
