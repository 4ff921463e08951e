"""Declarative pipeline specs: a YAML/dict-described stage list compiled
into ONE lazy DataFrame plan.

The reference's entire design is template-driven — a YAML resource spec
(`synapseformation_templates/default.yaml`) parameterized and executed by
`copy_from_template.py`. This module is that philosophy applied to
QUERIES: a curation pipeline declared as data (auditable, diffable,
shippable next to the output snapshot) and compiled to the same
DataFrame graph a hand-written pipeline would build — Catalyst sees one
plan, so filter pushdown / column pruning work across stage boundaries.

Spec shape (YAML or dict):

    source: documents
    stages:
      - op: quality_gate          # integer alpha-ppm >= threshold
        min_score_ppm: 815000
      - op: filter                # raw SQL predicate
        predicate: "lang = 'en'"
      - op: dedup_exact           # keep lowest doc_id per md5(text)
      - op: hash_sample           # deterministic xxhash64 sampling
        rate_ppm: 500000
        seed: 7
      - op: select
        columns: [doc_id, lang, n_chars]

Each op maps to engine primitives already covered by the query inventory;
the spec runner only COMPOSES them. Unknown ops raise immediately with
the op name (fail the plan, not the job).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, functions as F

try:  # optional — specs can also arrive as parsed dicts
    import yaml
except Exception:  # pragma: no cover
    yaml = None


def _quality_gate(df: DataFrame, stage: dict) -> DataFrame:
    thr = int(stage["min_score_ppm"])
    score = F.expr(
        "(length(text) - length(regexp_replace(text, '[A-Za-z]', ''))) * 1000000"
        " DIV greatest(length(text), 1)"
    )
    return df.where(score >= thr)


def _filter(df: DataFrame, stage: dict) -> DataFrame:
    return df.where(stage["predicate"])


def _dedup_exact(df: DataFrame, stage: dict) -> DataFrame:
    id_col = stage.get("id", "doc_id")
    key = F.md5(F.col(stage.get("on", "text")))
    keep = df.groupBy(key.alias("__k")).agg(F.min(id_col).alias(id_col)).drop("__k")
    return df.join(keep, id_col, "semi")


def _hash_sample(df: DataFrame, stage: dict) -> DataFrame:
    rate = int(stage["rate_ppm"])
    seed = int(stage.get("seed", 0))
    id_col = stage.get("id", "doc_id")
    return df.where(F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1_000_000)) < rate)


def _select(df: DataFrame, stage: dict) -> DataFrame:
    return df.select(*stage["columns"])


_OPS: dict[str, Callable[[DataFrame, dict], DataFrame]] = {
    "quality_gate": _quality_gate,
    "filter": _filter,
    "dedup_exact": _dedup_exact,
    "hash_sample": _hash_sample,
    "select": _select,
}


def compile_pipeline(spec: dict[str, Any], sources: dict[str, DataFrame]) -> DataFrame:
    """Compile a spec dict into one lazy DataFrame plan over ``sources``."""
    if spec.get("source") not in sources:
        raise ValueError(f"unknown source {spec.get('source')!r}")
    df = sources[spec["source"]]
    for i, stage in enumerate(spec.get("stages", [])):
        op = stage.get("op")
        if op not in _OPS:
            raise ValueError(f"stage {i}: unknown op {op!r} (known: {sorted(_OPS)})")
        df = _OPS[op](df, stage)
    return df


def compile_pipeline_yaml(text: str, sources: dict[str, DataFrame]) -> DataFrame:
    """Parse a YAML spec (parameter binding via plans.templates applies
    upstream) and compile it."""
    if yaml is None:  # pragma: no cover
        raise RuntimeError("PyYAML not available")
    return compile_pipeline(yaml.safe_load(text), sources)
