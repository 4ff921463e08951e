"""Focused equivalence tests for the r10 shingle rewrites.

`word_shingles` moved from ``concat_ws(' ', slice(t, i, n))`` to n
``element_at`` lookups concatenated with literal spaces (9x on the
winnowing profile); `hashed_word_shingles_expr` replaces gram STRINGS with
rotation-combined token-hash longs on join/broadcast paths. Both must stay
value-equivalent to the original formulation — these tests pin that.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bridge_analytics_template_spark.functions.text import (
    hashed_word_shingles_expr,
    word_shingles,
    ws_tokens,
)

DOCS = [
    (0, ""),  # empty
    (1, "one"),  # shorter than any gram width > 1
    (2, "two tokens"),
    (3, "exactly three tokens"),
    (4, "now four whole tokens"),
    (5, "the quick brown fox jumps over the lazy dog"),
    (6, "dup dup dup dup dup dup"),  # repeated tokens -> repeated grams
    (7, "café naïve résumé unicode tokens here"),
    (8, "  leading and   irregular   whitespace   collapse  "),
]


def _reference_shingles(tokens, n):
    """The pre-r10 formulation, kept verbatim as the equivalence oracle."""
    length = F.size(tokens)
    idx = F.sequence(F.lit(1), length - (n - 1))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))
    return F.when(length >= n, sh).otherwise(F.array().cast("array<string>"))


@pytest.mark.parametrize("n", [2, 3, 5, 8])
def test_word_shingles_matches_slice_form(spark, n):
    df = spark.createDataFrame(DOCS, "doc_id long, text string").select(
        "doc_id", ws_tokens("text").alias("toks")
    )
    out = df.select(
        "doc_id",
        word_shingles(F.col("toks"), n).alias("new"),
        _reference_shingles(F.col("toks"), n).alias("ref"),
    ).collect()
    assert len(out) == len(DOCS)
    for r in out:
        assert r["new"] == r["ref"], (n, r["doc_id"], r["new"], r["ref"])


@pytest.mark.parametrize("w", [3, 8])
def test_hashed_shingles_align_with_string_grams(spark, w):
    """Hashed gram arrays must be positionally parallel to the string
    grams: same length (non-distinct), and equal string grams <=> equal
    hashes within a document set with planted duplicates."""
    df = (
        spark.createDataFrame(DOCS, "doc_id long, text string")
        .select("doc_id", ws_tokens("text").alias("toks"))
        .select(
            "doc_id",
            word_shingles(F.col("toks"), w).alias("grams"),
            F.expr("transform(toks, t -> xxhash64(t))").alias("th"),
        )
        .select(
            "doc_id",
            "grams",
            F.expr(hashed_word_shingles_expr(w, distinct=False)).alias("hashed"),
            F.expr(hashed_word_shingles_expr(w, distinct=True)).alias("hashed_d"),
        )
    )
    rows = df.collect()
    gram_to_hash: dict[str, int] = {}
    for r in rows:
        assert len(r["grams"]) == len(r["hashed"]), r["doc_id"]
        # distinct variant == array_distinct of the non-distinct one
        seen, want = set(), []
        for h in r["hashed"]:
            if h not in seen:
                seen.add(h)
                want.append(h)
        assert r["hashed_d"] == want, r["doc_id"]
        for g, h in zip(r["grams"], r["hashed"]):
            # equal grams -> equal hashes, globally across docs
            assert gram_to_hash.setdefault(g, h) == h, g
    if w == 3:
        # the planted repeats actually exercised the cross-doc case
        assert len(gram_to_hash) < sum(len(r["grams"]) for r in rows)
