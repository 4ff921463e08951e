"""Assert-unique lookups raise exactly like the reference's get_* helpers
(/root/reference/src/copy_from_template.py:99-161)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bridge_analytics_template_spark.lookups import (
    LookupError0,
    LookupErrorMany,
    assert_unique,
    filter_unique,
    get_named_entity,
    get_scoped_view,
)


@pytest.fixture(scope="module")
def entities(spark):
    rows = [
        ("syn1", "EntityView", "raw_view", ["syn9"]),
        ("syn2", "Folder", "parquet", []),
        ("syn3", "Folder", "scores", []),
        ("syn4", "EntityView", "wide_view", ["syn9", "syn10"]),
        ("syn5", "Folder", "parquet", []),  # duplicate name
    ]
    return spark.createDataFrame(
        rows, "id string, concreteType string, name string, scopeIds array<string>"
    )


def test_exactly_one(entities):
    row = get_named_entity(entities, "Folder", "scores")
    assert row["id"] == "syn3"


def test_zero_matches_raises(entities):
    with pytest.raises(LookupError0):
        get_named_entity(entities, "Folder", "missing")


def test_many_matches_raises(entities):
    with pytest.raises(LookupErrorMany):
        get_named_entity(entities, "Folder", "parquet")


def test_scoped_view_requires_single_scope(entities):
    """copy_from_template.py:105-112 — scope contains the folder AND has
    exactly one member, so the two-folder view must not match."""
    row = get_scoped_view(entities, "EntityView", "syn9")
    assert row["id"] == "syn1"


def test_assert_unique_direct(entities):
    assert assert_unique(entities.filter(F.col("id") == "syn2"))["name"] == "parquet"
    with pytest.raises(LookupError0):
        filter_unique(entities, F.col("id") == "nope")
