"""Template binding + resource-spec parsing (reference parity:
copy_from_template.py:288-297, :355-356)."""

from __future__ import annotations

from bridge_analytics_template_spark.plans.templates import (
    bind_template,
    load_resource_spec,
    rebind_ids,
)

TEMPLATE = """
- name: parquet
  type: Folder
- name: raw view
  type: EntityViewSchema
  scopes: ['{bridge_raw_data}']
  addAnnotationColumns: true
"""


def test_bind_and_parse():
    spec = load_resource_spec(TEMPLATE, {"bridge_raw_data": "syn999"})
    assert spec[0] == {"name": "parquet", "type": "Folder"}
    assert spec[1]["scopes"] == ["syn999"]
    assert spec[1]["addAnnotationColumns"] is True


def test_bind_multiple_params():
    out = bind_template("{a}/{b}/parquet/", {"a": "appX", "b": "studyY"})
    assert out == "appX/studyY/parquet/"


def test_rebind_ids():
    q = "SELECT * FROM syn123 JOIN syn456"
    assert rebind_ids(q, {"syn123": "syn789"}) == "SELECT * FROM syn789 JOIN syn456"
