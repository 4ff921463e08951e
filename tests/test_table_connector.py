"""Python DataSource connector for the manifest table
(sources/table_connector.py): snapshot-option resolution, pushed-filter
file pruning from manifest metadata, generation reconciliation, and
value-identity with read_snapshot."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    In,
    LessThan,
)

from bridge_analytics_template_spark.sources import table_connector as tc
from bridge_analytics_template_spark.sources.manifest_table import (
    append_rows,
    evolve_schema,
    publish_snapshot,
    read_manifest,
    read_snapshot,
    tag_snapshot,
)


@pytest.fixture()
def table(spark, tmp_path):
    base = str(tmp_path / "t")
    df = spark.range(0, 2000).selectExpr(
        "id AS k",
        "id * 2 AS v",
        "CAST(timestamp_micros(CAST(id * 1000000 AS LONG)) AS timestamp) AS ts",
    )
    publish_snapshot(df, base, "k", n_files=8, stats_cols=["v"])
    evolve_schema(base, add=[("tag", "string", "L")])
    append_rows(
        spark.createDataFrame(
            [(9000 + i, 1, None, "N") for i in range(5)],
            "k long, v long, ts timestamp, tag string",
        ),
        base,
        epoch="e1",
    )
    tag_snapshot(base, "pin")
    tc.register(spark)
    return base


def test_connector_values_equal_read_snapshot(spark, table):
    """Full read through the connector == read_snapshot, column for
    column (longs, doubles-equivalent, strings, timestamps, evolved
    default backfill)."""
    got = {
        r["k"]: (r["v"], r["tag"], r["ts"])
        for r in spark.read.format("manifest_table")
        .option("path", table)
        .load()
        .collect()
    }
    want = {
        r["k"]: (r["v"], r["tag"], r["ts"])
        for r in read_snapshot(spark, table).collect()
    }
    assert got == want and len(got) == 2005


def test_connector_snapshot_options(spark, table):
    """versionAsOf pins a version (pre-evolve shape readable), tag
    resolves the reproducibility pin, and an unknown tag raises."""
    v1 = (
        spark.read.format("manifest_table")
        .option("path", table)
        .option("versionAsOf", 1)
        .load()
    )
    assert v1.columns == ["k", "v", "ts"] and v1.count() == 2000
    t = (
        spark.read.format("manifest_table")
        .option("path", table)
        .option("tag", "pin")
        .load()
    )
    assert t.count() == 2005
    with pytest.raises(Exception, match="no tag"):
        spark.read.format("manifest_table").option("path", table).option(
            "tag", "nope"
        ).load().count()


def test_connector_pushdown_prunes_partitions(spark, table):
    """pushFilters prunes the partition list from manifest metadata: a
    key range keeps a strict subset of files (bounds), a stats-column
    range prunes on its envelope, In prunes to point candidates, and a
    non-statted column never prunes. All filters are returned
    (re-applied by Spark), so end-to-end values stay exact."""
    total = len(read_manifest(table)["files"])

    def parts(filters):
        rd = tc._ManifestReader({"path": table})
        returned = rd.pushFilters(filters)
        assert list(returned) == list(filters)  # all re-applied by Spark
        return len(rd.partitions())

    assert parts([GreaterThanOrEqual(("k",), 0), LessThan(("k",), 100)]) < total
    assert parts([LessThan(("v",), 100)]) < total
    assert parts([In(("k",), (5, 7))]) < total
    assert parts([EqualTo(("ts",), None)]) == total  # not statted
    # disjoint range -> sentinel empty partition, read yields nothing
    rd = tc._ManifestReader({"path": table})
    rd.pushFilters([GreaterThanOrEqual(("k",), 10**12)])
    ps = rd.partitions()
    assert len(ps) == 1 and ps[0].path == ""
    assert list(rd.read(ps[0])) == []

    # end-to-end: filtered read through the connector == plain filter
    got = (
        spark.read.format("manifest_table")
        .option("path", table)
        .load()
        .filter((F.col("k") >= 500) & (F.col("k") < 600) & (F.col("v") > 1010))
        .count()
    )
    want = (
        read_snapshot(spark, table)
        .filter((F.col("k") >= 500) & (F.col("k") < 600) & (F.col("v") > 1010))
        .count()
    )
    assert got == want > 0
