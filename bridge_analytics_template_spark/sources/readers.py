"""Tabular ingest readers (S5-S7): parquet / CSV / JSON with explicit
schemas.

Schema inference is disabled on purpose: at 100 TB an inference pass is a
full extra scan, and the reference's regime is permissive-ingest **then**
declarative coercion (SURVEY.md §1.3) — so CSV/JSON land with declared (or
all-string) schemas and flow through ``coercion.apply_coercion``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the other self-describing columnar format in ETL estates;
    same vectorized reader + pushdown machinery as parquet."""
    return spark.read.orc(path)


def read_csv(spark: SparkSession, path: str, schema: str | None = None, header: bool = True) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)
