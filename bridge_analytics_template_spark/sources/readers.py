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


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """``binaryFile`` ingest — one row per object with ``(path, modificationTime,
    length, content binary)``: the entry point for image/audio/video corpora
    before the mapInPandas decode stage (llm/multimodal.py). Listing is
    distributed and the ``pathGlobFilter`` prunes at the file index, so a
    100 TB object store never gets a driver-side listing loop."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_text_files(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    """Line-oriented (or whole-file) text ingest: ``wholetext=True`` gives
    one row per document — the raw-corpus shape upstream of tokenization."""
    return spark.read.text(path, wholetext=whole)
