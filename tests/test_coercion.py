"""Coercion spec reproduces the reference's exact type table
(/root/reference/src/copy_from_template.py:164-232; see FIXTURES.md §B)."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from bridge_analytics_template_spark.coercion import (
    CoercionSpec,
    apply_coercion,
    enforce_max_size,
)

RAW_ROW = {
    "id": "syn123",
    "name": "file.zip",
    "etag": "abc",
    "type": "file",
    "clientInfo": '{"osName": "iPhone OS"}',
    "exportedOn": "2023-05-01 12:30:00",
    "eventTimestamp": "2023-05-01 10:00:00",
    "timeWindowPersistent": "true",
    "isFirstAssessment": "false",
    "sessionInstanceStartDay": "3",
    "assessmentRevision": "7",
    "otherAnnotation": "hello",
}


def _raw_df(spark):
    fields = [T.StructField(k, T.StringType()) for k in RAW_ROW]
    return spark.createDataFrame([tuple(RAW_ROW.values())], T.StructType(fields))


def test_reference_type_table(spark):
    out = apply_coercion(_raw_df(spark))
    types = {f.name: f.dataType for f in out.schema.fields}
    # date_cols -> timestamp (copy_from_template.py:179-182,198-200)
    assert types["exportedOn"] == T.TimestampType()
    assert types["eventTimestamp"] == T.TimestampType()
    # boolean_cols (:183-186,201-203)
    assert types["timeWindowPersistent"] == T.BooleanType()
    assert types["isFirstAssessment"] == T.BooleanType()
    # int_cols -> long (:187-190,204-206)
    assert types["sessionInstanceStartDay"] == T.LongType()
    assert types["assessmentRevision"] == T.LongType()
    # ignore_cols untouched (:178)
    assert types["name"] == T.StringType()
    assert types["etag"] == T.StringType()
    assert types["type"] == T.StringType()
    # everything else stays string (sized 128/512 advisory) (:207-210)
    assert types["clientInfo"] == T.StringType()
    assert types["otherAnnotation"] == T.StringType()
    row = out.collect()[0]
    assert row["exportedOn"] == datetime.datetime(2023, 5, 1, 12, 30)
    assert row["timeWindowPersistent"] is True
    assert row["isFirstAssessment"] is False
    assert row["sessionInstanceStartDay"] == 3


def test_only_string_columns_are_retyped(spark):
    """Parity with copy_from_template.py:195 — a column already non-string
    is left alone even if its name is in the spec."""
    df = spark.createDataFrame(
        [(1, datetime.datetime(2023, 1, 1))],
        T.StructType(
            [
                T.StructField("assessmentRevision", T.IntegerType()),
                T.StructField("exportedOn", T.TimestampType()),
            ]
        ),
    )
    out = apply_coercion(df)
    types = {f.name: f.dataType for f in out.schema.fields}
    assert types["assessmentRevision"] == T.IntegerType()  # not re-cast to long
    assert types["exportedOn"] == T.TimestampType()


def test_column_order_preserved(spark):
    out = apply_coercion(_raw_df(spark))
    assert out.columns == list(RAW_ROW)  # orderedColumnIds semantics (:219-223)


def test_max_size_flags(spark):
    df = _raw_df(spark)
    flagged = enforce_max_size(df, CoercionSpec(max_sizes={"otherAnnotation": 3}))
    row = flagged.collect()[0]
    assert row["otherAnnotation_oversize"] is True  # 'hello' > 3
    assert row["clientInfo_oversize"] is False  # fits in 512
    # ignore_cols get no flag
    assert "name_oversize" not in flagged.columns


def test_validate_counts_planted_violations(spark):
    from pyspark.sql import functions as F

    from bridge_analytics_template_spark.validation import (
        expression,
        in_set,
        max_length,
        not_null,
        validate,
    )

    df = spark.createDataFrame(
        [(1, "en", "ok"), (2, "english", "ok"), (3, "xx", None), (1, "de", "ok")],
        "id long, lang string, text string",
    )
    out = {
        r["rule"]: r["n_violations"]
        for r in validate(
            df,
            [
                max_length("lang", 2),
                in_set("lang", ("en", "de")),
                not_null("text"),
                expression("id_positive", F.col("id") <= 0),
            ],
            unique_cols=["id"],
        ).collect()
    }
    assert out == {
        "lang_max_length_2": 1,   # "english"
        "lang_in_set": 2,         # "english", "xx"
        "text_not_null": 1,
        "id_positive": 0,
        "id_unique": 1,           # id=1 twice
    }
