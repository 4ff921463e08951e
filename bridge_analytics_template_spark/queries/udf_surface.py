"""Pandas-UDF surface X1-X4 (SURVEY.md §2.10) and the CSV/JSON ingest
sources S6-S7.

The UDF queries intentionally compute integer-valued results (counts,
ranks): that keeps the oracle comparison exact while still driving the
Arrow batch path end-to-end. X4 (mapInPandas) is exercised by
llm_multimodal.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from ..catalog import load, register_views, scratch_path
from ..sources.readers import read_binary_files, read_csv, read_json, read_text_files
from .registry import query


@query(
    "x_scalar_pandas_udf",
    sql="""
    SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_tokens_py
    FROM documents ORDER BY doc_id
    """,
)
def x_scalar_pandas_udf(spark, sf_dir):
    """X1: scalar pandas UDF (Arrow-vectorized) — Python tokenization per
    batch; semantics match the JVM-side split so the oracle stays exact."""

    @F.pandas_udf("int")
    def py_token_count(s: pd.Series) -> pd.Series:
        return s.str.strip().str.split().map(len).astype("int32")

    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", py_token_count("text").alias("n_tokens_py")).orderBy("doc_id")


@query(
    "x_grouped_agg_pandas",
    sql="""
    SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS total_chars, COUNT(*) AS n_docs
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def x_grouped_agg_pandas(spark, sf_dir):
    """X2: grouped-aggregate pandas UDF — per-group reduction in Python
    (integer sum: exact under any combine order)."""

    @F.pandas_udf("bigint")
    def py_sum(v: pd.Series) -> int:
        return int(v.sum())

    @F.pandas_udf("bigint")
    def py_count(v: pd.Series) -> int:
        return int(v.count())

    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(py_sum("n_chars").alias("total_chars"), py_count("doc_id").alias("n_docs"))
        .orderBy("lang")
    )


@query(
    "x_grouped_map_pandas",
    sql="""
    SELECT c_custkey, c_nationkey,
           ROW_NUMBER() OVER (PARTITION BY c_nationkey
                              ORDER BY c_acctbal DESC, c_custkey) AS bal_rank
    FROM customer ORDER BY c_custkey
    """,
)
def x_grouped_map_pandas(spark, sf_dir):
    """X3: grouped-map applyInPandas — whole-group pandas DataFrame in/out
    (the per-participant session-reconstruction shape). Emits integer ranks
    so the oracle is exact."""

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["c_acctbal", "c_custkey"], ascending=[False, True])
        pdf["bal_rank"] = range(1, len(pdf) + 1)
        return pdf[["c_custkey", "c_nationkey", "bal_rank"]]

    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .applyInPandas(rank_group, schema="c_custkey long, c_nationkey int, bal_rank long")
        .orderBy("c_custkey")
    )


@query(
    "agg_pivot",
    sql="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS n_open,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_finished
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_pivot(spark, sf_dir):
    """Pivot: linestatus values to columns (bounded value list declared
    up front, so no extra distinct-values pass)."""
    l = load(spark, sf_dir, "lineitem")
    out = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.count(F.lit(1)))
        .withColumnRenamed("O", "n_open")
        .withColumnRenamed("F", "n_finished")
    )
    return out.select(
        "l_returnflag",
        F.coalesce("n_open", F.lit(0)).alias("n_open"),
        F.coalesce("n_finished", F.lit(0)).alias("n_finished"),
    ).orderBy("l_returnflag")


_NATION_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"


@query(
    "s_csv_roundtrip",
    sql="""
    SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS first_name
    FROM nation GROUP BY 1 ORDER BY 1
    """,
)
def s_csv_roundtrip(spark, sf_dir):
    """S7: CSV sink + scan with an explicit schema (no inference pass); the
    aggregate over the round-tripped data must equal the source."""
    n = load(spark, sf_dir, "nation")
    path = scratch_path(spark, "csv_roundtrip_nation")
    n.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(spark, path, schema=_NATION_SCHEMA)
    return (
        back.groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n_nations"), F.min("n_name").alias("first_name"))
        .orderBy("n_regionkey")
    )


@query(
    "s_json_roundtrip",
    sql="""
    SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS first_name
    FROM nation GROUP BY 1 ORDER BY 1
    """,
)
def s_json_roundtrip(spark, sf_dir):
    """S6: JSON-lines sink + scan with explicit schema (the Bridge raw-data
    archive shape: JSON records promoted into typed columns)."""
    n = load(spark, sf_dir, "nation")
    path = scratch_path(spark, "json_roundtrip_nation")
    n.write.mode("overwrite").json(path)
    back = read_json(spark, path, schema=_NATION_SCHEMA)
    return (
        back.groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n_nations"), F.min("n_name").alias("first_name"))
        .orderBy("n_regionkey")
    )


@query(
    "s_text_roundtrip",
    sql="""
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(length(regexp_replace(text, '[\r\n]+', ' ', 'g'))) AS BIGINT) AS total_chars,
           MIN(length(regexp_replace(text, '[\r\n]+', ' ', 'g'))) AS min_len,
           MAX(length(regexp_replace(text, '[\r\n]+', ' ', 'g'))) AS max_len
    FROM documents
    """,
)
def s_text_roundtrip(spark, sf_dir):
    """S6+ line-oriented text source: one document per line (newlines
    sanitized to spaces — the writer contract of a line-delimited corpus
    shard), written with the text sink and scanned back with
    ``spark.read.text``. Aggregates over the round-tripped lines must
    equal the same arithmetic on the source table. At scale this is the
    raw-corpus ingest format (one doc per line, gz-sharded); the scan is
    splittable and schema-free, so the only cost is the bytes."""
    d = load(spark, sf_dir, "documents")
    path = scratch_path(spark, "text_roundtrip_documents")
    d.select(
        F.regexp_replace(F.col("text"), r"[\r\n]+", " ").alias("value")
    ).write.mode("overwrite").text(path)
    back = read_text_files(spark, path)
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.min(F.length("value")).alias("min_len"),
        F.max(F.length("value")).alias("max_len"),
    )


@query(
    "s_avro_roundtrip",
    sql="""
    SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS first_name,
           CAST(SUM(CASE WHEN n_nationkey % 5 = 0 THEN 0
                         ELSE length('nation ' || n_name) END) AS BIGINT) AS comment_chars
    FROM nation GROUP BY 1 ORDER BY 1
    """,
)
def s_avro_roundtrip(spark, sf_dir):
    """S-extra: Avro Object Container ingest WITHOUT the spark-avro module
    (absent from this environment — format("avro") fails; env-gate
    re-checked r7). The container format is implemented from the public
    Avro 1.12 spec (sources/avro_codec.py: zigzag varints, deflate codec,
    sync-marked blocks, metadata map), the same spec-written pattern as
    the image/audio codec tier. One Arrow lane encodes each partition's
    rows into one deflate container (at scale: the shard files a binary
    sink lands in the object store), a second lane parses them back —
    including a nullable-union column with real nulls — and the aggregate
    must equal the source table. Roundtrip/hand-vector/corruption tests
    in tests/test_sources.py pin the codec itself."""
    from ..sources.avro_codec import decode_avro, encode_avro

    # the fixture nation table carries no comment column — synthesize a
    # nullable one so the ["null","string"] union path sees real nulls
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey",
        "n_name",
        "n_regionkey",
        F.when(F.col("n_nationkey") % 5 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("nation "), F.col("n_name")))
        .alias("n_comment"),
    )
    avro_schema = {
        "type": "record",
        "name": "nation",
        "fields": [
            {"name": "n_nationkey", "type": "long"},
            {"name": "n_name", "type": "string"},
            {"name": "n_regionkey", "type": "long"},
            {"name": "n_comment", "type": ["null", "string"]},
        ],
    }

    def enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            recs = [
                {
                    "n_nationkey": int(r.n_nationkey),
                    "n_name": r.n_name,
                    "n_regionkey": int(r.n_regionkey),
                    "n_comment": None if r.n_comment is None else r.n_comment,
                }
                for r in pdf.itertuples()
            ]
            yield pd.DataFrame({"blob": [encode_avro(recs, avro_schema, codec="deflate")]})

    def dec(batches):
        for pdf in batches:
            for blob in pdf["blob"]:
                _, recs = decode_avro(bytes(blob))
                yield pd.DataFrame.from_records(
                    recs,
                    columns=["n_nationkey", "n_name", "n_regionkey", "n_comment"],
                )

    blobs = n.mapInPandas(enc, schema="blob binary")
    back = blobs.mapInPandas(
        dec,
        schema="n_nationkey long, n_name string, n_regionkey long, n_comment string",
    )
    return (
        back.groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_name"),
            F.sum(F.coalesce(F.length("n_comment"), F.lit(0))).alias("comment_chars"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "s_binaryfile_scan",
    sql="""
    SELECT 'documents.parquet' AS file_name, TRUE AS content_matches_meta,
           TRUE AS nonempty
    """,
)
def s_binaryfile_scan(spark, sf_dir):
    """S4+/multimodal ingest: the ``binaryFile`` source — one row per
    object with (path, modificationTime, length, content) — over the
    documents fixture file. Deterministic facts are hash-checked (file
    name, content/metadata length agreement, non-emptiness); the byte
    count itself is environment-local so it reduces to invariants, same
    contract as bridge_file_view. This is the scan that feeds the
    multimodal decode pipeline on a real corpus (opaque bytes + typed
    metadata), where partition pruning on path prefixes applies before
    any content is read."""
    b = read_binary_files(spark, os.path.join(sf_dir, "documents.parquet"))
    return b.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        (F.length("content") == F.col("length")).alias("content_matches_meta"),
        (F.col("length") > 0).alias("nonempty"),
    )


@query(
    "s_xml_roundtrip",
    sql="""
    SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS first_name
    FROM nation GROUP BY 1 ORDER BY 1
    """,
)
def s_xml_roundtrip(spark, sf_dir):
    """S6b: XML sink + scan (Spark 4 native XML data source, one row per
    ``rowTag`` element) with an explicit schema — the remaining
    semi-structured ingest format after JSON/CSV. The aggregate over the
    round-tripped rows must equal the source table."""
    n = load(spark, sf_dir, "nation")
    path = scratch_path(spark, "xml_roundtrip_nation")
    n.write.mode("overwrite").format("xml").option("rootTag", "nations").option(
        "rowTag", "nation"
    ).save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema(_NATION_SCHEMA)
        .load(path)
    )
    return (
        back.groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n_nations"), F.min("n_name").alias("first_name"))
        .orderBy("n_regionkey")
    )


@query(
    "x_cogrouped_pandas",
    sql="""
    WITH c AS (SELECT user_id, MIN(ts) AS first_click
               FROM events WHERE event_type = 'click' GROUP BY 1),
         p AS (SELECT user_id, MIN(ts) AS first_purchase
               FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           CAST(floor(epoch(first_purchase)) - floor(epoch(first_click)) AS BIGINT)
             AS lag_seconds
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
    ORDER BY user_id
    """,
)
def x_cogrouped_pandas(spark, sf_dir):
    """X5: cogrouped pandas (groupBy.cogroup().applyInPandas) — align two
    grouped streams per key in one Python function; here first-click to
    first-purchase conversion lag per user. Arrow delivers both sides of a
    key as pandas frames; the oracle is the equivalent min-aggregate FULL
    OUTER join."""
    import pandas as pd

    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")

    def lag(key, c_pdf, p_pdf):
        # A key absent from one side arrives as an EMPTY frame — and Spark
        # may deliver it without column metadata, so probe columns too.
        epoch0 = pd.Timestamp("1970-01-01")
        fc = c_pdf["ts"].min() if "ts" in c_pdf.columns and len(c_pdf) else None
        fp = p_pdf["ts"].min() if "ts" in p_pdf.columns and len(p_pdf) else None
        secs = lambda t: (t - epoch0) // pd.Timedelta("1s")  # noqa: E731
        lag_s = secs(fp) - secs(fc) if fc is not None and fp is not None else None
        return pd.DataFrame({"user_id": [key[0]], "lag_seconds": [lag_s]})

    out = (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(lag, schema="user_id long, lag_seconds bigint")
    )
    return out.orderBy("user_id")


@query(
    "x_python_udtf",
    sql="""
    WITH parts AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, '.'), x -> trim(x, ' ')),
                         x -> x <> '') AS ps
      FROM documents WHERE doc_id % 20 = 0)
    SELECT doc_id,
           unnest(generate_series(1, len(ps))) - 1 AS pos,
           unnest(ps) AS sentence
    FROM parts ORDER BY doc_id, pos
    """,
)
def x_python_udtf(spark, sf_dir):
    """X6: Python UDTF (Spark 4 @udtf) — a table function yielding N rows
    per input (sentence segmentation with positions), usable from SQL via
    LATERAL. Deterministic splitting keeps it oracle-checkable."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            parts = [p.strip(" ") for p in (text or "").split(".")]
            i = 0
            for p in parts:
                if p:
                    yield i, p
                    i += 1

    spark.udtf.register("split_sentences", SplitSentences)
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.sentence
        FROM documents d, LATERAL split_sentences(d.text) s
        WHERE d.doc_id % 20 = 0
        ORDER BY d.doc_id, s.pos
        """
    )


@query(
    "x_map_in_arrow",
    sql="""
    SELECT doc_id, n_chars, n_chars * 2 AS n_chars_x2
    FROM documents ORDER BY doc_id
    """,
)
def x_map_in_arrow(spark, sf_dir):
    """X7: mapInArrow — the zero-copy batch path: pyarrow RecordBatch in,
    RecordBatch out, no pandas materialization. The cheapest Python hook
    for per-batch logic over wide binary/tensor columns (no Series
    boxing); integer arithmetic keeps the oracle exact."""
    import pyarrow as pa

    def double_chars(batches):
        for batch in batches:
            n = batch.column("n_chars")
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), n, pa.compute.multiply(n, 2)],
                ["doc_id", "n_chars", "n_chars_x2"],
            )

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return d.mapInArrow(
        double_chars, schema="doc_id long, n_chars long, n_chars_x2 long"
    ).orderBy("doc_id")


@query(
    "x_grouped_map_arrow",
    sql="""
    SELECT lang,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def x_grouped_map_arrow(spark, sf_dir):
    """X8: grouped-map applyInArrow — whole group as a pyarrow Table
    (columnar, no pandas conversion cost). Integer min/max/count per
    group keep the oracle exact."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def group_stats(table: "pa.Table") -> "pa.Table":
        n = table.column("n_chars")
        return pa.table(
            {
                "lang": [table.column("lang")[0].as_py()],
                "n_docs": [table.num_rows],
                "min_chars": [pc.min(n).as_py()],
                "max_chars": [pc.max(n).as_py()],
            }
        )

    d = load(spark, sf_dir, "documents").select("lang", "n_chars")
    return (
        d.groupBy("lang")
        .applyInArrow(
            group_stats,
            schema="lang string, n_docs long, min_chars long, max_chars long",
        )
        .orderBy("lang")
    )


@query(
    "x_arrow_udf",
    sql="""
    SELECT c_custkey,
           CAST(length(regexp_replace(lower(c_name), '[^aeiou]', '', 'g')) AS BIGINT)
             AS n_vowels
    FROM customer ORDER BY c_custkey
    """,
)
def x_arrow_udf(spark, sf_dir):
    """X5: Arrow-optimized scalar Python UDF (``useArrow=True`` — Spark
    3.5+'s third lane between the legacy pickled UDF and the pandas UDF:
    row-at-a-time Python semantics, Arrow batch transfer). Integer-valued
    result keeps the oracle exact."""
    import re

    @F.udf("long", useArrow=True)
    def n_vowels(name: str) -> int:
        return len(re.sub(r"[^aeiou]", "", name.lower()))

    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", n_vowels("c_name").alias("n_vowels")).orderBy("c_custkey")
