"""Sequence packing for LLM pretraining batches.

Greedy first-fit packing of documents into fixed-token-budget training
sequences. Global greedy packing is inherently sequential, so the engine
shards it: documents hash into ``buckets`` independent streams, each bucket
packs greedily in doc-id order inside one ``applyInPandas`` group — fully
deterministic, parallel across buckets, and the packing loss vs a global
greedy pass is bounded by one partial sequence per bucket.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count

PACK_SCHEMA = "bucket int, pack_id long, n_docs long, total_tokens long"


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 512,
    buckets: int = 32,
) -> DataFrame:
    """One row per packed training sequence: (bucket, pack_id, n_docs,
    total_tokens ≤ seq_len). Documents longer than ``seq_len`` are truncated
    to one full sequence (the pretraining convention)."""
    sized = df.select(
        F.col(id_col).alias("doc_id"),
        F.least(token_count(F.col(text_col)), F.lit(seq_len)).alias("n_tokens"),
        F.pmod(F.col(id_col), F.lit(buckets)).cast("int").alias("bucket"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        bucket = int(pdf["bucket"].iloc[0])
        rows, pid, used, ndocs = [], 0, 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if ndocs > 0 and used + n > seq_len:
                rows.append((bucket, pid, ndocs, used))
                pid, used, ndocs = pid + 1, 0, 0
            used += n
            ndocs += 1
        if ndocs > 0:
            rows.append((bucket, pid, ndocs, used))
        return pd.DataFrame(rows, columns=["bucket", "pack_id", "n_docs", "total_tokens"])

    return sized.groupBy("bucket").applyInPandas(pack, schema=PACK_SCHEMA)
