"""Schema-driven table profiling (dataset cards).

One aggregate pass over the table, with the aggregate list BUILT FROM THE
SCHEMA: row count, per-column non-null counts, min/max for numeric and
string columns. This is the engine analog of the reference's
schema-as-data loop (`/root/reference/src/copy_from_template.py:191-218`
iterates column entities to rewrite them; here we iterate ``df.schema`` to
measure them). Single shuffle-free partial+final aggregate regardless of
column count — the 100 TB-safe way to build a data-quality report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType


def profile(df: DataFrame) -> DataFrame:
    """Single-row profile: n_rows, nn_<col> (non-null counts), and
    min_<col>/max_<col> for numeric and string columns."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for field in df.schema.fields:
        aggs.append(F.count(F.col(field.name)).alias(f"nn_{field.name}"))
        if isinstance(field.dataType, (NumericType, StringType)):
            aggs.append(F.min(field.name).alias(f"min_{field.name}"))
            aggs.append(F.max(field.name).alias(f"max_{field.name}"))
    return df.agg(*aggs)
