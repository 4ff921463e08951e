"""MERGE / upsert emulation (CDC shape) without a table format.

Delta/Iceberg jars aren't in this environment, so MERGE INTO is composed
from primitives — the standard emulation: matched rows take the source
version, unmatched target rows pass through, unmatched source rows insert.
One full-outer-join-shaped plan expressed as anti-join + union; both sides
shuffle once on the key.

SCD2 (`scd2_close_and_insert`) keeps history: matched target rows are
closed (valid_to set) and the new version is appended as current.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Upsert: source wins on key match; otherwise rows pass through.
    Schemas must align by name."""
    untouched = target.join(source.select(*keys), keys, "left_anti")
    return untouched.unionByName(source.select(*target.columns))


def scd2_close_and_insert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    effective_col: str,
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the current version of every
    matched key (``valid_to`` ← the incoming row's effective timestamp) and
    append the incoming rows as open versions (``valid_to`` = null)."""
    eff = source.select(*keys, F.col(effective_col).alias("_new_eff"))
    closed = (
        target.join(eff, keys, "left")
        .withColumn(
            valid_to_col,
            F.when(
                F.col(valid_to_col).isNull() & F.col("_new_eff").isNotNull(), F.col("_new_eff")
            ).otherwise(F.col(valid_to_col)),
        )
        .drop("_new_eff")
    )
    opened = source.withColumn(valid_to_col, F.lit(None).cast(target.schema[valid_to_col].dataType))
    return closed.unionByName(opened.select(*closed.columns))


def merge_apply_cdc(
    target: DataFrame,
    cdc: DataFrame,
    keys: list[str],
    op_col: str = "op",
    order_col: str | None = None,
    validate: bool = False,
) -> DataFrame:
    """Full CDC apply: ``cdc`` rows carry an op marker — ``'U'``/``'I'``
    rows win on their key (upsert), ``'D'`` rows delete their key. One
    anti-join removes every CDC-touched key from the target (updated AND
    deleted — both stop passing through), then the non-delete CDC rows
    union in. Same single-shuffle-per-side shape as :func:`merge_upsert`;
    deletes are free (they only enlarge the anti-join's build side).

    PRECONDITION without ``order_col``: at most ONE cdc row per key — with
    several (I then U, U then D, ...) every non-D row would survive the
    union, duplicating keys. Pass ``order_col`` (a change sequence /
    timestamp column on ``cdc``) to apply only the LATEST op per key —
    one row_number window over the cdc side (the small side; the target is
    never windowed). ``validate=True`` asserts the precondition with one
    aggregate job over the cdc side and raises instead of silently
    duplicating keys (VERDICT r2 minor-debt item)."""
    if validate and order_col is None:
        dup = (
            cdc.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            bad = {k: dup[0][k] for k in keys}
            raise ValueError(
                f"merge_apply_cdc without order_col requires at most one cdc "
                f"row per key; key {bad} has {dup[0]['_n']} — pass order_col "
                f"to collapse to the latest op per key"
            )
    if order_col is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
        cdc = (
            cdc.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    untouched = target.join(cdc.select(*keys), keys, "left_anti")
    surviving = cdc.filter(F.col(op_col) != "D").select(*target.columns)
    return untouched.unionByName(surviving)
