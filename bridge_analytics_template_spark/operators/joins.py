"""Join operators beyond plain equi-joins (SURVEY.md §2.3).

Spark covers inner/outer/semi/anti/cross natively; this module adds the two
compositions the reference's data model implies but Spark lacks as
primitives:

* :func:`asof_join` — nearest-earlier-event alignment (J8), the semantics of
  matching each event to the latest schedule change at or before its
  timestamp (reference date columns ``scheduleModifiedOn``/``eventTimestamp``,
  /root/reference/src/copy_from_template.py:179-182).
* :func:`range_join` — interval containment (J7), the
  ``sessionInstanceStartDay..EndDay`` window shape
  (/root/reference/src/copy_from_template.py:187-190).

Scale notes: ``asof_join`` is the union+window formulation — one shuffle on
the join keys, no row blowup, no per-group Python — which survives arbitrary
fact sizes (a naive range-join + top-1 materializes every (left, earlier
right) pair first). ``range_join`` broadcasts the interval side; it is meant
for dimension-sized interval tables (bands, calendars), which is the only
shape that works at 100 TB anyway without an interval index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
    tolerance_s: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row within the same key
    group (left-outer: unmatched left rows keep nulls). ``direction`` picks
    the pandas ``merge_asof`` semantics:

    * ``"backward"`` (default): greatest ``right_ts <= left_ts`` — the
      nearest-earlier match of DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``.
    * ``"forward"``: smallest ``right_ts >= left_ts`` (``ASOF ... l.ts <=
      r.ts``).
    * ``"nearest"``: whichever of the two is closer by absolute time
      distance; exact ties prefer the backward match (pandas tie rule).

    Equal timestamps match in every direction. ``tolerance_s`` (seconds)
    additionally bounds the match distance: a nearest row farther than the
    tolerance is treated as no match (its columns null out) — the
    financial-tick / sensor-alignment semantics where stale state must not
    propagate. The bound is applied AFTER the window fill, so it costs one
    projection and changes nothing about the single-shuffle plan.

    Implementation: tag sides, union by position, and run window passes
    ordered by (ts, side) with ``last(value, ignorenulls=True)`` over an
    unbounded-preceding frame — ascending for backward, descending for
    forward, both for nearest (two sorts, still ONE shuffle on the keys:
    both windows share the hash partitioning). Right rows sort before left
    rows at equal ts so ties are included.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    out_right = [f"{c}{suffix}" for c in right_cols]
    if (tolerance_s is not None or direction == "nearest") and right_ts not in right_cols:
        # Carry the matched right timestamp so the distance rule / age
        # bound can be applied.
        right_cols = [*right_cols, right_ts]
        out_right = [*out_right, f"{right_ts}{suffix}"]
    l2 = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in keys],
        *[F.lit(None).cast(right.schema[c].dataType).alias(o) for c, o in zip(right_cols, out_right)],
    )
    r2 = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        *[F.col(c).alias(o) for c, o in zip(right_cols, out_right)],
    )
    # Ascending scan fills the nearest-EARLIER right row, descending scan
    # the nearest-LATER one; `_side` breaks equal-ts ties so right rows are
    # scanned first and equal timestamps match.
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").desc(), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l2.unionByName(r2)
    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        fills = [F.last(F.col(o), ignorenulls=True).over(w).alias(o) for o in out_right]
    else:
        # Fill BOTH directions, then pick per row by absolute distance
        # (ties → backward). Two sorts, one shuffle: the windows share the
        # hash partitioning on the keys.
        bts = F.last(F.col(f"{right_ts}{suffix}"), ignorenulls=True).over(w_back)
        fts = F.last(F.col(f"{right_ts}{suffix}"), ignorenulls=True).over(w_fwd)
        take_back = bts.isNotNull() & (
            fts.isNull()
            | (
                F.col("_ts").cast("double") - bts.cast("double")
                <= fts.cast("double") - F.col("_ts").cast("double")
            )
        )
        fills = [
            F.when(
                take_back, F.last(F.col(o), ignorenulls=True).over(w_back)
            )
            .otherwise(F.last(F.col(o), ignorenulls=True).over(w_fwd))
            .alias(o)
            for o in out_right
        ]
    filled = unioned.select(
        *[F.col(k) for k in keys],
        F.col("_ts"),
        F.col("_side"),
        *[F.col(c) for c in left.columns if c not in keys],
        *fills,
    )
    out = filled.filter(F.col("_side") == 1)
    if tolerance_s is not None:
        matched_ts = F.col(f"{right_ts}{suffix}")
        # Epoch-seconds doubles: exact microsecond arithmetic, no interval
        # type juggling between legacy and ANSI interval modes.
        dist = matched_ts.cast("double") - F.col("_ts").cast("double")
        if direction == "backward":
            dist = -dist
        elif direction == "nearest":
            dist = F.abs(dist)
        within = matched_ts.isNotNull() & (dist <= F.lit(float(tolerance_s)))
        out = out.select(
            *[F.col(k) for k in keys],
            "_ts",
            "_side",
            *[F.col(c) for c in left.columns if c not in keys],
            *[F.when(within, F.col(o)).alias(o) for o in out_right],
        )
    return out.drop("_side", "_ts")


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    value: Column,
    lo: Column,
    hi: Column,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join ``lo <= value < hi``; the interval side is
    broadcast (dimension-sized by design)."""
    return facts.join(F.broadcast(intervals), (value >= lo) & (value < hi), how)
