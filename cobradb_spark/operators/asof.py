"""As-of join (latest-record-at-or-before) — SURVEY.md §4.3.2.

PySpark 4 ships DataFrame._joinAsOf, but it is a private-ish API; this
module provides the composition fallback used by the engine: union the
two sides tagged, window-sort once per partition key, and carry the last
right-side row forward.  One shuffle on (by, on) — the same cost as a
sort-merge join — with no nested-loop component, so it scales linearly
with rows per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value_cols: list[str],
) -> DataFrame:
    """For each left row, attach right_value_cols of the latest right row
    with right.on <= left.on within the same `by` group (ties on the
    `on` column: the right row still qualifies; among equal-`on` right
    rows the last by input order of the window's sort is used — callers
    should ensure `on` is unique per group for full determinism).

    Returns all left columns + right_value_cols (null when no match).
    """
    lcols = left.columns
    tagged_l = left.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__on"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*right_value_cols).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    tagged_r = right.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__on"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*right_value_cols).alias("__r"),
    )
    # right rows sort before left rows at equal __on (__is_left asc), so
    # a right row at exactly left.on is visible to that left row.
    w = (
        Window.partitionBy("__by")
        .orderBy(F.col("__on").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = tagged_l.unionByName(tagged_r).withColumn(
        "__last_r", F.last("__r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__is_left") == 1).select(
        *[F.col("__l").getField(c).alias(c) for c in lcols],
        *[F.col("__last_r").getField(c).alias(c) for c in right_value_cols],
    )
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value_cols: list[str],
) -> DataFrame:
    """Mirror of asof_join_backward: for each left row, attach
    right_value_cols of the EARLIEST right row with right.on >= left.on
    within the same `by` group (pandas merge_asof direction='forward').
    Ties at right.on == left.on qualify.  Among multiple right rows with
    equal `on`, the window's (__on, __sort) order leaves them unordered —
    callers should ensure `on` is unique per group for full determinism
    (same caveat as the backward twin).  Same scale shape: ONE shuffle
    on (by, on), a single window pass, no nested loop.

    Returns all left columns + right_value_cols (null when no match).
    """
    lcols = left.columns
    tagged_l = left.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__on"),
        F.lit(0).alias("__sort"),  # left first at equal __on ...
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*right_value_cols).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    tagged_r = right.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__on"),
        F.lit(1).alias("__sort"),  # ... so same-ts right rows are in the frame
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*right_value_cols).alias("__r"),
    )
    w = (
        Window.partitionBy("__by")
        .orderBy(F.col("__on").asc(), F.col("__sort").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = tagged_l.unionByName(tagged_r).withColumn(
        "__first_r", F.first("__r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__sort") == 0).select(
        *[F.col("__l").getField(c).alias(c) for c in lcols],
        *[F.col("__first_r").getField(c).alias(c) for c in right_value_cols],
    )
    return out
