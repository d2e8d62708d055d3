"""Binned interval (range) join — SURVEY.md §4.3.1.

Reference semantics [P]: genome_region interval queries — which points
(gene positions) fall inside which [leftpos, rightpos] regions
(component_loading.py containment lookups).

A naive theta-join `a.lo <= p AND p <= a.hi` plans as a nested-loop
(BroadcastNestedLoopJoin) — O(N*M), hopeless at 100 TB.  The scale path
used here: quantize both sides to fixed-width bins, *equi-join on the
bin id* (hash join, shuffles on bin), then re-filter the exact
containment predicate.  An interval spanning k bins is exploded to k
rows; a point lives in exactly one bin, so no dedup is needed.  Bin
width should be on the order of the typical interval length: each
interval then explodes to ~2 rows, and the join is a plain hash join
whose cost is driven by truly-overlapping pairs, not the cross product.
Skewed bins (hot regions) are handled by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    lo: str,
    hi: str,
    point: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows of `points` to rows of `intervals` with
    lo <= point <= hi (closed interval).  lo/hi/point are integral
    (epoch seconds, positions, ...).  Returns all columns of both inputs.
    """
    b_lo = (F.col(lo) / bin_width).cast("long")
    b_hi = (F.col(hi) / bin_width).cast("long")
    binned_iv = intervals.withColumn(
        "__bin", F.explode(F.sequence(b_lo, b_hi))
    )
    binned_pt = points.withColumn("__bin", (F.col(point) / bin_width).cast("long"))
    cond: Column = (F.col(point) >= F.col(lo)) & (F.col(point) <= F.col(hi))
    return (
        binned_iv.join(binned_pt, on="__bin", how=how)
        .filter(cond)
        .drop("__bin")
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str,
    a_hi: str,
    b_lo: str,
    b_hi: str,
    bin_width: int,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Interval-interval OVERLAP join: pairs where
    [a_lo, a_hi] ∩ [b_lo, b_hi] ≠ ∅ (closed intervals), optionally also
    matching on `extra_keys` equality columns (present in both inputs).

    Same binned-equi-join strategy as interval_point_join, with one new
    wrinkle: a pair overlapping k shared bins would surface k times, so
    candidates are deduplicated on the pair BEFORE the exact predicate.
    The dedup happens bin-locally via the standard trick: keep a
    candidate only in the FIRST shared bin — max(bin containing both
    starts) — which needs no distinct/shuffle at all, just arithmetic
    on columns already present.
    """
    keys = list(extra_keys or [])
    ba = a.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.col(a_lo) / bin_width).cast("long"),
                (F.col(a_hi) / bin_width).cast("long"),
            )
        ),
    )
    bb = b.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.col(b_lo) / bin_width).cast("long"),
                (F.col(b_hi) / bin_width).cast("long"),
            )
        ),
    )
    overlap = (F.col(a_lo) <= F.col(b_hi)) & (F.col(b_lo) <= F.col(a_hi))
    # first shared bin = bin of max(a_lo, b_lo); emitting the pair only
    # there makes each true pair appear exactly once.
    first_shared = (F.greatest(F.col(a_lo), F.col(b_lo)) / bin_width).cast("long")
    return (
        ba.join(bb, on=keys + ["__bin"])
        .filter(overlap & (F.col("__bin") == first_shared))
        .drop("__bin")
    )
