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
