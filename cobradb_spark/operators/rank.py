"""Distributed global row-number — the scale-safe ranking primitive.

A plain `row_number() OVER (ORDER BY ...)` funnels every row through ONE
partition (Catalyst plans a single-partition window) — the classic
100 TB cliff.  This operator computes the identical rank distributed:

1. `repartitionByRange` on the order keys — partition i holds a
   contiguous, disjoint key range, ranges ascending with partition id;
2. per-partition counts -> driver (K tiny rows), prefix-summed into
   per-partition global offsets;
3. a window PARTITIONED by the range-partition id (so it shuffles by
   pid, never collapses to one task) computes local row_number, and
   `offset[pid] + local` is the exact global rank.

Ties must be fully broken by the order keys (callers append a unique
key), which makes the result independent of where the sampled range
boundaries happen to fall.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame, order_cols: list[Column], rank_col: str = "rank", num_parts: int | None = None
) -> DataFrame:
    """Add `rank_col` = exact global row_number by `order_cols`, distributed.

    `order_cols` must define a TOTAL order (append a unique tiebreaker).
    """
    k = num_parts or max(df.sparkSession.sparkContext.defaultParallelism, 2)
    tagged = (
        df.repartitionByRange(k, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r._pid: r["count"] for r in tagged.groupBy("_pid").count().collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        tagged.withColumn(
            rank_col, (off_map[F.col("_pid")] + F.row_number().over(w)).cast("long")
        )
        .drop("_pid")
    )
