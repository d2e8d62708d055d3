"""Distributed Lloyd k-means over an embedding column.

Reference grounding [P]: the reference clusters expression/flux vectors
for dataset QA (SURVEY §2 J rows); a training-data pipeline uses the
same kernel for embedding-cluster balanced sampling and diversity
filtering ahead of dedup.

Scale design — the shape that survives 100 TB:

- Centroids are k x dim doubles (a few KB): they are QUERY CONSTANTS,
  not data.  Each assignment pass embeds them as a literal
  array-of-structs and computes the argmin per row with higher-order
  functions (`transform` + `array_min` over `struct(dist, cid)`), so
  assignment is a NARROW map — zero shuffle, no join, no UDF, whatever
  the fact-table size.
- The centroid update is `posexplode` -> groupBy(cid, dim) -> avg.
  Partial aggregation combines map-side, so the shuffle carries at
  most k x dim rows PER PARTITION (not N x dim): the per-iteration
  shuffle is O(k * dim * partitions), independent of row count.
- Collecting the k x dim averaged centroids to the driver between
  iterations is the textbook Lloyd structure (bounded by k, never by
  N) — it is not a driver-side loop over data.

Cross-engine determinism: distances and updated centroids are rounded
to 9 decimals each iteration, which absorbs addition-order drift
(~1e-15 relative) and re-synchronizes both engines bit-exactly; argmin
ties break on the lowest centroid id via lexicographic
`struct(d, cid)` ordering (= ORDER BY d, cid in SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sqdist(vec: Column, cent: Column) -> Column:
    """Squared L2 between two double arrays, left-to-right fold."""
    return F.aggregate(
        F.zip_with(vec, cent, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(e: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Add (cluster, sqdist) columns via a literal-centroid narrow map."""
    cents = F.array(
        *[
            F.struct(
                F.array(*[F.lit(float(x)) for x in vec]).alias("cv"),
                F.lit(int(cid)).cast("long").alias("cid"),
            )
            for cid, vec in centroids
        ]
    )
    best = F.array_min(
        F.transform(
            cents,
            lambda c: F.struct(
                F.round(_sqdist(F.col("v"), c["cv"]), 9).alias("d"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return e.withColumn("cluster", best["cid"]).withColumn("sqdist", best["d"])


def kmeans_assign(emb: DataFrame, k: int, iters: int) -> DataFrame:
    """Run `iters` Lloyd assignment rounds; return the final assignment.

    `emb` must have (vec_id: long, embedding: array<float>).  Seeds are
    the k lowest vec_ids (deterministic, rerun-stable).  Returns
    (vec_id, cluster, sqdist) under the last-updated centroids.
    """
    e = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    seeds = e.orderBy("vec_id").limit(k).collect()
    centroids = [(int(r["vec_id"]), list(r["v"])) for r in seeds]
    for it in range(iters):
        assigned = _assign(e, centroids)
        if it == iters - 1:
            return assigned.select(
                "vec_id", "cluster", F.round("sqdist", 6).alias("sqdist")
            )
        new = (
            assigned.select("cluster", F.posexplode("v").alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.round(F.avg("x"), 9).alias("x"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("i", "x"))), lambda s: s["x"]
                ).alias("cv")
            )
            .collect()
        )
        centroids = sorted((int(r["cluster"]), list(r["cv"])) for r in new)
    raise AssertionError("iters must be >= 1")
