"""IVF (inverted-file) approximate nearest neighbor — the other 100 TB
ANN path next to LSH.

Shape: KMeans coarse quantizer (nlist centroids) partitions the corpus;
each query probes only the nprobe nearest centroid cells, so the exact
kernel runs on ~nprobe/nlist of the data.  At scale the assignment table
is bucketed/partitioned by centroid id, making each probe a partition-
pruned scan + local BLAS top-k; here the centroid set is broadcast and
the per-cell search reuses the numpy kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ivf_topk(
    emb: DataFrame,
    probes: DataFrame,
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Top-k euclidean neighbors for each probe, searching only the
    nprobe nearest KMeans cells.  Returns (probe_id, neighbor_id, dist,
    rn); ties broken by neighbor id."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = emb.sparkSession
    vec = emb.select("vec_id", array_to_vector("embedding").alias("features"), "embedding")
    km = KMeans(k=nlist, seed=seed, maxIter=10, featuresCol="features")
    model = km.fit(vec)
    assigned = model.transform(vec).select(
        "vec_id", "embedding", F.col("prediction").alias("cell")
    )
    centers = np.array([np.asarray(c) for c in model.clusterCenters()])
    b_centers = spark.sparkContext.broadcast(centers)

    def probe_cells(batches):
        C = b_centers.value
        for pdf in batches:
            q = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            d = ((q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            cells = np.argsort(d, axis=1)[:, :nprobe]
            yield pd.DataFrame(
                {
                    "probe_id": np.repeat(pdf["vec_id"].to_numpy(), nprobe),
                    "cell": cells.ravel(),
                }
            )

    probe_cell = probes.select("vec_id", "embedding").mapInPandas(
        probe_cells, schema="probe_id long, cell int"
    )
    # search only the probed cells: equi-join on cell (partition-pruned
    # scan at scale), exact distance inside
    cand = probe_cell.join(assigned, on="cell").filter(
        F.col("probe_id") != F.col("vec_id")
    )
    probe_vecs = probes.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p_emb")
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                "p_emb", "embedding", lambda x, y: (x.cast("double") - y.cast("double")) ** 2
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    scored = cand.join(F.broadcast(probe_vecs), on="probe_id").select(
        "probe_id", F.col("vec_id").alias("neighbor_id"), dist.alias("dist")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.col("dist").asc(), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("probe_id", "neighbor_id", F.round("dist", 6).alias("dist"), "rn")
    )
