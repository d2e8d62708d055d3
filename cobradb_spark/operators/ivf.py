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


def _train_pq_codebooks(
    sample: np.ndarray, m: int, ksub: int, iters: int = 8, seed: int = 42
) -> np.ndarray:
    """Per-subspace Lloyd k-means on a bounded driver-side sample.
    Returns codebooks of shape (m, ksub, dsub).  Deterministic (fixed
    seed, ties to lowest index)."""
    n, d = sample.shape
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        X = sample[:, j * dsub : (j + 1) * dsub]
        C = X[rng.choice(n, size=min(ksub, n), replace=False)]
        if len(C) < ksub:  # degenerate tiny sample: pad by repeating
            C = np.tile(C, (-(-ksub // len(C)), 1))[:ksub]
        for _ in range(iters):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(ksub):
                pts = X[a == c]
                if len(pts):
                    C[c] = pts.mean(axis=0)
        books[j] = C
    return books


def ivf_pq_topk(
    emb: DataFrame,
    probes: DataFrame,
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    m: int = 8,
    ksub: int = 16,
    shortlist: int = 100,
    seed: int = 42,
) -> DataFrame:
    """IVF + product quantization: the memory-compressed 100 TB ANN path.

    The corpus index stores m uint8 codes per vector (8 bytes here)
    instead of d floats (256 bytes) — the compression that lets a
    1000-executor cluster hold a trillion-vector index in RAM.  Pipeline:

    1. KMeans coarse quantizer (nlist cells), residual r = x - centroid;
    2. per-subspace codebooks (m x ksub) trained on a bounded driver
       sample of residuals, broadcast to executors;
    3. encode: each vector -> (cell, m codes), vectorized mapInPandas;
    4. query: probe the nprobe nearest cells; ADC (asymmetric distance)
       scores candidates from an (m x ksub) lookup table per probe —
       table lookups, no float vectors touched;
    5. exact re-rank of the ADC shortlist (standard IVF-PQ+rerank: PQ
       prunes, exact floats order the survivors).

    Only the codebooks (m*ksub*dsub floats) and centroids collect to the
    driver; encode/score stay distributed.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = emb.sparkSession
    vec = emb.select("vec_id", array_to_vector("embedding").alias("features"), "embedding")
    model = KMeans(k=nlist, seed=seed, maxIter=10, featuresCol="features").fit(vec)
    assigned = model.transform(vec).select(
        "vec_id", "embedding", F.col("prediction").alias("cell")
    )
    centers = np.array([np.asarray(c) for c in model.clusterCenters()])
    dim = centers.shape[1]
    dsub = dim // m

    # Bounded training sample of residuals (<= 2048 rows to the driver).
    # Deterministic pick (round-4 ADVICE): an unordered LIMIT returns
    # arbitrary rows under AQE/partition-layout changes, so codebooks —
    # and hence recall — would not be reproducible.  Ordering by a seeded
    # hash of vec_id is a stable pseudo-random sample and plans as a
    # TakeOrdered heap (no full sort shuffle).
    samp = np.array(
        [
            r["embedding"]
            for r in assigned.select("vec_id", "embedding")
            .orderBy(F.xxhash64(F.lit(seed), "vec_id"), "vec_id")
            .limit(2048)
            .collect()
        ],
        dtype=np.float64,
    )
    samp_cells = ((samp[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    books = _train_pq_codebooks(samp - centers[samp_cells], m, ksub, seed=seed)
    b_books = spark.sparkContext.broadcast(books)
    b_centers = spark.sparkContext.broadcast(centers)

    def encode(batches):
        B, C = b_books.value, b_centers.value
        for pdf in batches:
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            R = X - C[pdf["cell"].to_numpy()]
            codes = np.empty((len(R), m), dtype=np.int16)
            for j in range(m):
                d2 = (
                    (R[:, None, j * dsub : (j + 1) * dsub] - B[j][None, :, :]) ** 2
                ).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell": pdf["cell"],
                    "code": list(codes),
                }
            )

    coded = assigned.mapInPandas(encode, schema="vec_id long, cell int, code array<smallint>")

    def probe_cells(batches):
        C = b_centers.value
        for pdf in batches:
            q = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            d2 = ((q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            cells = np.argsort(d2, axis=1)[:, :nprobe]
            yield pd.DataFrame(
                {
                    "probe_id": np.repeat(pdf["vec_id"].to_numpy(), nprobe),
                    "cell": cells.ravel(),
                }
            )

    probe_cell = probes.select("vec_id", "embedding").mapInPandas(
        probe_cells, schema="probe_id long, cell int"
    )
    probe_vecs = probes.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p_emb")
    )
    # candidates: codes in the probed cells, probe vector rides along
    cand = (
        probe_cell.join(coded, on="cell")
        .filter(F.col("probe_id") != F.col("vec_id"))
        .join(F.broadcast(probe_vecs), on="probe_id")
    )

    def adc_score(batches):
        B, C = b_books.value, b_centers.value
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(pdf["p_emb"].tolist(), dtype=np.float64)
            r = q - C[pdf["cell"].to_numpy()]  # probe residual per row's cell
            codes = np.array(pdf["code"].tolist(), dtype=np.int64)
            # ADC: per row, distance^2 = sum_j ||r_j - B[j][code_j]||^2.
            # Vectorized: gather codewords, one subtract+square per subspace.
            acc = np.zeros(len(pdf))
            for j in range(m):
                cw = B[j][codes[:, j]]
                diff = r[:, j * dsub : (j + 1) * dsub] - cw
                acc += (diff * diff).sum(axis=1)
            yield pd.DataFrame(
                {
                    "probe_id": pdf["probe_id"],
                    "neighbor_id": pdf["vec_id"],
                    "adc": np.sqrt(acc),
                }
            )

    scored = cand.mapInPandas(
        adc_score, schema="probe_id long, neighbor_id long, adc double"
    )
    from pyspark.sql import Window

    ws = Window.partitionBy("probe_id").orderBy(F.col("adc").asc(), "neighbor_id")
    short = scored.withColumn("srn", F.row_number().over(ws)).filter(
        F.col("srn") <= shortlist
    )
    # exact re-rank of the shortlist
    nbr_vecs = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb")
    )
    exact = F.sqrt(
        F.aggregate(
            F.zip_with(
                "p_emb", "n_emb", lambda x, y: (x.cast("double") - y.cast("double")) ** 2
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    reranked = (
        short.join(F.broadcast(probe_vecs), on="probe_id")
        .join(nbr_vecs, on="neighbor_id")
        .select("probe_id", "neighbor_id", exact.alias("dist"))
    )
    wr = Window.partitionBy("probe_id").orderBy(F.col("dist").asc(), "neighbor_id")
    return (
        reranked.withColumn("rn", F.row_number().over(wr).cast("long"))
        .filter(F.col("rn") <= k)
        .select("probe_id", "neighbor_id", F.round("dist", 6).alias("dist"), "rn")
    )


def ivf_near_pairs(
    emb: DataFrame,
    threshold: float,
    nlist: int = 8,
    nassign: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_rows: int = 1_000_000,
    score_block_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """APPROXIMATE all-pairs cosine near-neighbors via an IVF index:
    candidate pairs are vectors sharing at least one of their `nassign`
    nearest KMeans cells, scored exactly per cell with the BLAS kernel.

    This is the index-accelerated scale path of knn.cosine_near_pairs:
    instead of broadcasting the corpus matrix (or LSH bucketing), the
    IVF index build (KMeans, seed-pinned) partitions the corpus into
    nlist cells; multi-assignment (nassign > 1) recovers pairs that
    straddle a cell border, the same recall knob as LSH's extra hash
    tables.  Per-cell scoring is an applyInPandas grouped-map over the
    cell key — at 100 TB nlist scales to ~sqrt(N) so each cell stays
    a bounded BLAS problem, and only the (tiny) centroid matrix
    ever touches the driver (broadcast back out).  Recall < 1 by
    design: pairs whose members share no assigned cell are missed —
    callers needing an exact-verified result use cosine_near_pairs and
    grade this path against it (the _graded key pattern).

    Hot-cell posture: scoring is BLOCKED — row-blocks of the cell
    matrix against the whole cell, block size chosen so the similarity
    slab stays under `score_block_bytes` — so peak memory is O(m x B),
    never the m x m matrix a skewed cell would blow up on.  The grouped
    map still materializes the cell's (m x d) vectors themselves, so a
    cell larger than `max_cell_rows` raises loudly (the gated-collect
    convention: fail with the knob named, never OOM a worker) — the fix
    at scale is raising nlist toward ~sqrt(N), which shrinks every
    cell.

    Returns (a_id, b_id, cos_sim) with a_id < b_id, cos_sim rounded 6,
    deduplicated across shared cells.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = emb.sparkSession
    vec = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        array_to_vector(vec_col).alias("features"),
    )
    km = KMeans(k=nlist, seed=seed, maxIter=10, featuresCol="features")
    model = km.fit(vec)
    centers = np.array([np.asarray(c) for c in model.clusterCenters()])
    b_centers = spark.sparkContext.broadcast(centers)

    def assign_cells(batches):
        C = b_centers.value
        n_assign = min(nassign, len(C))
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            d = ((q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            cells = np.argsort(d, axis=1)[:, :n_assign]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_assign),
                    "embedding": pdf["embedding"].iloc[
                        np.repeat(np.arange(len(pdf)), n_assign)
                    ].to_numpy(),
                    "cell": cells.ravel().astype("int32"),
                }
            )

    assigned = vec.select("vec_id", "embedding").mapInPandas(
        assign_cells, schema="vec_id long, embedding array<float>, cell int"
    )

    def pairs_in_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "cos_sim": []}).astype(
                {"a_id": "int64", "b_id": "int64", "cos_sim": "float64"}
            )
        if m > max_cell_rows:
            raise ValueError(
                f"ivf_near_pairs: a cell holds {m} vectors, over the "
                f"max_cell_rows={max_cell_rows} budget — raise nlist "
                "(toward ~sqrt(N)) so cells shrink, or raise the budget "
                "explicitly"
            )
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        M = np.array(pdf["embedding"].tolist(), dtype=np.float64)[order]
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        # blocked upper-triangle scoring: ids are sorted ascending, so
        # global row index i < column index j implies ids[i] < ids[j]
        blk = max(1, score_block_bytes // (m * 8))
        out_a, out_b, out_c = [], [], []
        for s in range(0, m, blk):
            e = min(s + blk, m)
            S = Mn[s:e] @ Mn.T  # (e-s) x m slab
            ai, bi = np.nonzero(S >= threshold)
            keep = (s + ai) < bi
            ai, bi = ai[keep], bi[keep]
            out_a.append(ids[s + ai])
            out_b.append(ids[bi])
            out_c.append(S[ai, bi])
        return pd.DataFrame(
            {
                "a_id": np.concatenate(out_a) if out_a else np.array([], dtype=np.int64),
                "b_id": np.concatenate(out_b) if out_b else np.array([], dtype=np.int64),
                "cos_sim": np.concatenate(out_c) if out_c else np.array([], dtype=np.float64),
            }
        )

    cand = assigned.groupBy("cell").applyInPandas(
        pairs_in_cell, schema="a_id long, b_id long, cos_sim double"
    )
    # a pair sharing several assigned cells is scored once per shared
    # cell with bit-identical doubles; max() is a pure dedup
    return (
        cand.groupBy("a_id", "b_id")
        .agg(F.round(F.max("cos_sim"), 6).alias("cos_sim"))
    )
