"""IVF / IVF-PQ recall-vs-probe-cost sweep (r9 VERDICT item 3).

Measures pooled micro-recall@10 (hits / exact-top-10 rows over the
fixed vec_id%100 probe set — the same measure the *_graded keys gate
on) for a grid of (nlist, nprobe) configurations — and, for IVF-PQ, a
(ksub, shortlist) codebook axis — alongside the candidate fraction
nprobe/nlist each config scans.  The output table goes into SCALING.md
as the production tuning curve: the shipped low-cost point (nlist=8,
nprobe=2) trades recall for a 4x candidate cut, and the *_hi keys pin
the >=0.8-recall operating point the curve identifies.  The PQ grid
includes the exact sim_ann_ivf_pq_hi operating point
(nlist=16, nprobe=8, ksub=64, shortlist=200) so the published _hi
measurements are reproducible by this tool (r10 ADVICE).

`--clustered` re-runs the sweep on a deterministically skewed variant
of the embeddings table (70/20/10% of points pulled toward three fixed
anchors, so KMeans cell occupancy is heavily non-uniform) — the
r10 VERDICT item-9 probe that the nprobe knob still clears the graded
floors when cells are NOT balanced, which is what real corpora look
like.

Usage: python tools/ann_sweep.py [--clustered] [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from cobradb_spark.io import load_table  # noqa: E402
from cobradb_spark.operators.ivf import ivf_pq_topk, ivf_topk  # noqa: E402
from cobradb_spark.queries.llm import _exact_euclid_topk  # noqa: E402
from cobradb_spark.session import get_spark  # noqa: E402

# (nlist, nprobe) coarse-quantizer grid, shared by IVF and IVF-PQ.
COARSE_GRID = [
    (8, 1), (8, 2), (8, 4), (8, 8),
    (16, 1), (16, 2), (16, 4), (16, 8), (16, 16),
]
# (ksub, shortlist) codebook axis for IVF-PQ: the base-key config, the
# _hi-key config, and one intermediate so the curve has a shape.
PQ_CODEBOOK_GRID = [(16, 100), (32, 150), (64, 200)]


def recall(ann_df, exact_df) -> float:
    ex = exact_df.select("probe_id", "neighbor_id")
    n_ex = ex.count()
    hits = ann_df.select("probe_id", "neighbor_id").join(
        ex, ["probe_id", "neighbor_id"]
    ).count()
    return hits / n_ex


def skew_corpus(emb: DataFrame) -> DataFrame:
    """Deterministically clustered variant of the embeddings table.

    Each vector is shrunk 5x and offset by one of three fixed anchors
    chosen by xxhash64(vec_id) with 70/20/10 weights, so the corpus has
    three clusters of wildly unequal mass and KMeans cells end up
    occupancy-skewed — the adversarial layout for a fixed-nprobe scan.
    Pure column expressions (F.transform over the dim-64 array); no UDF,
    no driver collect, so the derivation itself is 100 TB-shaped.
    """
    b = F.abs(F.xxhash64(F.col("vec_id"))) % 10
    grp = F.when(b < 7, F.lit(0.0)).when(b < 9, F.lit(4.0)).otherwise(F.lit(-4.0))
    return emb.withColumn(
        "embedding",
        F.transform("embedding", lambda x: (x * F.lit(0.2) + grp).cast("float")),
    )


def main() -> None:
    argv = [a for a in sys.argv[1:]]
    clustered = "--clustered" in argv
    if clustered:
        argv.remove("--clustered")
    sf_dirs = argv or ["/root/testdata/sf0.01"]
    spark = get_spark("ann_sweep")
    rows = []
    for sf_dir in sf_dirs:
        emb = load_table(spark, sf_dir, "embeddings")
        if clustered:
            emb = skew_corpus(emb)
        emb = emb.cache()
        probes = emb.filter(F.col("vec_id") % 100 == 0)
        ex = _exact_euclid_topk(emb).cache()
        ex.count()

        def emit(kind, nlist, nprobe, r, t0, **extra):
            row = {
                "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                "corpus": "clustered" if clustered else "uniform",
                "kind": kind,
                "nlist": nlist,
                "nprobe": nprobe,
                **extra,
                "cand_frac": round(nprobe / nlist, 4),
                "recall_at_10": round(r, 4),
                "sec": round(time.time() - t0, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

        for nlist, nprobe in COARSE_GRID:
            t0 = time.time()
            emit(
                "ivf", nlist, nprobe,
                recall(ivf_topk(emb, probes, k=10, nlist=nlist, nprobe=nprobe,
                                seed=42), ex),
                t0,
            )
        for nlist, nprobe in COARSE_GRID:
            for ksub, shortlist in PQ_CODEBOOK_GRID:
                # full codebook axis only at the two shipped coarse
                # configs; elsewhere the base codebook tracks the curve
                if (ksub, shortlist) != PQ_CODEBOOK_GRID[0] and (
                    (nlist, nprobe) not in ((8, 2), (16, 8))
                ):
                    continue
                t0 = time.time()
                emit(
                    "ivf_pq", nlist, nprobe,
                    recall(ivf_pq_topk(emb, probes, k=10, nlist=nlist,
                                       nprobe=nprobe, ksub=ksub,
                                       shortlist=shortlist, seed=42), ex),
                    t0, ksub=ksub, shortlist=shortlist,
                )
        ex.unpersist()
        emb.unpersist()
    print(json.dumps({"sweep": rows}))


if __name__ == "__main__":
    main()
