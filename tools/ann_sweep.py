"""IVF / IVF-PQ recall-vs-probe-cost sweep (r9 VERDICT item 3).

Measures micro-recall@10 (hits / exact-top-10 rows over the fixed
vec_id%100 probe set — the same measure the *_graded keys gate on)
for a grid of (nlist, nprobe) configurations, alongside the candidate
fraction nprobe/nlist each config scans.  The output table goes into
SCALING.md as the production tuning curve: the shipped low-cost point
(nlist=8, nprobe=2) trades recall for a 4x candidate cut, and the
*_hi keys pin the >=0.8-recall operating point the curve identifies.

Usage: python tools/ann_sweep.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cobradb_spark.io import load_table  # noqa: E402
from cobradb_spark.operators.ivf import ivf_pq_topk, ivf_topk  # noqa: E402
from cobradb_spark.queries.llm import _exact_euclid_topk  # noqa: E402
from cobradb_spark.session import get_spark  # noqa: E402


def recall(ann_df, exact_df) -> float:
    ex = exact_df.select("probe_id", "neighbor_id")
    n_ex = ex.count()
    hits = ann_df.select("probe_id", "neighbor_id").join(
        ex, ["probe_id", "neighbor_id"]
    ).count()
    return hits / n_ex


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    spark = get_spark("ann_sweep")
    grid = [
        (8, 1), (8, 2), (8, 4), (8, 8),
        (16, 1), (16, 2), (16, 4), (16, 8), (16, 16),
    ]
    rows = []
    for sf_dir in sf_dirs:
        emb = load_table(spark, sf_dir, "embeddings").cache()
        probes = emb.filter(F.col("vec_id") % 100 == 0)
        ex = _exact_euclid_topk(emb).cache()
        ex.count()
        for kind, fn in (("ivf", ivf_topk), ("ivf_pq", ivf_pq_topk)):
            for nlist, nprobe in grid:
                t0 = time.time()
                r = recall(
                    fn(emb, probes, k=10, nlist=nlist, nprobe=nprobe, seed=42), ex
                )
                row = {
                    "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                    "kind": kind,
                    "nlist": nlist,
                    "nprobe": nprobe,
                    "cand_frac": round(nprobe / nlist, 4),
                    "recall_at_10": round(r, 4),
                    "sec": round(time.time() - t0, 1),
                }
                rows.append(row)
                print(json.dumps(row), flush=True)
        ex.unpersist()
        emb.unpersist()
    print(json.dumps({"sweep": rows}))


if __name__ == "__main__":
    main()
