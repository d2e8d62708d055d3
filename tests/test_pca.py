"""embed_pca_power semantics (queries/mlprep.py).

The oracle gate proves Spark == DuckDB replay the identical integer
iteration; this test pins that the iteration actually converges to the
truth: the loadings align with numpy's exact top eigenvector of the
float covariance (|cos| > 0.999) and the Rayleigh eigenvalue matches
numpy's top eigenvalue to quantization tolerance.
"""

from __future__ import annotations

import numpy as np

from cobradb_spark.io import load_table
from cobradb_spark.registry import get_query


def test_pca_matches_numpy_eigendecomposition(spark, sf_dir):
    emb = np.stack(
        [
            r["embedding"]
            for r in load_table(spark, sf_dir, "embeddings")
            .select("embedding")
            .collect()
        ]
    ).astype(np.float64)
    c = np.cov(emb, rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(c)
    top_val, top_vec = w[-1], vecs[:, -1]

    rows = get_query("embed_pca_power").fn(spark, sf_dir).collect()
    assert len(rows) == emb.shape[1] == 64
    got = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    cos = abs(got @ top_vec) / (np.linalg.norm(got) * np.linalg.norm(top_vec))
    assert cos > 0.999
    eig = rows[0]["eigenvalue"]
    assert abs(eig - top_val) < 1e-3 * max(top_val, 1e-9)
    ratio = rows[0]["explained_ratio"]
    assert abs(ratio - top_val / np.trace(c)) < 1e-3
