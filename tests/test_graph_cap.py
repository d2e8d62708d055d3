"""graph_jaccard_neighbors hub-cap contract (queries/graph.py).

The registered key computes Jaccard over HUB-FILTERED neighbor sets
N'(x) = {y in N(x) : deg(y) <= cap}.  The oracle gate proves Spark ==
DuckDB under the same cap; these tests pin the cap semantics itself:

1. A cap above the max degree degenerates to the classical uncapped
   Jaccard, bit-for-bit (so the cap is a pure restriction, not a
   reformulation).
2. The capped score is the true Jaccard of the filtered sets — verified
   against an independent pure-Python recomputation from the raw edge
   list at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cobradb_spark.queries.graph import (
    _JACCARD_HUB_CAP,
    _copurchase_edges,
    _jaccard_neighbors_capped,
)


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_large_cap_degenerates_to_uncapped(spark, sf_dir):
    max_deg = (
        _copurchase_edges(spark, sf_dir)
        .groupBy("dst")
        .agg(F.count("*").alias("d"))
        .agg(F.max("d"))
        .first()[0]
    )
    capped = _rows(_jaccard_neighbors_capped(spark, sf_dir, max_deg + 1))
    uncapped = _rows(_jaccard_neighbors_capped(spark, sf_dir, None))
    assert capped == uncapped
    assert len(uncapped) == 50


def test_capped_score_is_true_jaccard_of_filtered_sets(spark, sf_dir):
    """Independent recomputation: collect the sf0.001 edge list (small),
    build the hub-filtered neighbor sets in Python, and check every
    returned row's n_shared / n_union / jaccard."""
    edges = _copurchase_edges(spark, sf_dir).collect()
    nbrs: dict[int, set[int]] = {}
    for r in edges:
        nbrs.setdefault(r.src, set()).add(r.dst)
    filt = {
        x: {y for y in ns if len(nbrs[y]) <= _JACCARD_HUB_CAP}
        for x, ns in nbrs.items()
    }
    out = _jaccard_neighbors_capped(spark, sf_dir, _JACCARD_HUB_CAP).collect()
    assert len(out) == 50
    for r in out:
        shared = len(filt[r.part_a] & filt[r.part_b])
        union = len(filt[r.part_a] | filt[r.part_b])
        assert r.n_shared == shared
        assert r.n_union == union
        assert r.jaccard == round(shared / union, 6)
