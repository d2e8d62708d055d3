"""Semantic checks for the graph operators (queries/graph.py): the oracle
gate proves Spark==DuckDB; these pin the *mathematical* invariants both
engines could get wrong together.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cobradb_spark.queries.graph import (
    graph_pagerank,
    graph_triangle_stats,
    _copurchase_edges,
)


def test_pagerank_mass_conserved(spark, sf_dir):
    """Symmetric graph, no dangling nodes: total rank stays 1 (up to the
    per-iteration 1e-12 rounding, |V| * 5e-13 worst case)."""
    pr = graph_pagerank(spark, sf_dir)
    row = pr.agg(
        F.sum("pagerank").alias("total"), F.count("*").alias("n"), F.min("pagerank").alias("lo")
    ).first()
    assert row["n"] > 0
    assert row["total"] == pytest.approx(1.0, abs=row["n"] * 5e-13 + 1e-9)
    assert row["lo"] > 0  # teleport term keeps every rank positive


def test_pagerank_degree_monotone_at_extremes(spark, sf_dir):
    """The max-degree node must outrank the min-degree node (holds for
    PageRank on connected-ish co-occurrence graphs; a sanity probe that
    the contribution join is keyed the right way around)."""
    edges = _copurchase_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("part_id")).agg(F.count("*").alias("d"))
    joined = graph_pagerank(spark, sf_dir).join(deg, "part_id")
    top = joined.orderBy(F.desc("d"), "part_id").first()
    bot = joined.orderBy(F.asc("d"), "part_id").first()
    assert top["pagerank"] > bot["pagerank"]


def test_triangle_stats_vs_bruteforce(spark, sf_dir):
    """Degree-oriented count == naive a<b<c three-way join count."""
    edges = _copurchase_edges(spark, sf_dir)
    und = edges.filter(F.col("src") < F.col("dst"))
    e1 = und.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = und.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = und.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    naive = e1.join(e2, "b").join(e3, ["a", "c"]).count()
    row = graph_triangle_stats(spark, sf_dir).first()
    assert row["n_triangles"] == naive
    assert 0.0 <= row["transitivity"] <= 1.0
    # wedges >= 3 * triangles always (each triangle closes 3 wedges)
    sum_wedges = (
        edges.groupBy("src").count().agg(F.sum(F.expr("count * (count - 1) / 2"))).first()[0]
    )
    assert sum_wedges >= 3 * row["n_triangles"]


def _sorted_rows(df):
    cols = sorted(df.columns)
    return [tuple(r[c] for c in cols) for r in sorted(df.select(*cols).collect())]


def test_vertex_gate_shuffle_path_identical(spark, sf_dir, monkeypatch):
    """Forcing the vertex-broadcast gate to 0 routes pagerank through the
    pinned src-partitioned edge list + per-iteration shuffle join, and
    triangle/jaccard through plain degree joins — results must be
    bit-identical to the broadcast path (same rows, same rounding)."""
    import cobradb_spark.queries.graph as G
    from cobradb_spark.operators.rank import release_rank_caches

    broadcast_side = {
        "pagerank": _sorted_rows(G.graph_pagerank(spark, sf_dir)),
        "triangle": _sorted_rows(G.graph_triangle_stats(spark, sf_dir)),
        "jaccard": _sorted_rows(G.graph_jaccard_neighbors(spark, sf_dir)),
    }
    release_rank_caches()
    monkeypatch.setattr(G, "BROADCAST_BYTES_LIMIT", 0)
    try:
        assert _sorted_rows(G.graph_pagerank(spark, sf_dir)) == broadcast_side["pagerank"]
        assert _sorted_rows(G.graph_triangle_stats(spark, sf_dir)) == broadcast_side["triangle"]
        assert _sorted_rows(G.graph_jaccard_neighbors(spark, sf_dir)) == broadcast_side["jaccard"]
    finally:
        release_rank_caches()


def test_connected_components_match_union_find(spark, sf_dir):
    """Independent ground truth: a driver-side union-find over the same
    strong-pair edge list must produce identical components (same
    partition of nodes, same min-id labels, same sizes)."""
    from cobradb_spark.queries.graph import (
        _CC_MIN_SUPPORT,
        graph_connected_components,
    )
    from cobradb_spark.io import load_table
    from cobradb_spark.operators.rank import release_rank_caches

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    from collections import Counter, defaultdict

    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    support = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i, p1 in enumerate(ps):
            for p2 in ps[i + 1 :]:
                support[(p1, p2)] += 1
    edges = [e for e, s in support.items() if s >= _CC_MIN_SUPPORT]

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {n: find(n) for n in parent}
    sizes = Counter(truth.values())

    out = graph_connected_components(spark, sf_dir).collect()
    release_rank_caches()
    assert len(out) == len(truth)
    for r in out:
        assert truth[r.part_id] == r.comp_id
        assert sizes[r.comp_id] == r.comp_size


def test_kcore_peel_reaches_fixpoint_and_matches_python(spark, sf_dir):
    """Pure-Python synchronous peel replay: asserts (a) the fixpoint is
    reached strictly within _KCORE_ROUNDS (so the fixed bound is
    semantics-free at test scale — survivors ARE the true 2-core) and
    (b) the Spark survivors/degrees match exactly."""
    from collections import Counter, defaultdict

    from cobradb_spark.io import load_table
    from cobradb_spark.operators.rank import release_rank_caches
    from cobradb_spark.queries.graph import (
        _CC_MIN_SUPPORT,
        _KCORE_K,
        _KCORE_ROUNDS,
        graph_kcore_peel,
    )

    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in rows:
        baskets[r.l_orderkey].add(r.l_partkey)
    support = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i, p1 in enumerate(ps):
            for p2 in ps[i + 1 :]:
                support[(p1, p2)] += 1
    adj = defaultdict(set)
    for (p1, p2), s in support.items():
        if s >= _CC_MIN_SUPPORT:
            adj[p1].add(p2)
            adj[p2].add(p1)
    surv = set(adj)
    rounds = 0
    while True:
        nxt = {n for n in surv if len(adj[n] & surv) >= _KCORE_K}
        rounds += 1
        if nxt == surv:
            break
        surv = nxt
    assert rounds <= _KCORE_ROUNDS, "peel must converge within the bound"
    expect = {n: len(adj[n] & surv) for n in surv}

    out = graph_kcore_peel(spark, sf_dir).collect()
    release_rank_caches()
    got = {r.part_id: r.core_deg for r in out}
    assert got == expect
    assert all(r.core_size == len(expect) for r in out)


def test_functional_cycles_match_direct_walk(spark, sf_dir):
    """Pointer-doubling result must equal a direct sequential walk of the
    same md5 successor map (Floyd-free ground truth: color-marking DFS),
    and the basins must partition all N nodes."""
    import hashlib

    from cobradb_spark import registry

    rows = registry.get_query("graph_functional_cycles").fn(spark, sf_dir).collect()
    got = sorted((r.cycle_rep, r.cycle_len, r.basin_n) for r in rows)

    n = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    succ = {
        v: int(hashlib.md5(f"succ{v}".encode()).hexdigest()[:15], 16) % n
        for v in range(n)
    }
    color, oncycle = {}, set()
    for start in range(n):
        path, v = [], start
        while v not in color:
            color[v] = start
            path.append(v)
            v = succ[v]
        if color[v] == start:
            oncycle.update(path[path.index(v):])
    reps, seen = {}, set()
    for v in oncycle:
        if v in seen:
            continue
        cyc, u = [v], succ[v]
        while u != v:
            cyc.append(u)
            u = succ[u]
        seen.update(cyc)
        reps[min(cyc)] = len(cyc)
    basin = {}
    for v in range(n):
        u = v
        while u not in oncycle:
            u = succ[u]
        cyc, w = [u], succ[u]
        while w != u:
            cyc.append(w)
            w = succ[w]
        basin[min(cyc)] = basin.get(min(cyc), 0) + 1
    expect = sorted((k, reps[k], basin[k]) for k in reps)
    assert got == expect
    assert sum(b for _, _, b in got) == n  # basins partition the node set


def test_sssp_weighted_matches_dijkstra(spark, sf_dir):
    """graph_sssp_weighted (frontier Bellman-Ford, oracle-checked against
    an unrolled synchronous replay) must equal an INDEPENDENT algorithm:
    heap Dijkstra over the same weighted edges in pure Python."""
    import heapq

    from cobradb_spark.queries.graph import graph_sssp_weighted
    from cobradb_spark.io import load_table

    lp = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    pairs = {}
    orders = {}
    for r in lp.collect():
        orders.setdefault(r["ok"], []).append(r["pk"])
    for parts in orders.values():
        for a in parts:
            for b in parts:
                if a != b:
                    pairs[(a, b)] = pairs.get((a, b), 0) + 1
    adj = {}
    for (a, b), c in pairs.items():
        adj.setdefault(a, []).append((b, max(1, 8 - c)))
    source = max(adj, key=lambda n: (len(adj[n]), -n))
    dist = {source: 0}
    heap = [(0, source)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, 1 << 60):
            continue
        for v, w in adj[u]:
            nd = d + w
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    got = {
        r["part_id"]: r["dist"]
        for r in graph_sssp_weighted(spark, sf_dir).collect()
    }
    assert got == dist


def test_personalized_pagerank_seed_locality(spark, sf_dir):
    """Semantic pins for PPR: the seed (max-degree hub) holds the top
    score (teleport re-injects all restart mass there); total mass
    never exceeds 1 + rounding slack; and positive mass reaches exactly
    the seed's <=3-hop out-neighborhood (the iteration count)."""
    from cobradb_spark.queries.graph import (
        _copurchase_edges,
        graph_personalized_pagerank,
    )

    rows = graph_personalized_pagerank(spark, sf_dir).collect()
    assert rows
    total = sum(r["ppr"] for r in rows)
    assert total <= 1.0 + len(rows) * 5e-13 + 1e-9
    by_node = {r["part_id"]: r["ppr"] for r in rows}
    edges = _copurchase_edges(spark, sf_dir).collect()
    deg = {}
    adj = {}
    for e in edges:
        deg[e["src"]] = deg.get(e["src"], 0) + 1
        adj.setdefault(e["src"], set()).add(e["dst"])
    seed = max(deg, key=lambda n: (deg[n], -n))
    assert max(by_node, key=by_node.get) == seed
    reach, frontier = {seed}, {seed}
    for _ in range(3):
        frontier = {d for s in frontier for d in adj.get(s, ())}
        reach |= frontier
    assert set(by_node) == reach
