"""Geo family semantics (queries/geo.py).

The oracle gate proves Spark == DuckDB; these tests pin the geometry
itself, independently of either engine:

1. The 3x3 grid-blocked radius join finds EXACTLY the pairs a
   brute-force all-pairs scan finds (the blocking is a pure pruning,
   never a filter on the result) — checked at sf0.001 where the cross
   product is tiny.
2. The geohash encode matches an independent pure-Python bit-by-bit
   geohash implementation (the Morton magic-mask spread is equivalent
   to the per-bit interleave definition).
3. Track length equals a pure-Python recomputation from the ordered
   event list; n_points equals each user's event count.
4. Centroid/bbox invariants: min <= centroid <= max per nation.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cobradb_spark.io import load_table
from cobradb_spark.queries.geo import (
    _B32,
    _C_LAT,
    _C_LON,
    _E_LAT,
    _E_LON,
    _R,
    _radius_pairs,
)


def _coord(k: int, salt: int, rng: int, off: float) -> float:
    return ((k % 1000003) * salt) % rng / 10000.0 - off


def _c_pos(k: int):
    return _coord(k, 9973, 1800000, 90.0), _coord(k, 7919, 3600000, 180.0)


def _s_pos(k: int):
    return _coord(k, 6007, 1800000, 90.0), _coord(k, 4391, 3600000, 180.0)


def _e_pos(k: int):
    return _coord(k, 9973, 1800000, 90.0), _coord(k, 7919, 3600000, 180.0)


def test_blocked_radius_join_equals_brute_force(spark, sf_dir):
    custkeys = [r[0] for r in load_table(spark, sf_dir, "customer").select("c_custkey").collect()]
    suppkeys = [r[0] for r in load_table(spark, sf_dir, "supplier").select("s_suppkey").collect()]
    brute = set()
    for ck in custkeys:
        cla, clo = _c_pos(ck)
        for sk in suppkeys:
            sla, slo = _s_pos(sk)
            d2 = (cla - sla) ** 2 + (clo - slo) ** 2
            if d2 <= _R * _R:
                brute.add((ck, sk))
    blocked = {
        (r["c_custkey"], r["s_suppkey"])
        for r in _radius_pairs(spark, sf_dir).collect()
    }
    assert blocked == brute
    assert len(brute) > 0  # non-degenerate fixture


def _py_geohash8(lat: float, lon: float) -> str:
    """Independent per-bit reference implementation (no Morton tricks)."""
    lat20 = math.floor((lat + 90.0) / 180.0 * 1048576.0)
    lon20 = math.floor((lon + 180.0) / 360.0 * 1048576.0)
    bits = []
    for i in range(19, -1, -1):  # MSB first, lon leads per the geohash spec
        bits.append((lon20 >> i) & 1)
        bits.append((lat20 >> i) & 1)
    h = 0
    for b in bits:
        h = (h << 1) | b
    return "".join(_B32[(h >> (35 - 5 * i)) & 31] for i in range(8))


def test_geohash_matches_reference_bits(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.expr(_C_LAT).alias("lat"),
            F.expr(_C_LON).alias("lon"),
        )
        .collect()
    )
    from cobradb_spark.registry import get_query

    got = {
        r["c_custkey"]: (r["geohash"], r["gh4"])
        for r in get_query("geo_geohash_encode").fn(spark, sf_dir).collect()
    }
    assert len(got) == len(rows)
    for r in rows:
        expect = _py_geohash8(r["lat"], r["lon"])
        assert got[r["c_custkey"]] == (expect, expect[:4])


def test_track_length_matches_python(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_id"]))
    expect = {}
    for u, pts in by_user.items():
        pts.sort()
        total_nano = 0
        for (_, a), (_, b) in zip(pts, pts[1:]):
            pa, pb = _e_pos(a), _e_pos(b)
            d = math.sqrt((pa[0] - pb[0]) ** 2 + (pa[1] - pb[1]) ** 2)
            total_nano += math.floor(d * 1e9)
        expect[u] = (len(pts), total_nano / 1e9)
    from cobradb_spark.registry import get_query

    got = {
        r["user_id"]: (r["n_points"], r["track_len"])
        for r in get_query("geo_track_length").fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_bbox_centroid_invariants(spark, sf_dir):
    from cobradb_spark.registry import get_query

    rows = get_query("geo_bbox_centroid").fn(spark, sf_dir).collect()
    assert len(rows) == 25
    for r in rows:
        assert r["min_lat"] <= r["centroid_lat"] <= r["max_lat"]
        assert r["min_lon"] <= r["centroid_lon"] <= r["max_lon"]
        assert r["n_customers"] > 0


def test_nearest_neighbor_is_argmin_of_pairs(spark, sf_dir):
    from cobradb_spark.registry import get_query

    pairs = _radius_pairs(spark, sf_dir).collect()
    best: dict = {}
    for r in pairs:
        key = (r["d2"], r["s_suppkey"])
        if r["c_custkey"] not in best or key < best[r["c_custkey"]]:
            best[r["c_custkey"]] = key
    got = {
        r["c_custkey"]: (r["nearest_suppkey"], r["dist"])
        for r in get_query("geo_nearest_neighbor").fn(spark, sf_dir).collect()
    }
    assert set(got) == set(best)
    for ck, (d2, sk) in best.items():
        assert got[ck] == (sk, math.sqrt(d2))


def test_polygon_contains_matches_python_replay(spark, sf_dir):
    """Replay the crossing-number test in pure Python over the same
    integer lattice, and assert the polygon actually splits the data
    (both inside and outside non-empty) so the op isn't vacuous."""
    from cobradb_spark.io import load_table
    from cobradb_spark.queries.geo import _POLY
    from cobradb_spark.registry import get_query

    def inside(px, py):
        n, cross = len(_POLY), 0
        for i in range(n):
            x1, y1 = _POLY[i]
            x2, y2 = _POLY[(i + 1) % n]
            if (y1 <= py) != (y2 <= py):
                t = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
                if (t > 0) == (y2 > y1):
                    cross += 1
        return cross % 2

    rows = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).collect()
    expect = {}
    for r in rows:
        k = r.c_custkey
        px = ((k % 1000003) * 7919) % 3600000
        py = ((k % 1000003) * 9973) % 1800000
        seg = expect.setdefault(r.c_mktsegment, [0, 0, 0])
        if inside(px, py):
            seg[0] += 1
            seg[2] += k
        else:
            seg[1] += 1
    got = {
        r.c_mktsegment: [r.n_inside, r.n_outside, r.inside_key_sum]
        for r in get_query("geo_polygon_contains").fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert sum(v[0] for v in expect.values()) > 0
    assert sum(v[1] for v in expect.values()) > 0
