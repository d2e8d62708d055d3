"""Property-based tests (hypothesis) for the id/hash functions — the
upgrade the reference's example-based suite lacks (SURVEY §5.1/5.2)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st


def _scrub(s: str) -> str:
    return re.sub(r"[^a-zA-Z0-9_]", "_", s).strip().lower()


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_scrub_idempotent(s):
    assert _scrub(_scrub(s)) == _scrub(s)


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_scrub_charset(s):
    assert re.fullmatch(r"[a-z0-9_]*", _scrub(s))


def test_reaction_hash_permutation_invariant(spark):
    """mini_stoich: permuted stoichiometry must collide; different must not."""
    from pyspark.sql import functions as F

    rows = [
        ("r1", 101, 2.0), ("r1", 202, -1.0),
        ("r2", 202, -1.0), ("r2", 101, 2.0),   # permutation of r1 -> same hash
        ("r3", 101, -2.0), ("r3", 202, 1.0),   # reversed signs -> different
    ]
    df = spark.createDataFrame(rows, "rxn string, met long, coef double")
    pair = F.concat_ws(":", F.col("met"), F.col("coef").cast("long"))
    sig = df.groupBy("rxn").agg(
        F.sha2(F.concat_ws(",", F.array_sort(F.collect_list(pair))), 256).alias("h")
    )
    h = dict((r.rxn, r.h) for r in sig.collect())
    assert h["r1"] == h["r2"]
    assert h["r1"] != h["r3"]


def test_znorm_known_values(spark):
    """SNIPPETS.md mini_kv frame: z-normalize expectations (FIXTURES §3)."""
    import pandas as pd

    df = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 3.0), (2, 5.0), (2, 10.0)], "id long, v double"
    )

    def znorm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["v"]
        return pd.DataFrame({"id": pdf["id"], "z": (v - v.mean()) / v.std(ddof=1)})

    out = df.groupBy("id").applyInPandas(znorm, "id long, z double")
    got = sorted((r.id, round(r.z, 4)) for r in out.collect())
    assert got == [
        (1, -0.7071), (1, 0.7071),
        (2, -0.8321), (2, -0.2774), (2, 1.1094),
    ]


def test_benford_constants_and_completeness(spark, sf_dir):
    """Benford ppm constants equal round(1e6*log10(1+1/d)) (recomputed
    here with math.log10 — the engines never evaluate a log), each
    metric covers all 9 digits exactly once, and ppm columns are
    internally consistent (obs sums to ~1e6, dev = |obs-exp|)."""
    import math

    from cobradb_spark import registry
    from cobradb_spark.queries.layout import _BENFORD_PPM

    for d, p in enumerate(_BENFORD_PPM, start=1):
        assert p == round(1_000_000 * math.log10(1 + 1 / d))

    rows = registry.get_query("profile_benford_deviation").fn(spark, sf_dir).collect()
    by_metric = {}
    for r in rows:
        by_metric.setdefault(r.metric, []).append(r)
        assert r.exp_ppm == _BENFORD_PPM[r.digit - 1]
        assert r.abs_dev_ppm == abs(r.obs_ppm - r.exp_ppm)
    for metric, rs in by_metric.items():
        assert sorted(r.digit for r in rs) == list(range(1, 10)), metric
        s = sum(r.obs_ppm for r in rs)
        assert 1_000_000 - 9 <= s <= 1_000_000  # truncating division undershoot


def test_global_prefix_sums_matches_sequential(spark):
    """Property: the distributed multi-column prefix sum equals the
    single-threaded prefix computation for random multisets, any
    partition count, including duplicate order keys (total order comes
    from the unique tiebreaker)."""
    import random

    from cobradb_spark.operators.rank import (
        global_prefix_sums,
        release_rank_caches,
    )
    from pyspark.sql import functions as F

    rng = random.Random(88)
    for trial, num_parts in [(0, 2), (1, 5), (2, 13)]:
        n = 80 + trial * 57
        rows = [
            (i, rng.randint(0, 9), rng.randint(0, 100), rng.randint(0, 5))
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "uid long, grp long, a long, b long")
        out = global_prefix_sums(
            df,
            [F.col("grp"), F.col("uid")],
            {"a": "pa", "b": "pb"},
            num_parts=num_parts,
        ).collect()
        release_rank_caches()
        ordered = sorted(rows, key=lambda r: (r[1], r[0]))
        want_a = want_b = 0
        expect = {}
        for uid, grp, a, b in ordered:
            expect[uid] = (want_a, want_b)
            want_a += a
            want_b += b
        for r in out:
            ea, eb = expect[r.uid]
            assert (r.pa, r.pb) == (ea, eb), (num_parts, r.uid)
