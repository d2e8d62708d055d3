"""Property-based tests: the composed joins vs brute-force references on
randomized micro-data (hypothesis drives the shapes; Spark runs once per
example set, so examples are kept small and batched)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cobradb_spark.operators.asof import asof_join_backward
from cobradb_spark.operators.interval import interval_point_join


def test_interval_join_matches_bruteforce_random(spark):
    rng = random.Random(42)
    for trial in range(3):
        ivs = [
            (i, lo, lo + rng.randint(0, 40))
            for i, lo in enumerate(rng.randint(-100, 100) for _ in range(30))
        ]
        pts = [(j, rng.randint(-120, 120)) for j in range(60)]
        expected = {
            (i, j) for i, lo, hi in ivs for j, p in pts if lo <= p <= hi
        }
        iv_df = spark.createDataFrame(ivs, "iv_id long, lo long, hi long")
        pt_df = spark.createDataFrame(pts, "pt_id long, p long")
        bin_width = rng.choice([1, 7, 40, 100])
        got = {
            (r.iv_id, r.pt_id)
            for r in interval_point_join(
                iv_df, pt_df, "lo", "hi", "p", bin_width=bin_width
            ).collect()
        }
        assert got == expected, f"trial {trial} bin_width {bin_width}"


def test_asof_matches_bruteforce_random(spark):
    rng = random.Random(7)
    lefts = [(rng.randint(0, 3), rng.randint(0, 100), i) for i in range(40)]
    rights = [(rng.randint(0, 3), rng.randint(0, 100), 1000 + i) for i in range(40)]
    # unique (by, on) per side keeps the expected answer well-defined
    lefts = list({(b, o): (b, o, i) for b, o, i in lefts}.values())
    rights = list({(b, o): (b, o, i) for b, o, i in rights}.values())
    l_df = spark.createDataFrame(lefts, "by long, on long, lid long")
    r_df = spark.createDataFrame(
        [(b, o, o) for b, o, _ in rights], "by long, on long, rv long"
    )
    out = asof_join_backward(l_df, r_df, on="on", by="by", right_value_cols=["rv"])
    got = {(r.by, r.on): r.rv for r in out.collect()}
    for b, o, _ in lefts:
        cand = [ro for rb, ro, _ in rights if rb == b and ro <= o]
        expected = max(cand) if cand else None
        assert got[(b, o)] == expected, f"by={b} on={o}"


def test_rows_only_variants_sane(spark, sf_dir):
    """agg_stats_higher / date_months_between / udaf_pandas_gmean: the
    in-test semantic oracles for the declared rows-only ops."""
    import math

    from cobradb_spark import registry

    # gmean == exp(avg(ln)) computed natively
    got = {
        r.l_returnflag: r.gmean_qty
        for r in registry.get_query("udaf_pandas_gmean").fn(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ref = {
        r.l_returnflag: round(math.exp(r.m), 6)
        for r in li.groupBy("l_returnflag")
        .agg(F.avg(F.log("l_quantity")).alias("m"))
        .collect()
    }
    for k in ref:
        assert abs(got[k] - ref[k]) < 1e-4

    # months_between: identity and monotonicity
    mb = registry.get_query("date_months_between").fn(spark, sf_dir)
    assert mb.filter(F.col("months_to_1998").isNull()).count() == 0

    # skew/kurt exist and are finite
    for r in registry.get_query("agg_stats_higher").fn(spark, sf_dir).collect():
        assert r.skew_qty is not None and r.kurt_qty is not None


def test_interval_overlap_join_matches_bruteforce_random(spark):
    """Binned overlap join (first-shared-bin dedup) == brute-force theta
    join: every true overlapping pair appears EXACTLY once, across bin
    widths smaller and larger than typical interval length."""
    from cobradb_spark.operators.interval import interval_overlap_join

    rng = random.Random(11)
    ivs_a = [(i, lo, lo + rng.randint(0, 30)) for i, lo in enumerate(rng.randint(-100, 100) for _ in range(40))]
    ivs_b = [(j, lo, lo + rng.randint(0, 30)) for j, lo in enumerate(rng.randint(-100, 100) for _ in range(40))]
    a = spark.createDataFrame(ivs_a, "a_id long, a_lo long, a_hi long")
    b = spark.createDataFrame(ivs_b, "b_id long, b_lo long, b_hi long")
    want = {
        (i, j)
        for i, alo, ahi in ivs_a
        for j, blo, bhi in ivs_b
        if alo <= bhi and blo <= ahi
    }
    for bw in (7, 64):
        got = [
            (r.a_id, r.b_id)
            for r in interval_overlap_join(
                a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=bw
            ).collect()
        ]
        assert len(got) == len(set(got)), f"bw={bw}: duplicate pairs emitted"
        assert set(got) == want, f"bw={bw}: pair set mismatch"


def test_fuzzy_blocked_matches_bruteforce_random_strings(spark, tmp_path):
    """join_fuzzy_blocked's adaptive-boundary PassJoin must equal the
    brute-force theta join on irregular data: random strings, multiple
    length classes, heavy shared-substring overlap (small alphabet) —
    the losslessness claim is split-independent, so it must survive any
    boundary the sampled-collision DP picks."""
    import random

    rng = random.Random(11)
    alpha = "ab0"
    sup = [(i, "".join(rng.choice(alpha) for _ in range(rng.choice([7, 9, 12]))))
           for i in range(60)]
    cus = [(i, "".join(rng.choice(alpha) for _ in range(rng.choice([7, 8, 9, 12, 13]))))
           for i in range(120)]
    spark.createDataFrame(sup, "s_suppkey long, s_name string").write.mode(
        "overwrite").parquet(str(tmp_path / "supplier.parquet"))
    spark.createDataFrame(cus, "c_custkey long, c_name string").write.mode(
        "overwrite").parquet(str(tmp_path / "customer.parquet"))

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    expected = {
        (sk, ck, lev(sn, cn))
        for sk, sn in sup for ck, cn in cus if lev(sn, cn) <= 6
    }
    from cobradb_spark.queries.joins import join_fuzzy_blocked

    got = {
        (r["s_suppkey"], r["c_custkey"], r["dist"])
        for r in join_fuzzy_blocked(spark, str(tmp_path)).collect()
    }
    assert got == expected


def test_fuzzy_segment_boundaries_partition_invariants(spark, tmp_path):
    """Boundaries must exactly tile [1..L] with 7 non-empty contiguous
    segments per length class, cover every index-side length class, and
    be identical across calls (deterministic sampling + DP)."""
    import random

    rng = random.Random(3)
    sup = [(i, "".join(rng.choice("xyz9") for _ in range(rng.choice([8, 11, 19]))))
           for i in range(80)]
    cus = [(i, "".join(rng.choice("xyz9") for _ in range(rng.choice([8, 12, 19]))))
           for i in range(200)]
    spark.createDataFrame(sup, "s_suppkey long, s_name string").write.mode(
        "overwrite").parquet(str(tmp_path / "supplier.parquet"))
    spark.createDataFrame(cus, "c_custkey long, c_name string").write.mode(
        "overwrite").parquet(str(tmp_path / "customer.parquet"))
    from cobradb_spark.io import load_tables
    from cobradb_spark.queries.joins import _fuzzy_segment_boundaries

    s, c = load_tables(spark, str(tmp_path), "supplier", "customer")
    rows1 = _fuzzy_segment_boundaries(s, c, 6, 7)
    rows2 = _fuzzy_segment_boundaries(s, c, 6, 7)
    assert rows1 == rows2  # deterministic

    by_ls = {}
    for ls, seg_i, st, ln in rows1:
        by_ls.setdefault(ls, []).append((seg_i, st, ln))
    assert set(by_ls) == {8, 11, 19}  # every index length class covered
    for ls, segs in by_ls.items():
        segs.sort()
        assert [i for i, _, _ in segs] == list(range(7))
        nxt = 1
        for _, st, ln in segs:
            assert st == nxt and ln >= 1
            nxt = st + ln
        assert nxt == ls + 1  # exact tiling of [1..ls]


def test_asof_nearest_is_true_argmin(spark, sf_dir):
    """Brute-force at sf0.001: for every purchase the matched candidate
    is the true min-|delta| view/click of that user, ties backward."""
    from pyspark.sql import functions as F

    from cobradb_spark.io import load_table
    from cobradb_spark.registry import get_query

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view", "click"))
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    cands = {}
    probes = []
    for r in ev:
        if r["event_type"] == "purchase":
            probes.append(r)
        else:
            cands.setdefault(r["user_id"], []).append(r)
    got = {
        r["purchase_id"]: (r["nearest_id"], r["delta_us"])
        for r in get_query("join_asof_nearest").fn(spark, sf_dir).collect()
    }
    n_checked = 0
    for p in probes:
        cs = cands.get(p["user_id"], [])
        if not cs:
            assert p["event_id"] not in got
            continue
        best = None
        for c in cs:
            from datetime import timedelta

            d_us = (c["ts"] - p["ts"]) // timedelta(microseconds=1)
            backward = d_us <= 0
            key = (abs(d_us), 0 if backward else 1, c["event_id"])
            if best is None or key < best[0]:
                best = (key, c["event_id"], abs(d_us))
        assert got[p["event_id"]] == (best[1], best[2]), p["event_id"]
        n_checked += 1
    assert n_checked > 50


def test_pit_scd2_exactly_one_version_per_fact(spark, sf_dir):
    """PIT contract: half-open [start_day, end_day) version ranges
    partition the timeline, so every order matches EXACTLY one dimension
    version, the matched range really covers the order date, and the
    physical join is an equi-hash join on the key (range only as
    residual — never a nested-loop range join)."""
    from cobradb_spark import registry

    q = registry.get_query("join_point_in_time_scd2").fn
    df = q(spark, sf_dir)
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert df.count() == n_orders  # one match per fact, none dropped
    assert df.select("o_orderkey").distinct().count() == n_orders

    for r in df.limit(200).collect():
        period = 400 + r.o_custkey % 200
        k = 1 + r.o_custkey % 3
        assert 0 <= r.version < k
        start = r.version * period
        assert start <= r.order_day
        if r.version < k - 1:
            assert r.order_day < (r.version + 1) * period

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashJoin" in plan and "NestedLoop" not in plan


def test_asof_forward_ties_and_replay(spark):
    """Forward as-of: earliest right row with on >= left.on; a right row
    at EXACTLY left.on must qualify (micro-fixture), and the operator
    must match a python replay on a small randomized frame."""
    from pyspark.sql import functions as F

    from cobradb_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (2, 15, 102)], "u long, t long, lid long"
    ).select("lid", "u", F.col("t").alias("on"))
    right = spark.createDataFrame(
        [(1, 10, 7), (1, 25, 8), (2, 14, 9)], "u long, t long, v long"
    ).select("u", F.col("t").alias("on"), "v")
    out = {
        r.lid: r.v
        for r in asof_join_forward(
            left, right, on="on", by="u", right_value_cols=["v"]
        ).collect()
    }
    # lid=100: right at exactly t=10 qualifies; lid=101: next is t=25;
    # lid=102: right at t=14 is BEFORE t=15 -> no forward match
    assert out == {100: 7, 101: 8, 102: None}

    import random

    rng = random.Random(13)
    L = [(u, rng.randrange(0, 50), i) for i, u in enumerate(
        rng.choices(range(4), k=40))]
    R = [(u, rng.randrange(0, 50), 1000 + i) for i, u in enumerate(
        rng.choices(range(4), k=40))]
    # unique (u, t) on the right so the earliest-match value is well-defined
    seen = set()
    R = [r for r in R if not (r[:2] in seen or seen.add(r[:2]))]
    lf = spark.createDataFrame(L, "u long, on long, lid long")
    rf = spark.createDataFrame(R, "u long, on long, v long")
    got = {
        r.lid: r.v
        for r in asof_join_forward(
            lf, rf, on="on", by="u", right_value_cols=["v"]
        ).collect()
    }
    for u, t, lid in L:
        cands = [(rt, v) for (ru, rt, v) in R if ru == u and rt >= t]
        want = min(cands)[1] if cands else None
        assert got[lid] == want, (lid, got[lid], want)
