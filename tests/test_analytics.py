"""Semantic edge cases for the event-analytics operators
(queries/analytics.py) on crafted in-memory frames — the oracle gate
(tools/check.py) proves parity on the fixture tables; these pin the
boundary behaviors a hash-match can silently get wrong together.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60, second)


def _sessionize(spark, rows):
    """Run the same lag/running-sum chain as sessionize_events on crafted rows."""
    from pyspark.sql import Window

    e = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, value double")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    sess = e.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    ).withColumn(
        "session_no", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return {r["event_id"]: r["session_no"] for r in sess.collect()}


def test_session_gap_boundary_is_strict(spark):
    """A gap of exactly 30:00 stays in-session; 30:01 starts a new one."""
    got = _sessionize(
        spark,
        [
            (1, _ts(0), 1, 1.0),
            (1, _ts(30), 2, 1.0),          # exactly 1800s after e1 -> same session
            (1, _ts(60, 1), 3, 1.0),       # 1801s after e2 -> new session
        ],
    )
    assert got[1] == got[2] == 1 and got[3] == 2


def test_session_numbering_is_per_user(spark):
    got = _sessionize(spark, [(1, _ts(0), 1, 1.0), (2, _ts(0), 2, 1.0)])
    assert got[1] == 1 and got[2] == 1


def test_funnel_requires_strict_event_order(spark, sf_dir):
    """A user whose only purchase precedes their first qualifying click must
    not count in the purchase stage (and mutatis mutandis for clicks)."""
    from cobradb_spark.registry import all_queries

    rows = all_queries()["funnel_conversion"].fn(spark, sf_dir).collect()
    users = {r["stage"]: r["users"] for r in rows}
    assert users["view"] >= users["click"] >= users["purchase"]
    assert set(users) == {"view", "click", "purchase"}


def test_decontam_eval_docs_excluded_and_bounds(spark, sf_dir):
    from cobradb_spark.registry import all_queries

    rows = all_queries()["decontam_ngram_overlap"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["doc_id"] % 50 != 0, "eval docs must not be scored"
        assert 0.2 <= r["overlap"] <= 1.0
        assert r["n_hit"] <= r["n_grams"]


def test_anomaly_needs_history(spark, sf_dir):
    """No z-score may be emitted for the first 3 days of a type's history."""
    from cobradb_spark.registry import all_queries

    rows = all_queries()["events_anomaly_zscore"].fn(spark, sf_dir).collect()
    assert rows, "fixture should surface at least one anomaly"
    by_type_min_day = {}
    for r in rows:
        by_type_min_day.setdefault(r["event_type"], []).append(r["day"])
    # global min day (2024-01-01) can never satisfy n_hist >= 3
    for days in by_type_min_day.values():
        assert min(days) >= dt.datetime(2024, 1, 4)


def test_cuped_theta_and_adjustment_match_numpy(spark, sf_dir):
    """analytics_ab_cuped pins: theta_ppm equals the numpy cov/var ratio
    (ppm-truncated), the adjusted means equal the replayed CUPED formula,
    and CUPED genuinely reduces the between-arm pre-period imbalance's
    contribution (|mean_y_cuped spread| <= |mean_y spread| when arms are
    imbalanced on X, which hashed arms are at small n)."""
    import hashlib

    import numpy as np

    from cobradb_spark import registry

    out = {r.arm: r for r in registry.get_query("analytics_ab_cuped").fn(spark, sf_dir).collect()}
    assert set(out) == {"control", "treatment"}

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    split = np.datetime64("1998-01-01")
    per = {}
    for r in orders:
        cents = int(np.round(r.o_totalprice * 100))
        x, y = per.setdefault(r.o_custkey, [0, 0])
        if np.datetime64(r.o_orderdate) < split:
            per[r.o_custkey][0] = x + cents
        else:
            per[r.o_custkey][1] = y + cents
    xs = np.array([v[0] for v in per.values()], dtype=np.float64)
    ys = np.array([v[1] for v in per.values()], dtype=np.float64)
    n = len(per)
    num = n * float((xs * ys).sum()) - xs.sum() * ys.sum()
    den = n * float((xs * xs).sum()) - xs.sum() ** 2
    got_theta = out["control"].theta_ppm
    assert abs(got_theta - 1e6 * num / den) <= 2  # ppm truncation slack

    arms = {
        c: "control"
        if int(hashlib.md5(f"cuped{c}".encode()).hexdigest()[:15], 16) % 2 == 0
        else "treatment"
        for c in per
    }
    mean_x_all = xs.sum() / n / 100.0
    for arm in ("control", "treatment"):
        sel = [c for c in per if arms[c] == arm]
        assert out[arm].n_units == len(sel)
        my = sum(per[c][1] for c in sel) / len(sel) / 100.0
        mx = sum(per[c][0] for c in sel) / len(sel) / 100.0
        assert abs(out[arm].mean_y - my) < 1e-6 * max(1.0, abs(my))
        adj = my - (got_theta / 1e6) * (mx - mean_x_all)
        assert abs(out[arm].mean_y_cuped - adj) < 1e-6 * max(1.0, abs(adj))

    # pre/post spend are positively correlated, so theta must be
    # positive and bounded by a plausible regression slope.  (No
    # assertion on the realized between-arm gap: CUPED reduces the
    # ESTIMATOR's variance in expectation; any single realization's
    # adjusted gap can exceed the raw gap.)
    assert 0 < got_theta < 5_000_000


def test_km_curve_properties_and_replay(spark, sf_dir):
    """Kaplan-Meier pins: surv_ppm is non-increasing and in (0, 1e6];
    n_risk strictly decreases across emitted event times; a pure-Python
    replay from the raw orders table reproduces every row exactly."""
    from cobradb_spark import registry

    rows = sorted(
        registry.get_query("analytics_survival_km").fn(spark, sf_dir).collect(),
        key=lambda r: r.t_days,
    )
    assert rows
    last_s, last_n = 1_000_000, None
    for r in rows:
        assert 0 < r.surv_ppm <= last_s
        assert r.d_events > 0
        if last_n is not None:
            assert r.n_risk < last_n
        last_s, last_n = r.surv_ppm, r.n_risk

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderdate"
    ).collect()
    per = {}
    for r in orders:
        f, l = per.get(r.o_custkey, (r.o_orderdate, r.o_orderdate))
        per[r.o_custkey] = (min(f, r.o_orderdate), max(l, r.o_orderdate))
    study_end = max(l for _, l in per.values())
    grid = {}
    for f, l in per.values():
        churned = (study_end - l).days > 365
        dur = (l - f).days if churned else (study_end - f).days
        d, c = grid.get(dur, (0, 0))
        grid[dur] = (d + churned, c + (not churned))
    s, at_risk = 1_000_000, len(per)
    expect = []
    for t in sorted(grid):
        d, c = grid[t]
        if d > 0:
            s = s * (at_risk - d) // at_risk
            expect.append((t, at_risk, d, c, s))
        at_risk -= d + c
    got = [(r.t_days, r.n_risk, r.d_events, r.c_censored, r.surv_ppm) for r in rows]
    assert got == expect


def test_ratio_delta_ci_matches_numpy(spark, sf_dir):
    """Delta-method pins: ratio/se/CI per arm equal the numpy replay of
    the cluster-level linearization, and the CI actually brackets the
    point estimate with positive width."""
    import hashlib

    import numpy as np

    from cobradb_spark import registry

    out = {r.arm: r for r in
           registry.get_query("analytics_ratio_delta_ci").fn(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_totalprice"
    ).collect()
    per = {}
    for r in orders:
        n, y = per.get(r.o_custkey, (0, 0))
        per[r.o_custkey] = (n + 1, y + int(np.floor(r.o_totalprice)))
    for arm in ("control", "treatment"):
        sel = [
            per[c] for c in per
            if (int(hashlib.md5(f"cuped{c}".encode()).hexdigest()[:15], 16) % 2 == 0)
            == (arm == "control")
        ]
        ns = np.array([s[0] for s in sel], dtype=np.float64)
        ys = np.array([s[1] for s in sel], dtype=np.float64)
        nu = len(sel)
        ratio = ys.sum() / ns.sum()
        vy, vn = ys.var(ddof=1), ns.var(ddof=1)
        cyn = np.cov(ys, ns, ddof=1)[0, 1]
        se = np.sqrt((vy + ratio**2 * vn - 2 * ratio * cyn) / nu) / ns.mean()
        r = out[arm]
        assert r.n_units == nu
        assert abs(r.ratio - ratio) < 1e-9 * ratio
        assert abs(r.se - se) < 1e-6 * se
        assert r.ci_lo < r.ratio < r.ci_hi
        assert abs((r.ci_hi - r.ci_lo) - 2 * 1.96 * r.se) < 1e-9


def test_markov_transitions_python_replay(spark, sf_dir):
    """Replay the transition matrix in pure Python: per-user streams
    ordered by (ts, event_id), corpus-wide (prev, next) counts, floor-div
    ppm probabilities."""
    from collections import defaultdict

    from cobradb_spark.io import load_table
    from cobradb_spark.registry import get_query

    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams = defaultdict(list)
    for r in rows:
        streams[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    counts = defaultdict(int)
    for s in streams.values():
        s.sort(key=lambda x: (x[0], x[1]))
        for (_, _, a), (_, _, b) in zip(s, s[1:]):
            counts[(a, b)] += 1
    totals = defaultdict(int)
    for (a, _), n in counts.items():
        totals[a] += n
    expect = {
        (a, b): (n, n * 1000000 // totals[a]) for (a, b), n in counts.items()
    }
    got = {
        (r["prev_type"], r["next_type"]): (r["n"], r["p_ppm"])
        for r in get_query("analytics_markov_transitions").fn(spark, sf_dir).collect()
    }
    assert got == expect
    # probabilities per prev row must sum to ~1e6 (floor-div remainder < types)
    by_prev = defaultdict(int)
    for (a, _), (_, p) in got.items():
        by_prev[a] += p
    for a, tot in by_prev.items():
        assert 1000000 - len([1 for (x, _) in got if x == a]) < tot <= 1000000


def test_forecast_backtest_python_replay(spark, sf_dir):
    """Replay the seasonal-naive backtest in pure Python: daily cent
    grid, last-7-rank holdout, |y_t - y_{t-7}| holdout errors,
    |y_t - y_{t-1}| train scale, truncating-division MASE ppm."""
    from collections import defaultdict

    from cobradb_spark.io import load_table
    from cobradb_spark.registry import get_query

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "ts", "value")
        .collect()
    )
    grid = defaultdict(lambda: defaultdict(int))
    for r in rows:
        day = r["ts"].date()
        # round-half-even like both engines' round(value * 100)
        grid[r["event_type"]][day] += round(r["value"] * 100)
    expect = {}
    for et, days in grid.items():
        y = [c for _, c in sorted(days.items())]
        n = len(y)
        sae = sum(abs(y[t] - y[t - 7]) for t in range(n - 7, n))
        scale = sum(abs(y[t] - y[t - 1]) for t in range(1, n - 7))
        n_scale = n - 8
        expect[et] = (
            n, 7, sae, scale, (sae * n_scale * 1000000) // (7 * scale)
        )
    got = {
        r["event_type"]: (
            r["n_days"], r["n_holdout"], r["sae_cents"], r["scale_cents"],
            r["mase_ppm"],
        )
        for r in get_query("events_forecast_backtest").fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_median_exact_pergroup_matches_numpy(spark, sf_dir):
    """The rank-selected per-group median must equal numpy's exact
    median of the same values (linear-interpolation midpoint)."""
    import numpy as np

    from cobradb_spark.io import load_table
    from cobradb_spark.registry import get_query

    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_extendedprice")
        .collect()
    )
    groups = {}
    for r in rows:
        groups.setdefault(f"{r[0]}/{r[1]}", []).append(r[2])
    got = {
        r["grp"]: (r["n_rows"], r["median"])
        for r in get_query("agg_median_exact_pergroup").fn(spark, sf_dir).collect()
    }
    assert set(got) == set(groups)
    for g, vals in groups.items():
        n, med = got[g]
        assert n == len(vals)
        assert med == float(np.median(np.array(vals)))


def test_top_paths_python_replay(spark, sf_dir):
    """Replay depth-3 path counting in pure Python on (ts, event_id)-
    ordered user streams; the top-20 must match with the (n desc, path)
    tie-break."""
    from collections import Counter, defaultdict

    from cobradb_spark.io import load_table
    from cobradb_spark.registry import get_query

    streams = defaultdict(list)
    for r in (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    ):
        streams[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    counts = Counter()
    for s in streams.values():
        s.sort(key=lambda x: (x[0], x[1]))
        types = [t for _, _, t in s]
        for a, b, c in zip(types, types[1:], types[2:]):
            counts[f"{a} > {b} > {c}"] += 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["path"], r["n"])
        for r in get_query("analytics_top_paths").fn(spark, sf_dir).collect()
    ]
    assert got == expect


def test_stickiness_dau_mau_matches_python_replay(spark, sf_dir):
    """DAU/MAU from first principles on the raw events; the presence-
    explode MAU must equal the naive trailing-30-day distinct count."""
    from collections import defaultdict

    from cobradb_spark import registry

    rows = (
        registry.get_query("analytics_stickiness_dau_mau")
        .fn(spark, sf_dir)
        .collect()
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts"
    ).collect()
    by_day = defaultdict(set)
    for r in ev:
        by_day[r.ts.date()].add(r.user_id)
    days = sorted(by_day)
    got = {r.day.date(): r for r in rows}
    assert set(got) == set(days)
    for d in days:
        dau = len(by_day[d])
        mau_set = set()
        for d2 in days:
            if 0 <= (d - d2).days <= 29:
                mau_set |= by_day[d2]
        r = got[d]
        assert r.dau == dau
        assert r.mau == len(mau_set)
        assert r.stickiness == pytest.approx(dau / len(mau_set), abs=1e-6)
        assert r.dau <= r.mau
