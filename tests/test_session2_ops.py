"""Behavioral contracts for the round-7 second-session operators —
properties the value-hash alone does not state explicitly (leakage
freedom, DBSCAN role invariants, keeper uniqueness, SRM direction)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cobradb_spark import registry

def test_pit_training_set_has_no_leakage(spark, sf_mid):
    """Point-in-time contract: an example's features must equal the
    user's event count/cents STRICTLY BEFORE the Monday of the
    purchase's week — recomputed here from raw events in Python."""
    out = registry.get_query("mlprep_pit_training_set").fn(spark, sf_mid).collect()
    ev = (
        spark.read.parquet(f"{sf_mid}/events.parquet")
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    ex = {r.event_id: r for r in ev}
    checked = 0
    for row in out[:300]:
        p = ex[row.event_id]
        monday = (p.ts - dt.timedelta(days=p.ts.weekday())).replace(
            hour=0, minute=0, second=0, microsecond=0
        )
        past = [e for e in by_user[row.user_id] if e.ts < monday]
        assert row.feat_n_events == len(past), row
        want_cents = sum(int(e.value * 100.0 + 0.5) for e in past)
        assert row.feat_cents == want_cents, row
        checked += 1
    assert checked > 50


def test_dbscan_role_invariants(spark, sf_mid):
    out = registry.get_query("geo_dbscan_grid").fn(spark, sf_mid).collect()
    roles = {r.role for r in out}
    assert roles == {"core", "border", "noise"}
    for r in out:
        if r.role == "core":
            assert r.n_in_eps >= 4 and r.cluster_id >= 0
        elif r.role == "border":
            assert r.n_in_eps < 4 and r.cluster_id >= 0
        else:
            assert r.cluster_id == -1
    # every non-noise cluster contains at least one core, and its id is
    # the minimum core key (the order-independence contract)
    by_cluster: dict[int, list] = {}
    for r in out:
        if r.cluster_id >= 0:
            by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        cores = [m.id for m in members if m.role == "core"]
        assert cores, cid
        assert min(cores) == cid


def test_keep_best_exactly_one_keeper_per_cluster(spark, sf_mid):
    out = registry.get_query("dedup_near_cluster_keep_best").fn(spark, sf_mid).collect()
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert any(len(m) >= 3 for m in by_cluster.values())  # real clusters exist
    for cid, members in by_cluster.items():
        keepers = [m for m in members if m.is_keeper]
        assert len(keepers) == 1, cid
        assert all(m.cluster_size == len(members) for m in members)
        # quality rule: a base doc can never be keeper while its own
        # strictly-longer mutation sits in the same cluster (two distinct
        # base docs MAY cluster and the longer base may win — that's fine)
        ids = {m.doc_id for m in members}
        k = keepers[0].doc_id
        if k < 1_000_000 and (k + 1_000_000 in ids or k + 2_000_000 in ids):
            raise AssertionError(f"base {k} kept over its longer mutation in {cid}")


def test_srm_detects_broken_split_not_fair_one(spark, sf_mid):
    out = {
        r.experiment: r
        for r in registry.get_query("analytics_experiment_srm_check")
        .fn(spark, sf_mid)
        .collect()
    }
    assert out["exp_bad"].srm_detected is True
    assert out["exp_fair"].srm_detected is False
    # the statistic orders with imbalance severity
    assert out["exp_bad"].chi2_ppm > out["exp_mild"].chi2_ppm


def test_bollinger_flags_match_float_reference(spark, sf_mid):
    """The integer cross-multiplied band test must agree with the
    naive float mean/σ formulation (no boundary drift)."""
    rows = registry.get_query("win_bollinger_bands").fn(spark, sf_mid)
    daily = rows.select("priority", "day", "cents").collect()
    series: dict[str, list] = {}
    for r in sorted(daily, key=lambda x: (x.priority, x.day)):
        series.setdefault(r.priority, []).append((r.day, r.cents))
    flags = {(r.priority, r.day): (r.brk_up, r.brk_dn) for r in rows.collect()}
    import statistics

    checked = 0
    for prio, pts in series.items():
        # rows only contain full frames; rebuild frames over the emitted
        # grid (suffices: emitted days are consecutive grid rows)
        for i in range(19, len(pts)):
            win = [c for _, c in pts[i - 19 : i + 1]]
            if len(win) < 20:
                continue
            mu = statistics.fmean(win)
            sd = statistics.pstdev(win)
            x = pts[i][1]
            up, dn = flags[(prio, pts[i][0])]
            assert up == (x - mu > 2 * sd) or abs(x - mu) - 2 * sd < 1e-6
            assert dn == (mu - x > 2 * sd) or abs(x - mu) - 2 * sd < 1e-6
            checked += 1
    assert checked > 100
