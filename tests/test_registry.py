"""Registry integrity: the driver contract surface."""

from __future__ import annotations

import re

from cobradb_spark import registry

ALLOWED_TABLES = {
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
}

# FROM/JOIN targets in oracle SQL that are not CTE names must be testdata
# views.  "(?<!DISTINCT )" skips the comparison operator "IS [NOT]
# DISTINCT FROM <operand>", whose right side is a column, not a table.
_FROM_RE = re.compile(r"\b(?<!DISTINCT )(?:FROM|JOIN)\s+([a-zA-Z_][a-zA-Z0-9_]*)", re.IGNORECASE)
_CTE_RE = re.compile(
    r"\b([a-zA-Z_][a-zA-Z0-9_]*)\s*(?:\([a-zA-Z0-9_,\s]*\))?\s+AS\s*(?:MATERIALIZED\s*)?\(",
    re.IGNORECASE
)


def test_registry_nonempty_and_unique():
    qs = registry.all_queries()
    assert len(qs) >= 60
    assert all(q.fn is not None for q in qs.values())


def test_oracles_reference_only_preregistered_views():
    for name, q in registry.all_queries().items():
        if q.oracle is None:
            continue
        ctes = {m.lower() for m in _CTE_RE.findall(q.oracle)}
        for tbl in _FROM_RE.findall(q.oracle):
            t = tbl.lower()
            # 'null' arises from "IS NOT DISTINCT FROM NULL" phrasing
            if t in ctes or t in {"unnest", "lateral", "read_parquet", "null", "timestamp"}:
                continue
            assert t in ALLOWED_TABLES, f"{name}: oracle references unknown table {t}"


def test_entry_contract_shapes():
    import __spark_entry__ as E

    qmap, omap = E.queries(), E.oracle_sql()
    assert set(omap) <= set(qmap)
    assert len(qmap) >= 60


def test_driver_window_keys_are_oracle_carrying():
    """The correctness driver hash-checks the FIRST 50 queries() entries;
    a rows-only or unregistered key in that window wastes a driver row
    (r3 verdict: rotation is part of the verification contract).  The
    r11 window leads with every never-driver-checked oracle-carrying
    key (r10 VERDICT item 1), then the sim_ann_lsh_graded stale-row
    refresh, the streaming I1-I8 refresh (item 10), and the oldest
    (r2/r3) surviving evidence (item 2).  The past-window tail holds
    only rows-only keys — zero-cost under a 50-row window."""
    from cobradb_spark import registry

    qs = registry.all_queries()
    window = list(qs)[:50]
    assert window == list(registry._DRIVER_PRIORITY)[:50], (
        "driver window must be exactly the first 50 of the rotated priority list"
    )
    for name in window:
        assert qs[name].oracle is not None, f"{name} in driver window without oracle"
    # never-checked drain leads; the last r2-refresh key closes the
    # 50-slot window (nine oldest-r3 refreshes were displaced to
    # _R12_REFRESH as r11-new codec keys took slots)
    assert window[: len(registry._R11_PLANNED_HEAD)] == list(
        registry._R11_PLANNED_HEAD
    )
    assert window[-1] == "project_compute"
    # past-window tail: only the documented rows-only refresh entries
    tail = list(registry._DRIVER_PRIORITY)[50:]
    assert tail == ["sim_ann_lsh", "sim_ann_ivf_hi", "sim_ann_ivf_pq_hi"]
    for name in tail:
        assert qs[name].oracle is None, f"{name} in rows-only tail HAS an oracle"


def _driver_checked_keys():
    """Union of keys with any driver row across CORRECTNESS_r*.json."""
    import json
    from pathlib import Path

    checked: set[str] = set()
    for p in sorted(Path(__file__).resolve().parent.parent.glob("CORRECTNESS_r*.json")):
        checked.update(json.loads(p.read_text()))
    return checked


def test_r11_window_zeroes_never_checked_and_r12_is_staged():
    """r10 VERDICT item 1: after the r11 window runs, EVERY
    oracle-carrying key must have a driver hash row — recomputed from
    the CORRECTNESS_r*.json artifacts plus the staged window, so
    neither new keys nor re-shuffles can silently drop a key from the
    drain path.  (Keys added during r11 must be appended to
    _R11_PLANNED_HEAD AND placed in the window; this test fails if
    they aren't.)"""
    from cobradb_spark import registry

    qs = registry.all_queries()
    staged = list(registry._R11_PLANNED_HEAD)
    assert len(staged) == len(set(staged)), "duplicate keys in r11 drain list"
    missing = [n for n in staged if n not in qs]
    assert not missing, f"staged r11 names not registered: {missing}"

    checked = _driver_checked_keys()
    window = list(registry._DRIVER_PRIORITY)[:50]
    assert len(set(window)) == 50, "duplicate keys in the driver window"
    never_checked = {
        n for n, q in qs.items() if q.oracle is not None and n not in checked
    }
    # the drain list IS the never-checked set, and all of it is in-window
    assert set(staged) == never_checked, (
        f"drain drift: missing={sorted(never_checked - set(staged))} "
        f"extra={sorted(set(staged) - never_checked)}"
    )
    assert never_checked <= set(window), (
        f"never-checked keys outside the r11 window: "
        f"{sorted(never_checked - set(window))}"
    )
    # refresh slots must already HAVE driver rows (they re-run, they
    # don't drain the backlog) — both in-window and staged for r12
    for n in window:
        if n not in never_checked:
            assert n in checked, f"window refresh key {n} has no prior driver row"
    r12 = list(registry._R12_REFRESH)
    assert len(r12) == len(set(r12)), "duplicate keys in r12 staging"
    for n in r12:
        assert n in qs, f"r12 refresh key {n} not registered"
        assert n in checked, f"r12 refresh key {n} has no prior driver row"
        assert n not in window, f"r12 refresh key {n} already in the r11 window"
    # nothing stale is forgotten: every key whose latest evidence is
    # r2/r3 is either in this window or staged for r12
    import json
    from pathlib import Path

    latest: dict[str, int] = {}
    for p in sorted(Path(__file__).resolve().parent.parent.glob("CORRECTNESS_r*.json")):
        rnd = int(p.stem.split("_r")[1])
        for k in json.loads(p.read_text()):
            latest[k] = rnd
    stale = {k for k, r in latest.items() if r <= 3 and k in qs}
    uncovered = stale - set(window) - set(r12)
    assert not uncovered, f"stale r2/r3 keys neither in window nor r12: {sorted(uncovered)}"
