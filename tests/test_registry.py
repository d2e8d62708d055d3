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
    (r3 verdict: rotation is part of the verification contract).  The r8
    window deliberately closes with the four rows-only ANN keys — the
    only registered keys that can never carry an oracle — so exactly
    that tail is allowed."""
    from cobradb_spark import registry

    qs = registry.all_queries()
    window = list(qs)[:50]
    assert window == list(registry._DRIVER_PRIORITY), (
        "driver window must be exactly the rotated priority list"
    )
    ann_tail = ["dedup_minhash_near", "sim_ann_lsh", "sim_ann_ivf", "sim_ann_ivf_pq"]
    assert window[-4:] == ann_tail, "rows-only ANN keys must close the window"
    for name in window[:-4]:
        assert qs[name].oracle is not None, f"{name} in driver window without oracle"
    # the two r7 hash-mismatch keys lead the window (re-verification first)
    assert window[:2] == ["win_max_drawdown", "text_vocab_coverage"]


def test_r9_planned_window_names_are_registered():
    """The staged next-round rotation list must not rot: every name in
    _R9_PLANNED_HEAD exists in the registry, is oracle-carrying, fills
    exactly one 50-slot driver window, and none are already in the
    executed r8 window (they'd waste a driver slot twice)."""
    from cobradb_spark import registry

    qs = registry.all_queries()
    assert len(registry._R9_PLANNED_HEAD) == 50
    missing = [n for n in registry._R9_PLANNED_HEAD if n not in qs]
    assert not missing, f"planned r9 names not registered: {missing}"
    for n in registry._R9_PLANNED_HEAD:
        assert qs[n].oracle is not None, f"{n} staged without oracle"
    overlap = set(registry._R9_PLANNED_HEAD) & set(registry._DRIVER_PRIORITY)
    assert not overlap, f"planned r9 keys already in the r8 window: {overlap}"


def test_r10_queue_names_are_registered_and_new():
    """The r10 backlog must not rot: every name registered,
    oracle-carrying, and in neither the executed r8 window nor the
    staged r9 window.  Together the three lists must cover every key
    that still lacks driver-hash evidence."""
    from cobradb_spark import registry

    qs = registry.all_queries()
    missing = [n for n in registry._R10_QUEUE if n not in qs]
    assert not missing, f"queued r10 names not registered: {missing}"
    for n in registry._R10_QUEUE:
        assert qs[n].oracle is not None, f"{n} queued without oracle"
    taken = set(registry._DRIVER_PRIORITY) | set(registry._R9_PLANNED_HEAD)
    overlap = set(registry._R10_QUEUE) & taken
    assert not overlap, f"r10-queued keys already windowed: {overlap}"
