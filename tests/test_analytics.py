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
