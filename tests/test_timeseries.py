"""Time-series decomposition/regression semantics (windows.py OLS,
analytics.py STL).

The oracle gate proves Spark == DuckDB bit-for-bit; these tests pin
the math against independent references:

1. The integer-sum closed-form OLS slope/intercept matches
   numpy.polyfit on the same (x, cents/100) frame to float tolerance.
2. STL reconstruction: observed == trend + seasonal + residual (to
   addition-reordering tolerance), and the seasonal component is
   constant per (event_type, hour-of-day).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cobradb_spark.io import load_table
from cobradb_spark.queries.windows import _OLS_WIN
from cobradb_spark.registry import get_query


def test_rolling_ols_matches_polyfit(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    series: dict = {}
    for r in ev:
        series.setdefault(r["event_type"], []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    got = {
        (r["event_type"], r["event_id"]): (r["x"], r["n"], r["slope"], r["intercept"])
        for r in get_query("win_rolling_ols_slope").fn(spark, sf_dir).collect()
    }
    checked = 0
    for etype, pts in series.items():
        pts.sort()
        ys = [np.floor(v * 100.0 + 0.5) / 100.0 for _, _, v in pts]
        for i, (_, eid, _) in enumerate(pts):
            if i == 0:
                assert (etype, eid) not in got  # n == 1 rows filtered
                continue
            lo = max(0, i - (_OLS_WIN - 1))
            xs = np.arange(lo + 1, i + 2, dtype=np.float64)
            yw = np.asarray(ys[lo : i + 1])
            slope, intercept = np.polyfit(xs, yw, 1)
            x, n, g_slope, g_intercept = got[(etype, eid)]
            assert x == i + 1 and n == i + 1 - lo
            assert abs(g_slope - slope) < 1e-9 * max(1.0, abs(slope))
            assert abs(g_intercept - intercept) < 1e-7 * max(1.0, abs(intercept))
            checked += 1
    assert checked > 500


def test_stl_reconstruction_and_seasonal_constancy(spark, sf_dir):
    rows = get_query("events_stl_decompose").fn(spark, sf_dir).collect()
    assert len(rows) > 100
    seasonal_by_key: dict = {}
    for r in rows:
        assert abs(r["observed"] - (r["trend"] + r["seasonal"] + r["residual"])) < 1e-9
        key = (r["event_type"], r["hour"].hour)
        if key in seasonal_by_key:
            assert seasonal_by_key[key] == r["seasonal"]
        else:
            seasonal_by_key[key] = r["seasonal"]
    # the seasonal profile is small by design: |types| x <=24
    n_types = len({k[0] for k in seasonal_by_key})
    assert len(seasonal_by_key) <= n_types * 24
