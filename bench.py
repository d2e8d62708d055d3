"""Headline benchmark — BASELINE.md protocol.

Runs the six headline queries (matching the DuckDB-floor metrics in
BASELINE.md §2) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
one shared local[$SPARK_GRAFT_CPUS] session.  Per query: one untimed
warmup (codegen/JIT), then 3 timed runs, median reported.  Results are
materialized through the noop sink so the full plan executes without
collect/serialization cost.

A second track (r5 verdict item 8) covers the full 22-shape TPC-H-style
SQL suite (q1 = the agg_basic pricing summary + the 21 sql_* keys), so
regressions outside the six headline queries surface in the per-round
artifact too.  Same warmup + 3-run-median protocol per query; the suite
total lands in `tpch_suite_seconds` / per-query in `tpch_queries`.

Prints ONE JSON line:
  {"metric": "suite_seconds", "value": N, "unit": "sec",
   "queries": {...}, "sf": ...,
   "tpch_suite_seconds": M, "tpch_queries": {...}}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cobradb_spark import registry
from cobradb_spark.operators.rank import release_rank_caches
from cobradb_spark.session import get_spark

HEADLINE = {
    "q_pricing_summary": "agg_basic",
    "q_join_topn": "join_topn_flagship",
    "q_window_rank": "win_rank_topk_pergroup",
    "q_sessionize": "stream_session_window",
    "q_cosine_topk": "sim_cosine_topk",
    "q_grouping_sets": "agg_grouping_sets",
}


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed_suite(spark, qs, sf_dir, labels: dict[str, str]) -> dict[str, float]:
    results: dict[str, float] = {}
    for label, name in labels.items():
        fn = qs[name].fn
        materialize(fn(spark, sf_dir))  # warmup: codegen + page cache
        release_rank_caches()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            times.append(time.perf_counter() - t0)
            release_rank_caches()
        results[label] = round(statistics.median(times), 4)
    return results


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    qs = registry.all_queries()
    results = _timed_suite(spark, qs, sf_dir, HEADLINE)
    total = round(sum(results.values()), 4)
    # 22-shape TPC-H track: q1's shape is the agg_basic pricing summary;
    # the rest are the sql_* flagship keys.
    tpch_labels = {"q1": "agg_basic"}
    tpch_labels.update({n: n for n in sorted(qs) if n.startswith("sql_")})
    tpch = _timed_suite(spark, qs, sf_dir, tpch_labels)
    print(
        json.dumps(
            {
                "metric": "suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": float(sf),
                "tpch_suite_seconds": round(sum(tpch.values()), 4),
                "tpch_queries": tpch,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
