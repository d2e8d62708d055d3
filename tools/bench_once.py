"""Single-pass suite runner for bench.py's interleaved A/B.

Usage: python tools/bench_once.py <repo_root> <sf_dir> [query,query,...]

With the optional third argument, runs ONLY the named registry keys
(one untimed warmup + 3 timed runs each, median) and prints
{"queries": {name: sec}} — the single-query interleaved-A/B probe the
q19 (r12) / q8 (r14) quiet re-reads use.

Imports the engine from <repo_root> (which may be a git worktree of a
FROZEN commit — the code under test), runs one untimed warmup pass and
one timed pass of the headline + TPC-H tracks, and prints one JSON line
{"headline": sec, "tpch": sec}.  The runner itself always ships from
HEAD; only the engine code is swapped, so an old commit needs no
bench-protocol compatibility beyond the stable registry API
(all_queries / release_rank_caches / get_spark — present since r1).

Why subprocess-per-pass: each A/B reading gets a fresh JVM, so JIT
state, GC history, and page cache from one variant cannot leak into the
other's timing — the alternation is the point (two consecutive rounds
of uniform ~10-25% drift on untouched queries motivated this; see
BASELINE.md round-7/8 notes).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    repo_root, sf_dir = sys.argv[1], sys.argv[2]
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    sys.path.insert(0, repo_root)

    from cobradb_spark import registry
    from cobradb_spark.operators.rank import release_rank_caches
    from cobradb_spark.session import get_spark

    headline = [
        "agg_basic", "join_topn_flagship", "win_rank_topk_pergroup",
        "stream_session_window", "sim_cosine_topk", "agg_grouping_sets",
    ]
    qs = registry.all_queries()
    tpch = ["agg_basic"] + sorted(n for n in qs if n.startswith("sql_"))
    spark = get_spark("bench-ab")

    def one_pass(names: list[str]) -> float:
        t_total = 0.0
        for name in names:
            t0 = time.perf_counter()
            qs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t_total += time.perf_counter() - t0
            release_rank_caches()
        return t_total

    if only:
        import statistics

        per: dict[str, float] = {}
        for name in only:
            one_pass([name])  # warmup: codegen + page cache
            per[name] = round(
                statistics.median(one_pass([name]) for _ in range(3)), 4
            )
        print(json.dumps({"queries": per}))
        spark.stop()
        return

    one_pass(headline)  # warmup: codegen + page cache
    one_pass(tpch)
    out = {
        "headline": round(one_pass(headline), 4),
        "tpch": round(one_pass(tpch), 4),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
