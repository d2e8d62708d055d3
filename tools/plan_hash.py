"""Canonicalized physical-plan hash for drift probes.

Usage: python tools/plan_hash.py <repo_root> <sf_dir> <key> [key ...]

Builds each key's DataFrame from the engine at <repo_root> (HEAD or a
frozen-commit worktree), renders the formatted physical plan, scrubs
run-varying tokens (expression ids `#N`, `plan_id=N`, temp/scratch
paths, statistics sizes), and prints one JSON line {key: md5hex}.
Identical hashes across HEAD and a frozen commit prove Catalyst picks
the SAME plan — the r12 q19 probe's step (1), reusable per round.
"""

from __future__ import annotations

import hashlib
import json
import re
import sys


def canonical_plan_hash(plan: str) -> str:
    s = re.sub(r"#\d+", "#x", plan)
    s = re.sub(r"plan_id=\d+", "plan_id=x", s)
    s = re.sub(r"Location: \S+ \[[^\]]*\]", "Location: x", s)
    s = re.sub(r"file:/[^\s,\]]+", "file:x", s)
    s = re.sub(r"Statistics\([^)]*\)", "Statistics(x)", s)
    s = re.sub(r"sizeInBytes=[^,)]+", "sizeInBytes=x", s)
    return hashlib.md5(s.encode()).hexdigest()


def main() -> None:
    repo_root, sf_dir, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    sys.path.insert(0, repo_root)

    from cobradb_spark import registry
    from cobradb_spark.session import get_spark

    spark = get_spark("plan-hash")
    qs = registry.all_queries()
    out = {}
    for k in keys:
        df = qs[k].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        out[k] = canonical_plan_hash(plan)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
