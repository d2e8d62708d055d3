"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the cobradb_spark package; this module only
adapts the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cobradb_spark import registry  # noqa: E402
from cobradb_spark.session import apply_runtime_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY §7 phase 0):
    customer ⋈ orders ⋈ lineitem ⋈ nation ⋈ region → revenue per nation,
    top 10 — exercises scan, broadcast + shuffle join, hash agg,
    top-k in one spine."""
    from cobradb_spark.queries.flagship import join_topn

    apply_runtime_confs(spark)
    return join_topn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checked query."""
    return registry.oracle_map()
