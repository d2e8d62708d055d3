"""Query registry — the single source of truth behind __spark_entry__.

Every operator from SURVEY.md §2 registers here with its Spark callable
and (when SQL-expressible) the equivalent DuckDB oracle SQL.  The
contract (SURVEY.md §0): never declare an operator before its oracle
formulation hash-matches locally at sf=0.01 (tools/check.py).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# queries/ modules that populate the registry on import.
_QUERY_MODULES = (
    "cobradb_spark.queries.flagship",
    "cobradb_spark.queries.scans",
    "cobradb_spark.queries.filters",
    "cobradb_spark.queries.joins",
    "cobradb_spark.queries.aggregates",
    "cobradb_spark.queries.windows",
    "cobradb_spark.queries.sorts",
    "cobradb_spark.queries.setops",
    "cobradb_spark.queries.scalars",
    "cobradb_spark.queries.streaming",
    "cobradb_spark.queries.llm",
    "cobradb_spark.queries.textops",
    "cobradb_spark.queries.multimodal",
    "cobradb_spark.queries.udfs",
    "cobradb_spark.queries.etl",
    "cobradb_spark.queries.reshape",
    "cobradb_spark.queries.mlprep",
    "cobradb_spark.queries.sketches",
    "cobradb_spark.queries.analytics",
    "cobradb_spark.queries.rollups",
    "cobradb_spark.queries.layout",
    "cobradb_spark.queries.graph",
)


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}
_LOADED = False


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _LOADED = True


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def get_query(name: str) -> Query:
    _load()
    return _REGISTRY[name]


def query_map() -> dict[str, QueryFn]:
    """name -> callable, shaped for __spark_entry__.queries()."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_map() -> dict[str, str]:
    """name -> DuckDB SQL, shaped for __spark_entry__.oracle_sql()."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
