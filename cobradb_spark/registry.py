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


# Driver-window rotation: the correctness driver checks the FIRST 50
# entries of query_map() in iteration order, so ordering is part of the
# verification contract.  History: r1-r2 exposed the same leading 50
# (flagship/scans/filters/joins + 3 aggregates); r3 exposed D4-K5
# (48 pass / 2 array-canonicalizer errs).  Round 4 front-loads:
#   (a) the 2 r3 errs, now projecting delimited strings instead of raw
#       arrays (agg_collect_synonyms, array_ops);
#   (b) the 4 extension keys stuck on stale r2 err rows — fixed by the
#       r3 loader repair but never re-exposed;
#   (c) J1/J3, which have NEVER been driver-checked (an earlier comment
#       here wrongly claimed they were r1-green; CORRECTNESS_r01 contains
#       neither key — r3 verdict item 4);
#   (d) 42 of the 122 never-checked registry keys, oracle-carrying
#       first: the dedup/sim + text/embed families (this engine's north
#       star), sketches, analytics, reshape.
# Remaining never-checked keys (88 after the r4 window, incl. queries
# added this round) rotate in over r5/r6 — planned windows:
#   r5 (oracle-carrying, 50): the 4 new sql_* shapes, dedup_containment_ngram,
#     agg_countmin_freq, etl_k_anonymize, analytics_pattern_match_journeys,
#     stream_cdc_upsert_view, stream_python_sink, stream_stream_join,
#     stream_python_source, stream_sessionize_stateful, stream_trending_topk,
#     stream_chained_stateful_agg, rollup_hypertable, the agg tail
#     (stats_higher argminmax weighted_stats listagg_ordered corr_matrix
#     mode), win tail (cume_dist ewma_smooth islands_ranges
#     running_distinct), scalars tail (months_between month_diff_exact
#     bround variant_typed try_safe, set_intersect_except_all), the
#     multimodal family, and the udf tail.
#   r6 (~38): etl/rollup/sample/profile/graph families + any r5 spillover;
#     rows-only keys (minhash, lsh, ivf, ivf_pq) go last — the driver
#     records only a weaker rows-only line for them.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) r3 array-canonicalizer errs, now string-projected
    "agg_collect_synonyms", "array_ops",
    # (b) stale r2 err rows, fixed in r3 by the loader repair
    "scan_jsonl_source", "scan_file_metadata_lineage",
    "scan_corrupt_tolerant", "join_interval_overlap",
    # (c) J1/J3 — first-ever driver exposure
    "dedup_exact_hash", "sim_cosine_topk",
    # (d) dedup/sim family (J-ext)
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_cosine_near",
    "dedup_sorted_neighborhood", "dedup_url_canonical", "dedup_repeated_spans",
    "dedup_cluster_cc", "etl_dedup_incremental",
    # (d) text/embed family
    "text_lang_id", "text_quality_score", "text_token_count",
    "text_fingerprint_winnow", "text_feature_hashing", "text_inverted_index",
    "text_tfidf_topk", "text_repetition_stats", "text_bpe_pair_counts",
    "text_unigram_perplexity", "embed_quantize_int8", "embed_kmeans_cluster",
    "str_regexp_extract_all",
    # (d) sketches
    "agg_hll_sketch_merge", "join_bloom_prefilter", "agg_heavy_hitters",
    "agg_bitmap_distinct_rollup", "agg_hll_intersect_estimate",
    "agg_histogram_quantile_merge",
    # (d) analytics
    "sessionize_events", "cohort_retention", "funnel_conversion",
    "events_anomaly_zscore", "decontam_ngram_overlap", "text_pii_redact",
    "funnel_time_bounded", "segment_rfm", "analytics_copurchase_pairs",
    "analytics_rolling_distinct_users", "events_anomaly_mad", "ts_autocorr",
    # (d) reshape
    "agg_pivot", "reshape_unpivot", "reshape_transpose",
)


def all_queries() -> dict[str, Query]:
    _load()
    missing = [n for n in _DRIVER_PRIORITY if n not in _REGISTRY]
    if missing:
        raise KeyError(f"_DRIVER_PRIORITY names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in _DRIVER_PRIORITY}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered


def get_query(name: str) -> Query:
    _load()
    return _REGISTRY[name]


def query_map() -> dict[str, QueryFn]:
    """name -> callable, shaped for __spark_entry__.queries()."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_map() -> dict[str, str]:
    """name -> DuckDB SQL, shaped for __spark_entry__.oracle_sql()."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
