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
    "cobradb_spark.queries.geo",
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


# Driver-window rotation: the correctness driver hash-checks the FIRST
# 50 entries of query_map() in iteration order, so ordering is part of
# the verification contract.  History: r1-r2 exposed the leading 50
# (flagship/scans/filters/joins + 3 aggregates); r3 exposed D4-K5; r4-r7
# drained the never-checked backlog window by window (each round
# executing the list staged by the previous one — CORRECTNESS_r04-r07).
# Running total after r7: 291 distinct keys driver-checked, 92 never
# checked, 2 open failures (win_max_drawdown, text_vocab_coverage: both
# were value-EXACT locally; root cause was DuckDB HUGEINT window sums
# surfacing as pandas float64 against Spark's int64 under the driver's
# dtype-sensitive value-hash — fixed by CASTing every HUGEINT-derived
# oracle output AS BIGINT, and tools/check.py now fails on dtype-class
# mismatches so local EXACT implies driver-hashable again).
#
# Round 11 window (_DRIVER_PRIORITY below), executing the r10-staged
# plan (r10 VERDICT items 1+2+10):
#   * slots 1-27: ALL never-driver-checked oracle-carrying keys — the
#     6-key r10 residue, the two graded ANN-hi verdicts, and the twelve
#     r11-new codec keys (Layer III Huffman + bit reservoir + stereo +
#     REQUANTIZATION, Layer II B.2c/B.2d, Layer II and Layer I
#     stereo/joint/dual, Adam7-interlaced PNG, animated+interlaced GIF,
#     GIF transparency + restore-disposals, stereo/8-bit WAV,
#     stereo/LPC FLAC, and the TIME-DOMAIN closers: the Layer III
#     IMDCT chain plus ALL THREE layers through the shared polyphase
#     synthesis to PCM).  After this window runs, every
#     oracle-carrying registry key has a driver hash row.
#   * slot 28: sim_ann_lsh_graded — the hash-carrying companion of the
#     one §2 key whose latest driver row is a stale r8 `no_oracle`
#     entry (sim_ann_lsh itself is rows-only and sits in the
#     past-window tail).
#   * slots 29-36: the streaming family I1-I8 (r10 VERDICT item 10 —
#     last checked r3; applyInPandasWithState is session-conf-
#     sensitive, so 8 rounds of conf churn deserve fresh rows).
#   * slots 37-50: the oldest surviving driver evidence — the 14
#     oldest remaining r2-checked keys (joins/filters/scans, including
#     join_bucketed_colocated, the bucketBy zero-Exchange demo);
#     the displaced oldest refreshes (join_lateral_topk, join_null_safe,
#     join_outer_left_right_full,
#     join_self_hierarchy, join_semi,
#     join_shuffle_hash_hint, join_shuffle_large, scan_csv_tsv,
#     agg_approx_distinct and nine r3 rows) move to _R12_REFRESH as
#     r11-new codec keys took slots.
# Every key is oracle-carrying (rows-only keys never spend a window
# slot) and locally EXACT at sf0.01 under tools/check.py --window.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # --- first-time rows: zero the never-checked set ---
    "multimodal_mp3_sideinfo_parse",
    "analytics_hhi_concentration", "analytics_theil_index",
    "agg_entropy_pergroup", "text_mattr_lexical_diversity",
    "mlprep_mutual_information",
    "sim_ann_ivf_hi_graded", "sim_ann_ivf_pq_hi_graded",
    "multimodal_mp3_huffman_decode", "multimodal_mp2_lowrate_decode",
    "multimodal_mp3_reservoir_decode", "multimodal_mp2_stereo_decode",
    "multimodal_mp1_stereo_decode", "multimodal_mp3_stereo_decode",
    "multimodal_png_interlaced_decode", "multimodal_gif_animated_decode",
    "multimodal_wav_stereo_decode", "multimodal_flac_stereo_decode",
    "multimodal_gif_transparency_decode", "multimodal_mp3_requantize_decode",
    "multimodal_mp3_imdct_decode", "multimodal_mp3_pcm_decode",
    "multimodal_mp1_pcm_decode", "multimodal_mp2_pcm_decode",
    "multimodal_mp3_stereo_pcm_decode", "multimodal_mp3_joint_pcm_decode",
    "multimodal_mp3_joint_short_pcm_decode",
    # --- stale-row refresh: hash-carrying LSH verdict ---
    "sim_ann_lsh_graded",
    # --- streaming refresh (I1-I8, last checked r3) ---
    "stream_tumbling_agg", "stream_sliding_agg", "stream_session_window",
    "stream_watermark_late", "stream_dedup", "stream_stateful_counts",
    "stream_static_join", "stream_foreachBatch_sink",
    # --- oldest-evidence refresh: the 22 remaining r2 rows ---
    "agg_basic", "agg_count_distinct", "case_when", "distinct_project",
    "filter_conjunctive", "filter_in_null", "fk_audit_anti",
    "hierarchy_recursive_cte", "join_anti", "join_broadcast_inner",
    "join_bucketed_colocated", "join_cross_bounded", "join_fuzzy_blocked",
    "project_compute",
    # --- past the 50-row window: rows-only refreshes, zero-cost under
    # a 50-row window (the pattern r9/r10 used for sim_ann_lsh) ---
    "sim_ann_lsh", "sim_ann_ivf_hi", "sim_ann_ivf_pq_hi",
)

# Drained r11 backlog (kept for the staging-integrity test): the keys
# that had no driver row entering r11.  All sit in the window above;
# tests/test_registry.py asserts the window covers the recomputed
# never-checked set exactly, so the drain cannot rot.
_R11_PLANNED_HEAD: tuple[str, ...] = (
    "multimodal_mp3_sideinfo_parse",
    "analytics_hhi_concentration", "analytics_theil_index",
    "agg_entropy_pergroup", "text_mattr_lexical_diversity",
    "mlprep_mutual_information",
    # --- keys added during r10 (appended as they land) ---
    "sim_ann_ivf_hi_graded", "sim_ann_ivf_pq_hi_graded",
    # --- keys added during r11 ---
    "multimodal_mp3_huffman_decode", "multimodal_mp2_lowrate_decode",
    "multimodal_mp3_reservoir_decode", "multimodal_mp2_stereo_decode",
    "multimodal_mp1_stereo_decode", "multimodal_mp3_stereo_decode",
    "multimodal_png_interlaced_decode", "multimodal_gif_animated_decode",
    "multimodal_wav_stereo_decode", "multimodal_flac_stereo_decode",
    "multimodal_gif_transparency_decode", "multimodal_mp3_requantize_decode",
    "multimodal_mp3_imdct_decode", "multimodal_mp3_pcm_decode",
    "multimodal_mp1_pcm_decode", "multimodal_mp2_pcm_decode",
    "multimodal_mp3_stereo_pcm_decode", "multimodal_mp3_joint_pcm_decode",
    "multimodal_mp3_joint_short_pcm_decode",
)

# Staged r12 refresh plan: the remaining r3-checked keys once the r11
# window lands (30 never rotated out of r3 + the displaced oldest-r3 /
# r2 refreshes, scan_csv_tsv and agg_approx_distinct among them) —
# after them, no §2 key's evidence predates r11.
_R12_REFRESH: tuple[str, ...] = (
    "join_lateral_topk", "join_null_safe", "join_outer_left_right_full", "join_self_hierarchy", "join_semi",
    "join_shuffle_hash_hint", "join_shuffle_large",
    "agg_approx_distinct", "scan_csv_tsv", "agg_conditional", "agg_first_last_ordered", "agg_grouping_sets", "agg_having", "agg_percentiles", "agg_stats", "array_higher_order", "conditional_null", "date_parts_trunc", "embed_vector_norm", "hash_reaction_dedup",
    "json_extract_nested", "limit_offset", "map_ops", "math_suite",
    "scan_json_lines", "set_except", "set_intersect", "set_union_all",
    "set_union_distinct", "sort_multikey_nulls", "str_fuzzy_match",
    "str_normalize_ids", "str_split_compartment", "text_stats",
    "text_top_terms", "topk_global", "udaf_pandas_grouped_agg",
    "udf_grouped_map_normalize", "udf_pandas_scalar", "udf_scalar_python",
    "udtf_expand", "win_lag_lead", "win_nth_first_last",
    "win_ntile_pctrank", "win_range_frame", "win_rank_topk_pergroup",
    "win_running_frame",
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
