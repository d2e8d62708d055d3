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
# Round 9 window (_DRIVER_PRIORITY below, 50 keys, ALL oracle-carrying
# — first window with no rows-only tail):
#   (a) the first 46 keys of the r8-staged _R9_PLANNED_HEAD verbatim
#       (r8 VERDICT item 1): agg_weighted_median_exact leads because its
#       quantization changed in r8 (floor(x*100+0.5) on both engines);
#       analytics_ratio_delta_ci carries the r6 DECIMAL overflow fix;
#       then the r7-staged queue in its original priority order
#       (experimentation / RAG / feature-store / geo families first).
#   (b) the 4 graded ANN companions pulled forward from the r10 backlog
#       (r8 VERDICT item 2): the approximate family has never had a
#       driver hash row; the *_graded keys hash the exact-side counts
#       plus a measured-recall verdict, closing that gap a round early.
#       The 4 displaced tail keys of the old staging
#       (mlprep_time_split_embargo, rollup_time_weighted_avg,
#       etl_surrogate_keys, graph_degree_assortativity) move to the r10
#       head; the 2 double-staged re-checks (scan_csv_tsv,
#       scan_json_lines — driver rows since r2/r3) are unstaged so the
#       backlog is exactly the never-checked set.
_DRIVER_PRIORITY: tuple[str, ...] = (
    "agg_weighted_median_exact", "analytics_ratio_delta_ci",
    "etl_contract_schema_diff", "sink_csv_quoted_roundtrip",
    "dedup_exactsubstr_cut", "graph_sssp_weighted", "mlprep_group_kfold",
    "analytics_markov_transitions", "multimodal_audio_resample",
    "etl_incremental_agg_retract", "events_forecast_backtest",
    "text_bpe_train", "multimodal_scene_cut_keyframes",
    "rollup_state_duration", "agg_median_exact_pergroup",
    "etl_l_diversity_check", "etl_bitemporal_snapshot",
    "graph_personalized_pagerank", "sim_topk_incremental",
    "analytics_top_paths", "rag_chunk_index_mips", "win_bollinger_bands",
    "analytics_subsequence_support", "text_kneser_ney_bigram",
    "geo_dbscan_grid", "text_source_distinctive_terms",
    "agg_tdigest_quantile", "analytics_new_returning_users",
    "mlprep_undersample_balanced", "join_interval_self_overlap",
    "analytics_experiment_srm_check", "mlprep_pit_training_set",
    "multimodal_audio_vad", "analytics_power_mde",
    "etl_scd3_current_previous", "text_ngram_novelty_rate",
    "analytics_value_migration_matrix", "graph_brand_assortativity",
    "dedup_near_cluster_keep_best", "stream_temporal_dim_enrich",
    "rollup_dow_hour_heatmap", "events_inter_arrival_stats",
    "rag_hybrid_rrf_fusion", "sim_mmr_diversified", "analytics_cohort_ltv",
    "sim_filtered_topk",
    "sim_ann_lsh_graded", "sim_ann_ivf_graded", "sim_ann_ivf_pq_graded",
    "dedup_minhash_near_graded",
)

# Staged r10 backlog: every key that will still lack a driver hash row
# after the r9 window executes — the 4 keys displaced from the old r9
# staging by the graded ANN companions, then the never-checked backlog
# in its r8 priority order, then the 16 r9-new keys in landing order.
# Keys ADDED mid-round are appended as they land
# (tests/test_registry.py recomputes the never-checked set from the
# CORRECTNESS_r*.json artifacts and asserts this list covers it
# exactly, so the staging cannot rot).  56 keys > one 50-slot window:
# the r10 rotation takes the FIRST 50 verbatim; the final 6 (and any
# r10-new keys) drain in r11.  Every key here is locally tri-scale
# EXACT and plain-session EXACT (see SURVEY §8 round-9 gates).
_R10_PLANNED_HEAD: tuple[str, ...] = (
    "mlprep_time_split_embargo", "rollup_time_weighted_avg",
    "etl_surrogate_keys", "graph_degree_assortativity",
    "multimodal_mp1_subband_decode",
    "mlprep_roc_auc", "mlprep_ks_statistic", "etl_t_closeness_check",
    "analytics_bootstrap_ci", "analytics_mann_kendall_trend",
    "agg_winsorized_trimmed_mean", "mlprep_information_value",
    "mlprep_cramers_v", "text_zipf_fit",
    "mlprep_average_precision",
    "text_burstiness_dispersion", "join_temporal_overlap_duration",
    "etl_tokenizer_fertility", "events_peak_concurrency",
    "analytics_price_elasticity", "events_stl_strength",
    "scan_json_multiline", "multimodal_image_channel_hist",
    "text_ocr_noise_score", "agg_tukey_fences", "analytics_diff_in_diff",
    "analytics_theil_sen_trend", "agg_gini_spend", "mlprep_lorenz_deciles",
    "agg_gini_impurity_category", "scan_csv_gzip", "stream_tumbling_ohlc",
    "join_asof_tolerance", "events_slo_burn_rate", "mlprep_nzv_filter",
    "etl_subject_access_export", "etl_pseudonymize_consistent",
    "etl_one_big_table", "events_apdex_score", "mlprep_confusion_matrix",
    # --- keys added during r9 (appended as they land) ---
    "multimodal_mp2_subband_decode",
    "analytics_welch_ttest", "analytics_spearman_corr",
    "multimodal_bmp_decode", "analytics_propensity_match",
    "graph_modularity_score", "text_js_divergence_sources",
    "mlprep_isotonic_calibration", "analytics_quantile_treatment_effect",
    "win_rsi_indicator", "multimodal_mp3_sideinfo_parse",
    "analytics_hhi_concentration", "analytics_theil_index",
    "agg_entropy_pergroup", "text_mattr_lexical_diversity",
    "mlprep_mutual_information",
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
