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
# Round 5 executed the window planned in round 4; round 6 executed the
# window planned in round 5 (etl/rollup/sample/profile/graph + r5-new,
# all green in CORRECTNESS_r06).  Round 7 executes the FIRST 50 names of
# the r6-staged `_R7_PLANNED_HEAD` (73 names total — every key with no
# driver row in CORRECTNESS_r01-r06): that is the `_DRIVER_PRIORITY`
# below, verbatim, all oracle-carrying.
#   r8 plan (see _R8_PLANNED_HEAD below, 50 keys): the 23-name tail of
#     the r7 staging that did not fit this window — 19 oracle-carrying
#     keys (geo_polygon_contains .. graph_functional_cycles) followed by
#     the four rows-only ANN keys — plus 27 re-checks of the OLDEST
#     driver evidence (r2-era flagship/scan/join rows, untouched since
#     CORRECTNESS_r02; re-checking guards against silent regressions in
#     code that has since been refactored).  Oracle-carrying keys first,
#     the four ANN rows-only keys LAST (the driver records only a weaker
#     rows-only line for them).  NOTE for the r8 rotation: the window
#     test test_driver_window_keys_are_oracle_carrying must then be
#     relaxed to allow exactly those four trailing ANN keys.
# The planned r8 window as data, so tests can assert every planned name
# is actually registered — a typo here would otherwise surface only as a
# KeyError during the r8 rotation.
_R8_PLANNED_HEAD: tuple[str, ...] = (
    # r7-staging tail: oracle-carrying keys that did not fit the r7 window
    "geo_polygon_contains", "win_hampel_outliers", "events_cross_correlation",
    "stream_transform_with_state",
    "agg_kmv_theta_sketch", "multimodal_mp3_frame_index",
    "analytics_ab_cuped", "etl_vacuum_retention",
    "profile_benford_deviation", "analytics_survival_km",
    "multimodal_srt_parse", "join_point_in_time_scd2",
    "mlprep_calibration_bins", "text_dictionary_match",
    "embed_matryoshka_overlap", "text_unicode_canonicalize",
    "scan_fixedwidth", "udf_pandas_scalar_iter", "graph_functional_cycles",
    # oldest-evidence re-checks (r2-era rows, CORRECTNESS_r02 order)
    "join_topn_flagship", "sql_returned_revenue", "sql_shipping_priority_q3",
    "sql_local_supplier_volume_q5", "sql_order_priority_exists_q4",
    "sql_small_quantity_scalar_q17", "scan_parquet",
    "scan_projection_pushdown", "scan_csv_tsv", "scan_json_lines",
    "sink_parquet_partitioned", "scan_jsonl_source", "sink_orc_roundtrip",
    "merge_upsert", "scan_nested_ingest", "scan_python_datasource",
    "scan_observed_metrics", "sink_python_datasource",
    "scan_partition_pruning", "scan_schema_evolution",
    "scan_file_metadata_lineage", "scan_binaryfile_ingest",
    "scan_corrupt_tolerant", "join_dpp_partition_pruning",
    "join_range_interval", "join_asof", "join_skew_salted",
    # rows-only ANN keys go LAST in the r8 window
    "dedup_minhash_near", "sim_ann_lsh", "sim_ann_ivf", "sim_ann_ivf_pq",
)

# Queued for the r9 window (r7-new keys; no driver rows yet, all
# tri-scale oracle-EXACT in the r7 sweeps): dedup_exactsubstr_cut,
# graph_sssp_weighted, mlprep_group_kfold, analytics_markov_transitions,
# multimodal_audio_resample — plus whatever r8 adds and the next tranche
# of oldest-evidence re-checks.
_R9_QUEUE: tuple[str, ...] = (
    "dedup_exactsubstr_cut", "graph_sssp_weighted", "mlprep_group_kfold",
    "analytics_markov_transitions", "multimodal_audio_resample",
    "etl_incremental_agg_retract", "events_forecast_backtest",
    "text_bpe_train", "multimodal_scene_cut_keyframes",
    "rollup_state_duration", "agg_median_exact_pergroup",
    "etl_l_diversity_check", "etl_bitemporal_snapshot",
    "graph_personalized_pagerank", "sim_topk_incremental",
    "analytics_top_paths", "rag_chunk_index_mips",
    # second r7 session (all tri-scale oracle-EXACT on landing)
    "win_bollinger_bands", "analytics_subsequence_support",
    "text_kneser_ney_bigram", "geo_dbscan_grid",
    "text_source_distinctive_terms", "agg_tdigest_quantile",
    "analytics_new_returning_users", "mlprep_undersample_balanced",
    "join_interval_self_overlap", "analytics_experiment_srm_check",
    "mlprep_pit_training_set", "multimodal_audio_vad",
    "analytics_power_mde", "etl_scd3_current_previous",
    "text_ngram_novelty_rate", "analytics_value_migration_matrix",
    "graph_brand_assortativity", "dedup_near_cluster_keep_best",
    "stream_temporal_dim_enrich", "rollup_dow_hour_heatmap",
    "events_inter_arrival_stats", "rag_hybrid_rrf_fusion",
    "sim_mmr_diversified", "analytics_cohort_ltv", "sim_filtered_topk",
    "mlprep_time_split_embargo", "rollup_time_weighted_avg",
    "etl_surrogate_keys", "graph_degree_assortativity",
    "scan_json_multiline", "multimodal_image_channel_hist",
    "text_ocr_noise_score", "agg_tukey_fences", "analytics_diff_in_diff",
    "analytics_theil_sen_trend", "agg_gini_spend", "mlprep_lorenz_deciles",
    "agg_gini_impurity_category", "scan_csv_gzip", "stream_tumbling_ohlc",
    "join_asof_tolerance", "events_slo_burn_rate", "mlprep_nzv_filter",
    "etl_subject_access_export", "agg_weighted_median_exact",
    "etl_pseudonymize_consistent", "etl_one_big_table",
    "events_apdex_score", "mlprep_confusion_matrix",
)

# The executed r7 window: first 50 names of the r6-staged plan, verbatim.
_DRIVER_PRIORITY: tuple[str, ...] = (
    "sql_customer_distribution_q13", "analytics_attribution_position",
    "sql_min_cost_supplier_q2", "sql_important_stock_q11",
    "text_bigram_perplexity", "multimodal_gif_decode",
    "multimodal_flac_decode", "dedup_semantic_cluster",
    "graph_connected_components", "etl_importance_resample",
    "text_bpe_apply", "rollup_downsample_lttb", "events_forecast_holt",
    "geo_grid_radius_join", "geo_nearest_neighbor", "geo_geohash_encode",
    "geo_track_length", "geo_bbox_centroid",
    "win_rolling_ols_slope", "events_stl_decompose", "embed_pca_power",
    "graph_label_propagation", "scan_timetravel_log",
    "etl_curriculum_order", "agg_quantile_exact_global",
    "sim_maxsim_late_interaction", "profile_corpus_report",
    "events_forecast_holt_winters", "text_chunk_sliding",
    "stream_track_accumulate", "graph_bfs_levels", "join_asof_nearest",
    "events_rate_burst", "etl_late_arriving_dim",
    "embed_binary_hamming_topk", "mlprep_target_encode",
    "analytics_audience_overlap", "win_rolling_corr",
    "graph_random_walks", "graph_hits_scores", "text_keyphrase_rake",
    "dedup_span_excise", "text_bm25_topk", "graph_kcore_peel",
    "win_max_drawdown", "analytics_basket_rules", "text_cooccurrence_pmi",
    "text_vocab_coverage", "profile_psi_drift", "stream_stream_outer_join",
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
