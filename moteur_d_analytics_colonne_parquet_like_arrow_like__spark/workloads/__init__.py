"""Workload registry: named queries + matching DuckDB oracle SQL.

Each workload module exposes ``QUERIES: dict[str, Callable[[SparkSession,
str], DataFrame]]`` and ``ORACLES: dict[str, str]`` (ANSI SQL DuckDB can run
on the same parquet views). The driver's correctness gate runs both sides at
sf0.01 and hash-compares (see ``__spark_entry__.py``).

Oracle-authoring rules that keep the hashes stable across engines:

- alias every computed column identically on both sides,
- sums over doubles go through DECIMAL(18,2)/BIGINT so partial-aggregation
  order cannot change the result, then cast back to double,
- timestamps are projected as DATE or ISO strings where they appear in
  computed output,
- ties in top-k output are broken by a unique key column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    analytics,
    geospatial,
    parity,
    pipeline,
    python_surface,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    relational8,
    pipeline2,
    mleval,
    mleval2,
    streaming_ops,
)

_MODULES = [
    parity,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    relational8,
    geospatial,
    analytics,
    python_surface,
    pipeline,
    pipeline2,
    mleval,
    mleval2,
    streaming_ops,
]

# Round-7 verification priority (the driver samples the first ~50 entries of
# all_queries()). VERDICT r6 item 1 — this round is a verification-debt
# burn-down: registrations are frozen (≤10 new) and the sample is spent on
# (a) the 5 entries whose behavior changed AFTER their newest driver
# signature (the four two_phase_rank_cumsum window rewrites, signed r5
# pre-rewrite, and join_fuzzy_match, whose 2-token blocking changed its
# output after its r5 signature); then (b) the 45 of 49 never-driver-checked
# entries that fit in the remaining sample; then (c) the 4 never-checked
# entries deferred because the judge already oracle-verified them green
# locally in r6 (lowest risk to wait one more round); then (d) round-7's
# few new registrations; then the r1/r2/r3-vintage backlog for r8's sample.
# tools/freshness_report.py audits this file against CORRECTNESS_r*.json and
# tests/test_freshness.py fails the build if the debt can't fit the budget.
_VERIFY_FIRST: tuple[str, ...] = (
    # (a) behavior changed after newest driver signature — re-sign FIRST
    "customers_abc",  # r5 sig predates two_phase_rank_cumsum rewrite
    "supplier_gini",  # r5 sig predates two_phase_rank_cumsum rewrite
    "customers_rfm",  # r5 sig predates two_phase_rank_cumsum rewrite
    "pipeline_score_normalize",  # r5 sig predates rewrite
    "join_fuzzy_match",  # r5 sig predates 2-token blocking change
    # (b) never driver-checked — newest additions without any signature
    "embedding_pca_power",
    "events_stl_decompose",
    "events_seasonal_strength",
    "pipeline_mix_kl",
    "sim_knn_graph",
    "multimodal_binaryfile_ingest",
    "agg_mode_exact",
    "orders_reconciliation",
    "pipeline_shard_plan",
    "sketch_kmv_setops",
    "sim_pq_adc",
    "stream_kmv_distinct",
    "orders_forecast_backtest",
    "parts_xyz_classes",
    "sql_lateral_topk",
    "dedup_ppjoin",
    "multimodal_frame_plan",
    "table_branches",
    "sql_variant_extract",
    "table_branch_promote",
    "events_holt",
    "parts_abc_xyz_matrix",
    "events_acf",
    "orders_changepoint",
    "graph_bfs_distance",
    "customers_survival_km",
    "pipeline_temperature_mix",
    "pipeline_quality_cut",
    "embedding_label_drift",
    "orders_mom_growth",
    "events_seasonal_dow",
    "supplier_kcore",
    "events_latency_bands",
    "orders_open_backlog",
    "agg_bitmap_distinct",
    "stream_windowed_topk",
    "events_ab_cuped",
    "customers_cohort_ltv",
    "dedup_incremental_ingest",
    "events_bursts",
    "events_entropy_profile",
    "market_hhi",
    "orders_mix_independence",
    "pipeline_pit_features",
    "dedup_containment",
    # (c) never driver-checked but judge-verified green locally in r6 —
    # deferred past the 50-entry sample boundary; first in line for r8
    "sql_recursive_cte",
    "table_delete_vectors",
    "cli_query_compiled",
    "sim_ivf_recall",
    # (d) round-7 registrations (kept ≤10; they queue behind the backlog)
    "sim_pq_recall",
    "dedup_lsh_recall",
    "sim_tfidf_sparse",
    "pipeline_quantile_match",
    # (e) r1-vintage greens the r5 sample didn't reach - stalest first
    "agg_count_distinct",
    "agg_rollup",
    "agg_cube",
    "scalar_functions",
    "window_distribution",
    "subquery_scalar",
    "subquery_correlated",
    "agg_percentiles",
    "sample_hash",
    "agg_grouping_sets",
    "join_anti",
    "join_multiway",
    "window_topk_per_group",
    "sort_top_k",
    "tpch_q1",
    "tpch_q6",
    "tpch_q13",
    "tpch_q18_having",
    "tpch_q4_exists",
    "tpch_q12_conditional",
    "tpch_q14_promo",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_embedding",
    # (d) last verified round 2
    "agg_approx_sketches",
    "dedup_clusters",
    "dedup_embedding_lsh",
    "sim_topk_bruteforce",
    "sim_topk_lsh",
    "sim_topk_lsh_multiprobe",
    "text_lang_id",
    "text_quality",
    "text_tokens",
    "text_fingerprint",
    "text_pii",
    "pipeline_curate",
    "multimodal_decode",
    "tpch_q2_mincost",
    "tpch_q20_dominant",
    "dedup_minhash_capped",
    "window_frames",
    "scalar_functions2",
    "sim_topk_ivf",
    "dedup_clusters_star",
    "set_ops_all",
    "table_time_travel",
    "py_udtf_tokens",
    "py_vectorized_dot",
    "higher_order_funcs",
    "join_salted",
    "agg_variance_exact",
    "text_winnow",
    "tpch_q3_shipping",
    "tpch_q10_returns",
    "tpch_q19_disjunct",
    "tpch_q7_volume",
    "tpch_q15_top_supplier",
    # (e) last verified round 3
    "tpch_q17_small_qty",
    "tpch_q8_market_share",
    "token_histogram",
    "pipeline_corpus_report",
    "tpch_q5_local_volume",
    "tpch_q9_profit",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_cnt",
    "tpch_q21_waiting",
    "tpch_q22_global_sales",
    "sketch_heavy_hitters",
    "table_merge",
    "text_repetition",
    "incremental_hll",
    "unpivot_measures",
    "constraint_report",
    "source_col_native",
    "table_profile",
    "sort_paginate",
    "window_first_last",
    "array_set_ops",
    "graph_triangles",
    "source_formats",
    "py_grouped_map",
    "pipeline_contamination",
    "text_tfidf_terms",
    "pipeline_pack_sequences",
    "sample_per_group",
    "parity_full_scan",
    "parity_projection",
    "parity_filtered_scan",
    "parity_aggregate",
    "parity_filtered_aggregate",
    "parity_group_by",
    "parity_group_by_money",
    "join_broadcast",
    "join_left",
    "join_semi",
    # (f) freshest (round-4 sample), last
    "sample_stratified",
    "events_zorder_pruned",
    "stream_stateful_multibatch",
    "join_interval_overlap",
    "stream_stream_left_join",
    "stream_col_source",
    "rollup_time_hierarchy",
    "json_extract",
    "batch_sessionize",
    "events_funnel",
    "join_full_outer",
    "events_retention_cohorts",
    "stream_tumbling_window",
    "stream_tumbling_append",
    "stream_sliding_window",
    "stream_session_window",
    "stream_dedup",
    "stream_stateful",
    "stream_stream_join",
    "stream_stream_full_join",
    "stream_static_join",
    "stream_upsert",
    "join_asof",
    "join_asof_nearest",
    "multimodal_audio_features",
    "multimodal_image_resize",
    "pagerank",
    "kmeans_assign",
    "kmeans_update",
    "gopher_quality",
    "chunk_documents",
    "top_ngrams",
    "dedup_lines_global",
    "sample_weighted",
    "incremental_quantiles",
    "events_key_skew",
    "scd2_segment_history",
    "pipeline_mixture_sample",
    "events_attribution",
    "outlier_orders",
    "events_gap_report",
    "join_bucketed",
    "pipeline_split_leakage",
    "sim_rrf_fusion",
    "text_bm25",
    "regression_price_trend",
    "pipeline_dataset_card",
    "events_rolling_active",
    "text_pmi_pairs",
    "window_lag",
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        dup = set(merged) & set(m.QUERIES)
        if dup:
            raise ValueError(f"duplicate query names across workloads: {dup}")
        merged.update(m.QUERIES)
    out = {n: merged[n] for n in _VERIFY_FIRST if n in merged}
    out.update({n: fn for n, fn in merged.items() if n not in out})
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
