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
    parity,
    pipeline,
    python_surface,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    streaming_ops,
)

_MODULES = [
    parity,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    python_surface,
    pipeline,
    streaming_ops,
]

# Queries the round-1 correctness gate did NOT record a row for (it verified
# only the first 50 of 67 declared queries) plus the queries it failed.
# all_queries() enumerates these first so a truncating verifier always
# covers the least-proven surface; previously-green queries follow.
_VERIFY_FIRST: tuple[str, ...] = (
    # failed round 1 (nanos conf / no_oracle — both fixed):
    "join_asof",
    "window_lag",
    "pivot_event_types",
    "json_extract",
    "agg_approx_sketches",
    # no CORRECTNESS row round 1:
    "stream_tumbling_window",
    "stream_tumbling_append",
    "stream_sliding_window",
    "stream_session_window",
    "stream_dedup",
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
    # new in round 2:
    "tpch_q2_mincost",
    "tpch_q20_dominant",
    "dedup_minhash_capped",
    "window_frames",
    "batch_sessionize",
    "scalar_functions2",
    "sim_topk_ivf",
    "stream_upsert",
    "dedup_clusters_star",
    "set_ops_all",
    "table_time_travel",
    "source_formats",
    "py_udtf_tokens",
    "py_grouped_map",
    "py_vectorized_dot",
    "higher_order_funcs",
    "incremental_agg",
    "join_salted",
    "join_range",
    "stream_stateful",
    "events_time_pruned",
    "agg_variance_exact",
    "text_winnow",
    "tpch_q3_shipping",
    "tpch_q10_returns",
    "tpch_q19_disjunct",
    "tpch_q7_volume",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty",
    "tpch_q8_market_share",
    "sample_stratified",
    "token_histogram",
    "pipeline_corpus_report",
    # new this session (complete the 22-query TPC-H dial-tone):
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
    "events_zorder_pruned",
    "stream_stateful_multibatch",
    "join_interval_overlap",
    "source_col_native",
    "stream_stream_left_join",
    "table_profile",
    "sort_paginate",
    "window_first_last",
    "array_set_ops",
    "graph_triangles",
    "stream_col_source",
    "rollup_time_hierarchy",
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
