"""Sorts / limits / top-k (reference: only the group-key output sort, O7 —
SURVEY.md §2.7 extension surface).

Scale notes: ``order_by().limit(k)`` plans TakeOrderedAndProject — each task
keeps a k-heap, the driver merges k·partitions rows; no global sort. A full
``order_by`` without limit is a range-partitioned sort (sampling + shuffle)
— correct but expensive; expose it separately so callers reach for top-k
first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """Global top-k: TakeOrderedAndProject, never a full sort. Include a
    unique tie-breaker in order_cols for deterministic output."""
    return df.orderBy(*order_cols).limit(k)


def order_by(df: DataFrame, order_cols: list[Column]) -> DataFrame:
    """Total order via range partitioning (use only when the full ordered
    result is genuinely needed)."""
    return df.orderBy(*order_cols)


def limit(df: DataFrame, n: int) -> DataFrame:
    return df.limit(n)


def order_by_bounded(df: DataFrame, order_cols: list[Column | str]) -> DataFrame:
    """Total order for a relation whose row count is bounded by a DOMAIN
    (flag/status cross product, a dimension table, queries x k) rather than
    by input size: coalesce(1) + partition-local sort — the same total
    order as ``order_by`` with one whole stage fewer (no range-bounds
    sampling job, no range exchange; r13 optimization round, guide §2.4
    "an orderBy used only to make output deterministic"). Same rule as
    ``query.execute_group_by(low_cardinality=True)``, exposed for workload
    tails. ONLY for provably bounded outputs — a result that scales with
    the corpus must keep the range-partitioned ``order_by``."""
    return df.coalesce(1).sortWithinPartitions(*order_cols)
