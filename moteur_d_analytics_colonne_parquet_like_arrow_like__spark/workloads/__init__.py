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

from . import parity, pipeline, relational, relational2, relational3, streaming_ops

_MODULES = [parity, relational, relational2, relational3, pipeline, streaming_ops]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        dup = set(out) & set(m.QUERIES)
        if dup:
            raise ValueError(f"duplicate query names across workloads: {dup}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
