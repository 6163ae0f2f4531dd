"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the package
``moteur_d_analytics_colonne_parquet_like_arrow_like__spark``; this file
only adapts it to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import workloads


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's canonical
    group-by (SELECT key, COUNT/SUM/MIN/MAX ... GROUP BY key ORDER BY key,
    reference cae/examples/basic_usage.cpp:88-98) on lineitem."""
    return workloads.all_queries()["parity_group_by"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return workloads.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → weaker rows-only check)."""
    return workloads.all_oracles()
