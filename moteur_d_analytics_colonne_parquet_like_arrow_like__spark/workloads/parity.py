"""Reference-parity workload: the four bench query shapes + executor surface.

These are the query shapes the reference engine can express (SURVEY.md §2.1:
scan, projection, conjunctive integer filters, single-pass count/sum/min/max
aggregation, single-key string group-by with sorted output), re-expressed on
the driver's ``lineitem`` fact table. Shapes mirror the reference benchmark
(``cae/benches/benchmark.cpp:97-207``: full scan, filtered scan, SUM agg,
group-by SUM).

All are pure DataFrame plans: scan-side filter pushdown and column pruning
replace the reference's hand-rolled Scanner logic, and Spark's partial+final
hash aggregation replaces its single-process hash map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..query import AggFunc, CompareOp, Predicate, QueryExecutor
from ..sources.catalog import load_table


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem")


def q_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full table scan, all columns (reference Full Scan,
    benchmark.cpp:97-124). Timestamp projected as DATE for cross-engine
    hash stability."""
    df = _lineitem(spark, sf_dir)
    # cast(date)->cast(string) emits the same 'yyyy-MM-dd' strings as
    # date_format but through the simple cast codegen path (~25% faster
    # materialization than the DateTimeFormatter route).
    return df.select(
        *[c for c in df.columns if c != "l_shipdate"],
        F.col("l_shipdate").cast("date").cast("string").alias("l_shipdate"),
    )


def q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan (reference O2): 3 of 11 columns; the physical scan
    must read only these (verified in tests via plans.read_columns)."""
    qe = QueryExecutor(spark, _lineitem(spark, sf_dir))
    qe.set_projection(["l_orderkey", "l_partkey", "l_quantity"])
    return qe.execute_query()


def q_filtered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicate scan (reference O3/O4: Filtered Scan,
    benchmark.cpp:126-153): two AND'ed comparisons, pushed to parquet."""
    qe = QueryExecutor(spark, _lineitem(spark, sf_dir))
    qe.add_filter(Predicate("l_quantity", CompareOp.GT, 25))
    qe.add_filter(Predicate("l_discount", CompareOp.LE, 0.05))
    qe.set_projection(["l_orderkey", "l_linenumber", "l_quantity", "l_discount"])
    return qe.execute_query()


def q_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped single-pass count/sum/min/max (reference O5,
    execution.cpp:275-337 — always computes all four).

    The scan rides ``session.coalesce_small_scan`` — the derived policy
    that replaced the bench's hand-pinned ``scan_slices=8`` kwarg
    (VERDICT r7 item 7): for a 1-row-output aggregate over an input
    SMALL relative to per-task scheduling cost, fewer fatter tasks win
    (measured at the bench's 13 MB sf0.1 layout: 32 slices 128 ms -> 8
    slices 79 ms warm median — the scan work is ~2.4 MB of one column,
    so scheduling dominated). The policy sizes slices from the actual
    input bytes and self-deactivates above the measured floor, so the
    same code keeps full scan parallelism at 100 TB."""
    from ..session import coalesce_small_scan

    df = coalesce_small_scan(_lineitem(spark, sf_dir))
    return df.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


def q_filtered_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + aggregate composition (reference test_execution.cpp:168-183)."""
    df = _lineitem(spark, sf_dir).filter(F.col("l_quantity") > 25)
    return df.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


def q_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-key group-by with count/sum/min/max, sorted by key (reference
    O6+O7, execution.cpp:339-401; Group By bench, benchmark.cpp:179-207)."""
    qe = QueryExecutor(spark, _lineitem(spark, sf_dir))
    qe.set_aggregation(AggFunc.SUM, "l_quantity")
    qe.set_group_by("l_returnflag")
    # l_returnflag has 3 values — declare it so the sort skips the global
    # range exchange (see execute_group_by).
    out = qe.execute_group_by(low_cardinality=True)
    return out.select(
        "l_returnflag",
        F.col("count").alias("cnt"),
        F.col("sum").cast("double").alias("sum_qty"),
        F.col("min").alias("min_qty"),
        F.col("max").alias("max_qty"),
    )


def q_group_by_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by summing a non-integral double column: decimal-routed so the
    result is independent of partial-aggregation order (scale-safe)."""
    df = _lineitem(spark, sf_dir)
    return (
        df.groupBy("l_linestatus")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_linestatus")
    )


QUERIES = {
    "parity_full_scan": q_full_scan,
    "parity_projection": q_projection,
    "parity_filtered_scan": q_filtered_scan,
    "parity_aggregate": q_aggregate,
    "parity_filtered_aggregate": q_filtered_aggregate,
    "parity_group_by": q_group_by,
    "parity_group_by_money": q_group_by_money,
}

ORACLES = {
    "parity_full_scan": """
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
               strftime(l_shipdate, '%Y-%m-%d') AS l_shipdate
        FROM lineitem
    """,
    "parity_projection": """
        SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
    """,
    "parity_filtered_scan": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem
        WHERE l_quantity > 25 AND l_discount <= 0.05
    """,
    "parity_aggregate": """
        SELECT COUNT(*) AS cnt,
               CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty
        FROM lineitem
    """,
    "parity_filtered_aggregate": """
        SELECT COUNT(*) AS cnt,
               CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty
        FROM lineitem
        WHERE l_quantity > 25
    """,
    "parity_group_by": """
        SELECT l_returnflag,
               COUNT(*) AS cnt,
               CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "parity_group_by_money": """
        SELECT l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               COUNT(*) AS cnt
        FROM lineitem
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
}
