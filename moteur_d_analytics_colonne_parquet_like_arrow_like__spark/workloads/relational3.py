"""Third relational workload: more TPC-H shapes (Q6/Q13/Q18), HAVING, and a
stream-stream interval join — each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table
from .. import streaming as S


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast-revenue: tight filter + single agg — the query
    where predicate pushdown + row-group skipping do all the work."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer (two-level
    aggregation with a left join keeping zero-order customers)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        customer.select("c_custkey")
        .join(
            orders.select(F.col("o_custkey").alias("c_custkey"), "o_orderkey"),
            "c_custkey",
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q_tpch_q18_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-quantity orders via GROUP BY ... HAVING, then
    join back to orders for attributes."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .where(F.col("total_qty") > 150)  # HAVING
    )
    return (
        big.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey", "o_totalprice"),
            "l_orderkey",
        )
        .select("l_orderkey", "o_custkey", "o_totalprice", "total_qty")
        .orderBy("l_orderkey")
    )


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: views joined to purchases of the same
    user within [0, 30 min] after the view — the attribution-window shape.
    Both sides carry watermarks so join state is bounded; executed through
    the micro-batch engine and oracle-checked against the batch interval
    join."""
    events = S.events_stream(spark, sf_dir)
    views = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "60 minutes")
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "60 minutes")
    )
    joined = views.join(
        purchases,
        (views.user_id == purchases.user_id)
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select(
        "view_id",
        "purchase_id",
        views.user_id.alias("user_id"),
    )
    return S.run_to_memory(joined, output_mode="append", shuffle_partitions=8).orderBy(
        "view_id", "purchase_id"
    )


QUERIES = {
    "tpch_q6": q_tpch_q6,
    "tpch_q13": q_tpch_q13,
    "tpch_q18_having": q_tpch_q18_having,
    "stream_stream_join": q_stream_stream_join,
}

ORACLES = {
    "tpch_q6": """
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
          AND l_discount >= 0.03 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "tpch_q13": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_q18_having": """
        SELECT l_orderkey, o_custkey, o_totalprice, total_qty
        FROM (
            SELECT l_orderkey, CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 150
        )
        JOIN orders ON l_orderkey = o_orderkey
        ORDER BY l_orderkey
    """,
    "stream_stream_join": """
        SELECT v.event_id AS view_id,
               p.event_id AS purchase_id,
               v.user_id
        FROM events v
        JOIN events p
          ON v.user_id = p.user_id
         AND v.event_type = 'view' AND p.event_type = 'purchase'
         AND p.ts >= v.ts
         AND p.ts <= v.ts + INTERVAL '30 minutes'
        ORDER BY view_id, purchase_id
    """,
}
