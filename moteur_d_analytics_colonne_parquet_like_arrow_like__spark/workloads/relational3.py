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


def q_tpch_q4_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for orders with ≥1 line item
    shipped after the order date — correlated EXISTS, executed as a
    left-semi join with the correlation in the join condition (one shuffle
    on orderkey, no row duplication)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o, l = orders.alias("o"), li.alias("l")
    sem = o.join(
        l,
        (F.col("o.o_orderkey") == F.col("l.l_orderkey"))
        & (F.col("l.l_shipdate") > F.col("o.o_orderdate")),
        "left_semi",
    )
    return (
        sem.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch_q12_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation — high/low-priority line
    counts per return flag (CASE inside SUM, single pass)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    )
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q_tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — broadcast dim join +
    conditional/total aggregate ratio (decimal-routed for determinism)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,4)"))
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct"),
        F.sum(rev).cast("double").alias("total_revenue"),
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


def q_tpch_q2_mincost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): for each qualifying part, the
    EUROPE supplier(s) whose supply cost equals the minimum over all EUROPE
    suppliers of that part — the classic correlated MIN subquery.

    The testdata has no partsupp table, so supply cost is derived as
    MIN(l_extendedprice) per (part, supplier) over lineitem. Decorrelation
    the scalable way: the per-part minimum is a second aggregate joined back
    on partkey (one narrow shuffle on partkey), never a per-row subquery.
    Dimension joins (supplier⨝nation⨝region, part filter) broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    part = _t(spark, sf_dir, "part")

    eu_supp = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(
            F.broadcast(region.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supplycost")
    )
    eu_ps = ps.join(
        F.broadcast(eu_supp), ps.l_suppkey == eu_supp.s_suppkey
    )
    min_cost = eu_ps.groupBy("l_partkey").agg(
        F.min("supplycost").alias("min_cost")
    )
    best = eu_ps.join(min_cost, "l_partkey").where(
        F.col("supplycost") == F.col("min_cost")
    )
    qual_parts = part.where(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_brand")
    return (
        best.join(
            F.broadcast(qual_parts), best.l_partkey == qual_parts.p_partkey
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supplycost")
        .orderBy(
            F.col("s_acctbal").desc(),
            "n_name",
            "s_name",
            "p_partkey",
        )
        .limit(100)
    )


def q_tpch_q20_dominant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (quantity subquery): suppliers who shipped, for some
    part since 1996, more than a quarter of that part's total shipped quantity — an
    IN subquery whose HAVING compares against a correlated aggregate.

    Decorrelated: per-(part,supplier) sums join the per-part totals on
    partkey; the comparison is decimal-exact (qty*4 > total avoids
    fractional double rounding). Ends in a semi-join against supplier."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("1996-01-01")
    )
    supplier = _t(spark, sf_dir, "supplier")
    qty = F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(qty.alias("supp_qty"))
    per_part = li.groupBy("l_partkey").agg(qty.alias("part_qty"))
    dominant = (
        per_ps.join(per_part, "l_partkey")
        .where(F.col("supp_qty") * 4 > F.col("part_qty"))
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    return (
        supplier.join(dominant, "s_suppkey", "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


QUERIES = {
    "tpch_q2_mincost": q_tpch_q2_mincost,
    "tpch_q20_dominant": q_tpch_q20_dominant,
    "tpch_q6": q_tpch_q6,
    "tpch_q13": q_tpch_q13,
    "tpch_q18_having": q_tpch_q18_having,
    "tpch_q4_exists": q_tpch_q4_exists,
    "tpch_q12_conditional": q_tpch_q12_conditional,
    "tpch_q14_promo": q_tpch_q14_promo,
    "stream_stream_join": q_stream_stream_join,
}

ORACLES = {
    "tpch_q2_mincost": """
        WITH eu_supp AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ),
        ps AS (
            SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supplycost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        eu_ps AS (
            SELECT ps.*, s.s_name, s.s_acctbal, s.n_name
            FROM ps JOIN eu_supp s ON ps.l_suppkey = s.s_suppkey
        )
        SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_brand, e.supplycost
        FROM eu_ps e
        JOIN part p ON e.l_partkey = p.p_partkey
        WHERE p.p_size <= 10 AND p.p_type = 'STANDARD'
          AND e.supplycost = (
              SELECT MIN(e2.supplycost) FROM eu_ps e2
              WHERE e2.l_partkey = e.l_partkey
          )
        ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
        LIMIT 100
    """,
    "tpch_q20_dominant": """
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l1.l_suppkey
            FROM lineitem l1
            WHERE l1.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            GROUP BY l1.l_partkey, l1.l_suppkey
            HAVING SUM(CAST(l1.l_quantity AS DECIMAL(18,2))) * 4 > (
                SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                FROM lineitem l2
                WHERE l2.l_partkey = l1.l_partkey
                  AND l2.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            )
        )
        ORDER BY s_suppkey
    """,
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
    "tpch_q4_exists": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "tpch_q12_conditional": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "tpch_q14_promo": """
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS promo_revenue_pct,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        ORDER BY 1
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
