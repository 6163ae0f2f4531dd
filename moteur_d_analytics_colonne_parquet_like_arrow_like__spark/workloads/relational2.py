"""Second relational workload: subqueries, pivot, JSON extraction, exact
percentiles, deterministic sampling, grouping sets, stream-static join.

Rounds out the query surface a reference user would expect from a general
engine (SURVEY.md §2.4-2.9 extensions), each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import stable_hash60
from ..operators import sorts
from ..sources.catalog import load_table
from .. import streaming as S


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price. The subquery
    is one tiny aggregate broadcast into the scan filter."""
    orders = _t(spark, sf_dir, "orders")
    avg_price = orders.agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) / F.count(F.lit(1)))
        .cast("double")
        .alias("avg_p")
    )
    return (
        orders.join(F.broadcast(avg_price))
        .where(F.col("o_totalprice") > F.col("avg_p"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subquery (decorrelated the scalable way): each customer's
    orders above that customer's own average — expressed as a join against
    the per-customer aggregate, which is what a decorrelation rewrite
    produces; one shuffle on custkey."""
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) / F.count(F.lit(1)))
        .cast("double")
        .alias("cust_avg")
    )
    return (
        orders.join(per_cust, "o_custkey")
        .where(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts: one row per user decile, one column per event
    type. Pivot compiles to conditional aggregation — one pass, no joins."""
    events = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    decile = F.pmod(F.col("user_id"), F.lit(10)).alias("user_decile")
    return (
        events.select(decile, "event_type")
        .groupBy("user_decile")
        .pivot("event_type", types)
        .count()
        .na.fill(0)
        .orderBy("user_decile")
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props column + aggregation on the
    extracted value (get_json_object → JVM-side JSON path)."""
    events = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) of quantity per return flag.
    At 100 TB this becomes approx_percentile (t-digest sketch); exact form
    kept because it is oracle-checkable."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("p50"),
            F.expr("percentile(l_quantity, 0.9)").alias("p90"),
            F.expr("percentile(l_quantity, 0.99)").alias("p99"),
        )
        .orderBy("l_returnflag")
    )


def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% systematic sample via stable hash of the key —
    reproducible across engines and runs (unlike RNG-based sampling), which
    is what a training-data pipeline needs for holdout splits."""
    li = _t(spark, sf_dir, "lineitem")
    bucket = F.pmod(
        stable_hash60(F.concat_ws("-", "l_orderkey", "l_linenumber")), F.lit(100)
    )
    return (
        li.where(bucket < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): (flag), (status), ()."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
               COALESCE(l_linestatus, 'ALL') AS l_linestatus,
               COUNT(*) AS cnt
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag, l_linestatus
        """
    )


def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: streaming events joined to the static
    customer dim (broadcast per micro-batch), then aggregated. The canonical
    streaming enrichment shape — dim lookups never stall the stream."""
    stream = S.events_stream(spark, sf_dir)
    customer = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = stream.join(F.broadcast(customer), "user_id", "inner")
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )
    return S.run_to_memory(agg, output_mode="update", shuffle_partitions=8).orderBy("c_mktsegment")


def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — the 100 TB substitutes for exact distinct/
    percentiles: HLL++ cardinality + quantile sketches in one pass.

    Sketch values are engine-private, so the hash-checkable output is the
    EXACT values plus booleans asserting each sketch landed within its
    documented error bound (the oracle emits the exact values and literal
    TRUE): HLL++ at rsd=0.02 checked against a 10% bound; percentile_approx
    at accuracy=1000 checked against max(5% relative, 1.0 absolute).

    r14 (VERDICT r13 item 7): the exact COUNT(DISTINCT) no longer rides
    the same aggregate as the sketches. Spark's single-distinct-column
    plan re-keys the WHOLE aggregation by (group, distinct-col) before
    the final group-by — which dragged every imperative buffer
    (percentile counts-map, two QuantileSummaries, the HLL registers)
    through a ~200k-group partial aggregate, one buffer set per
    (returnflag, partkey): the measured 18 s sf0.1 / 63 s sf1 wall was
    buffer churn, not truth-side arithmetic. Split form: the sketch +
    exact-percentile pass stays keyed by the 3-value flag alone (3
    buffers per task), and the distinct count runs its own expand-free
    two-phase distinct→count, broadcast-joined back on the 3-row output.
    Value note: HLL register-max merges and exact-percentile counts-map
    merges are order-independent, so those columns are bit-identical;
    percentile_approx partial-merge TOPOLOGY changes, but only the
    within-bound BOOLEANS are emitted (accuracy=1000 ≈ 0.1% error vs the
    5% bound) — oracle unchanged, hash-identical at both SFs."""
    li = _t(spark, sf_dir, "lineitem")
    tol = lambda exact: F.greatest(F.abs(exact) * 0.05, F.lit(1.0))  # noqa: E731
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("_hll"),
        F.expr("percentile(l_quantity, 0.5)").alias("exact_p50"),
        F.percentile_approx("l_quantity", 0.5, 1000).alias("_p50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("exact_p90_price"),
        F.percentile_approx("l_extendedprice", 0.9, 1000).alias("_p90"),
    )
    exact_parts = (
        li.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_parts"))
    )
    agg = sketches.join(F.broadcast(exact_parts), "l_returnflag")
    out = agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("_hll") - F.col("exact_parts"))
            <= F.col("exact_parts") * 0.10
        ).alias("hll_within_bound"),
        "exact_p50",
        (F.abs(F.col("_p50") - F.col("exact_p50")) <= tol(F.col("exact_p50"))).alias(
            "p50_within_bound"
        ),
        "exact_p90_price",
        (
            F.abs(F.col("_p90") - F.col("exact_p90_price"))
            <= tol(F.col("exact_p90_price"))
        ).alias("p90_within_bound"),
    )
    # 3-row flag-domain-bounded output: local sort, not a range exchange.
    return sorts.order_by_bounded(out, ["l_returnflag"])


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist over
    part price within brand (one shared window exchange)."""
    from pyspark.sql import Window

    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").asc(), F.col("p_partkey").asc()
    )
    return part.select(
        "p_brand",
        "p_partkey",
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
    ).orderBy("p_brand", "p_partkey")


def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time arithmetic surface: truncation, offsets, deltas, extract."""
    orders = _t(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_month"
        ),
        F.date_format(F.date_add(od, 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.lit("1998-12-31").cast("date"), od).cast("bigint").alias(
            "age_days"
        ),
        F.dayofweek(od).cast("bigint").alias("dow"),
        F.quarter(od).cast("bigint").alias("qtr"),
        F.last_day(od).cast("string").alias("month_end"),
    ).orderBy("o_orderkey")


QUERIES = {
    "agg_approx_sketches": q_approx_sketches,
    "window_distribution": q_window_distribution,
    "date_arithmetic": q_date_arithmetic,
    "subquery_scalar": q_subquery_scalar,
    "subquery_correlated": q_subquery_correlated,
    "pivot_event_types": q_pivot,
    "json_extract": q_json_extract,
    "agg_percentiles": q_percentiles,
    "sample_hash": q_sample_hash,
    "agg_grouping_sets": q_grouping_sets,
    "stream_static_join": q_stream_static_join,
}

ORACLES = {
    "agg_approx_sketches": """
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS exact_parts,
               TRUE AS hll_within_bound,
               quantile_cont(l_quantity, 0.5) AS exact_p50,
               TRUE AS p50_within_bound,
               quantile_cont(l_extendedprice, 0.9) AS exact_p90_price,
               TRUE AS p90_within_bound
        FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "window_distribution": """
        SELECT p_brand, p_partkey,
               NTILE(4) OVER w AS price_quartile,
               PERCENT_RANK() OVER w AS price_pct_rank,
               CUME_DIST() OVER w AS price_cume_dist
        FROM part
        WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice ASC, p_partkey ASC)
        ORDER BY p_brand, p_partkey
    """,
    "date_arithmetic": """
        SELECT o_orderkey,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
               strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
               CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS age_days,
               CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow,
               CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
        FROM orders
        ORDER BY o_orderkey
    """,
    "subquery_scalar": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / COUNT(*) AS DOUBLE)
            FROM orders
        )
        ORDER BY o_orderkey
    """,
    "subquery_correlated": """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders o
        JOIN (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / COUNT(*) AS DOUBLE) AS cust_avg
            FROM orders GROUP BY o_custkey
        ) a USING (o_custkey)
        WHERE o_totalprice > cust_avg
        ORDER BY o_orderkey
    """,
    "pivot_event_types": """
        SELECT user_id % 10 AS user_decile,
               COUNT(*) FILTER (event_type = 'click') AS click,
               COUNT(*) FILTER (event_type = 'error') AS error,
               COUNT(*) FILTER (event_type = 'purchase') AS purchase,
               COUNT(*) FILTER (event_type = 'signup') AS signup,
               COUNT(*) FILTER (event_type = 'view') AS view
        FROM events
        GROUP BY 1 ORDER BY 1
    """,
    "json_extract": """
        SELECT event_type,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
               MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        FROM events
        GROUP BY event_type ORDER BY event_type
    """,
    "agg_percentiles": """
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS p50,
               quantile_cont(l_quantity, 0.9) AS p90,
               quantile_cont(l_quantity, 0.99) AS p99
        FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "sample_hash": """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE CAST(concat('0x', substr(md5(concat_ws('-', l_orderkey, l_linenumber)), 1, 15)) AS BIGINT) % 100 < 10
        ORDER BY l_orderkey, l_linenumber
    """,
    "agg_grouping_sets": """
        SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
               COALESCE(l_linestatus, 'ALL') AS l_linestatus,
               COUNT(*) AS cnt
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag, l_linestatus
    """,
    "stream_static_join": """
        SELECT c_mktsegment,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
}
