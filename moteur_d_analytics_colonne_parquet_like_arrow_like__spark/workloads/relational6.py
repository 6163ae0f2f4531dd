"""Sixth relational workload: time-series post-processing over the events
table — dense-grid resampling with forward-fill, robust (median/MAD)
anomaly detection, and percentile winsorization (operators/timeseries.py).

These are the passes a telemetry/feature pipeline layers on top of the
reference's time-pruned scans (reference: ABSENT — extension surface).
Determinism rules follow workloads/__init__: per-bucket averages route
through DECIMAL sums, exact-percentile stats are rounded to 6 decimals
BEFORE any threshold/clamp comparison so both engines compare identical
doubles, and timestamps are projected as strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import timeseries
from ..sources.catalog import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample + forward-fill per user: bucket events to hours
    (DECIMAL-exact mean value per bucket), then densify each user's
    timeline onto a full hourly grid from their first to last active hour
    and carry the last observation forward across the silent hours. The
    grid is a per-key ``explode(sequence(...))`` — map-side, bounded by
    each key's own span — and the fill is one window per user; the only
    shuffles are the bucket aggregate and the fill's partitionBy(user),
    which share the key."""
    ev = _events(spark, sf_dir).where(F.col("user_id") < 12)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("v_fill")
    )
    filled = timeseries.resample_ffill(
        hourly, "user_id", "h", "v_fill", step="1 hour"
    )
    return filled.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        "v_fill",
        "is_gap",
    ).orderBy("user_id", "hour")


def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type anomaly report: |value − median| > 3·1.4826·MAD.
    Median/MAD are immune to the outliers they hunt (the mean/stddev
    z-score is masked by its own anomalies). Two exact-median passes over
    the handful of event types, then the tiny stats table broadcasts back
    onto the facts — the event stream itself never shuffles."""
    ev = _events(spark, sf_dir).select("event_type", "value")
    stats, flagged = timeseries.mad_outliers(
        ev, "event_type", "value", k=3.0, round_stats=6
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_outlier").cast("bigint").alias("n_outliers"),
            F.first("med").alias("med_r"),
            F.first("mad").alias("mad_r"),
        )
        .orderBy("event_type")
    )


def q_events_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization per event type: clamp values into the
    [p01, p99] band and report how many rows clipped on each side plus the
    DECIMAL-exact mean before/after — the robust-feature pre-processing
    pass of a training pipeline. Exact interpolated percentiles on a
    bounded group count; bounds broadcast back; no fact shuffle."""
    ev = _events(spark, sf_dir).select("event_type", "value")
    w = timeseries.winsorize(
        ev, "event_type", "value", lower_p=0.01, upper_p=0.99, round_stats=6
    )
    return (
        w.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("value") < F.col("lo")).cast("int"))
            .cast("bigint")
            .alias("n_clip_low"),
            F.sum((F.col("value") > F.col("hi")).cast("int"))
            .cast("bigint")
            .alias("n_clip_high"),
            F.first("lo").alias("p01_r"),
            F.first("hi").alias("p99_r"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_raw_r"),
            F.round(
                F.sum(F.col("winsorized").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_winsor_r"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "events_gap_fill": q_events_gap_fill,
    "events_anomaly_mad": q_events_anomaly_mad,
    "events_winsorize": q_events_winsorize,
}

ORACLES = {
    "events_gap_fill": """
        WITH obs AS (
            SELECT user_id, date_trunc('hour', ts) AS h,
                   round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                         / COUNT(*), 6) AS v_fill
            FROM events WHERE user_id < 12
            GROUP BY user_id, date_trunc('hour', ts)
        ),
        span AS (
            SELECT user_id, MIN(h) AS h0, MAX(h) AS h1
            FROM obs GROUP BY user_id
        ),
        grid AS (
            SELECT user_id,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
            FROM span
        ),
        j AS (
            SELECT g.user_id, g.h, o.v_fill
            FROM grid g LEFT JOIN obs o
              ON o.user_id = g.user_id AND o.h = g.h
        )
        SELECT user_id,
               strftime(h, '%Y-%m-%d %H:00') AS hour,
               last_value(v_fill IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS v_fill,
               CAST(v_fill IS NULL AS INTEGER) AS is_gap
        FROM j
        ORDER BY user_id, h
    """,
    "events_anomaly_mad": """
        WITH st AS (
            SELECT event_type, round(median(value), 6) AS med
            FROM events GROUP BY event_type
        ),
        md AS (
            SELECT e.event_type,
                   round(median(abs(e.value - st.med)), 6) AS mad
            FROM events e JOIN st USING (event_type)
            GROUP BY e.event_type
        ),
        fl AS (
            SELECT e.event_type, st.med, md.mad,
                   CASE WHEN abs(e.value - st.med) > 3.0 * 1.4826 * md.mad
                        THEN 1 ELSE 0 END AS o
            FROM events e
            JOIN st USING (event_type) JOIN md USING (event_type)
        )
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(o) AS BIGINT) AS n_outliers,
               med AS med_r, mad AS mad_r
        FROM fl GROUP BY event_type, med, mad
        ORDER BY event_type
    """,
    "events_winsorize": """
        WITH b AS (
            SELECT event_type,
                   round(quantile_cont(value, 0.01), 6) AS lo,
                   round(quantile_cont(value, 0.99), 6) AS hi
            FROM events GROUP BY event_type
        ),
        w AS (
            SELECT e.event_type, e.value, b.lo, b.hi,
                   least(greatest(e.value, b.lo), b.hi) AS winsorized
            FROM events e JOIN b USING (event_type)
        )
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clip_low,
               CAST(SUM(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clip_high,
               lo AS p01_r, hi AS p99_r,
               round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_raw_r,
               round(CAST(SUM(CAST(winsorized AS DECIMAL(18,6))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_winsor_r
        FROM w GROUP BY event_type, lo, hi
        ORDER BY event_type
    """,
}


def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct customers per month via Spark's bitmap aggregate
    family (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_count) — the mergeable-exact-distinct
    strategy: keys hash to fixed 4096-bit bucket bitmaps that are
    map-side combinable and MERGEABLE (unlike count-distinct's expand,
    which shuffles every raw key; unlike HLL, zero error). At 100 TB
    the shuffle moves (months x occupied buckets) half-KB bitmaps, not
    raw keys, and persisted per-partition bitmaps OR together for
    incremental maintenance. The oracle is plain COUNT(DISTINCT)."""
    orders = load_table(spark, sf_dir, "orders")
    b = orders.select(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        ),
        F.expr("bitmap_bucket_number(o_custkey)").alias("__bkt"),
        F.expr("bitmap_bit_position(o_custkey)").alias("__pos"),
    )
    per_bucket = b.groupBy("month", "__bkt").agg(
        F.expr("bitmap_construct_agg(__pos)").alias("__bm")
    )
    return (
        per_bucket.groupBy("month")
        .agg(
            F.sum(F.expr("bitmap_count(__bm)")).cast("bigint").alias(
                "n_customers"
            )
        )
        .orderBy("month")
    )


QUERIES["agg_bitmap_distinct"] = q_agg_bitmap_distinct

ORACLES["agg_bitmap_distinct"] = """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders GROUP BY 1 ORDER BY month
"""
