"""Model-evaluation and data-repair workload: distributed tie-aware AUC,
exact linear gap interpolation, consistent-hash shard rebalancing, and an
integer batch-perceptron trainer (reference: ABSENT — SURVEY.md §2
extension surface; these are the evaluation/serving primitives a curation
pipeline runs AROUND the reference's scan/agg verbs).

Determinism rules follow workloads/__init__: every cross-engine number is
BIGINT end to end — scores quantize to cents/milli via ``round(x·10^k)``
(the doubles carry exactly 2 decimals, so the product is integer-valued
±1 ulp and rounds identically in both engines), rank sums stay
doubled-integer, interpolation is a floor-division lerp, and ratios ship
as integer micro-units (``div`` in Spark, ``//`` in DuckDB — both
truncate toward zero; all operands here are non-negative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import stats, timeseries
from ..sources.catalog import load_table


QUERIES: dict = {}
ORACLES: dict = {}


# ------------------------------------------------------------------ AUC


def q_events_auc_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the event ``value`` discriminate purchases from everything
    else? Tie-aware Mann-Whitney AUC of the cent-quantized value against
    the purchase label (operators/stats.auc_rank): facts reduce once to
    distinct-score cells, the strictly-below counts ride the two-phase
    chunked prefix scan (never a single-task global window), and the AUC
    ships as exact integer micro-units."""
    ev = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100)
        .cast("bigint")
        .alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    return stats.auc_rank(ev, "score", "y", chunk=1000)


QUERIES["events_auc_value"] = q_events_auc_value

ORACLES["events_auc_value"] = """
WITH s AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
), g AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM s GROUP BY score
), c AS (
  SELECT pos, cnt,
         CAST(SUM(cnt) OVER (ORDER BY score
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM g
), tot AS (
  SELECT CAST(SUM(pos * (2 * (cum - cnt) + cnt + 1)) AS BIGINT) AS r2s,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(cnt - pos) AS BIGINT) AS n_neg
  FROM c
)
SELECT n_pos, n_neg,
       CAST(((r2s - n_pos * (n_pos + 1)) * 1000000)
            // (2 * n_pos * n_neg) AS BIGINT) AS auc_micro
FROM tot
"""


# -------------------------------------------------- linear interpolation


def q_events_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly timeline repair by LINEAR interpolation: bucket a
    12-user cohort's events to epoch-hour cells (integer milli mean —
    sum-of-milli div count, exact), densify each user's own hour range,
    and fill interior silent hours with the floor-division lerp between
    the flanking observations (operators/timeseries.interpolate_linear).
    The two-sided sibling of events_gap_fill's forward-fill."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 12)
    hourly = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 3600000000").alias("hour_idx"),
        F.round(F.col("value") * 1000).cast("bigint").alias("v_milli"),
    ).groupBy("user_id", "hour_idx").agg(
        F.expr("sum(v_milli) div count(1)").cast("bigint").alias("v_milli")
    )
    out = timeseries.interpolate_linear(
        hourly, "user_id", "hour_idx", "v_milli"
    )
    return out.orderBy("user_id", "hour_idx")


QUERIES["events_interpolate_linear"] = q_events_interpolate_linear

ORACLES["events_interpolate_linear"] = """
WITH hourly AS MATERIALIZED (
  SELECT user_id,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
         CAST(SUM(CAST(round(value * 1000) AS BIGINT)) // COUNT(*)
              AS BIGINT) AS v_obs
  FROM events WHERE user_id < 12
  GROUP BY 1, 2
), span AS (
  SELECT user_id, MIN(h) AS i0, MAX(h) AS i1 FROM hourly GROUP BY 1
), grid AS (
  SELECT s.user_id, gs.h
  FROM span s, LATERAL unnest(generate_series(s.i0, s.i1)) AS gs(h)
), sided AS (
  SELECT g.user_id, g.h,
         CASE WHEN o.v_obs IS NULL THEN 1 ELSE 0 END AS is_gap,
         last_value(o.v_obs IGNORE NULLS) OVER w_prev AS v0,
         last_value(CASE WHEN o.v_obs IS NOT NULL THEN g.h END
                    IGNORE NULLS) OVER w_prev AS t0,
         first_value(o.v_obs IGNORE NULLS) OVER w_next AS v1,
         first_value(CASE WHEN o.v_obs IS NOT NULL THEN g.h END
                     IGNORE NULLS) OVER w_next AS t1
  FROM grid g LEFT JOIN hourly o ON g.user_id = o.user_id AND g.h = o.h
  WINDOW
    w_prev AS (PARTITION BY g.user_id ORDER BY g.h
               ROWS UNBOUNDED PRECEDING),
    w_next AS (PARTITION BY g.user_id ORDER BY g.h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, h AS hour_idx,
       CAST(CASE WHEN is_gap = 0 THEN v0
                 ELSE (v0 * (t1 - h) + v1 * (h - t0)) // (t1 - t0)
            END AS BIGINT) AS v_milli,
       is_gap
FROM sided
ORDER BY user_id, hour_idx
"""
