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


# ------------------------------------------------- consistent-hash shards


def q_docs_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resharding-cost audit for growing a 16-node document store to 17
    under consistent hashing (operators/sampling.consistent_shard_assign):
    per current node, how many docs it holds, how many leave when node 16
    joins, and how many of those land ON the new node — consistent
    hashing's contract is that every mover goes to the new node (the two
    columns must be equal; the pytest asserts it), vs mod-N sharding
    which would move ~16/17 of everything."""
    from ..operators import sampling

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = sampling.consistent_shard_assign(
        docs, "doc_id", 16, out_col="node_before"
    )
    b = sampling.consistent_shard_assign(
        a, "doc_id", 17, out_col="node_after"
    )
    return (
        b.groupBy("node_before")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                (F.col("node_after") != F.col("node_before")).cast("int")
            )
            .cast("bigint")
            .alias("n_moved"),
            F.sum((F.col("node_after") == 16).cast("int"))
            .cast("bigint")
            .alias("n_to_new"),
        )
        .orderBy("node_before")
    )


QUERIES["docs_shard_rebalance"] = q_docs_shard_rebalance

# One ring, both views: node < 16 restricts the successor search to the
# 16-node ring; the unrestricted search is the 17-node ring (the new
# node's vnodes only ADD points, never move existing ones).
ORACLES["docs_shard_rebalance"] = """
WITH ring AS MATERIALIZED (
  SELECT i.i AS node,
         CAST(concat('0x', substr(md5('node' || i.i || '#v' || j.j), 1, 15))
              AS BIGINT) AS point
  FROM (SELECT unnest(generate_series(0, 16)) AS i) i,
       (SELECT unnest(generate_series(0, 7)) AS j) j
), keys AS MATERIALIZED (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM documents
), assign AS (
  SELECT k.doc_id,
         COALESCE(arg_min(r.node, r.point)
                    FILTER (WHERE r.point >= k.h AND r.node < 16),
                  arg_min(r.node, r.point) FILTER (WHERE r.node < 16)
         ) AS node_before,
         COALESCE(arg_min(r.node, r.point) FILTER (WHERE r.point >= k.h),
                  arg_min(r.node, r.point)
         ) AS node_after
  FROM keys k CROSS JOIN ring r
  GROUP BY k.doc_id, k.h
)
SELECT CAST(node_before AS INT) AS node_before,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN node_after <> node_before THEN 1 ELSE 0 END)
            AS BIGINT) AS n_moved,
       CAST(SUM(CASE WHEN node_after = 16 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_to_new
FROM assign
GROUP BY node_before
ORDER BY node_before
"""


# ------------------------------------------------------ batch perceptron


def _perceptron_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.when(F.col("event_type") == "purchase", F.lit(1))
        .otherwise(F.lit(-1))
        .cast("bigint")
        .alias("y"),
        F.lit(1).cast("bigint").alias("x_bias"),
        F.round(F.col("value") * 100).cast("bigint").alias("x_cents"),
        F.expr("(unix_micros(ts) div 3600000000) % 24")
        .cast("bigint")
        .alias("x_hour"),
        F.expr("(unix_micros(ts) div 86400000000) % 7")
        .cast("bigint")
        .alias("x_dow"),
    )


def q_events_perceptron(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a purchase-vs-rest linear classifier with the exact integer
    batch perceptron (operators/stats.perceptron_train, 3 epochs) on
    value-cents / hour-of-day / epoch-day-weekday features. The weights
    and the final-margin accuracy are BIGINT-exact — a deterministic,
    partitioning-invariant stand-in for the quality-classifier training
    step of a curation pipeline (one combinable aggregate per epoch;
    the model re-enters as literals, the facts never shuffle)."""
    feats = _perceptron_features(spark, sf_dir)
    return stats.perceptron_train(
        feats, ["x_bias", "x_cents", "x_hour", "x_dow"], "y", epochs=3
    )


QUERIES["events_perceptron"] = q_events_perceptron

# Three unrolled epochs (w0 = 0 makes epoch 1's "misclassified" set the
# whole table); each epoch is one aggregate over the feature CTE joined
# to the previous 1-row weight CTE — MATERIALIZED so DuckDB never inlines
# the feature scan into each reference.
ORACLES["events_perceptron"] = """
WITH f AS MATERIALIZED (
  SELECT CASE WHEN event_type = 'purchase' THEN CAST(1 AS BIGINT)
              ELSE CAST(-1 AS BIGINT) END AS y,
         CAST(1 AS BIGINT) AS x0,
         CAST(round(value * 100) AS BIGINT) AS x1,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS x2,
         CAST((epoch_us(ts) // 86400000000) % 7 AS BIGINT) AS x3
  FROM events
), w1 AS MATERIALIZED (
  SELECT CAST(SUM(y * x0) AS BIGINT) AS a0,
         CAST(SUM(y * x1) AS BIGINT) AS a1,
         CAST(SUM(y * x2) AS BIGINT) AS a2,
         CAST(SUM(y * x3) AS BIGINT) AS a3
  FROM f
), w2 AS MATERIALIZED (
  SELECT CAST(w1.a0 + COALESCE(SUM(CASE WHEN y * (w1.a0*x0 + w1.a1*x1
               + w1.a2*x2 + w1.a3*x3) <= 0 THEN y * x0 END), 0) AS BIGINT) AS a0,
         CAST(w1.a1 + COALESCE(SUM(CASE WHEN y * (w1.a0*x0 + w1.a1*x1
               + w1.a2*x2 + w1.a3*x3) <= 0 THEN y * x1 END), 0) AS BIGINT) AS a1,
         CAST(w1.a2 + COALESCE(SUM(CASE WHEN y * (w1.a0*x0 + w1.a1*x1
               + w1.a2*x2 + w1.a3*x3) <= 0 THEN y * x2 END), 0) AS BIGINT) AS a2,
         CAST(w1.a3 + COALESCE(SUM(CASE WHEN y * (w1.a0*x0 + w1.a1*x1
               + w1.a2*x2 + w1.a3*x3) <= 0 THEN y * x3 END), 0) AS BIGINT) AS a3
  FROM f, w1
  GROUP BY w1.a0, w1.a1, w1.a2, w1.a3
), w3 AS MATERIALIZED (
  SELECT CAST(w2.a0 + COALESCE(SUM(CASE WHEN y * (w2.a0*x0 + w2.a1*x1
               + w2.a2*x2 + w2.a3*x3) <= 0 THEN y * x0 END), 0) AS BIGINT) AS a0,
         CAST(w2.a1 + COALESCE(SUM(CASE WHEN y * (w2.a0*x0 + w2.a1*x1
               + w2.a2*x2 + w2.a3*x3) <= 0 THEN y * x1 END), 0) AS BIGINT) AS a1,
         CAST(w2.a2 + COALESCE(SUM(CASE WHEN y * (w2.a0*x0 + w2.a1*x1
               + w2.a2*x2 + w2.a3*x3) <= 0 THEN y * x2 END), 0) AS BIGINT) AS a2,
         CAST(w2.a3 + COALESCE(SUM(CASE WHEN y * (w2.a0*x0 + w2.a1*x1
               + w2.a2*x2 + w2.a3*x3) <= 0 THEN y * x3 END), 0) AS BIGINT) AS a3
  FROM f, w2
  GROUP BY w2.a0, w2.a1, w2.a2, w2.a3
)
SELECT w3.a0 AS w_x_bias, w3.a1 AS w_x_cents,
       w3.a2 AS w_x_hour, w3.a3 AS w_x_dow,
       CAST(SUM(CASE WHEN y * (w3.a0*x0 + w3.a1*x1 + w3.a2*x2
                + w3.a3*x3) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(COUNT(*) AS BIGINT) AS n_total
FROM f, w3
GROUP BY w3.a0, w3.a1, w3.a2, w3.a3
"""


# ---------------------------------------------------- image dHash near-dup


def q_multimodal_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate image detection end to end: real 24-bit
    BMP blobs (operators/multimodal.generate_real_media) → pixel-level
    dHash decoded from the actual bytes (image_dhash) → banded Hamming
    join (dhash_near_pairs, exact recall at <= 3 bits via pigeonhole).
    The oracle never sees the bytes: it recomputes every pixel from the
    generator's analytic formula ((7i+13) mod 256 over bottom-up BGR
    rows) in SQL — one byte off in the writer, the parser, or the grid
    math and the hashes diverge."""
    from ..operators import multimodal

    media = multimodal.generate_real_media(spark, 2400)
    hashes = multimodal.image_dhash(media.where(F.col("kind") == "image"))
    pairs = multimodal.dhash_near_pairs(hashes, max_hamming=3)
    return pairs.orderBy("id_a", "id_b")


QUERIES["multimodal_dhash_neardup"] = q_multimodal_dhash_neardup

# The generator's image law: ids ≡ 0 (mod 3) < 2400, width (id%31+1)*4,
# height (id%23+1)*4, stride 3w (w is a multiple of 4), pixel byte i =
# (7i+13) mod 256, rows stored bottom-up. The oracle rebuilds the 8x9
# cell grid per image and compares hashes all-pairs (716 images — the
# banding is a Spark-side scale device, not a semantic).
ORACLES["multimodal_dhash_neardup"] = """
WITH img AS MATERIALIZED (
  SELECT i.i AS media_id,
         ((i.i % 31) + 1) * 4 AS w,
         ((i.i % 23) + 1) * 4 AS h
  FROM (SELECT unnest(generate_series(0, 2399)) AS i) i
  WHERE i.i % 3 = 0 AND ((i.i % 31) + 1) * 4 >= 9
        AND ((i.i % 23) + 1) * 4 >= 8
), px AS (
  SELECT media_id, w, h, x.x AS x, y.y AS y,
         ((h - 1 - y.y) * 3 * w + 3 * x.x) AS base
  FROM img,
       LATERAL unnest(generate_series(0, w - 1)) AS x(x),
       LATERAL unnest(generate_series(0, h - 1)) AS y(y)
), gray AS (
  SELECT media_id,
         (((base * 7 + 13) % 256) + (((base + 1) * 7 + 13) % 256)
          + (((base + 2) * 7 + 13) % 256)) // 3 AS g,
         (x * 9) // w AS cx, (y * 8) // h AS cy
  FROM px
), cells AS (
  SELECT media_id, cy, cx, SUM(g) // COUNT(*) AS avgv
  FROM gray GROUP BY media_id, cy, cx
), bits AS (
  SELECT a.media_id, a.cy AS r, a.cx AS c,
         CASE WHEN a.avgv > b.avgv THEN 1 ELSE 0 END AS bit
  FROM cells a JOIN cells b
    ON b.media_id = a.media_id AND b.cy = a.cy AND b.cx = a.cx + 1
), hashes AS MATERIALIZED (
  SELECT media_id,
         CAST(SUM(CASE WHEN r * 8 + c >= 32
              THEN bit * (CAST(1 AS BIGINT) << (r * 8 + c - 32))
              ELSE 0 END) AS BIGINT) AS hi,
         CAST(SUM(CASE WHEN r * 8 + c < 32
              THEN bit * (CAST(1 AS BIGINT) << (r * 8 + c))
              ELSE 0 END) AS BIGINT) AS lo
  FROM bits GROUP BY media_id
)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
            AS INT) AS hamming
FROM hashes a JOIN hashes b ON a.media_id < b.media_id
WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
ORDER BY id_a, id_b
"""


# --------------------------------------------------- LOO target encoding


def q_events_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free user-level purchase-propensity feature: leave-one-out
    smoothed target encoding of user_id against the purchase label
    (operators/stats.target_encode_loo, m=20). The encoding depends only
    on (user, own-label), so the output groups to at most two rows per
    user — n rows sharing each encoded value plus the exact micro-unit
    value itself (min == max within a group; the pytest asserts it)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    enc = stats.target_encode_loo(ev, "user_id", "y", m=20)
    return (
        enc.groupBy("user_id", "y")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("te_micro").alias("te_micro"),
        )
        .orderBy("user_id", "y")
    )


QUERIES["events_target_encode_loo"] = q_events_target_encode_loo

ORACLES["events_target_encode_loo"] = """
WITH f AS MATERIALIZED (
  SELECT user_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
), per_cat AS (
  SELECT user_id, CAST(SUM(y) AS BIGINT) AS s_c,
         CAST(COUNT(*) AS BIGINT) AS n_c
  FROM f GROUP BY user_id
), prior AS (
  SELECT CAST(SUM(y) AS BIGINT) AS p_num,
         CAST(COUNT(*) AS BIGINT) AS p_den
  FROM f
)
SELECT f.user_id, f.y, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(((s_c - y) * p_den + 20 * p_num) * 1000000
                // ((n_c - 1 + 20) * p_den)) AS BIGINT) AS te_micro
FROM f JOIN per_cat USING (user_id) CROSS JOIN prior
GROUP BY f.user_id, f.y
ORDER BY f.user_id, f.y
"""


# ------------------------------------------------------ calibration curve


def q_events_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for "value predicts purchase": equi-depth
    cent-score deciles (ties keep together) with the observed purchase
    rate per bucket in exact micro-units
    (operators/stats.calibration_curve) — the companion readout to
    events_auc_value. The distinct-cent grid is bounded by the value
    range, and the cumulative still rides the chunked two-phase scan."""
    ev = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("bigint").alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    return stats.calibration_curve(ev, "score", "y", n_buckets=10)


QUERIES["events_calibration"] = q_events_calibration

ORACLES["events_calibration"] = """
WITH s AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
), g AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM s GROUP BY score
), c AS (
  SELECT score, cnt, pos,
         CAST(SUM(cnt) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum
  FROM g
), t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM g)
SELECT CAST(((cum - cnt) * 10) // n + 1 AS BIGINT) AS bucket,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(SUM(pos) AS BIGINT) AS n_pos,
       MIN(score) AS min_score,
       MAX(score) AS max_score,
       CAST((SUM(pos) * 1000000) // SUM(cnt) AS BIGINT) AS pos_rate_micro
FROM c CROSS JOIN t
GROUP BY 1
ORDER BY bucket
"""


# ------------------------------------------------------------- PSI drift


def q_events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-drift meter: PSI of the cent-quantized value distribution
    between the first half of January (reference window) and the rest
    (serving window), binned by the reference deciles with Laplace
    smoothing (operators/stats.psi_drift). Per-bin terms ship rounded
    (the mix-KL float rule); Σ psi_term_r is the headline PSI."""
    ev = load_table(spark, sf_dir, "events").select(
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("score"),
    )
    cut = F.lit("2024-01-16").cast("timestamp")
    return stats.psi_drift(
        ev.where(F.col("ts") < cut).select("score"),
        ev.where(F.col("ts") >= cut).select("score"),
        "score",
        n_buckets=10,
    )


QUERIES["events_psi_drift"] = q_events_psi_drift

ORACLES["events_psi_drift"] = """
WITH av AS MATERIALIZED (
  SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
  WHERE ts < TIMESTAMP '2024-01-16'
), bv AS MATERIALIZED (
  SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
  WHERE ts >= TIMESTAMP '2024-01-16'
), ga AS MATERIALIZED (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM av GROUP BY v
), gb AS MATERIALIZED (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM bv GROUP BY v
), cum AS (
  SELECT v, c,
         CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cumc
  FROM ga
), ta AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM ga),
bucketed AS (
  SELECT v, c, CAST(((cumc - c) * 10) // n AS BIGINT) + 1 AS bucket
  FROM cum CROSS JOIN ta
), edges AS MATERIALIZED (
  SELECT bucket, MAX(v) AS edge FROM bucketed GROUP BY bucket
  HAVING bucket < 10
), bins_a AS (
  SELECT g.v, g.c, 1 + COUNT(e.edge) AS bin
  FROM ga g LEFT JOIN edges e ON e.edge < g.v GROUP BY g.v, g.c
), bins_b AS (
  SELECT g.v, g.c, 1 + COUNT(e.edge) AS bin
  FROM gb g LEFT JOIN edges e ON e.edge < g.v GROUP BY g.v, g.c
), na AS (SELECT bin, CAST(SUM(c) AS BIGINT) AS n_a FROM bins_a GROUP BY bin),
nb AS (SELECT bin, CAST(SUM(c) AS BIGINT) AS n_b FROM bins_b GROUP BY bin),
spine AS (SELECT unnest(generate_series(1, 10)) AS bin),
counts AS (
  SELECT s.bin,
         COALESCE(na.n_a, 0) AS n_a,
         COALESCE(nb.n_b, 0) AS n_b
  FROM spine s LEFT JOIN na ON na.bin = s.bin LEFT JOIN nb ON nb.bin = s.bin
), totals AS (
  SELECT CAST(SUM(n_a) AS BIGINT) AS ta_n,
         CAST(SUM(n_b) AS BIGINT) AS tb_n
  FROM counts
)
SELECT CAST(bin AS INT) AS bin, n_a, n_b,
       round((CAST(n_a + 1 AS DOUBLE) / (ta_n + 10)
              - CAST(n_b + 1 AS DOUBLE) / (tb_n + 10))
             * ln((CAST(n_a + 1 AS DOUBLE) / (ta_n + 10))
                  / (CAST(n_b + 1 AS DOUBLE) / (tb_n + 10))), 6)
         AS psi_term_r
FROM counts CROSS JOIN totals
ORDER BY bin
"""


# ------------------------------------------------------ exact percentiles


def q_events_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-off latency-style percentiles: the EXACT p50/p90/p99/p99.9 of
    the cent-quantized event value (operators/stats.exact_percentiles) —
    distinct-value cells + the chunked two-phase cumulative, no sketch
    error, no global sort. The exact twin of the sketch-based
    incremental_quantiles surface."""
    ev = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("bigint").alias("score")
    )
    return stats.exact_percentiles(
        ev, "score", permille=(500, 900, 990, 999)
    )


QUERIES["events_exact_percentiles"] = q_events_exact_percentiles

ORACLES["events_exact_percentiles"] = """
WITH s AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
), g AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM s GROUP BY v
), c AS (
  SELECT v, cnt,
         CAST(SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum
  FROM g
), t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM g),
q AS (SELECT unnest([500, 900, 990, 999]) AS permille)
SELECT CAST(q.permille AS INT) AS permille,
       CAST((q.permille * t.n + 999) // 1000 AS BIGINT) AS rank_q,
       c.v AS value
FROM q CROSS JOIN t JOIN c
  ON (q.permille * t.n + 999) // 1000 BETWEEN c.cum - c.cnt + 1 AND c.cum
ORDER BY permille
"""


# ------------------------------------------------------ Theil-Sen trend


def q_orders_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-revenue trend: Theil–Sen median slope (milli-cents
    per day) over the per-day revenue reduction
    (operators/stats.theil_sen_slope) — the calendar-bounded all-pairs
    median that up to ~29% outlier days cannot move, next to the
    OLS-based regression queries it complements."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"
        ).cast("bigint").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "rev_cents"
        )
    )
    return stats.theil_sen_slope(daily, "day", "rev_cents", scale=1000)


QUERIES["orders_theil_sen"] = q_orders_theil_sen

ORACLES["orders_theil_sen"] = """
WITH daily AS MATERIALIZED (
  SELECT CAST(date_diff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev
  FROM orders GROUP BY 1
), slopes AS MATERIALIZED (
  SELECT CAST(((b.rev - a.rev) * 1000) // (b.day - a.day) AS BIGINT)
           AS slope
  FROM daily a JOIN daily b ON a.day < b.day
), g AS (
  SELECT slope, CAST(COUNT(*) AS BIGINT) AS cnt FROM slopes GROUP BY slope
), c AS (
  SELECT slope, cnt,
         CAST(SUM(cnt) OVER (ORDER BY slope ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum
  FROM g
), t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM g)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_points,
       t.n AS n_pairs,
       c.slope AS slope_median
FROM t JOIN c ON (500 * t.n + 999) // 1000 BETWEEN c.cum - c.cnt + 1 AND c.cum
"""


# ------------------------------------------------- hashing-trick features

_BOW_BUCKETS = 16


def q_docs_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick bag-of-words featurization — the fastText/Vowpal
    input layer: every token maps to ``h60(token) mod 16`` and each
    document becomes a fixed-width integer count vector, with no vocab
    dictionary to build, ship, or keep consistent (the property that
    makes feature hashing THE featurizer at 100 TB: stateless, one
    explode + one combinable aggregate, any executor can featurize any
    shard). Gate output is the per-bucket corpus profile: total count,
    docs touching the bucket, and the max per-doc count with doc_id as
    tie-break — enough to pin every cell of the doc x bucket matrix's
    marginals. (The synthetic corpus's lang/quality labels are
    text-independent by design, so a trained-classifier gate would be
    noise; events_perceptron covers the trainer with learnable
    features.)"""
    from ..functions import stable_hash60, words

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(words("text")).alias("w")
    ).where(F.col("w") != "")
    per_doc = toks.groupBy(
        "doc_id",
        F.pmod(stable_hash60("w"), F.lit(_BOW_BUCKETS)).alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    mx = per_doc.groupBy("bucket").agg(F.max("c").alias("__m"))
    return (
        per_doc.join(F.broadcast(mx), "bucket")
        .groupBy("bucket")
        .agg(
            F.sum("c").cast("bigint").alias("total"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.max("c").cast("bigint").alias("max_per_doc"),
            F.min(
                F.when(F.col("c") == F.col("__m"), F.col("doc_id"))
            ).alias("argmax_doc"),
        )
        .orderBy("bucket")
    )


QUERIES["docs_hashed_features"] = q_docs_hashed_features

ORACLES["docs_hashed_features"] = f"""
WITH norm AS (
  SELECT doc_id,
         lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
  FROM documents
), tok AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT)
           % {_BOW_BUCKETS} AS bucket
  FROM (SELECT doc_id, unnest(string_split(norm, ' ')) AS w FROM norm) t
  WHERE w <> ''
), per_doc AS (
  SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY doc_id, bucket
), mx AS (
  SELECT bucket, MAX(c) AS m FROM per_doc GROUP BY bucket
)
SELECT p.bucket,
       CAST(SUM(p.c) AS BIGINT) AS total,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(p.c) AS BIGINT) AS max_per_doc,
       CAST(MIN(CASE WHEN p.c = mx.m THEN p.doc_id END) AS BIGINT)
         AS argmax_doc
FROM per_doc p JOIN mx ON mx.bucket = p.bucket
GROUP BY p.bucket
ORDER BY p.bucket
"""


# ---------------------------------------------------- weighted percentiles


def q_lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted price percentiles: the exact p50/p90/p99 of the
    line price in cents where each line counts ``l_quantity`` times —
    "the median price per UNIT sold", not per order line
    (operators/stats.exact_percentiles with weight_col). Same
    distinct-cell + chunked-cumulative machinery as the unweighted
    percentiles; ranks run over cumulative integer weight."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("price_cents"),
        F.round(F.col("l_quantity")).cast("bigint").alias("qty"),
    )
    return stats.exact_percentiles(
        li, "price_cents", permille=(500, 900, 990),
        chunk=1_000_000, weight_col="qty",
    )


QUERIES["lineitem_weighted_median"] = q_lineitem_weighted_median

ORACLES["lineitem_weighted_median"] = """
WITH s AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
         CAST(round(l_quantity) AS BIGINT) AS q
  FROM lineitem
), g AS (
  SELECT v, CAST(SUM(q) AS BIGINT) AS cnt FROM s GROUP BY v
), c AS (
  SELECT v, cnt,
         CAST(SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum
  FROM g
), t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM g),
q AS (SELECT unnest([500, 900, 990]) AS permille)
SELECT CAST(q.permille AS INT) AS permille,
       CAST((q.permille * t.n + 999) // 1000 AS BIGINT) AS rank_q,
       c.v AS value
FROM q CROSS JOIN t JOIN c
  ON (q.permille * t.n + 999) // 1000 BETWEEN c.cum - c.cnt + 1 AND c.cum
ORDER BY permille
"""


# -------------------------------------------------------- isotonic fit


def q_events_isotonic_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone recalibration of the purchase propensity implied by the
    cent-quantized event value: isotonic regression over 20 equi-depth
    score buckets (operators/stats.isotonic_fit — PAV via the minimax
    identity on the bounded bucket table; facts reduce once, the
    bucketing rides the two-phase chunked prefix scan). The output
    ``iso_rate_r`` is the best non-decreasing L2 fit to the observed
    per-bucket positive rates — the calibration map served next to the
    model whose AUC ``events_auc_value`` measures."""
    ev = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("bigint").alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    return stats.isotonic_fit(ev, "score", "y", n_buckets=20)


QUERIES["events_isotonic_fit"] = q_events_isotonic_fit

ORACLES["events_isotonic_fit"] = """
WITH s AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
), g AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM s GROUP BY score
), c AS (
  SELECT score, cnt, pos,
         CAST(SUM(cnt) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum
  FROM g
), t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM g),
bins AS MATERIALIZED (
  SELECT CAST(((cum - cnt) * 20) // n + 1 AS BIGINT) AS bucket,
         CAST(SUM(cnt) AS BIGINT) AS n_rows,
         CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST((SUM(pos) * 1000000) // SUM(cnt) AS BIGINT) AS pos_rate_micro
  FROM c CROSS JOIN t GROUP BY 1
), pre AS MATERIALIZED (
  SELECT bucket, n_rows, n_pos, pos_rate_micro,
         CAST(SUM(n_rows) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_n,
         CAST(SUM(n_pos) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_p
  FROM bins
), pairs AS (
  SELECT lo.bucket AS h, hi.bucket AS j,
         CAST(hi.cum_p - (lo.cum_p - lo.n_pos) AS DOUBLE)
         / CAST(hi.cum_n - (lo.cum_n - lo.n_rows) AS DOUBLE) AS avg_hj
  FROM pre lo JOIN pre hi ON lo.bucket <= hi.bucket
), inner_min AS (
  SELECT i.bucket AS i, p.h, MIN(p.avg_hj) AS min_j
  FROM pre i JOIN pairs p ON p.h <= i.bucket AND p.j >= i.bucket
  GROUP BY 1, 2
), fit AS (
  SELECT i, MAX(min_j) AS fit FROM inner_min GROUP BY i
)
SELECT b.bucket, b.n_rows, b.n_pos, b.pos_rate_micro,
       round(f.fit, 6) AS iso_rate_r
FROM bins b JOIN fit f ON f.i = b.bucket
ORDER BY b.bucket
"""


# ------------------------------------------------- exact higher moments


def q_agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact skewness and excess kurtosis of the order quantity per
    return flag — the two shape statistics a feature-health dashboard
    tracks beyond mean/variance. Each engine's NATIVE skewness/kurtosis
    uses a different streaming accumulation (not reproducible
    bit-for-bit), so both sides here compute from the same exact
    integer power sums S1..S4 (quantity is integral; per-row q^4 and
    the DECIMAL(38,0) totals are overflow-safe past sf1000) and then
    evaluate the IDENTICAL central-moment expression tree in doubles:
    m2 = S2/n - m1^2, m3 = S3/n - 3*m1*S2/n + 2*m1^3,
    m4 = S4/n - 4*m1*S3/n + 6*m1^2*S2/n - 3*m1^4,
    g1 = m3/m2^1.5, g2 = m4/m2^2 - 3.

    Scale shape: pure map-side partial power sums (whole-stage codegen,
    one shuffled row per group), one 3-row output."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("q")
    )
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("q").cast("decimal(38,0)")).alias("_s1"),
        F.sum((F.col("q") * F.col("q")).cast("decimal(38,0)")).alias("_s2"),
        F.sum(
            (F.col("q") * F.col("q") * F.col("q")).cast("decimal(38,0)")
        ).alias("_s3"),
        F.sum(
            (F.col("q") * F.col("q") * F.col("q") * F.col("q")).cast(
                "decimal(38,0)"
            )
        ).alias("_s4"),
    )
    nd = F.col("n").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    s3 = F.col("_s3").cast("double")
    s4 = F.col("_s4").cast("double")
    m1 = s1 / nd
    m2 = s2 / nd - m1 * m1
    m3 = s3 / nd - F.lit(3.0) * m1 * (s2 / nd) + F.lit(2.0) * m1 * m1 * m1
    m4 = (
        s4 / nd
        - F.lit(4.0) * m1 * (s3 / nd)
        + F.lit(6.0) * m1 * m1 * (s2 / nd)
        - F.lit(3.0) * m1 * m1 * m1 * m1
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.round(m1, 6).alias("mean_r"),
        F.round(m2, 6).alias("m2_r"),
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skew_r"),
        F.round(m4 / (m2 * m2) - F.lit(3.0), 6).alias("kurtosis_r"),
    ).orderBy("l_returnflag")


QUERIES["agg_skew_kurtosis"] = q_agg_skew_kurtosis

ORACLES["agg_skew_kurtosis"] = """
WITH a AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(q AS DECIMAL(38,0))) AS s1,
         SUM(CAST(q*q AS DECIMAL(38,0))) AS s2,
         SUM(CAST(q*q*q AS DECIMAL(38,0))) AS s3,
         SUM(CAST(q*q*q*q AS DECIMAL(38,0))) AS s4
  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
  GROUP BY l_returnflag
), d AS (
  SELECT l_returnflag, n,
         CAST(n AS DOUBLE) AS nd,
         CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
         CAST(s3 AS DOUBLE) AS s3, CAST(s4 AS DOUBLE) AS s4
  FROM a
), m AS (
  SELECT l_returnflag, n,
         s1/nd AS m1,
         s2/nd - (s1/nd)*(s1/nd) AS m2,
         s3/nd - 3.0*(s1/nd)*(s2/nd) + 2.0*(s1/nd)*(s1/nd)*(s1/nd) AS m3,
         s4/nd - 4.0*(s1/nd)*(s3/nd) + 6.0*(s1/nd)*(s1/nd)*(s2/nd)
               - 3.0*(s1/nd)*(s1/nd)*(s1/nd)*(s1/nd) AS m4
  FROM d
)
SELECT l_returnflag, n,
       round(m1, 6) AS mean_r,
       round(m2, 6) AS m2_r,
       round(m3 / (m2 * sqrt(m2)), 6) AS skew_r,
       round(m4 / (m2 * m2) - 3.0, 6) AS kurtosis_r
FROM m
ORDER BY l_returnflag
"""


# ------------------------------------------------- k-center coreset


def q_sim_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity coreset of the embedding corpus: 6-step farthest-point
    sampling (operators/similarity.kcenter_greedy — Gonzalez's k-center
    2-approximation) with exact micro-quantized integer distances and
    min-id tie-breaks, so the greedy trajectory is engine-reproducible.
    The output is the selection order with each pick's
    distance-to-selected-set — the shrinking coverage radius a curator
    reads to choose k."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.kcenter_greedy(emb, "vec_id", "embedding", k=6)


QUERIES["sim_kcenter_coreset"] = q_sim_kcenter_coreset


def _kcenter_oracle(k: int = 6) -> str:
    rounds = []
    prev_m = "m0"
    for r in range(1, k):
        rounds.append(
            f"c{r} AS MATERIALIZED (SELECT vid, min_d2 FROM {prev_m} "
            f"ORDER BY min_d2 DESC, vid ASC LIMIT 1)"
        )
        if r + 1 < k:
            rounds.append(
                f"m{r} AS MATERIALIZED (SELECT m.vid, "
                f"LEAST(m.min_d2, d.d2) AS min_d2 "
                f"FROM {prev_m} m JOIN c{r} ON TRUE "
                f"JOIN d ON d.va = m.vid AND d.vb = c{r}.vid)"
            )
            prev_m = f"m{r}"
    selects = [
        "SELECT CAST(0 AS INT) AS sel_order, s0.c AS vec_id, "
        "CAST(0 AS BIGINT) AS d2_sel FROM s0"
    ] + [
        f"SELECT CAST({r} AS INT), vid, min_d2 FROM c{r}" for r in range(1, k)
    ]
    return (
        """
WITH q AS MATERIALIZED (
  SELECT vec_id, i,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS qv
  FROM embeddings, UNNEST(range(1, 65)) AS t(i)
), d AS MATERIALIZED (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         CAST(SUM((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS d2
  FROM q a JOIN q b ON a.i = b.i
  GROUP BY 1, 2
), s0 AS MATERIALIZED (SELECT MIN(vec_id) AS c FROM embeddings),
m0 AS MATERIALIZED (
  SELECT d.va AS vid, d.d2 AS min_d2 FROM d JOIN s0 ON d.vb = s0.c
),
"""
        + ",\n".join(rounds)
        + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY sel_order"
    )


ORACLES["sim_kcenter_coreset"] = _kcenter_oracle(6)


# ------------------------------------------------------ JL projection


def q_sim_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss distortion audit: project the embedding
    corpus 64 → 16 dims with the md5-derived ±1 sign matrix
    (operators/similarity.jl_project — no codebook artifact, any engine
    regenerates the identical matrix) and report how well squared
    distances survive on a deterministic 50×50 pair sample:
    ``ratio = d2_projected / (16 · d2_original)`` should concentrate
    around 1. One audit row: pair count, min/avg/max ratio, and how
    many pairs distort beyond ±0.5 — the measured dial for choosing
    the projected dimension.

    The sample is SIZE-BOUNDED (r13): 50 ids per side — the smallest
    vec_ids of each modulus class — not every %10 id. The original
    %10-only filter made the sample corpus-PROPORTIONAL, so the pair
    join grew quadratically with the corpus (the v4 rehearsal fixture
    measured 36.9x wall at 10x data before this cut). The statistic
    audits the DATA-INDEPENDENT sign matrix, so a fixed deterministic
    sample measures it at any scale, and only the sampled ≤100
    vectors are projected here; at sf0.01 (50 ids per class exactly)
    the output is value-identical to the unbounded form."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    sa = (
        emb.where(F.col("vec_id") % 10 == 0)
        .select("vec_id")
        .orderBy("vec_id")
        .limit(50)
    )
    sb = (
        emb.where(F.col("vec_id") % 10 == 5)
        .select("vec_id")
        .orderBy("vec_id")
        .limit(50)
    )
    sample = emb.join(F.broadcast(sa.unionAll(sb)), "vec_id")
    proj = similarity.jl_project(
        sample, "vec_id", "embedding", in_dim=64, out_dim=16
    )
    q = sample.select(
        F.col("vec_id").alias("vid"),
        F.posexplode(
            F.expr(
                "transform(embedding, x -> "
                "cast(round(cast(x as double) * 1000000.0) as bigint))"
            )
        ).alias("i", "qv"),
    )
    pa = q.where(F.col("vid") % 10 == 0).select(
        F.col("vid").alias("va"), "i", F.col("qv").alias("qa")
    )
    pb = q.where(F.col("vid") % 10 == 5).select(
        F.col("vid").alias("vb"), "i", F.col("qv").alias("qb")
    )
    d2o = (
        pa.join(pb, "i")
        .groupBy("va", "vb")
        .agg(
            F.sum((F.col("qa") - F.col("qb")) * (F.col("qa") - F.col("qb")))
            .cast("bigint")
            .alias("d2o")
        )
    )
    ja = proj.where(F.col("vid") % 10 == 0).select(
        F.col("vid").alias("va"), "j", F.col("pj").alias("ra")
    )
    jb = proj.where(F.col("vid") % 10 == 5).select(
        F.col("vid").alias("vb"), "j", F.col("pj").alias("rb")
    )
    d2p = (
        ja.join(jb, "j")
        .groupBy("va", "vb")
        .agg(
            F.sum((F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb")))
            .cast("bigint")
            .alias("d2p")
        )
    )
    ratios = d2o.join(d2p, ["va", "vb"]).select(
        F.round(
            F.col("d2p").cast("double")
            / (F.lit(16) * F.col("d2o")).cast("double"),
            6,
        ).alias("ratio_r")
    )
    return ratios.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.min("ratio_r").alias("min_ratio_r"),
        F.round(
            F.sum(F.col("ratio_r").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("avg_ratio_r"),
        F.max("ratio_r").alias("max_ratio_r"),
        F.sum(
            (
                (F.col("ratio_r") < 0.5) | (F.col("ratio_r") > 1.5)
            ).cast("bigint")
        ).alias("n_outside"),
    )


QUERIES["sim_jl_distortion"] = q_sim_jl_distortion

ORACLES["sim_jl_distortion"] = """
WITH sample AS MATERIALIZED (
  SELECT vec_id FROM (SELECT vec_id FROM embeddings
                      WHERE vec_id % 10 = 0 ORDER BY vec_id LIMIT 50)
  UNION ALL
  SELECT vec_id FROM (SELECT vec_id FROM embeddings
                      WHERE vec_id % 10 = 5 ORDER BY vec_id LIMIT 50)
), q AS MATERIALIZED (
  SELECT vec_id AS vid, i - 1 AS i,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS qv
  FROM embeddings JOIN sample USING (vec_id), UNNEST(range(1, 65)) AS t(i)
), signs AS MATERIALIZED (
  SELECT i.i, j.j,
         CASE WHEN substr(md5(i.i || '_' || j.j), 1, 1) < '8'
              THEN 1 ELSE -1 END AS s
  FROM (SELECT unnest(range(0, 64)) AS i) i,
       (SELECT unnest(range(0, 16)) AS j) j
), proj AS MATERIALIZED (
  SELECT q.vid, s.j, CAST(SUM(s.s * q.qv) AS BIGINT) AS pj
  FROM q JOIN signs s ON s.i = q.i
  GROUP BY q.vid, s.j
), d2o AS (
  SELECT a.vid AS va, b.vid AS vb,
         CAST(SUM((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS d2o
  FROM q a JOIN q b ON a.i = b.i
  WHERE a.vid % 10 = 0 AND b.vid % 10 = 5
  GROUP BY 1, 2
), d2p AS (
  SELECT a.vid AS va, b.vid AS vb,
         CAST(SUM((a.pj - b.pj) * (a.pj - b.pj)) AS BIGINT) AS d2p
  FROM proj a JOIN proj b ON a.j = b.j
  WHERE a.vid % 10 = 0 AND b.vid % 10 = 5
  GROUP BY 1, 2
), ratios AS (
  SELECT round(CAST(d2p.d2p AS DOUBLE) / CAST(16 * d2o.d2o AS DOUBLE), 6)
           AS ratio_r
  FROM d2o JOIN d2p ON d2o.va = d2p.va AND d2o.vb = d2p.vb
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       MIN(ratio_r) AS min_ratio_r,
       round(CAST(SUM(CAST(ratio_r AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS avg_ratio_r,
       MAX(ratio_r) AS max_ratio_r,
       CAST(SUM(CASE WHEN ratio_r < 0.5 OR ratio_r > 1.5
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outside
FROM ratios
"""


# ------------------------------------------- normal-equations OLS (2f)


# One source of truth for the Cramer solve: the SAME expression strings
# evaluate over identically-named double columns in Spark AND DuckDB, so
# the IEEE operation sequence is identical by construction.
_OLS2_DET = "(nd*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2))"
_OLS2_DET0 = "(sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s2y*s12) + s2*(s1y*s12 - s2y*s11))"
_OLS2_DET1 = "(nd*(s1y*s22 - s2y*s12) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2))"
_OLS2_DET2 = "(nd*(s11*s2y - s12*s1y) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2))"


def q_lineitem_ols_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature linear regression by EXACT normal equations: fit
    realized revenue_dollars ~ w0 + w1*price_dollars + w2*discount_cents
    over all of lineitem (revenue = price·(1−discount), so the plane
    recovers w1 ≈ 1−E[d] with a strongly negative discount weight and
    R² ≈ 1 — a fit whose coefficients mean something, unlike the
    independent synthetic columns). Dollar (not cent) quantization is
    deliberate: every Gram sum then stays below 2^53, so the exact
    DECIMAL total converts to double IDENTICALLY on every engine — at
    cent scale Σx² reaches ~6e18 and the decimal→double cast itself
    rounds differently per engine (observed: one ulp in w2). The 3x3 Gram matrix and moment vector are exact
    DECIMAL(38,0) sums (map-side partial aggregation — the corpus
    reduces to TEN numbers, the textbook distributed-regression shape;
    native least-squares solvers iterate or factorize, neither
    reproducible bit-for-bit), then the Cramer's-rule solve runs the
    IDENTICAL double expression tree on both engines (shared strings).
    Output: n, weights, and R^2."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("bigint")
        .alias("y"),
        F.round(F.col("l_extendedprice")).cast("bigint").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x2"),
    )
    d = F.col("n").cast("double")
    agg = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x1").cast("decimal(38,0)")).alias("_s1"),
        F.sum(F.col("x2").cast("decimal(38,0)")).alias("_s2"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("_sy"),
        F.sum((F.col("x1") * F.col("x1")).cast("decimal(38,0)")).alias("_s11"),
        F.sum((F.col("x1") * F.col("x2")).cast("decimal(38,0)")).alias("_s12"),
        F.sum((F.col("x2") * F.col("x2")).cast("decimal(38,0)")).alias("_s22"),
        F.sum((F.col("x1") * F.col("y")).cast("decimal(38,0)")).alias("_s1y"),
        F.sum((F.col("x2") * F.col("y")).cast("decimal(38,0)")).alias("_s2y"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("_syy"),
    )
    doubled = agg.select(
        "n",
        d.alias("nd"),
        *[
            F.col(f"_{c}").cast("double").alias(c)
            for c in ("s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy")
        ],
    )
    solved = doubled.select(
        "n",
        "nd",
        "sy",
        "s1y",
        "s2y",
        "syy",
        (F.expr(_OLS2_DET0) / F.expr(_OLS2_DET)).alias("w0"),
        (F.expr(_OLS2_DET1) / F.expr(_OLS2_DET)).alias("w1"),
        (F.expr(_OLS2_DET2) / F.expr(_OLS2_DET)).alias("w2"),
    )
    sse = F.expr("syy - w0*sy - w1*s1y - w2*s2y")
    sst = F.expr("syy - sy*sy/nd")
    return solved.select(
        "n",
        F.round("w0", 4).alias("w0_r"),
        F.round("w1", 4).alias("w1_r"),
        F.round("w2", 4).alias("w2_r"),
        F.round(F.lit(1.0) - sse / sst, 6).alias("r2_r"),
    )


QUERIES["lineitem_ols_normal"] = q_lineitem_ols_normal

ORACLES["lineitem_ols_normal"] = f"""
WITH base AS (
  SELECT CAST(round(l_extendedprice * (1 - l_discount)) AS BIGINT) AS y,
         CAST(round(l_extendedprice) AS BIGINT) AS x1,
         CAST(round(l_discount * 100) AS BIGINT) AS x2
  FROM lineitem
), a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(x1 AS DECIMAL(38,0))) AS _s1,
         SUM(CAST(x2 AS DECIMAL(38,0))) AS _s2,
         SUM(CAST(y AS DECIMAL(38,0))) AS _sy,
         SUM(CAST(x1*x1 AS DECIMAL(38,0))) AS _s11,
         SUM(CAST(x1*x2 AS DECIMAL(38,0))) AS _s12,
         SUM(CAST(x2*x2 AS DECIMAL(38,0))) AS _s22,
         SUM(CAST(x1*y AS DECIMAL(38,0))) AS _s1y,
         SUM(CAST(x2*y AS DECIMAL(38,0))) AS _s2y,
         SUM(CAST(y*y AS DECIMAL(38,0))) AS _syy
  FROM base
), d AS (
  SELECT n, CAST(n AS DOUBLE) AS nd,
         CAST(_s1 AS DOUBLE) AS s1, CAST(_s2 AS DOUBLE) AS s2,
         CAST(_sy AS DOUBLE) AS sy, CAST(_s11 AS DOUBLE) AS s11,
         CAST(_s12 AS DOUBLE) AS s12, CAST(_s22 AS DOUBLE) AS s22,
         CAST(_s1y AS DOUBLE) AS s1y, CAST(_s2y AS DOUBLE) AS s2y,
         CAST(_syy AS DOUBLE) AS syy
  FROM a
), w AS (
  SELECT n, nd, sy, s1y, s2y, syy,
         {_OLS2_DET0} / {_OLS2_DET} AS w0,
         {_OLS2_DET1} / {_OLS2_DET} AS w1,
         {_OLS2_DET2} / {_OLS2_DET} AS w2
  FROM d
)
SELECT n,
       round(w0, 4) AS w0_r,
       round(w1, 4) AS w1_r,
       round(w2, 4) AS w2_r,
       round(1.0 - (syy - w0*sy - w1*s1y - w2*s2y)
                   / (syy - sy*sy/nd), 6) AS r2_r
FROM w
"""


# ------------------------------------------------- conformal band


def q_events_conformal_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction band (Vovk et al.; the
    distribution-free finite-sample wrapper every served regressor
    should ship with): train a per-event-type mean-value predictor on
    users %5 in {0,1,2}, take the conformal quantile q̂ = the
    ceil((n_cal+1)·0.9)-th smallest |residual| on the DISJOINT
    calibration split (%5 = 3, exact type-1 quantile over distinct
    residual cells via the two-phase chunked scan — no global sort),
    and audit the guaranteed ≥90% coverage on the held-out test split
    (%5 = 4). All residuals are exact integer micro-cents; one audit
    row out.

    Scale shape: the predictor is a bounded per-type broadcast; each
    split reduces map-side; the quantile rides
    ``two_phase_rank_cumsum``. Nothing data-proportional is sorted in
    one task or broadcast."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.col("event_type"),
        F.round(F.col("value") * 100).cast("bigint").alias("y_c"),
    )
    train = ev.where(F.col("user_id") % 5 <= 2)
    cal = ev.where(F.col("user_id") % 5 == 3)
    test = ev.where(F.col("user_id") % 5 == 4)
    pred = train.groupBy("event_type").agg(
        F.expr("(sum(y_c) * 1000000) div count(1)").alias("pred_micro"),
        F.count(F.lit(1)).cast("bigint").alias("n_tr"),
    )
    scored_cal = cal.join(F.broadcast(pred), "event_type").select(
        F.abs(F.col("y_c") * F.lit(1000000) - F.col("pred_micro")).alias("s")
    )
    cells = scored_cal.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt")
    )
    ranked = stats.two_phase_rank_cumsum(
        cells,
        "s",
        F.expr("s div 100000000"),
        value_col="__cnt",
        cum_col="__cum",
    )
    ncal = scored_cal.agg(F.count(F.lit(1)).cast("bigint").alias("n_cal"))
    qhat = (
        ranked.join(F.broadcast(ncal))
        .withColumn("rank_q", F.expr("((n_cal + 1) * 900 + 999) div 1000"))
        .where(
            F.least(F.col("rank_q"), F.col("n_cal")).between(
                F.col("__cum") - F.col("__cnt") + 1, F.col("__cum")
            )
        )
        .select("n_cal", "rank_q", F.col("s").alias("qhat_micro"))
    )
    covered = (
        test.join(F.broadcast(pred), "event_type")
        .crossJoin(F.broadcast(qhat))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                (
                    F.abs(F.col("y_c") * F.lit(1000000) - F.col("pred_micro"))
                    <= F.col("qhat_micro")
                ).cast("bigint")
            ).alias("n_covered"),
            F.min("n_cal").alias("n_cal"),
            F.min("rank_q").alias("rank_q"),
            F.min("qhat_micro").alias("qhat_micro"),
        )
    )
    ntr = train.agg(F.count(F.lit(1)).cast("bigint").alias("n_train"))
    return covered.crossJoin(F.broadcast(ntr)).select(
        "n_train",
        "n_cal",
        "n_test",
        "rank_q",
        "qhat_micro",
        F.expr("(n_covered * 1000000) div n_test").alias("cover_micro"),
    )


QUERIES["events_conformal_band"] = q_events_conformal_band

ORACLES["events_conformal_band"] = """
WITH ev AS (
  SELECT user_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS y_c
  FROM events
), pred AS MATERIALIZED (
  SELECT event_type,
         CAST((SUM(y_c) * 1000000) // COUNT(*) AS BIGINT) AS pred_micro
  FROM ev WHERE user_id % 5 <= 2
  GROUP BY event_type
), n_train AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_train FROM ev WHERE user_id % 5 <= 2
), cal AS MATERIALIZED (
  SELECT abs(e.y_c * 1000000 - p.pred_micro) AS s
  FROM ev e JOIN pred p USING (event_type)
  WHERE e.user_id % 5 = 3
), nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
cells AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS cnt FROM cal GROUP BY s
), ranked AS (
  SELECT s, cnt,
         CAST(SUM(cnt) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum
  FROM cells
), qhat AS MATERIALIZED (
  SELECT n_cal,
         CAST(((n_cal + 1) * 900 + 999) // 1000 AS BIGINT) AS rank_q,
         CAST(s AS BIGINT) AS qhat_micro
  FROM ranked CROSS JOIN nc
  WHERE LEAST(((n_cal + 1) * 900 + 999) // 1000, n_cal)
        BETWEEN cum - cnt + 1 AND cum
), test AS (
  SELECT abs(e.y_c * 1000000 - p.pred_micro) AS s
  FROM ev e JOIN pred p USING (event_type)
  WHERE e.user_id % 5 = 4
)
SELECT (SELECT n_train FROM n_train) AS n_train,
       q.n_cal,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       q.rank_q,
       q.qhat_micro,
       CAST((CAST(SUM(CASE WHEN t.s <= q.qhat_micro THEN 1 ELSE 0 END)
                  AS BIGINT) * 1000000) // COUNT(*) AS BIGINT)
         AS cover_micro
FROM test t CROSS JOIN qhat q
GROUP BY q.n_cal, q.rank_q, q.qhat_micro
"""


# --------------------------------------------- grouped exact percentiles


def q_events_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type exact p50/p90/p99 of the cent-quantized value
    (operators/stats.exact_percentiles_by_group): the grouped latency-
    dashboard shape. The two-phase cumulative keeps the event type as a
    PARTITION key while still chunking by value range — a type holding
    most of the traffic never becomes one sort task."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("score"),
    )
    return stats.exact_percentiles_by_group(
        ev, ["event_type"], "score", permille=(500, 900, 990)
    )


QUERIES["events_percentiles_by_type"] = q_events_percentiles_by_type

ORACLES["events_percentiles_by_type"] = """
WITH s AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS score
  FROM events
), g AS (
  SELECT event_type, score, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM s GROUP BY 1, 2
), c AS (
  SELECT event_type, score, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY score
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM g
), t AS (
  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY 1
), spine AS (
  SELECT unnest([500, 900, 990]) AS permille
)
SELECT c.event_type,
       CAST(s2.permille AS INT) AS permille,
       CAST((s2.permille * t.n + 999) // 1000 AS BIGINT) AS rank_q,
       c.score AS value
FROM c
JOIN t USING (event_type)
CROSS JOIN spine s2
WHERE (s2.permille * t.n + 999) // 1000
      BETWEEN c.cum - c.cnt + 1 AND c.cum
ORDER BY c.event_type, permille
"""


# -------------------------------------------- difference-in-differences


def q_events_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the 2×2 (treatment × period) readout —
    DiD = (post_T − pre_T) − (post_C − pre_C) — with an unpooled
    standard error and z statistic; the quasi-experimental companion to
    events_ab_test/events_ab_cuped when assignment isn't randomized but
    a pre-period exists. Treatment = user_id parity, period split at
    Jan 16. Every cell reduces to exact DECIMAL sums map-side; the four
    means, the DiD, and the SE evaluate as one identical double
    expression tree on both engines.

    Convention note (ADVICE r6): the per-cell variance in the unpooled
    SE uses the population divisor n — var = (s2/n − m²)/n — not the
    sample divisor n−1. At the event-table cell sizes here the two
    differ by <0.1%; the population form keeps the expression a pure
    function of the three exact sums (n, s, s2), identical on both
    engines, with no n>1 guard. Swap (s2/n − m²) for
    (s2 − s²/n)/(n−1) if textbook-sample SEs are required."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2 == 0).cast("int").alias("treat"),
        (F.col("ts") >= F.lit("2024-01-16").cast("timestamp"))
        .cast("int")
        .alias("post"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    cells = ev.groupBy("treat", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("_s"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("_s2"),
    )
    # pivot the 4 cells into one row via conditional aggregation
    def cell(t, p, col):
        return F.max(
            F.when(
                (F.col("treat") == t) & (F.col("post") == p), F.col(col)
            )
        )

    wide = cells.agg(
        *[
            c.alias(f"{n}_{t}{p}")
            for t in (0, 1)
            for p in (0, 1)
            for n, c in (
                ("n", cell(t, p, "n")),
                ("s", cell(t, p, "_s").cast("double")),
                ("s2", cell(t, p, "_s2").cast("double")),
            )
        ]
    )
    def mean(t, p):
        return F.col(f"s_{t}{p}") / F.col(f"n_{t}{p}").cast("double")

    def sem2(t, p):
        n = F.col(f"n_{t}{p}").cast("double")
        m = mean(t, p)
        return (F.col(f"s2_{t}{p}") / n - m * m) / n

    did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    se = F.sqrt(sem2(1, 1) + sem2(1, 0) + sem2(0, 1) + sem2(0, 0))
    return wide.select(
        F.col("n_00").alias("n_ctrl_pre"),
        F.col("n_01").alias("n_ctrl_post"),
        F.col("n_10").alias("n_treat_pre"),
        F.col("n_11").alias("n_treat_post"),
        F.round(mean(0, 0), 6).alias("mean_ctrl_pre_r"),
        F.round(mean(0, 1), 6).alias("mean_ctrl_post_r"),
        F.round(mean(1, 0), 6).alias("mean_treat_pre_r"),
        F.round(mean(1, 1), 6).alias("mean_treat_post_r"),
        F.round(did, 6).alias("did_r"),
        F.round(se, 6).alias("se_r"),
        F.round(did / se, 6).alias("z_r"),
    )


QUERIES["events_did"] = q_events_did

ORACLES["events_did"] = """
WITH ev AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treat,
         CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS post,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events
), cells AS (
  SELECT treat, post,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(y AS DECIMAL(38,0))) AS s,
         SUM(CAST(y*y AS DECIMAL(38,0))) AS s2
  FROM ev GROUP BY 1, 2
), wide AS (
  SELECT
    MAX(CASE WHEN treat=0 AND post=0 THEN n END) AS n_00,
    MAX(CASE WHEN treat=0 AND post=1 THEN n END) AS n_01,
    MAX(CASE WHEN treat=1 AND post=0 THEN n END) AS n_10,
    MAX(CASE WHEN treat=1 AND post=1 THEN n END) AS n_11,
    MAX(CASE WHEN treat=0 AND post=0 THEN CAST(s AS DOUBLE) END) AS s_00,
    MAX(CASE WHEN treat=0 AND post=1 THEN CAST(s AS DOUBLE) END) AS s_01,
    MAX(CASE WHEN treat=1 AND post=0 THEN CAST(s AS DOUBLE) END) AS s_10,
    MAX(CASE WHEN treat=1 AND post=1 THEN CAST(s AS DOUBLE) END) AS s_11,
    MAX(CASE WHEN treat=0 AND post=0 THEN CAST(s2 AS DOUBLE) END) AS s2_00,
    MAX(CASE WHEN treat=0 AND post=1 THEN CAST(s2 AS DOUBLE) END) AS s2_01,
    MAX(CASE WHEN treat=1 AND post=0 THEN CAST(s2 AS DOUBLE) END) AS s2_10,
    MAX(CASE WHEN treat=1 AND post=1 THEN CAST(s2 AS DOUBLE) END) AS s2_11
  FROM cells
)
SELECT n_00 AS n_ctrl_pre, n_01 AS n_ctrl_post,
       n_10 AS n_treat_pre, n_11 AS n_treat_post,
       round(s_00 / CAST(n_00 AS DOUBLE), 6) AS mean_ctrl_pre_r,
       round(s_01 / CAST(n_01 AS DOUBLE), 6) AS mean_ctrl_post_r,
       round(s_10 / CAST(n_10 AS DOUBLE), 6) AS mean_treat_pre_r,
       round(s_11 / CAST(n_11 AS DOUBLE), 6) AS mean_treat_post_r,
       round((s_11 / CAST(n_11 AS DOUBLE) - s_10 / CAST(n_10 AS DOUBLE))
             - (s_01 / CAST(n_01 AS DOUBLE) - s_00 / CAST(n_00 AS DOUBLE)), 6)
         AS did_r,
       round(sqrt(
           (s2_11 / CAST(n_11 AS DOUBLE)
            - (s_11 / CAST(n_11 AS DOUBLE)) * (s_11 / CAST(n_11 AS DOUBLE)))
             / CAST(n_11 AS DOUBLE)
         + (s2_10 / CAST(n_10 AS DOUBLE)
            - (s_10 / CAST(n_10 AS DOUBLE)) * (s_10 / CAST(n_10 AS DOUBLE)))
             / CAST(n_10 AS DOUBLE)
         + (s2_01 / CAST(n_01 AS DOUBLE)
            - (s_01 / CAST(n_01 AS DOUBLE)) * (s_01 / CAST(n_01 AS DOUBLE)))
             / CAST(n_01 AS DOUBLE)
         + (s2_00 / CAST(n_00 AS DOUBLE)
            - (s_00 / CAST(n_00 AS DOUBLE)) * (s_00 / CAST(n_00 AS DOUBLE)))
             / CAST(n_00 AS DOUBLE)), 6) AS se_r,
       round(((s_11 / CAST(n_11 AS DOUBLE) - s_10 / CAST(n_10 AS DOUBLE))
              - (s_01 / CAST(n_01 AS DOUBLE) - s_00 / CAST(n_00 AS DOUBLE)))
             / sqrt(
           (s2_11 / CAST(n_11 AS DOUBLE)
            - (s_11 / CAST(n_11 AS DOUBLE)) * (s_11 / CAST(n_11 AS DOUBLE)))
             / CAST(n_11 AS DOUBLE)
         + (s2_10 / CAST(n_10 AS DOUBLE)
            - (s_10 / CAST(n_10 AS DOUBLE)) * (s_10 / CAST(n_10 AS DOUBLE)))
             / CAST(n_10 AS DOUBLE)
         + (s2_01 / CAST(n_01 AS DOUBLE)
            - (s_01 / CAST(n_01 AS DOUBLE)) * (s_01 / CAST(n_01 AS DOUBLE)))
             / CAST(n_01 AS DOUBLE)
         + (s2_00 / CAST(n_00 AS DOUBLE)
            - (s_00 / CAST(n_00 AS DOUBLE)) * (s_00 / CAST(n_00 AS DOUBLE)))
             / CAST(n_00 AS DOUBLE)), 6) AS z_r
FROM wide
"""


# ----------------------------------------------------- bloom filter FPR


def q_sketch_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom filter with a MEASURED false-positive rate: build
    a k=4, m=16384-bit filter over January's distinct active users
    (each key sets bits h_i(u) = md5-hash60(u||'_'||i) mod m), then
    probe it with 20,000 keys from a disjoint synthetic namespace
    (10^9 + i — every real user id is orders of magnitude smaller, so
    every probe is a true negative and "all 4 bits set" is by
    construction a false positive; the synthetic split was necessary
    because every observed user is active in both halves of the
    month). One audit row: members, set-bit count, probes,
    false positives, measured FPR, and the theoretical
    (s/m)^k computed from the ACTUAL set-bit count s (tighter than the
    e^(-kn/m) approximation, and exact given s). The membership-sketch
    companion to the plan-level join_bloom_pruned.

    Scale shape: the filter is a 16384-row distinct-bit set (bounded by
    m, never by members) collected as ONE bounded broadcast list; the
    probe side is a broadcast-array membership test per row, no shuffle
    beyond the distinct reductions."""
    from ..functions import stable_hash60

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("ts") < F.lit("2024-01-16").cast("timestamp")).alias("early"),
    )
    jan = ev.where(F.col("early")).select("user_id").distinct()
    n_probe_keys = 20000
    feb_only = spark.range(n_probe_keys).select(
        (F.col("id") + F.lit(1_000_000_000)).alias("user_id")
    )
    K, M = 4, 16384

    def bits(df):
        return df.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            stable_hash60(
                                F.concat_ws("_", F.col("user_id"), F.lit(i))
                            ),
                            F.lit(M),
                        )
                        for i in range(K)
                    ]
                )
            ).alias("bit")
        ).distinct()

    filt = bits(jan)
    n_bits = filt.agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    # probe: a user is a false positive iff ALL K of its bits are set
    probe_bits = feb_only.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.pmod(
                        stable_hash60(
                            F.concat_ws("_", F.col("user_id"), F.lit(i))
                        ),
                        F.lit(M),
                    )
                    for i in range(K)
                ]
            )
        ).alias("bit"),
    )
    hits = (
        probe_bits.join(filt, "bit", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("nb"))
        .where(F.col("nb") == K)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_fp"))
    )
    counts = (
        jan.agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .crossJoin(
            feb_only.agg(F.count(F.lit(1)).cast("bigint").alias("n_probes"))
        )
        .crossJoin(F.broadcast(n_bits))
        .crossJoin(F.broadcast(hits))
    )
    load = F.col("s").cast("double") / F.lit(float(M))
    return counts.select(
        "n_members",
        F.col("s").alias("n_set_bits"),
        "n_probes",
        "n_fp",
        F.expr("(n_fp * 1000000) div n_probes").alias("fpr_micro"),
        F.round(load * load * load * load, 6).alias("theo_fpr_r"),
    )


QUERIES["sketch_bloom_fpr"] = q_sketch_bloom_fpr

ORACLES["sketch_bloom_fpr"] = """
WITH ev AS (
  SELECT user_id, ts < TIMESTAMP '2024-01-16' AS early FROM events
), jan AS MATERIALIZED (
  SELECT DISTINCT user_id FROM ev WHERE early
), feb_only AS MATERIALIZED (
  SELECT 1000000000 + unnest(range(0, 20000)) AS user_id
), ks AS (SELECT unnest(range(0, 4)) AS i),
filt AS MATERIALIZED (
  SELECT DISTINCT
         CAST(concat('0x', substr(md5(user_id || '_' || i), 1, 15))
              AS BIGINT) % 16384 AS bit
  FROM jan CROSS JOIN ks
), s AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM filt),
probe AS (
  SELECT f.user_id,
         CAST(concat('0x', substr(md5(f.user_id || '_' || i), 1, 15))
              AS BIGINT) % 16384 AS bit
  FROM feb_only f CROSS JOIN ks
), fp AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_fp FROM (
    SELECT p.user_id FROM probe p
    WHERE p.bit IN (SELECT bit FROM filt)
    GROUP BY p.user_id HAVING COUNT(*) = 4
  )
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM jan) AS n_members,
       s.s AS n_set_bits,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM feb_only) AS n_probes,
       fp.n_fp,
       CAST((fp.n_fp * 1000000)
            // (SELECT COUNT(*) FROM feb_only) AS BIGINT) AS fpr_micro,
       round((CAST(s.s AS DOUBLE) / 16384.0) * (CAST(s.s AS DOUBLE) / 16384.0)
             * (CAST(s.s AS DOUBLE) / 16384.0) * (CAST(s.s AS DOUBLE) / 16384.0),
             6) AS theo_fpr_r
FROM s CROSS JOIN fp
"""


# -------------------------------------------------- Mann-Kendall trend


def q_orders_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotone-trend test on the daily order count: the
    nonparametric companion to orders_theil_sen — S = Σ_{i<j}
    sign(x_j − x_i) over the bounded calendar grid, the tie-corrected
    variance [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18 as an exact integer
    numerator, and the continuity-corrected z. Facts reduce once to one
    row per day; the pair enumeration self-joins the ~2.4k-row daily
    AGGREGATE, never the fact table."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    a = daily.select(F.col("d").alias("da"), F.col("c").alias("ca"))
    b = daily.select(F.col("d").alias("db"), F.col("c").alias("cb"))
    s_stat = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum(F.signum(F.col("cb") - F.col("ca")).cast("bigint"))
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    ties = (
        daily.groupBy("c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    wide = n_days.crossJoin(F.broadcast(s_stat)).crossJoin(
        F.broadcast(ties)
    )
    var_num = F.expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie_term")
    var_s = var_num.cast("double") / F.lit(18.0)
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1).cast("double") / F.sqrt(var_s),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1).cast("double") / F.sqrt(var_s),
        )
        .otherwise(F.lit(0.0))
    )
    return wide.select(
        "n_days",
        "s_stat",
        var_num.cast("bigint").alias("var_num"),
        F.round(z, 6).alias("z_r"),
    )


QUERIES["orders_mann_kendall"] = q_orders_mann_kendall

ORACLES["orders_mann_kendall"] = """
WITH daily AS MATERIALIZED (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
), s AS (
  SELECT CAST(SUM(CASE WHEN b.c > a.c THEN 1
                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM daily a JOIN daily b ON a.d < b.d
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
ties AS (
  SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY c)
)
SELECT n.n_days, s.s_stat,
       CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - ties.tie_term
            AS BIGINT) AS var_num,
       round(CASE
         WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
              / sqrt(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                          - ties.tie_term AS DOUBLE) / 18.0)
         WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
              / sqrt(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                          - ties.tie_term AS DOUBLE) / 18.0)
         ELSE 0.0 END, 6) AS z_r
FROM n CROSS JOIN s CROSS JOIN ties
"""


# ---------------------------------------------- degree assortativity


def q_supplier_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-supply graph (Newman 2002): the
    Pearson correlation of endpoint degrees over edges — do
    high-degree suppliers co-supply with other hubs (r > 0) or with
    the periphery (r < 0)? Both edge directions enter the sums (the
    undirected convention), every moment is an exact BIGINT, and the
    final r is one shared double expression. Complements
    supplier_kcore / communities with a single network-topology
    scalar."""
    from ..operators import graph

    li = load_table(spark, sf_dir, "lineitem")
    edges = graph.co_supply_edges(li)
    und = edges.select(
        F.col("sa").alias("n"), F.col("sb").alias("m")
    ).unionByName(edges.select(F.col("sb").alias("n"), F.col("sa").alias("m")))
    deg = und.groupBy("n").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    pairs = (
        und.join(deg.select(F.col("n"), F.col("d").alias("dj")), "n")
        .join(
            deg.select(F.col("n").alias("m"), F.col("d").alias("dk")), "m"
        )
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("m2"),
        F.sum(F.col("dj") * F.col("dk")).cast("bigint").alias("sjk"),
        F.sum(F.col("dj")).cast("bigint").alias("sj"),
        F.sum(F.col("dj") * F.col("dj")).cast("bigint").alias("sj2"),
    )
    md = F.col("m2").cast("double")
    mean = F.col("sj").cast("double") / md
    num = F.col("sjk").cast("double") / md - mean * mean
    den = F.col("sj2").cast("double") / md - mean * mean
    return agg.select(
        (F.col("m2") / 2).cast("bigint").alias("n_edges"),
        "sjk",
        "sj",
        "sj2",
        F.round(num / den, 6).alias("assortativity_r"),
    )


QUERIES["supplier_assortativity"] = q_supplier_assortativity

ORACLES["supplier_assortativity"] = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            WHERE l_partkey % 50 = 0),
e0 AS MATERIALIZED (
  SELECT a.l_suppkey AS a, b.l_suppkey AS b
  FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
  WHERE a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
), und AS MATERIALIZED (
  SELECT a AS n, b AS m FROM e0 UNION ALL SELECT b, a FROM e0
), deg AS MATERIALIZED (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY n
), pairs AS (
  SELECT dj.d AS dj, dk.d AS dk
  FROM und u JOIN deg dj ON dj.n = u.n JOIN deg dk ON dk.n = u.m
), a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m2,
         CAST(SUM(dj * dk) AS BIGINT) AS sjk,
         CAST(SUM(dj) AS BIGINT) AS sj,
         CAST(SUM(dj * dj) AS BIGINT) AS sj2
  FROM pairs
)
SELECT CAST(m2 / 2 AS BIGINT) AS n_edges, sjk, sj, sj2,
       round((CAST(sjk AS DOUBLE) / CAST(m2 AS DOUBLE)
              - (CAST(sj AS DOUBLE) / CAST(m2 AS DOUBLE))
                * (CAST(sj AS DOUBLE) / CAST(m2 AS DOUBLE)))
             / (CAST(sj2 AS DOUBLE) / CAST(m2 AS DOUBLE)
                - (CAST(sj AS DOUBLE) / CAST(m2 AS DOUBLE))
                  * (CAST(sj AS DOUBLE) / CAST(m2 AS DOUBLE))), 6)
         AS assortativity_r
FROM a
"""


# ------------------------------------------------- two-sample KS test


def q_events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance between the
    first-half and second-half value distributions (the same split the
    PSI meter watches, but with the distribution-free KS statistic):
    D = max_v |F1(v) − F2(v)| evaluated as the cross-multiplied
    integer |cum1·n2 − cum2·n1| — no float CDFs, the argmax value is
    part of the output. Distinct cent cells ride the two-phase chunked
    scan per side; the max is one aggregate. Also ships the scaled
    statistic K = D·sqrt(n1·n2/(n1+n2)) that KS tables threshold."""
    ev = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
        (F.col("ts") < F.lit("2024-01-16").cast("timestamp")).alias("early"),
    )

    def cum_side(flag: bool, tag: str):
        cells = (
            ev.where(F.col("early") == flag)
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("__cnt"))
        )
        return stats.two_phase_rank_cumsum(
            cells,
            "v",
            F.expr("v div 1000"),
            value_col="__cnt",
            cum_col=f"cum{tag}",
        ).select("v", f"cum{tag}")

    c1 = cum_side(True, "1")
    c2 = cum_side(False, "2")
    # evaluate both CDFs on the UNION of distinct values: after a full
    # outer join, a side's missing cum at v is its cum at the nearest
    # lower v — recovered with a bounded-forward-fill via last() over
    # the merged value axis (values are a bounded cent domain)
    from pyspark.sql import Window as W

    merged = c1.join(c2, "v", "full_outer")
    byv = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    filled = merged.select(
        "v",
        F.coalesce(
            F.last("cum1", ignorenulls=True).over(byv), F.lit(0)
        ).alias("f1"),
        F.coalesce(
            F.last("cum2", ignorenulls=True).over(byv), F.lit(0)
        ).alias("f2"),
    )
    n1 = ev.where(F.col("early")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n1")
    )
    n2 = ev.where(~F.col("early")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n2")
    )
    d = (
        filled.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "n1",
            "n2",
            F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")).alias(
                "dn"
            ),
            "v",
        )
        .groupBy("n1", "n2")
        .agg(
            F.max(F.struct(F.col("dn"), (-F.col("v")).alias("nv"))).alias("m")
        )
        .select(
            "n1",
            "n2",
            F.col("m.dn").alias("d_num"),
            (-F.col("m.nv")).alias("argmax_v"),
        )
    )
    nn = F.col("n1").cast("double") * F.col("n2").cast("double")
    dd = F.col("d_num").cast("double") / nn
    return d.select(
        "n1",
        "n2",
        "d_num",
        "argmax_v",
        F.expr("(d_num * 1000000) div (n1 * n2)").alias("d_micro"),
        F.round(
            dd
            * F.sqrt(
                nn / (F.col("n1").cast("double") + F.col("n2").cast("double"))
            ),
            6,
        ).alias("k_stat_r"),
    )


QUERIES["events_ks_drift"] = q_events_ks_drift

ORACLES["events_ks_drift"] = """
WITH ev AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         ts < TIMESTAMP '2024-01-16' AS early
  FROM events
), g1 AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM ev WHERE early GROUP BY v
), g2 AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM ev WHERE NOT early GROUP BY v
), c1 AS (
  SELECT v, CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS cum1
  FROM g1
), c2 AS (
  SELECT v, CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS cum2
  FROM g2
), merged AS (
  SELECT COALESCE(c1.v, c2.v) AS v, c1.cum1, c2.cum2
  FROM c1 FULL OUTER JOIN c2 ON c1.v = c2.v
), filled AS (
  SELECT v,
         COALESCE(LAST_VALUE(cum1 IGNORE NULLS) OVER (
           ORDER BY v ROWS UNBOUNDED PRECEDING), 0) AS f1,
         COALESCE(LAST_VALUE(cum2 IGNORE NULLS) OVER (
           ORDER BY v ROWS UNBOUNDED PRECEDING), 0) AS f2
  FROM merged
), n AS (
  SELECT CAST(SUM(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS n2
  FROM ev
), scored AS (
  SELECT n.n1, n.n2,
         abs(f.f1 * n.n2 - f.f2 * n.n1) AS dn,
         f.v,
         ROW_NUMBER() OVER (ORDER BY abs(f.f1 * n.n2 - f.f2 * n.n1) DESC,
                            f.v ASC) AS rk
  FROM filled f CROSS JOIN n
), d AS (
  SELECT n1, n2, dn AS d_num, v AS argmax_v FROM scored WHERE rk = 1
)
SELECT n1, n2, CAST(d_num AS BIGINT) AS d_num,
       CAST(argmax_v AS BIGINT) AS argmax_v,
       CAST((d_num * 1000000) // (n1 * n2) AS BIGINT) AS d_micro,
       round((CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
             * sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                    / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))), 6)
         AS k_stat_r
FROM d
"""


# ---------------------------------------------------------- runs test


def q_orders_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily-revenue sign sequence: is
    each day's revenue being above/below the overall daily MEDIAN
    serially random, or does it cluster (momentum) / alternate
    (mean-reversion)? The sign sequence lives on the bounded calendar
    grid; runs count via a lag comparison; the normal approximation
    z = (R − μ)/σ with μ = 2·n1·n2/n + 1 evaluates from exact integer
    counts. Clustering shows up as R far below μ."""
    from pyspark.sql import Window as W

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)")
            ).alias("rev")
        )
    )
    # lower-median daily revenue as the cut (type-1 quantile on the
    # bounded day grid)
    byv = W.orderBy(F.col("rev").asc(), F.col("d").asc())
    nw = W.partitionBy()
    med = (
        daily.withColumn("rk", F.row_number().over(byv))
        .withColumn("nd", F.count(F.lit(1)).over(nw))
        .where(F.col("rk") == F.expr("(nd + 1) div 2"))
        .select(F.col("rev").alias("med_rev"))
    )
    signs = daily.crossJoin(F.broadcast(med)).select(
        "d", (F.col("rev") > F.col("med_rev")).cast("int").alias("s")
    )
    byd = W.orderBy("d")
    runs = signs.select(
        "s",
        (
            F.lag("s", 1).over(byd).isNull()
            | (F.lag("s", 1).over(byd) != F.col("s"))
        )
        .cast("int")
        .alias("new_run"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("s").cast("bigint").alias("n_above"),
        F.sum("new_run").cast("bigint").alias("n_runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = (F.col("n_days") - F.col("n_above")).cast("double")
    n = F.col("n_days").cast("double")
    mu = F.lit(2.0) * n1 * n2 / n + F.lit(1.0)
    var = (
        (F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n))
        / (n * n * (n - F.lit(1.0)))
    )
    return runs.select(
        "n_days",
        "n_above",
        "n_runs",
        F.round(mu, 6).alias("mu_r"),
        F.round(
            (F.col("n_runs").cast("double") - mu) / F.sqrt(var), 6
        ).alias("z_r"),
    )


QUERIES["orders_runs_test"] = q_orders_runs_test

ORACLES["orders_runs_test"] = """
WITH daily AS MATERIALIZED (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
), med AS (
  SELECT rev AS med_rev FROM (
    SELECT rev,
           ROW_NUMBER() OVER (ORDER BY rev ASC, d ASC) AS rk,
           COUNT(*) OVER () AS nd
    FROM daily
  ) WHERE rk = (nd + 1) // 2
), signs AS (
  SELECT d, CASE WHEN rev > (SELECT med_rev FROM med)
                 THEN 1 ELSE 0 END AS s
  FROM daily
), flagged AS (
  SELECT s,
         CASE WHEN LAG(s) OVER (ORDER BY d) IS NULL
               OR LAG(s) OVER (ORDER BY d) <> s
              THEN 1 ELSE 0 END AS new_run
  FROM signs
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(s) AS BIGINT) AS n_above,
         CAST(SUM(new_run) AS BIGINT) AS n_runs
  FROM flagged
)
SELECT n_days, n_above, n_runs,
       round(2.0 * n_above * (n_days - n_above) / CAST(n_days AS DOUBLE)
             + 1.0, 6) AS mu_r,
       round((CAST(n_runs AS DOUBLE)
              - (2.0 * n_above * (n_days - n_above)
                 / CAST(n_days AS DOUBLE) + 1.0))
             / sqrt((2.0 * n_above * (n_days - n_above)
                     * (2.0 * n_above * (n_days - n_above)
                        - CAST(n_days AS DOUBLE)))
                    / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)
                       * (CAST(n_days AS DOUBLE) - 1.0))), 6) AS z_r
FROM agg
"""
