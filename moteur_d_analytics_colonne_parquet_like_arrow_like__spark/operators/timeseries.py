"""Time-series operators: grid resampling with forward-fill, and robust
(median/MAD) outlier detection (reference: ABSENT — SURVEY.md §2 extension
surface; the reference engine stops at zone-map time pruning, these are the
gap-fill / anomaly passes every telemetry pipeline layers on top).

Scale notes:

- ``resample_ffill`` materialises one row per (key, grid step). The grid is
  generated per key with ``explode(sequence(...))`` — a map-side expansion
  bounded by each key's own time span, never a driver-side loop or a global
  calendar cross join. The forward-fill is one window per key ordered by the
  grid timestamp; the only shuffle is the partitionBy(key) exchange, and the
  observation aggregate that precedes it shares the same key so AQE can
  coalesce. At 100 TB the span guard (``max_steps``) is the safety valve: a
  key with a pathological min/max span fails loudly instead of exploding a
  billion grid rows.
- ``mad_outliers`` is two exact-median passes (per-group median, then median
  of absolute deviations) + a broadcast join of the tiny per-group stats
  table back onto the facts. Group count is assumed small (event types,
  sensors — thousands at most), so the stats side always broadcasts; the
  fact side is never shuffled at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def resample_ffill(
    observed: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    step: str = "1 hour",
    max_steps: int = 1_000_000,
) -> DataFrame:
    """Resample one-row-per-(key, bucket) observations onto a dense
    per-key time grid and forward-fill the gaps.

    ``observed`` must already be aggregated to at most one row per
    (key, bucket) — this operator owns the grid and the fill, not the
    bucket aggregate (callers pick sum/avg/last and its exactness rules).
    The output has one row per grid step from each key's first to last
    bucket with:

    - ``value_col``: the observed value, forward-filled from the most
      recent non-null observation (``last(..., ignorenulls=True)`` over a
      ROWS UNBOUNDED PRECEDING window — the first grid row per key is an
      observation by construction, so no leading nulls survive),
    - ``is_gap``: 1 where the row was synthesised by the grid, 0 where
      observed.

    ``max_steps`` guards the sequence explode: one corrupt timestamp
    (epoch 0, year 9999) would otherwise silently inflate a key's grid to
    millions of rows; exceeding it raises at execution time.
    """
    grid_span = observed.groupBy(key_col).agg(
        F.min(bucket_col).alias("__h0"), F.max(bucket_col).alias("__h1")
    )
    step_expr = F.expr(f"INTERVAL {step}")
    # Step length in micros via instants (epoch + step − epoch), immune to
    # session-timezone parsing: timestamp_seconds(0) is the epoch instant.
    step_us = F.unix_micros(F.timestamp_seconds(F.lit(0)) + step_expr)
    n_steps = (
        F.unix_micros(F.col("__h1")) - F.unix_micros(F.col("__h0"))
    ) / step_us
    guarded = grid_span.withColumn(
        "__h1",
        F.when(
            n_steps <= F.lit(max_steps), F.col("__h1")
        ).otherwise(
            F.raise_error(
                F.lit(
                    f"resample_ffill: key span exceeds max_steps={max_steps}"
                )
            )
        ),
    )
    grid = guarded.select(
        key_col,
        F.explode(F.sequence(F.col("__h0"), F.col("__h1"), step_expr)).alias(
            bucket_col
        ),
    )
    joined = grid.join(observed, on=[key_col, bucket_col], how="left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        bucket_col,
        F.last(F.col(value_col), ignorenulls=True).over(w).alias(value_col),
        F.col(value_col).isNull().cast("int").alias("is_gap"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
    round_stats: int | None = 6,
) -> tuple[DataFrame, DataFrame]:
    """Robust per-group outlier detection: |x − median| > k·1.4826·MAD.

    Returns ``(stats, flagged)``: ``stats`` has one row per group with
    ``med`` and ``mad`` (exact medians — use on bounded group counts);
    ``flagged`` is ``df`` plus an ``is_outlier`` int column. 1.4826 scales
    MAD to the σ of a normal distribution, making ``k`` read like a
    z-score threshold.

    ``round_stats`` rounds med/MAD before the threshold comparison so two
    engines whose exact-median interpolation differs in the last ulp still
    flag identical rows (the oracle-parity rule; pass None for raw).
    """
    med = df.groupBy(group_col).agg(
        F.median(F.col(value_col)).alias("med")
    )
    dev = df.join(F.broadcast(med), group_col).select(
        group_col, F.abs(F.col(value_col) - F.col("med")).alias("__adev")
    )
    mad = dev.groupBy(group_col).agg(F.median("__adev").alias("mad"))
    stats = med.join(mad, group_col)
    if round_stats is not None:
        stats = stats.select(
            group_col,
            F.round("med", round_stats).alias("med"),
            F.round("mad", round_stats).alias("mad"),
        )
    flagged = df.join(F.broadcast(stats), group_col).withColumn(
        "is_outlier",
        (
            F.abs(F.col(value_col) - F.col("med"))
            > F.lit(k) * F.lit(1.4826) * F.col("mad")
        ).cast("int"),
    )
    return stats, flagged


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lower_p: float = 0.01,
    upper_p: float = 0.99,
    round_stats: int | None = 6,
) -> DataFrame:
    """Per-group percentile clipping (winsorization): values below the
    group's ``lower_p`` quantile clamp up to it, above ``upper_p`` clamp
    down — the standard robust pre-processing for heavy-tailed features.

    Adds ``lo``/``hi`` (the per-group bounds, exact interpolated
    percentiles, rounded like :func:`mad_outliers` for cross-engine
    determinism) and ``winsorized`` (the clamped value). Same scale shape
    as ``mad_outliers``: one exact-percentile pass over a bounded group
    count, then a broadcast of the tiny bounds table — the fact side never
    shuffles.
    """
    bounds = df.groupBy(group_col).agg(
        F.percentile(F.col(value_col), F.lit(lower_p)).alias("lo"),
        F.percentile(F.col(value_col), F.lit(upper_p)).alias("hi"),
    )
    if round_stats is not None:
        bounds = bounds.select(
            group_col,
            F.round("lo", round_stats).alias("lo"),
            F.round("hi", round_stats).alias("hi"),
        )
    return df.join(F.broadcast(bounds), group_col).withColumn(
        "winsorized",
        F.least(F.greatest(F.col(value_col), F.col("lo")), F.col("hi")),
    )


def ewma_half(
    observed: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Exponentially-weighted moving average with alpha = 1/2 per key:
    ``ewma_1 = x_1; ewma_t = x_t/2 + ewma_{t-1}/2`` over the
    ``order_col``-sorted series. Returns (key, n_points, last_value,
    ewma_r) — the smoothed level a monitoring/forecast pass reads.

    Exactness across engines WITHOUT decimal routing: the recurrence is
    evaluated as a SEQUENTIAL FOLD over the per-key ordered array
    (``aggregate`` here, ``list_reduce`` in ANSI engines), so the
    operation order is fixed by definition — and every step is two
    IEEE-exact halvings plus one correctly-rounded add, identical
    everywhere. This is the same determinism contract as
    ``functions.dot_product``, applied to a recurrence that window
    functions cannot express (each output depends on the previous
    OUTPUT, not a frame of inputs).

    Scale shape: one groupBy(key) collecting the ordered (order, value)
    structs — the array is bounded by the per-key series length (days,
    not events; aggregate ``observed`` to one row per (key, step) first,
    e.g. via ``resample_ffill`` or a bucketed mean). The fold is a
    per-row expression after that single shuffle.
    """
    pts = observed.groupBy(F.col(key_col).alias("key")).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(order_col).alias("o"),
                                    F.col(value_col).alias("v")))
        ).alias("__pts")
    )
    vals = F.transform(F.col("__pts"), lambda p: p["v"].cast("double"))
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: acc / F.lit(2.0) + x / F.lit(2.0),
    )
    return pts.select(
        F.col("key").alias(key_col),
        F.size(F.col("__pts")).cast("bigint").alias("n_points"),
        F.round(F.element_at(vals, -1), 6).alias("last_r"),
        F.round(ewma, 6).alias("ewma_r"),
    ).orderBy(key_col)


def seasonal_profile_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    sigma: float = 2.0,
) -> DataFrame:
    """Day-of-week seasonal baseline + deviation screen per key — the
    monitoring pass that separates "Mondays are always like this" from a
    real anomaly: daily totals reduce the facts once, a per-(key, dow)
    profile (mean + population stddev over the daily totals) forms the
    seasonal expectation, and days whose total deviates more than
    ``sigma`` standard deviations from their own weekday's mean are
    counted as anomalous. One row per (key, dow): days observed, mean,
    stddev, anomalous-day count.

    Exactness: daily totals route values through DECIMAL(18,6) (order-
    independent); the profile moments route the daily totals AND their
    squares through DECIMAL again, so mean/variance are bit-identical on
    any engine (single rounded sqrt/divisions at the end). dow is 0 =
    Sunday .. 6 = Saturday (Spark ``dayofweek - 1`` == DuckDB
    ``dayofweek``).

    Scale shape: the raw facts are touched ONCE (combiner-friendly
    (key, day) groupBy); everything after runs on the per-day reduction
    — profile cells are (keys x 7), the flag pass joins daily totals to
    their broadcast profile row. No windows anywhere.
    """
    daily = df.groupBy(
        F.col(key_col).alias("k"), F.to_date(ts_col).alias("d")
    ).agg(
        # cast the total back to (18,6) so the square below is (37,12) —
        # inside both engines' 38-digit cap, no implicit rescale
        F.sum(F.col(value_col).cast("decimal(18,6)"))
        .cast("decimal(18,6)")
        .alias("__x_dec")
    )
    daily = daily.select(
        "k",
        "d",
        (F.dayofweek("d") - F.lit(1)).cast("int").alias("dow"),
        F.col("__x_dec").cast("double").alias("x"),
        F.col("__x_dec"),
    )
    prof = daily.groupBy("k", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("__x_dec").alias("__sx"),
        F.sum(F.col("__x_dec") * F.col("__x_dec")).alias("__sxx"),
    )
    prof = prof.select(
        "k",
        "dow",
        "n_days",
        (F.col("__sx").cast("double") / F.col("n_days")).alias("__mean"),
        F.sqrt(
            F.greatest(
                F.lit(0.0),
                F.col("__sxx").cast("double") / F.col("n_days")
                - F.pow(F.col("__sx").cast("double") / F.col("n_days"), 2),
            )
        ).alias("__std"),
    )
    flagged = (
        daily.join(F.broadcast(prof), ["k", "dow"])
        .withColumn(
            "__anom",
            (
                F.abs(F.col("x") - F.col("__mean"))
                > F.lit(float(sigma)) * F.col("__std")
            ).cast("int"),
        )
        .groupBy("k", "dow")
        .agg(F.sum("__anom").cast("bigint").alias("n_anomalous"))
    )
    return (
        prof.join(flagged, ["k", "dow"])
        .select(
            F.col("k").alias(key_col),
            "dow",
            "n_days",
            F.round("__mean", 6).alias("mean_r"),
            F.round("__std", 6).alias("std_r"),
            "n_anomalous",
        )
        .orderBy(key_col, "dow")
    )


def holt_half(
    observed: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    forecast_steps: int = 7,
) -> DataFrame:
    """Holt double-exponential smoothing with alpha = beta = 1/2 per
    key: level AND trend state, the next rung after ``ewma_half`` (an
    EWMA tracks a level but lags any sustained slope; Holt's trend term
    closes that lag and yields an h-step-ahead forecast l + h*b).

    Recurrence (state initialized to (l=x_1, b=0)):
        l_t = x_t/2 + (l_{t-1} + b_{t-1})/2
        b_t = (l_t - l_{t-1})/2 + b_{t-1}/2

    Same determinism contract as ``ewma_half``: a SEQUENTIAL FOLD over
    the per-key ordered array with a struct (level, trend) accumulator
    — operation order fixed by definition, each step two IEEE-exact
    halvings plus correctly-rounded adds, bit-identical in any engine
    with a left fold (DuckDB: ``list_reduce`` over
    ``struct_pack(l, b)`` elements, first element as the seed). Window
    functions cannot express it (each output depends on the previous
    OUTPUT pair). Scale shape: one groupBy(key) over the already-
    reduced per-step series; the fold is a per-row expression.

    Returns (key, n_points, level_r, trend_r, forecast_r) with
    forecast_r = level + forecast_steps * trend, rounded to 6.
    """
    pts = observed.groupBy(F.col(key_col).alias("key")).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("o"), F.col(value_col).alias("v")
                )
            )
        ).alias("__pts")
    )
    vals = F.transform(F.col("__pts"), lambda p: p["v"].cast("double"))

    def _step(acc, x):
        new_l = x / F.lit(2.0) + (acc["l"] + acc["b"]) / F.lit(2.0)
        new_b = (new_l - acc["l"]) / F.lit(2.0) + acc["b"] / F.lit(2.0)
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    st = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.struct(
            F.element_at(vals, 1).alias("l"), F.lit(0.0).alias("b")
        ),
        _step,
    )
    return pts.select(
        F.col("key").alias(key_col),
        F.size(F.col("__pts")).cast("bigint").alias("n_points"),
        F.round(st["l"], 6).alias("level_r"),
        F.round(st["b"], 6).alias("trend_r"),
        F.round(
            st["l"] + F.lit(float(forecast_steps)) * st["b"], 6
        ).alias("forecast_r"),
    ).orderBy(key_col)


def interpolate_linear(
    observed: DataFrame,
    key_col: str,
    idx_col: str,
    value_col: str,
    max_steps: int = 1_000_000,
) -> DataFrame:
    """Densify one-row-per-(key, integer-grid-index) observations onto the
    full index range and LINEARLY interpolate interior gaps — the
    two-sided sibling of :func:`resample_ffill` (carry-forward fills from
    the past only; interpolation weighs both neighbours), the standard
    sensor/feature repair before model training.

    Exactness contract: ``idx_col`` is an integer grid position (e.g.
    epoch-hours) and ``value_col`` an integer (scaled units, e.g. milli);
    a gap at t between observations (t0,v0) and (t1,v1) fills with the
    floor-division lerp ``(v0·(t1−t) + v1·(t−t0)) div (t1−t0)`` — pure
    BIGINT, bit-identical across engines (no float slope). Grid edges are
    observations by construction (the grid spans each key's own min..max),
    so every gap has both neighbours.

    Scale shape: the grid is a per-key ``explode(sequence(...))`` guarded
    by ``max_steps`` (a corrupt index would otherwise explode one key into
    millions of rows); the neighbour search is two windows partitioned by
    key — bounded by each key's own span, never a global sort.

    reference: ABSENT — SURVEY.md §2 extension surface.
    """
    span = observed.groupBy(key_col).agg(
        F.min(idx_col).alias("__i0"), F.max(idx_col).alias("__i1")
    )
    guarded = span.withColumn(
        "__i1",
        F.when(
            F.col("__i1") - F.col("__i0") <= F.lit(max_steps), F.col("__i1")
        ).otherwise(
            F.raise_error(
                F.lit(
                    "interpolate_linear: key span exceeds "
                    f"max_steps={max_steps}"
                )
            )
        ),
    )
    grid = guarded.select(
        key_col,
        F.explode(
            F.sequence(F.col("__i0"), F.col("__i1"))
        ).alias(idx_col),
    )
    joined = grid.join(observed, on=[key_col, idx_col], how="left")
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy(idx_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_idx = F.when(
        F.col(value_col).isNotNull(), F.col(idx_col)
    )
    sided = joined.select(
        key_col,
        idx_col,
        F.col(value_col).isNull().cast("int").alias("is_gap"),
        F.last(value_col, ignorenulls=True).over(w_prev).alias("__v0"),
        F.last(obs_idx, ignorenulls=True).over(w_prev).alias("__t0"),
        F.first(value_col, ignorenulls=True).over(w_next).alias("__v1"),
        F.first(obs_idx, ignorenulls=True).over(w_next).alias("__t1"),
    )
    lerp = F.expr(
        f"(__v0 * (__t1 - {idx_col}) + __v1 * ({idx_col} - __t0))"
        " div (__t1 - __t0)"
    )
    return sided.select(
        key_col,
        idx_col,
        F.when(F.col("is_gap") == 0, F.col("__v0"))
        .otherwise(lerp)
        .cast("bigint")
        .alias(value_col),
        "is_gap",
    )
