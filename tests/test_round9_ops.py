"""Round-9 operator tests: the pin_exploding_join helper (VERDICT r8
item 7 — the r8 AQE fan-out fix codified), plus the round's measurement
dials (trained IVF directory, enriched-corpus coverage meter)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import assert_explosion_pinned
from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
    joins,
)


def test_pin_exploding_join_is_aqe_exempt(spark):
    """The helper must produce a REPARTITION_BY_NUM exchange (user
    repartition with explicit numPartitions — the only shuffle origin AQE
    will not coalesce), hash-partitioned on the pinned key."""
    df = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    pinned = joins.pin_exploding_join(df, "k", 8)
    plan = pinned._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan
    assert "hashpartitioning(k" in plan


def test_pin_exploding_join_defaults_to_parallelism(spark):
    df = spark.range(100).select((F.col("id") % 3).alias("k"))
    pinned = joins.pin_exploding_join(df, "k")
    assert (
        pinned.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_pin_exploding_join_survives_downstream_join(spark):
    """End-to-end shape of the r8 failure: a tiny aggregate relation
    joined back to its pinned source must keep the REPARTITION_BY_NUM
    layout through the exploding self-join (the elision trap — a pin at
    the join inputs alone is elided against a broadcast-collapsed
    lineage; the source pin survives every planner path)."""
    base = spark.range(2000).select(
        (F.col("id") % 11).alias("k"), F.col("id").alias("doc")
    )
    src = joins.pin_exploding_join(base, "k", 8)
    counts = src.groupBy("k").agg(F.count(F.lit(1)).alias("df"))
    side = src.join(counts, "k")
    a = side.select(F.col("doc").alias("a"), "k")
    b = side.select(F.col("doc").alias("b"), "k")
    pairs = (
        joins.pin_exploding_join(a, "k", 8)
        .join(joins.pin_exploding_join(b, "k", 8), "k")
        .where(F.col("a") != F.col("b"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("pairs"))
    )
    plan = assert_explosion_pinned(pairs, "k", min_pins=1)
    # and the result is what an unpinned plan computes too
    rows = {r["k"]: r["pairs"] for r in pairs.collect()}
    import math

    expect = {}
    for k in range(11):
        n = math.ceil((2000 - k) / 11)
        expect[k] = n * (n - 1)
    assert rows == expect
