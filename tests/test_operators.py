"""Unit tests for extension operators (joins/windows/setops/sorts)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
    joins,
    setops,
    sorts,
    windows,
)


def _ts(s: str):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_backward(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01T10:00:05")),
            (2, "A", _ts("2024-01-01T10:00:00")),
            (3, "B", _ts("2024-01-01T09:00:00")),
        ],
        "trade_id long, sym string, t timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:03"), 101.0),
            ("A", _ts("2024-01-01T09:59:59"), 100.0),
            ("B", _ts("2024-01-01T10:00:00"), 50.0),  # after the B trade
        ],
        "sym string, qt timestamp, px double",
    )
    out = joins.asof_join(
        trades, quotes, key="sym", left_ts="t", right_ts="qt", left_id="trade_id"
    )
    got = {r["trade_id"]: r["px"] for r in out.collect()}
    assert got[1] == 101.0  # latest quote ≤ 10:00:05
    assert got[2] == 100.0  # latest quote ≤ 10:00:00
    assert got[3] is None  # no quote before the trade → left row kept, null


def test_asof_join_forward(spark):
    left = spark.createDataFrame([(1, "A", 10)], "id long, k string, t long")
    right = spark.createDataFrame(
        [("A", 5, "early"), ("A", 12, "next"), ("A", 20, "late")],
        "k string, rt long, tag string",
    )
    out = joins.asof_join(
        left, right, key="k", left_ts="t", right_ts="rt", left_id="id",
        direction="forward",
    )
    assert out.collect()[0]["tag"] == "next"


def test_semi_anti_partition(spark):
    left = spark.createDataFrame([(i,) for i in range(10)], "k long")
    right = spark.createDataFrame([(i,) for i in range(0, 10, 2)], "k long")
    semi = joins.semi_join(left, right, ["k"])
    anti = joins.anti_join(left, right, ["k"])
    assert semi.count() == 5 and anti.count() == 5
    # semi ∪ anti = left, disjoint
    assert semi.intersect(anti).count() == 0
    assert setops.union(semi, anti).exceptAll(left).count() == 0


def test_range_join_keyed(spark):
    li = spark.createDataFrame([(1, 5), (2, 15)], "k int, v int")
    bounds = spark.createDataFrame([(1, 0, 10), (2, 0, 10)], "k int, lo int, hi int")
    out = joins.range_join(
        li, bounds, "k",
        F.col("v") >= F.col("lo"), F.col("v") <= F.col("hi"),
    )
    assert [r["k"] for r in out.collect()] == [1]


def test_top_k_per_group_deterministic(spark):
    df = spark.createDataFrame(
        [("g", i % 3, i) for i in range(9)], "g string, score int, id int"
    )
    out = windows.top_k_per_group(
        df, ["g"], [F.col("score").desc(), F.col("id").asc()], k=2
    )
    rows = out.orderBy("rnk").collect()
    assert [(r["score"], r["id"]) for r in rows] == [(2, 2), (2, 5)]


def test_sessionize_gap(spark):
    base = 1_700_000_000
    df = spark.createDataFrame(
        [
            (1, base + 0),
            (1, base + 10),
            (1, base + 2000),  # > 30min? no: gap 1990s > 1800 → new session
            (2, base + 0),
        ],
        "uid long, epoch long",
    ).withColumn("ts", F.timestamp_seconds("epoch"))
    out = windows.sessionize(df, "uid", "ts", gap_seconds=1800)
    got = {(r["uid"], r["epoch"]): r["session_id"] for r in out.collect()}
    assert got[(1, base)] == 1
    assert got[(1, base + 10)] == 1
    assert got[(1, base + 2000)] == 2
    assert got[(2, base)] == 1


def test_running_agg_peers_share_value(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 1, 20), ("a", 2, 5)], "k string, o int, v int"
    )
    out = windows.running_agg(df, ["k"], "o", F.col("v"), out_col="cum")
    got = sorted((r["o"], r["v"], r["cum"]) for r in out.collect())
    # RANGE frame: both o=1 peers see the full 30
    assert got == [(1, 10, 30), (1, 20, 30), (2, 5, 35)]


def test_setops_semantics(spark):
    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], "x int")
    b = spark.createDataFrame([(2,), (3,), (4,)], "x int")
    assert setops.union(a, b).count() == 7
    assert setops.union_distinct(a, b).count() == 4
    assert sorted(r["x"] for r in setops.intersect(a, b).collect()) == [2, 3]
    assert sorted(r["x"] for r in setops.except_(a, b).collect()) == [1]
    # exceptAll keeps multiplicity: {1,2,2,3} minus {2,3,4} = {1,2}
    assert sorted(r["x"] for r in setops.except_all(a, b).collect()) == [1, 2]


def test_top_k_global(spark):
    df = spark.range(1000).selectExpr("id", "id % 7 as v")
    out = sorts.top_k(df, [F.col("v").desc(), F.col("id").asc()], 3).collect()
    assert [(r["v"], r["id"]) for r in out] == [(6, 6), (6, 13), (6, 20)]


def test_asof_join_keeps_duplicate_left_rows(spark):
    """Without a left_id, two IDENTICAL left rows must each produce an
    output row (the surrogate-key window partition), not collapse to one."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import joins

    left = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20)], "k long, t long"
    )
    right = spark.createDataFrame([(1, 5, "a"), (1, 15, "b")], "k long, rt long, tag string")
    out = joins.asof_join(left, right, key="k", left_ts="t", right_ts="rt").collect()
    assert len(out) == 3
    tags = sorted(r["tag"] for r in out)
    assert tags == ["a", "a", "b"]


def test_salted_join_rejects_right_preserving(spark):
    import pytest

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import joins

    left = spark.createDataFrame([(1, 1)], "k long, v long")
    right = spark.createDataFrame([(1, "x")], "k long, tag string")
    with pytest.raises(ValueError, match="left-preserving"):
        joins.salted_join(left, right, "k", how="full")


def test_constraint_checks(spark):
    """Known-answer violation counts for every rule kind, incl. NULL
    handling (NULLs never count against range/values/regex rules)."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
        constraints as C,
    )

    df = spark.createDataFrame(
        [
            (1, 10, "ok", "A"),
            (2, -5, "ok", "B"),      # range violation
            (2, 500, None, "C"),     # dup key; null status
            (3, 50, "bad!", "Z"),    # regex + accepted_values violation
            (4, None, "ok", "A"),    # null v: not a range violation
        ],
        "id long, v long, status string, code string",
    )
    dim = spark.createDataFrame([("A",), ("B",), ("C",)], "code string")
    rules = [
        C.not_null("status"),
        C.in_range("v", 0, 100),
        C.accepted_values("code", ["A", "B", "C"]),
        C.matches("status", r"^[a-z]+$"),
        C.unique("id"),
        C.references("code", dim, "code"),
    ]
    got = {
        r["rule"]: r["violations"]
        for r in C.check_constraints(df, rules).collect()
    }
    assert got == {
        "not_null(status)": 1,
        "in_range(v,0,100)": 2,      # -5 and 500
        "accepted_values(code)": 1,  # Z
        "matches(status)": 1,        # 'bad!'
        "unique(id)": 2,             # both id=2 rows
        "references(code)": 1,       # Z missing from dim
    }


def test_interval_overlap_join_known_pairs(spark):
    """Chunked interval join equals the naive O(n^2) overlap join,
    including a long interval spanning many buckets (matched exactly
    once thanks to the first-bucket dedup filter) and a point interval."""
    from pyspark.sql import functions as F

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators.joins import (
        interval_overlap_join,
    )

    rows = [
        (1, "a", 0, 100),
        (1, "b", 50, 150),       # overlaps a
        (1, "c", 200, 300),      # overlaps nothing
        (1, "p", 100, 100),      # point: touches a's end, inside b
        (2, "d", 0, 10_000),     # long: spans 167 one-minute buckets
        (2, "e", 9_000, 9_500),  # overlaps d only
    ]
    df = spark.createDataFrame(rows, "k int, id string, s long, e long")
    a = df.select("k", F.col("id").alias("id_a"), F.col("s").alias("sa"),
                  F.col("e").alias("ea"))
    b = df.select("k", F.col("id").alias("id_b"), F.col("s").alias("sb"),
                  F.col("e").alias("eb"))
    out = interval_overlap_join(
        a, b, ["k"], "sa", "ea", "sb", "eb", chunk_seconds=60
    ).where(F.col("id_a") < F.col("id_b"))
    got = sorted((r["id_a"], r["id_b"]) for r in out.collect())
    assert got == [("a", "b"), ("a", "p"), ("b", "p"), ("d", "e")]


def test_observed_quality_rides_the_action(spark):
    """observe() metrics are collected during the single real action —
    values match, no extra scan is scheduled by the helper itself."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators.constraints import (
        observed_quality,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "d")], "id long, s string"
    )
    observed, obs = observed_quality(df, ["s", "id"])
    assert observed.where("id > 1").count() == 3  # the one real action
    got = obs.get
    assert got["n_rows"] == 4  # observed at scan, pre-filter
    assert got["nulls_s"] == 2
    assert got["nulls_id"] == 0


def test_interval_overlap_join_chunk_invariance(spark):
    """Seeded random intervals: the chunked join equals the naive O(n^2)
    overlap set for EVERY chunk size — the rewrite is parameter-invariant
    (pairs found once, never duplicated or dropped at bucket borders)."""
    import random

    from pyspark.sql import functions as F

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators.joins import (
        interval_overlap_join,
    )

    rng = random.Random(1337)
    rows = []
    for i in range(300):
        k = rng.randint(0, 4)
        s = rng.randint(0, 5_000)
        e = s + rng.randint(0, 400)  # point through multi-bucket lengths
        rows.append((k, i, s, e))
    naive = {
        (a[1], b[1])
        for a in rows
        for b in rows
        if a[0] == b[0] and a[1] < b[1] and a[2] <= b[3] and b[2] <= a[3]
    }
    df = spark.createDataFrame(rows, "k int, id long, s long, e long")
    a = df.select("k", F.col("id").alias("id_a"), F.col("s").alias("sa"),
                  F.col("e").alias("ea"))
    b = df.select("k", F.col("id").alias("id_b"), F.col("s").alias("sb"),
                  F.col("e").alias("eb"))
    for chunk in (10, 100, 1000):
        out = interval_overlap_join(
            a, b, ["k"], "sa", "ea", "sb", "eb", chunk_seconds=chunk
        ).where(F.col("id_a") < F.col("id_b"))
        got = {(r["id_a"], r["id_b"]) for r in out.collect()}
        assert got == naive, f"chunk={chunk}"


def test_cms_never_underestimates_random(spark):
    """Seeded random item stream with heavy skew: every CMS estimate >=
    its exact count (the sketch's one-sided guarantee), at a width with
    guaranteed collisions."""
    import random
    from collections import Counter

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
        sketches,
    )

    rng = random.Random(99)
    stream = [f"item{int(rng.paretovariate(0.7))}" for _ in range(5_000)]
    exact = Counter(stream)
    items = spark.createDataFrame([(s,) for s in stream], "item string")
    sk = sketches.cms_build(items, "item", depth=3, width=64)  # forced collisions
    est = sketches.cms_estimate(items.distinct(), sk, "item", depth=3, width=64)
    for r in est.collect():
        assert r["cms_est"] >= exact[r["item"]], r["item"]
