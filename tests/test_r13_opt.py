"""Round-13 OPTIMIZATION-round pins: every rewrite here must be
value-identical to the formulation it replaced — these tests hold the old
formulation next to the new one so a regression in either direction is a
red test, not a silent result change."""

from __future__ import annotations

from pyspark.sql import functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
    sorts,
    text,
    windows,
)


def test_explicit_shuffle_width_policy(spark, sf_dir):
    """Data-derived explicit-exchange width: bytes-per-task floor, capped
    at the session conf; conf width when bytes aren't knowable."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.session import (
        RANGE_TASK_BYTES,
        explicit_shuffle_width,
        local_input_bytes,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import (
        load_table,
    )

    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    orders = load_table(spark, sf_dir, "orders")
    b = local_input_bytes(orders)
    assert b is not None and b > 0
    n = explicit_shuffle_width(orders)
    assert 1 <= n <= cap
    assert n == max(1, min(cap, -(-b // RANGE_TASK_BYTES)))
    # No local files -> conf width unchanged.
    mem = spark.range(10)
    assert explicit_shuffle_width(mem) == cap


def test_order_by_bounded_equals_order_by(spark):
    """coalesce(1) + local sort must produce the same TOTAL order as the
    range-partitioned orderBy it replaces on bounded-output tails —
    including null keys and ties."""
    rows = [(None, 1.0), ("b", 2.0), ("a", 3.0), ("a", 1.0), ("c", None)]
    df = spark.createDataFrame(rows, "k string, v double").repartition(5)
    old = df.orderBy("k", "v").collect()
    new = sorts.order_by_bounded(df, ["k", "v"]).collect()
    assert [tuple(r) for r in new] == [tuple(r) for r in old]


def test_top_k_per_group_ordered_equals_orderby_form(spark):
    """The single-exchange ordered form must match the two-exchange
    ``top_k_per_group(...).orderBy(keys, rnk)`` form ROW-FOR-ROW, including
    total output order (ties, nulls-first key, singleton groups)."""
    rows = [
        # key, price, id — group 7 has ties on price, group None exercises
        # NULLS FIRST, group 1 is a singleton, group 2 exceeds k
        (7, 5.0, 1),
        (7, 5.0, 2),
        (7, 9.0, 3),
        (7, 1.0, 4),
        (None, 3.0, 5),
        (1, 2.0, 6),
        (2, 8.0, 7),
        (2, 8.0, 8),
        (2, 7.0, 9),
        (2, 6.0, 10),
    ]
    df = spark.createDataFrame(rows, "k int, price double, id int")
    order = [F.col("price").desc(), F.col("id").asc()]
    old = (
        windows.top_k_per_group(df, ["k"], order, k=3)
        .orderBy("k", "rnk")
        .collect()
    )
    new = windows.top_k_per_group_ordered(df, ["k"], order, k=3).collect()
    assert [tuple(r) for r in new] == [tuple(r) for r in old]
    assert len(new) == 8  # groups 7 and 2 capped at 3, two singletons


def test_quality_features_translate_equals_regex_form(spark):
    """translate()-based punct/digit counts must equal the regex-class
    formulation they replaced (and the oracle still uses) byte-for-byte —
    including non-ASCII chars, which fall outside BOTH char classes."""
    docs = [
        (1, "Hello,  World! 123"),
        (2, "   tabs\tand\nnewlines 4 the win   "),
        (3, "çédille ünïcode 9ç!"),
        (4, "..."),
        (5, "the of and plain english text here"),
        (6, "1234567890"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {
        r["doc_id"]: r
        for r in text.quality_features(df, "text").collect()
    }
    # The exact regex formulation this round replaced.
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.functions import (
        normalize_text,
    )

    ref = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.length(
                F.regexp_replace(normalize_text("text"), "[a-z0-9 ]", "")
            ).alias("punct"),
            F.length(
                F.regexp_replace(normalize_text("text"), "[^0-9]", "")
            ).alias("digits"),
            F.length(normalize_text("text")).alias("nc"),
        ).collect()
    }
    for doc_id, r in out.items():
        nc = ref[doc_id]["nc"]
        assert r["q_punct_ratio"] == ref[doc_id]["punct"] / nc, doc_id
        assert r["q_digit_ratio"] == ref[doc_id]["digits"] / nc, doc_id
