"""Unit tests for the round-4-registered operators: pagerank,
kmeans_assign_step, gopher_quality, chunk_documents, top_ngrams.

Each test exercises hand-computable semantics on tiny in-memory data —
independent of the testdata tables — plus a plan-shape assertion where the
scale contract matters (broadcast centroids, no shuffle in chunking)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
    graph,
    similarity,
    text,
)
from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources import catalog


# ----------------------------------------------------- input schema contract


def test_testdata_schemas_match_pinned_manifest(spark, sf_dir):
    # The round-3 events NANOS→MICROS drift cost 25 gate queries; this
    # turns the next input-contract change into a local test failure.
    catalog.verify_table_schemas(spark, sf_dir)


def test_schema_drift_fails_loudly(spark, sf_dir, monkeypatch):
    bad = dict(catalog.EXPECTED_TABLE_SCHEMAS)
    bad["events"] = [("event_id", "bigint"), ("ts", "bigint")]
    monkeypatch.setattr(catalog, "EXPECTED_TABLE_SCHEMAS", bad)
    with pytest.raises(ValueError, match="(?s)schema drift.*events"):
        catalog.verify_table_schemas(spark, sf_dir, names=["events"])


# ------------------------------------------------------------------ pagerank


def test_pagerank_uniform_on_symmetric_cycle(spark):
    # Undirected triangle (symmetric edge list): perfectly regular, so the
    # stationary distribution is uniform 1/3 and every iteration is a
    # fixed point — rank stays exactly 1/3 per node.
    und = [(1, 2), (2, 3), (1, 3)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(edges, iterations=3).collect()
    }
    assert set(got) == {1, 2, 3}
    for v in got.values():
        assert v == pytest.approx(1 / 3, abs=1e-12)


def test_pagerank_star_center_ranks_highest(spark):
    # Star: center 0 linked to 1..4 (symmetric). The center accumulates
    # mass from every leaf; leaves are symmetric with each other.
    und = [(0, i) for i in range(1, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"]
    )
    rows = graph.pagerank(edges, iterations=3).collect()
    got = {r["node"]: r["rank"] for r in rows}
    leaf_ranks = {round(got[i], 12) for i in range(1, 5)}
    assert len(leaf_ranks) == 1  # symmetric leaves agree exactly
    assert got[0] > got[1]
    # total mass stays ~1 (no dangling nodes in a symmetric graph)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


# ------------------------------------------------------- kmeans_assign_step


def test_kmeans_assign_nearest_and_ties(spark):
    vecs = spark.createDataFrame(
        [
            Row(vec_id=10, embedding=[0.0, 0.0]),
            Row(vec_id=11, embedding=[9.0, 9.0]),
            Row(vec_id=12, embedding=[5.0, 5.0]),  # equidistant to both
        ]
    )
    cents = spark.createDataFrame(
        [
            Row(centroid_id=1, embedding=[10.0, 10.0]),
            Row(centroid_id=0, embedding=[0.0, 0.0]),
        ]
    )
    out = {
        r["vec_id"]: (r["cluster_id"], r["dist2"])
        for r in similarity.kmeans_assign_step(
            vecs, cents, "vec_id", "embedding"
        ).collect()
    }
    assert out[10][0] == 0 and out[10][1] == 0.0
    assert out[11][0] == 1 and out[11][1] == pytest.approx(2.0)
    # exact tie (50.0 both ways) -> smaller centroid id wins
    assert out[12][0] == 0 and out[12][1] == pytest.approx(50.0)


def test_kmeans_update_exact_cluster_means(spark):
    vecs = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[0.0, 0.0]),
            Row(vec_id=2, embedding=[2.0, 4.0]),
            Row(vec_id=3, embedding=[100.0, 50.0]),
        ]
    )
    cents = spark.createDataFrame(
        [
            Row(centroid_id=0, embedding=[0.0, 0.0]),
            Row(centroid_id=1, embedding=[100.0, 50.0]),
        ]
    )
    assigned = similarity.kmeans_assign_step(vecs, cents, "vec_id", "embedding")
    rows = {
        r["cluster_id"]: r
        for r in similarity.kmeans_update_step(
            assigned, vec_col="v", cluster_col="cluster_id", dim=2
        ).collect()
    }
    assert rows[0]["n"] == 2 and rows[0]["centroid"] == [1.0, 2.0]
    assert rows[1]["n"] == 1 and rows[1]["centroid"] == [100.0, 50.0]


def test_kmeans_update_drops_empty_clusters(spark):
    vecs = spark.createDataFrame([Row(vec_id=1, embedding=[0.0, 0.0])])
    cents = spark.createDataFrame(
        [
            Row(centroid_id=0, embedding=[0.0, 0.0]),
            Row(centroid_id=1, embedding=[9.0, 9.0]),  # attracts nothing
        ]
    )
    assigned = similarity.kmeans_assign_step(vecs, cents, "vec_id", "embedding")
    rows = similarity.kmeans_update_step(
        assigned, vec_col="v", cluster_col="cluster_id", dim=2
    ).collect()
    assert [r["cluster_id"] for r in rows] == [0]


def test_kmeans_assign_broadcasts_centroids(spark):
    vecs = spark.createDataFrame([Row(vec_id=1, embedding=[1.0, 2.0])])
    cents = spark.createDataFrame([Row(centroid_id=0, embedding=[0.0, 0.0])])
    plan = (
        similarity.kmeans_assign_step(vecs, cents, "vec_id", "embedding")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Broadcast" in plan  # corpus side must not shuffle for the join


# ------------------------------------------------------------ gopher_quality


def test_gopher_quality_metrics(spark):
    good = " ".join(["the", "be", "to", "of"] * 15)  # 60 words, all stopwords
    df = spark.createDataFrame(
        [Row(doc_id=1, text=good), Row(doc_id=2, text="tiny doc")]
    )
    out = {r["doc_id"]: r for r in text.gopher_quality(df, "text").collect()}
    r1 = out[1]
    assert r1["g_words"] == 60
    assert r1["g_stop_hits"] == 60
    assert r1["g_alpha_ratio"] == 1.0
    # mean word len = (3+2+2+2)*15 chars / 60 words = 2.25 -> fails the band
    assert r1["g_mean_word_len"] == pytest.approx(2.25)
    assert r1["g_pass"] is False
    r2 = out[2]
    assert r2["g_words"] == 2 and r2["g_pass"] is False


def test_gopher_quality_passing_doc(spark):
    # 60 distinct-ish words, mean length ~5, >2 stopword hits, no bullets.
    body = " ".join(
        f"alpha{i % 7}xx" for i in range(56)
    ) + " the and that have"
    df = spark.createDataFrame([Row(doc_id=1, text=body)])
    r = text.gopher_quality(df, "text").collect()[0]
    assert r["g_words"] == 60
    assert r["g_stop_hits"] == 4
    assert 3.0 <= r["g_mean_word_len"] <= 10.0
    assert r["g_pass"] is True


def test_gopher_bullet_and_ellipsis_lines(spark):
    txt = "- bullet one\n- bullet two\nplain line ends...\n* third bullet"
    r = text.gopher_quality(
        spark.createDataFrame([Row(doc_id=1, text=txt)]), "text"
    ).collect()[0]
    assert r["g_bullet_ratio"] == pytest.approx(3 / 4)
    assert r["g_ellipsis_ratio"] == pytest.approx(1 / 4)


# ---------------------------------------------------------- chunk_documents


def test_chunk_documents_windows_and_overlap(spark):
    # len 1000, chunk 600, overlap 150 -> stride 450,
    # n_chunks = ceil((1000-150)/450) = 2: [0,600), [450,1000)
    txt = "a" * 449 + "B" + "c" * 550
    df = spark.createDataFrame([Row(doc_id=7, text=txt)])
    rows = (
        text.chunk_documents(df, "text", ["doc_id"], 600, 150)
        .orderBy("chunk_id")
        .collect()
    )
    assert [r["chunk_id"] for r in rows] == [0, 1]
    assert [r["chunk_start"] for r in rows] == [0, 450]
    assert rows[0]["chunk_text"] == txt[0:600]
    assert rows[1]["chunk_text"] == txt[450:1000]
    # the 150-char overlap is shared verbatim
    assert rows[0]["chunk_text"][450:] == rows[1]["chunk_text"][:150]
    assert rows[1]["chunk_len"] == 550


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="short")])
    rows = text.chunk_documents(df, "text", ["doc_id"], 600, 150).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "short" and rows[0]["chunk_len"] == 5


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="x")])
    with pytest.raises(ValueError):
        text.chunk_documents(df, "text", ["doc_id"], 100, 100)


def test_chunk_documents_no_shuffle(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="y" * 2000)])
    plan = (
        text.chunk_documents(df, "text", ["doc_id"], 600, 150)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # chunking is per-row, shuffle-free


# ---------------------------------------------------------- weighted sample


def test_weighted_sample_is_deterministic_and_sized(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import sampling

    df = spark.createDataFrame(
        [Row(doc_id=i, w=(i % 5) + 1) for i in range(100)]
    )
    a = sampling.weighted_sample(df, "doc_id", "w", k=10).collect()
    b = sampling.weighted_sample(df, "doc_id", "w", k=10).collect()
    assert len(a) == 10
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]  # rerun-stable
    # a different salt draws a different sample
    c = sampling.weighted_sample(df, "doc_id", "w", k=10, salt="other").collect()
    assert [r["doc_id"] for r in a] != [r["doc_id"] for r in c]


def test_weighted_sample_favors_heavy_rows(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import sampling

    # 50 heavy rows (w=1000) vs 50 light rows (w=1): with an exponential
    # race the 10 winners should be overwhelmingly heavy.
    df = spark.createDataFrame(
        [Row(doc_id=i, w=1000 if i < 50 else 1) for i in range(100)]
    )
    picked = [
        r["doc_id"]
        for r in sampling.weighted_sample(df, "doc_id", "w", k=10).collect()
    ]
    assert sum(1 for d in picked if d < 50) >= 9


# ------------------------------------------------------- dedup_lines_global


def test_dedup_lines_global_keeps_winner_occurrence(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import dedup

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="unique one\nCOMMON footer\nunique two"),
            Row(doc_id=2, text="common FOOTER\nother line"),
            Row(doc_id=3, text="Common Footer"),
        ]
    )
    out = {
        r["doc_id"]: r
        for r in dedup.dedup_lines_global(df, "doc_id", "text").collect()
    }
    # winner = (doc 1, pos 1): doc 1 keeps its copy (original casing)
    assert out[1]["text_clean"] == "unique one\nCOMMON footer\nunique two"
    assert out[1]["n_lines_removed"] == 0
    # losers lose only the repeated line
    assert out[2]["text_clean"] == "other line"
    assert out[2]["n_lines_removed"] == 1
    # a doc that was nothing but the repeated line collapses to empty
    assert out[3]["text_clean"] == "" and out[3]["n_lines_kept"] == 0


def test_dedup_lines_global_exempts_blank_and_unrepeated(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import dedup

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a\n\nb"),
            Row(doc_id=2, text="c\n\nd"),  # blank line repeats but is exempt
        ]
    )
    out = {
        r["doc_id"]: r
        for r in dedup.dedup_lines_global(df, "doc_id", "text").collect()
    }
    assert out[1]["text_clean"] == "a\n\nb"
    assert out[2]["text_clean"] == "c\n\nd"
    assert out[1]["n_lines_removed"] == 0 and out[2]["n_lines_removed"] == 0


# --------------------------------------------------------------- top_ngrams


def test_top_ngrams_counts_and_df(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="big data big data pipelines"),
            Row(doc_id=2, text="Big Data!! rules"),
            Row(doc_id=3, text="one"),  # single token -> no bigrams
        ]
    )
    rows = text.top_ngrams(df, "text", "doc_id", n_top=10).collect()
    got = {r["bigram"]: (r["n_occurrences"], r["n_docs"]) for r in rows}
    # doc1: "big data","data big","big data","data pipelines"
    # doc2 (punct stripped): "big data","data rules"
    assert got["big data"] == (3, 2)
    assert got["data big"] == (1, 1)
    assert got["data pipelines"] == (1, 1)
    assert got["data rules"] == (1, 1)
    assert len(got) == 4
    # ordering: count desc, then bigram asc
    assert rows[0]["bigram"] == "big data"
    assert [r["bigram"] for r in rows[1:]] == sorted(
        b for b in got if b != "big data"
    )


def test_top_ngrams_limit_is_deterministic(spark):
    # 20 distinct bigrams, all count 1 — the limit boundary is decided
    # purely by the bigram-ascending tie-break. (Letters only: the [^a-z]
    # rule strips digits from tokens.)
    letters = "abcdefghijklmnopqrstu"
    df = spark.createDataFrame(
        [
            Row(doc_id=i, text=f"{letters[i]}x {letters[i + 1]}y")
            for i in range(20)
        ]
    )
    rows = text.top_ngrams(df, "text", "doc_id", n_top=5).collect()
    assert len(rows) == 5
    assert [r["bigram"] for r in rows] == sorted(
        f"{letters[i]}x {letters[i + 1]}y" for i in range(20)
    )[:5]


# ---------------------------------------------------- incremental quantiles


def test_histogram_merge_equals_union_histogram(spark):
    # Mergeability: hist(A) + hist(B) == hist(A ∪ B), bucket by bucket.
    from pyspark.sql import functions as F

    a = spark.range(0, 100).select((F.col("id") * 10.0).alias("v"))
    b = spark.range(100, 150).select((F.col("id") * 10.0).alias("v"))

    def hist(df):
        return (
            df.groupBy(
                F.floor(F.col("v") / F.lit(100.0)).cast("bigint").alias("bucket")
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    merged = (
        hist(a)
        .unionByName(hist(b))
        .groupBy("bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    direct = hist(a.unionByName(b))
    got = {r["bucket"]: r["cnt"] for r in merged.collect()}
    want = {r["bucket"]: r["cnt"] for r in direct.collect()}
    assert got == want


def test_quantile_from_cdf_picks_first_covering_bucket(spark):
    # 100 values 0..990 step 10, width 100 -> 10 buckets of 10 each.
    # p50: cum reaches 50 at bucket 4 (cum 50) -> upper edge 500.
    # p90: cum reaches 90 at bucket 8 -> upper edge 900.
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads.relational5 import (  # noqa: E501
        QUERIES,
    )
    from pyspark.sql import Window, functions as F

    df = spark.range(0, 100).select((F.col("id") * 10.0).alias("v"))
    h = (
        df.groupBy(
            F.floor(F.col("v") / F.lit(100.0)).cast("bigint").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cdf = h.withColumn("cum", F.sum("cnt").over(w))
    total = 100
    rows = {
        q: cdf.where(F.col("cum") >= q * total).agg(F.min("bucket")).collect()[0][0]
        for q in (0.5, 0.9)
    }
    assert rows[0.5] == 4 and rows[0.9] == 8


# ------------------------------------------------------------ key skew report


def test_key_skew_report_identifies_hot_key(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import joins

    # key 7 carries 60 of 100 rows; 5 keys total -> mean 20 rows/key.
    rows = [Row(k=7)] * 60 + [Row(k=i) for i in range(4) for _ in range(10)]
    df = spark.createDataFrame(rows)
    out = joins.key_skew_report(df, "k", top_n=3).collect()
    assert len(out) == 3
    hot = out[0]
    assert hot["key"] == "7" and hot["cnt"] == 60
    assert hot["frac_r"] == pytest.approx(0.6)
    assert hot["x_mean_r"] == pytest.approx(3.0)  # 60 / (100/5 keys)
    # remaining top keys tie at 10 and break by key ascending
    assert [r["key"] for r in out[1:]] == ["0", "1"]


# -------------------------------------------------------------------- SCD2


def test_scd2_change_close_noop_and_insert(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import scd

    current = spark.createDataFrame(
        [
            # key 1: open row that will change
            Row(k=1, seg="A", valid_from="d1", valid_to=None),
            # key 1 also has closed history that must pass through
            Row(k=1, seg="Z", valid_from="d0", valid_to="d1"),
            # key 2: open row, update carries the identical value (no-op)
            Row(k=2, seg="B", valid_from="d1", valid_to=None),
            # key 3: open row, no update at all
            Row(k=3, seg="C", valid_from="d1", valid_to=None),
        ]
    )
    updates = spark.createDataFrame(
        [
            Row(k=1, seg="A2", eff="d2"),
            Row(k=2, seg="B", eff="d2"),
            Row(k=9, seg="NEW", eff="d2"),  # brand-new member
        ]
    )
    out = scd.scd2_apply(current, updates, ["k"], ["seg"], "eff")
    rows = {(r["k"], r["seg"], r["valid_from"]): r["valid_to"] for r in out.collect()}
    assert rows == {
        (1, "Z", "d0"): "d1",   # closed history untouched
        (1, "A", "d1"): "d2",   # changed row closed at eff
        (1, "A2", "d2"): None,  # new open row
        (2, "B", "d1"): None,   # identical update -> no-op
        (3, "C", "d1"): None,   # untouched
        (9, "NEW", "d2"): None, # brand-new member
    }
    # exactly one open row per live key
    open_per_key = {}
    for (k, _, _), vt in rows.items():
        if vt is None:
            open_per_key[k] = open_per_key.get(k, 0) + 1
    assert open_per_key == {1: 1, 2: 1, 3: 1, 9: 1}


# ------------------------------------------------------------- asof nearest


def test_asof_nearest_picks_closest_side_and_ties_earlier(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import joins

    left = spark.createDataFrame(
        [
            Row(lid=1, k=1, ts="2024-01-10 00:00:00"),
            Row(lid=2, k=1, ts="2024-01-20 00:00:00"),
            Row(lid=3, k=2, ts="2024-01-10 00:00:00"),  # no right rows in window
        ]
    ).select("lid", "k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [
            Row(k=1, rid=100, rts="2024-01-08 00:00:00"),  # 2d before lid 1
            Row(k=1, rid=101, rts="2024-01-11 00:00:00"),  # 1d after lid 1
            Row(k=1, rid=102, rts="2024-01-19 00:00:00"),  # 1d before lid 2
            Row(k=1, rid=103, rts="2024-01-21 00:00:00"),  # 1d after lid 2: TIE
        ]
    ).select("k", "rid", F.col("rts").cast("timestamp").alias("rts"))
    out = {
        r["lid"]: r["rid"]
        for r in joins.asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts",
            left_id="lid", direction="nearest",
            tolerance=F.expr("INTERVAL 7 DAYS"),
        ).collect()
    }
    assert out[1] == 101  # 1 day after beats 2 days before
    assert out[2] == 102  # exact tie -> earlier right row wins
    assert out[3] is None  # nothing within tolerance -> NULL kept


def test_asof_nearest_requires_tolerance(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import joins

    df = spark.createDataFrame([Row(k=1, ts="2024-01-01")]).select(
        "k", F.col("ts").cast("timestamp").alias("ts")
    )
    with pytest.raises(ValueError, match="nearest"):
        joins.asof_join(df, df, key="k", left_ts="ts", right_ts="ts",
                        direction="nearest")


def test_asof_backward_tolerance_bounds_window(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import joins

    left = spark.createDataFrame([Row(lid=1, k=1, ts="2024-01-10 00:00:00")]).select(
        "lid", "k", F.col("ts").cast("timestamp").alias("ts")
    )
    right = spark.createDataFrame(
        [Row(k=1, rid=100, rts="2024-01-01 00:00:00")]  # 9 days before
    ).select("k", "rid", F.col("rts").cast("timestamp").alias("rts"))
    # unbounded backward matches; a 7-day tolerance excludes it
    unbounded = joins.asof_join(left, right, "k", "ts", "rts", left_id="lid")
    bounded = joins.asof_join(
        left, right, "k", "ts", "rts", left_id="lid",
        tolerance=F.expr("INTERVAL 7 DAYS"),
    )
    assert unbounded.collect()[0]["rid"] == 100
    assert bounded.collect()[0]["rid"] is None


# ---------------------------------------------------------- mixture sampling


def test_mixture_sample_saturation_and_zero_weight(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import sampling

    # Three sources, 10 docs x 10 tokens each (300 tokens total).
    df = spark.createDataFrame(
        [
            Row(doc_id=s * 100 + i, source=f"s{s}", tok=10)
            for s in range(3)
            for i in range(10)
        ]
    )
    # budget = 0.9 * 300 = 270 tokens; s0 wants 270 > 100 -> saturates
    # (keeps all 10 docs, frac 1.0); s1/s2 unmapped -> weight 0 -> dropped.
    kept = sampling.mixture_sample(
        df, "doc_id", "source", F.col("tok"), {"s0": 1.0}, budget_frac=0.9
    )
    rows = kept.collect()
    assert {r["source"] for r in rows} == {"s0"}
    assert len(rows) == 10
    assert all(r["keep_frac_r"] == 1.0 for r in rows)


def test_mixture_sample_fraction_and_determinism(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import sampling

    df = spark.createDataFrame(
        [Row(doc_id=i, source="s0", tok=10) for i in range(200)]
    )
    # budget 30% on the single source -> keep_frac 0.3
    kept = sampling.mixture_sample(
        df, "doc_id", "source", F.col("tok"), {"s0": 1.0}, budget_frac=0.3
    )
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in kept.collect())
    assert a == b  # rerun-stable
    # Bernoulli(0.3) over 200 docs: expect ~60, allow generous slack
    assert 30 <= len(a) <= 90
    assert kept.collect()[0]["keep_frac_r"] == pytest.approx(0.3)


# ---------------------------------------------------------------------- BM25


def test_bm25_ranks_matching_docs(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import text

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark spark spark is fast"),
            Row(doc_id=2, text="spark data"),
            Row(doc_id=3, text="nothing relevant here at all"),
            Row(doc_id=4, text="data data data data data data data data"),
        ]
    )
    rows = text.bm25_topk(df, "doc_id", "text", ["spark", "data"], k=10).collect()
    got = {r["doc_id"]: r for r in rows}
    # doc 3 has no query terms -> absent
    assert 3 not in got
    # doc 2 hits both terms; docs 1 and 4 hit one each
    assert got[2]["n_terms_hit"] == 2
    assert got[1]["n_terms_hit"] == 1 and got[4]["n_terms_hit"] == 1
    # two-term doc should outrank the single-term repeats (tf saturates)
    assert rows[0]["doc_id"] == 2
    assert all(r["bm25_r"] > 0 for r in rows)


# ------------------------------------------------- legacy nanos loader path


def test_events_loader_handles_legacy_nanos_encoding(spark, tmp_path):
    """The dtype-branch's back-compat arm: a TIMESTAMP(NANOS) parquet (the
    pre-round-4 testdata vintage) must load to the same UTC instants the
    native MICROS path produces. Guards the only loader branch the
    current testdata no longer exercises."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = str(tmp_path)
    ts_ns = pa.array(
        [1704067200_000_000_000, 1706655432_123_456_789],  # 2024-01-01 / -30
        type=pa.timestamp("ns"),
    )
    table = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": ts_ns,
            "user_id": pa.array([10, 20], type=pa.int64()),
            "event_type": pa.array(["view", "purchase"]),
            "value": pa.array([1.5, 2.5], type=pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(
        table, f"{sf_dir}/events.parquet", coerce_timestamps=None
    )
    assert catalog.probe_events_ts_type(f"{sf_dir}/events.parquet") == (
        "timestamp[ns]"
    )
    df = catalog.load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {
        r["event_id"]: str(r["ts"]) for r in df.orderBy("event_id").collect()
    }
    # nanos truncate to micros: ...789 ns -> ...456 us
    assert got[1] == "2024-01-01 00:00:00"
    assert got[2] == "2024-01-30 22:57:12.123456"


def test_events_loader_rejects_out_of_range_timestamps(spark, tmp_path):
    """The footer-stats sanity bound: an encoding drift that lands events
    outside 2000-2100 must fail at probe time, not corrupt downstream."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = str(tmp_path)
    table = pa.table(
        {
            "event_id": pa.array([1], type=pa.int64()),
            # 1970-01-20-style corruption (the round-3 silent failure)
            "ts": pa.array([1_700_000_000], type=pa.timestamp("us")),
            "user_id": pa.array([1], type=pa.int64()),
            "event_type": pa.array(["view"]),
            "value": pa.array([1.0], type=pa.float64()),
            "props": pa.array(["{}"]),
        }
    )
    pq.write_table(table, f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError, match="sanity check failed"):
        catalog.probe_events_ts_type(f"{sf_dir}/events.parquet")
