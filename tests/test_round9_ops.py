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


def test_trained_ivf_directory_beats_sign_cells(spark, sf_dir):
    """VERDICT r8 item 4: the k-means-trained coarse directory must
    recover most of the gap between the untrained sign-cell IVF+PQ
    (0.47 @ 16 cells multi-probe) and the pure-PQ ceiling (0.69) —
    the bar is >= 0.6 mean recall@10 at 16 cells / 4 probes."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
        similarity,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
        analytics,
    )

    rows = analytics.q_sim_ivfpq_recall(spark, sf_dir).collect()
    def mean_recall(directory, probe):
        rs = [
            r["recall_r"]
            for r in rows
            if r["directory"] == directory
            and r["cells"] == 16
            and r["probe"] == probe
        ]
        assert len(rs) == 10
        return sum(rs) / len(rs)

    trained = mean_recall("kmeans", 4)
    sign_mp = mean_recall("sign", 1)
    assert trained >= 0.6, f"trained 16c/4p recall {trained}"
    assert trained > sign_mp, (trained, sign_mp)


def test_nearest_cells_probe_count(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
        similarity,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import (
        load_table,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    cells = similarity.train_ivf_directory(
        emb, "vec_id", "embedding", n_cells=8, iterations=1
    )
    probes = similarity.nearest_cells(
        emb.where(F.col("vec_id") < 5), cells, "vec_id", "embedding", nprobe=3
    )
    counts = {r["query_id"]: r["n"] for r in
              probes.groupBy("query_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {0, 1, 2, 3, 4}
    assert all(v == 3 for v in counts.values())


def test_zipf_coverage_meter_has_a_knee(spark):
    """VERDICT r8 item 5: on the derived Zipfian corpus the bucket cap
    must show a real trade-off curve — a cap with recall >= 0.9 at a
    small fraction of the exact (fractional-filter-only) pair work
    (measured sf0.1: cap 10 -> 0.961 recall at 1.4% work; sf0.01:
    0.988 at 15.4%) and a cap low enough to collapse recall (cap 2)
    so the dial demonstrably dials. Pinned to sf0.01, not the sf0.001
    test default: with 50 docs the fractional filter admits only
    df <= 10, so every cap above 10 is vacuous and there is no curve
    to assert. The 40-word-fixture meter (sim_tfidf_recall) keeps its
    degenerate curve as the corpus-shape contrast."""
    import os

    from conftest import SF_DIR
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
        pipeline,
    )

    # sibling of the configured test dir, not a hardcoded root — follows
    # SPARK_GRAFT_TEST_SF_DIR relocations
    sf_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    rows = {
        r["bucket_cap"]: r
        for r in pipeline.q_sim_tfidf_recall_zipf(spark, sf_dir).collect()
    }
    assert set(rows) == {2, 10, 30, 150}
    caps = [2, 10, 30, 150]
    recalls = [rows[c]["recall_r"] for c in caps]
    works = [rows[c]["work_frac_r"] for c in caps]
    assert recalls == sorted(recalls), recalls
    assert works == sorted(works) and len(set(works)) == 4, works
    assert rows[10]["recall_r"] >= 0.9 and rows[10]["work_frac_r"] <= 0.2
    assert rows[2]["recall_r"] < 0.6, rows[2]["recall_r"]
    assert all(r["truth_work"] > 0 for r in rows.values())


def test_small_scan_slices_uri_and_plain_paths(spark, tmp_path):
    """r9 review fix: only file: URIs are percent-decoded; plain paths
    (including a literal %) are used verbatim; remote schemes deactivate
    the policy. Spark returns inputFiles() as percent-encoded file: URIs
    for paths with spaces — both branches must size the scan instead of
    silently deactivating."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.session import (
        small_scan_slices,
    )

    spaced = tmp_path / "with space"
    spaced.mkdir()
    p1 = str(spaced / "t.parquet")
    spark.range(1000).write.mode("overwrite").parquet(p1)
    df1 = spark.read.parquet(p1)
    assert df1.inputFiles() and df1.inputFiles()[0].startswith("file:")
    assert "%20" in df1.inputFiles()[0]  # encoded space reaches the policy
    n1 = small_scan_slices(df1)
    assert n1 == 1  # tiny scan -> derived single fat slice

    pct = tmp_path / "pct%dir"
    pct.mkdir()
    p2 = str(pct / "t.parquet")
    spark.range(1000).write.mode("overwrite").parquet(p2)
    n2 = small_scan_slices(spark.read.parquet(p2))
    assert n2 == 1  # literal % not mangled by decoding


def test_xml_round_trip(spark, sf_dir, tmp_path):
    """Spark 4 native XML source (SPARK-44265): write-then-read with an
    explicit schema must be value-identical, including entity escaping
    of XML-special characters in string content."""
    from pyspark.sql import types as T

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources import (
        formats,
    )

    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("txt", T.StringType(), True),
            T.StructField("val", T.DoubleType(), True),
        ]
    )
    rows = [
        (1, "plain", 1.5),
        (2, "a < b & c > d", -2.25),
        (3, 'quote " and \' apostrophe', 0.0),
        (4, None, None),
    ]
    df = spark.createDataFrame(rows, st)
    path = str(tmp_path / "xmlrt")
    formats.write_xml(df, path)
    back = formats.read_xml(spark, path, schema=st)
    got = sorted(
        [(r["id"], r["txt"], r["val"]) for r in back.collect()]
    )
    assert got == sorted(rows)


def test_state_inspect_complements_append_output(spark, sf_dir):
    """The statestore reader's live windows and the append-mode sink's
    closed windows partition the full window set: same watermark
    cutoff, opposite sides, no overlap, union = the batch tumbling
    aggregation."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
        streaming_ops,
    )

    live = {
        (r["window_start"], r["event_type"])
        for r in streaming_ops.q_stream_state_inspect(
            spark, sf_dir
        ).collect()
    }
    closed = {
        (r["window_start"], r["event_type"])
        for r in streaming_ops.QUERIES["stream_tumbling_append"](
            spark, sf_dir
        ).collect()
    }
    assert live, "state should hold at least one live window"
    assert not (live & closed), "a window cannot be both live and closed"
    batch = {
        (r["window_start"], r["event_type"])
        for r in streaming_ops.QUERIES["stream_tumbling_window"](
            spark, sf_dir
        ).collect()
    }
    assert live | closed == batch
