"""Round-11 tests: the LSH-fed keep-best twin, the bucket-cap advisor
(the r10 cap-sizing rule made executable — VERDICT r10 items 1 and 3),
and stage-boundary materialization for the composed curation pipeline
(item 2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import dedup
from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads.pipeline2 import (
    advised_bucket_cap,
    e2e_stage_frames,
    q_dedup_keep_best_lsh,
    q_pipeline_cap_advisor,
)


# ------------------------------------------------------------ cap advisor


def _entries(spark, sizes: dict[int, int]):
    """Synthetic (band, key) entries: ``sizes[s] = n`` makes n buckets
    of occupancy s."""
    rows = []
    b = 0
    for s, n in sorted(sizes.items()):
        for _ in range(n):
            rows.extend((0, f"k{b}", i) for i in range(s))
            b += 1
    return spark.createDataFrame(rows, "band int, key string, member int")


def test_advisor_census_arithmetic(spark):
    """Census rows carry exact bucket/entry/pair counts with a correct
    cumulative sum."""
    out = dedup.bucket_cap_advisor(
        _entries(spark, {1: 5, 3: 2, 10: 1}), ["band", "key"]
    ).collect()
    by_sz = {r["bucket_sz"]: r for r in out}
    assert by_sz[1]["n_buckets"] == 5
    assert by_sz[1]["n_entries"] == 5
    assert by_sz[1]["n_pairs"] == 0
    assert by_sz[3]["n_buckets"] == 2
    assert by_sz[3]["n_entries"] == 6
    assert by_sz[3]["n_pairs"] == 6  # 2 buckets x C(3,2)
    assert by_sz[10]["n_pairs"] == 45
    assert by_sz[10]["cum_entries"] == 21


def test_advisor_finds_replica_cluster_size(spark):
    """The r10 sf1 shape in miniature: entry mass concentrated at the
    replica cluster size (10) with a singleton floor and a sparse hot
    tail — the advisor must recommend 10, the cap that cap=4 famously
    undercut."""
    out = dedup.bucket_cap_advisor(
        _entries(spark, {1: 50, 2: 5, 10: 20, 100: 1}), ["band", "key"]
    ).collect()
    assert out[0]["advised_cap"] == 10
    # every row carries the same scalar
    assert len({r["advised_cap"] for r in out}) == 1


def test_advisor_majority_guard_on_flat_census(spark):
    """With no dominant multi-entry mode (all mass in singletons), the
    majority rule keeps the recommendation at the distribution body
    instead of a degenerate 1-vs-tail split."""
    out = dedup.bucket_cap_advisor(
        _entries(spark, {1: 100}), ["band", "key"]
    ).collect()
    assert out[0]["advised_cap"] == 1


def test_advisor_gate_consistent_with_operator(spark, sf_dir):
    """The gate's advised cap equals advised_bucket_cap on the same
    exact-dedup survivor corpus (the value the e2e 'advised' mode
    consumes)."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import (
        load_table,
    )

    gate_cap = (
        q_pipeline_cap_advisor(spark, sf_dir).select("advised_cap").first()[0]
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    keepers = dedup.exact_dedup(docs, "doc_id", ["text"]).select(
        F.col("keeper_id").alias("doc_id")
    )
    s1 = docs.join(keepers, "doc_id", "left_semi")
    assert advised_bucket_cap(s1) == gate_cap


def test_e2e_check_cap_raises_below_advised(spark, sf_dir):
    """check_cap turns the r10 eyeball-discovery into a hard failure:
    a cap below the census recommendation must raise, a cap at/above it
    must build."""
    with pytest.raises(ValueError, match="below the census-advised"):
        e2e_stage_frames(
            spark, sf_dir, upto="s2", max_bucket_size=1, check_cap=True
        )
    frames = e2e_stage_frames(
        spark, sf_dir, upto="s2", max_bucket_size=64, check_cap=True
    )
    assert frames["s2"].count() > 0


def test_e2e_advised_mode_matches_explicit_cap(spark, sf_dir):
    """max_bucket_size='advised' must produce the identical survivor set
    as passing the advisor's integer recommendation explicitly."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    keepers = dedup.exact_dedup(docs, "doc_id", ["text"]).select(
        F.col("keeper_id").alias("doc_id")
    )
    s1 = docs.join(keepers, "doc_id", "left_semi")
    cap = advised_bucket_cap(s1)
    a = e2e_stage_frames(spark, sf_dir, upto="s2", max_bucket_size="advised")
    b = e2e_stage_frames(spark, sf_dir, upto="s2", max_bucket_size=cap)
    assert (
        a["s2"].select("doc_id").exceptAll(b["s2"].select("doc_id")).count()
        == 0
    )
    assert a["s2"].count() == b["s2"].count()


# ------------------------------------------- stage-boundary materialization


def test_e2e_materialized_output_identical(spark, sf_dir, tmp_path):
    """The materialize-at-edge knob must not change a single output row:
    the composed span frame with parquet stage boundaries equals the
    lazy single-plan frame bit-for-bit."""
    lazy = e2e_stage_frames(spark, sf_dir)["s5"].orderBy("doc_id")
    mat = e2e_stage_frames(
        spark, sf_dir, materialize_dir=str(tmp_path / "e2e_mat")
    )["s5"].orderBy("doc_id")
    assert lazy.schema == mat.schema
    assert lazy.exceptAll(mat).count() == 0
    assert mat.exceptAll(lazy).count() == 0


def test_e2e_materialized_stages_written(spark, sf_dir, tmp_path):
    """Materialization writes each intermediate stage (s1..s4) once and
    downstream frames read from the materialized parquet, not the
    corpus."""
    root = tmp_path / "e2e_mat2"
    frames = e2e_stage_frames(spark, sf_dir, materialize_dir=str(root))
    for st in ("s1", "s2", "s3", "s4"):
        assert (root / f"{st}.parquet").exists()
    # the final frame's scan set is the materialized parquet, not the
    # documents table (the 15x corpus re-read the knob exists to cut)
    files = frames["s5"].inputFiles()
    assert files
    assert all(str(root) in f for f in files)
    assert not any("documents.parquet" in f for f in files)


# ------------------------------------------------------ LSH-fed keep-best


def test_keep_best_lsh_matches_policy(spark, sf_dir):
    """Every cluster elects exactly one keeper, the keeper's id belongs
    to the cluster, and n_members >= 2 (singletons are not clusters)."""
    rows = q_dedup_keep_best_lsh(spark, sf_dir).collect()
    assert rows, "LSH tier found no clusters at the test SF"
    labels = [r["label"] for r in rows]
    assert len(set(labels)) == len(labels)
    for r in rows:
        assert r["n_members"] >= 2
        assert r["best_q_r"] is not None


def test_keep_best_lsh_keeper_is_best_scored(spark, sf_dir):
    """Spot-check the policy: re-derive one cluster's membership and
    confirm the elected keeper carries the maximum quality score (ties
    -> smallest id)."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
        text,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(
        docs,
        "doc_id",
        "text",
        num_hashes=16,
        bands=4,
        shingle_k=3,
        threshold=0.5,
        max_bucket_size=64,
    )
    clusters = dedup.duplicate_clusters(pairs).cache()
    scored = text.quality_features(
        docs.select("doc_id", "text"), "text"
    ).select("doc_id", "q_score")
    out = q_dedup_keep_best_lsh(spark, sf_dir).limit(3).collect()
    for r in out:
        members = [
            m["node"]
            for m in clusters.where(F.col("label") == r["label"]).collect()
        ]
        assert r["keeper_id"] in members
        ms = (
            scored.where(F.col("doc_id").isin(members))
            .orderBy(F.col("q_score").desc(), F.col("doc_id").asc())
            .first()
        )
        assert ms["doc_id"] == r["keeper_id"]
