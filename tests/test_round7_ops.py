"""Round-7 tests: the PQ compression/recall dial (VERDICT r6 item 4) and
the LSH-vs-PPJoin recall crossover (item 6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
    analytics,
    pipeline,
)


def test_round7_gates_never_cartesian(spark, sf_dir):
    # Both new report queries compose candidate-generation joins (LSH
    # bands, PPJoin prefixes, PQ codebook probes) that must stay
    # equi-joins; the only acceptable nested-loop sources are the
    # broadcast 1-row stat relations (norms, trace, totals) and the
    # bounded-codebook/distance-table broadcasts. A CartesianProduct
    # means a candidate join silently degenerated (the r6 ppjoin
    # shared-lineage trap class).
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import (
        plans,
    )

    for q in (
        analytics.q_sim_pq_recall,
        pipeline.q_dedup_lsh_recall,
        pipeline.q_sim_tfidf_sparse,
    ):
        plan = plans.formatted_plan(q(spark, sf_dir))
        assert "CartesianProduct" not in plan, q.__name__


def test_sparse_cosine_invariants(spark, sf_dir):
    # Cosine of non-negative integer weight vectors lives in (0, 1]; the
    # join-side df cap makes the dot a lower bound, so never above 1.
    # Each doc gets at most k=5 neighbours, ranked densely from 1.
    rows = pipeline.q_sim_tfidf_sparse(spark, sf_dir).collect()
    assert rows, "sparse cosine returned nothing (cap too tight?)"
    per = {}
    for r in rows:
        assert 0.0 < r["cosine_r"] <= 1.0
        assert r["id_a"] != r["id_b"]
        per.setdefault(r["id_a"], []).append(r["rnk"])
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_quantile_match_rides_chunked_scan(spark, sf_dir):
    # The pooled-global rank is exactly the unbounded-window shape
    # plans.unsafe_global_windows rejects — it must ride the two-phase
    # chunked scan, and the whole plan must stay window-safe.
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import (
        plans,
    )

    df = analytics.q_pipeline_quantile_match(spark, sf_dir)
    assert plans.unsafe_global_windows(df) == []


def test_quantile_match_semantics(spark, sf_dir):
    # matched values must come from the pooled score set, be monotone in
    # within-source rank, and each source's extremes must map to the
    # pooled extremes (idx formula hits 1 and N at the rank endpoints).
    rows = analytics.q_pipeline_quantile_match(spark, sf_dir).collect()
    assert rows
    pooled = sorted(r["q_r"] for r in rows)
    pooled_set = set(pooled)
    by_src = {}
    for r in rows:
        assert r["matched_r"] in pooled_set
        by_src.setdefault(r["source"], []).append((r["q_r"], r["doc_id"], r["matched_r"]))
    for src, vals in by_src.items():
        vals.sort()
        matched = [m for _, _, m in vals]
        assert matched == sorted(matched), f"non-monotone mapping in {src}"
        if len(vals) > 1:
            assert matched[0] == pooled[0], f"{src} min not pooled min"
            assert matched[-1] == pooled[-1], f"{src} max not pooled max"


def test_sparse_cosine_df_cap_validation():
    import pytest as _pytest

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
        text as text_ops,
    )

    with _pytest.raises(ValueError):
        text_ops.tfidf_cosine_pairs(
            None, "id", "t", max_join_df=10, max_join_df_den=5
        )


def test_lsh_recall_crossover_consistent(spark, sf_dir):
    # The crossover report's internal accounting must be coherent: the
    # exact-pair count is band-independent, true positives can't exceed
    # either side, and ratios live in [0, 1].
    rows = pipeline.q_dedup_lsh_recall(spark, sf_dir).collect()
    assert [r["bands"] for r in rows] == [4, 8]
    assert len({r["exact_pairs"] for r in rows}) == 1
    for r in rows:
        assert r["true_pos"] <= r["exact_pairs"]
        assert r["true_pos"] <= r["lsh_pairs"]
        if r["exact_pairs"]:
            assert 0.0 <= r["recall_r"] <= 1.0
        if r["lsh_pairs"]:
            assert 0.0 <= r["precision_r"] <= 1.0


def test_pq_recall_dial_monotone(spark, sf_dir):
    # More codebook capacity (m=32 x 64 codewords) must beat the 4x-smaller
    # m=8 x 16 setting on mean recall@10 — the dial's reason to exist.
    out = analytics.q_sim_pq_recall(spark, sf_dir).collect()
    assert out, "recall report is empty"
    by = {}
    for r in out:
        by.setdefault((r["pq_m"], r["pq_codes"]), []).append(r)
    # r8 added the third (64, 256) setting; this r7 test keeps checking
    # the original dial pair plus containment of the full grid
    assert {(8, 16), (32, 64)} <= set(by)
    assert set(by) == {(8, 16), (32, 64), (64, 256)}
    means = {
        k: sum(r["recall_r"] for r in rows) / len(rows)
        for k, rows in by.items()
    }
    assert means[(32, 64)] > means[(8, 16)]
    for rows in by.values():
        for r in rows:
            assert 0.0 <= r["recall_r"] <= 1.0
            assert r["hits"] <= r["k"] == 10
