"""Round-7 tests: the PQ compression/recall dial (VERDICT r6 item 4) and
the LSH-vs-PPJoin recall crossover (item 6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
    analytics,
    pipeline,
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
    assert set(by) == {(8, 16), (32, 64)}
    means = {
        k: sum(r["recall_r"] for r in rows) / len(rows)
        for k, rows in by.items()
    }
    assert means[(32, 64)] > means[(8, 16)]
    for rows in by.values():
        for r in rows:
            assert 0.0 <= r["recall_r"] <= 1.0
            assert r["hits"] <= r["k"] == 10
