"""Round-7 tests: the PQ compression/recall dial (VERDICT r6 item 4) and
the LSH-vs-PPJoin recall crossover (item 6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
    analytics,
)


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
