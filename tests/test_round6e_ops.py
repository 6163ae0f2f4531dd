"""Round-6 session-5 operators: isotonic regression (PAV), plus the
PPJoin filter upgrades' companions live in test_round6b_ops.

Each gate query gets an independent re-derivation (pandas/numpy brute
force at sf0.001) so a Spark-side logic bug cannot hide behind an
oracle authored from the same reading of the algorithm.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import stats
from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import mleval


def _pdf(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet").toPandas()


def _pav(rates, weights):
    """Classic pool-adjacent-violators on (rate, weight) blocks."""
    blocks = [[r, w] for r, w in zip(rates, weights)]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] > blocks[i + 1][0] + 1e-15:
            r1, w1 = blocks[i]
            r2, w2 = blocks[i + 1]
            blocks[i] = [(r1 * w1 + r2 * w2) / (w1 + w2), w1 + w2]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    out = []
    k = 0
    for r, w in blocks:
        # distribute the pooled rate back over its member buckets
        used = 0
        while used < w - 1e-9:
            out.append(r)
            used += weights[len(out) - 1]
            k += 1
    return out


# ------------------------------------------------------------- isotonic


def test_isotonic_matches_classic_pav(spark):
    # A deliberately non-monotone rate sequence: PAV must pool the
    # violators; compare against the textbook stack algorithm.
    rows = []
    rates = [(0, 10, 1), (1, 10, 5), (2, 10, 3), (3, 10, 4), (4, 10, 9)]
    for score, n, pos in rates:
        rows += [(score, 1)] * pos + [(score, 0)] * (n - pos)
    df = spark.createDataFrame(rows, "score long, y int")
    got = stats.isotonic_fit(df, "score", "y", n_buckets=5).orderBy("bucket")
    fit = [r["iso_rate_r"] for r in got.collect()]
    want = _pav([p / n for _, n, p in rates], [n for _, n, _ in rates])
    assert fit == pytest.approx([round(v, 6) for v in want], abs=1e-6)
    # isotonic by construction
    assert all(a <= b + 1e-12 for a, b in zip(fit, fit[1:]))


def test_isotonic_gate_monotone_and_weighted_mean_preserving(spark, sf_dir):
    out = mleval.q_events_isotonic_fit(spark, sf_dir).toPandas()
    fit = out["iso_rate_r"].to_numpy()
    assert (np.diff(fit) >= -1e-12).all()
    # PAV preserves the weighted mean: sum(fit*n) == sum(pos)
    assert float((fit * out["n_rows"]).sum()) == pytest.approx(
        float(out["n_pos"].sum()), rel=1e-9
    )
    # and matches the classic algorithm on the observed bucket rates
    want = _pav(
        (out["n_pos"] / out["n_rows"]).tolist(), out["n_rows"].tolist()
    )
    assert fit.tolist() == pytest.approx([round(v, 6) for v in want], abs=1e-6)


def test_isotonic_already_monotone_is_identity(spark):
    rows = []
    for score, n, pos in [(0, 10, 1), (1, 10, 4), (2, 10, 8)]:
        rows += [(score, 1)] * pos + [(score, 0)] * (n - pos)
    df = spark.createDataFrame(rows, "score long, y int")
    out = stats.isotonic_fit(df, "score", "y", n_buckets=3).orderBy("bucket")
    assert [r["iso_rate_r"] for r in out.collect()] == [0.1, 0.4, 0.8]


# ---------------------------------------------------- skew / kurtosis


def test_skew_kurtosis_matches_numpy(spark, sf_dir):
    out = {
        r["l_returnflag"]: r
        for r in mleval.q_agg_skew_kurtosis(spark, sf_dir).collect()
    }
    li = _pdf(spark, sf_dir, "lineitem")
    for flag, grp in li.groupby("l_returnflag"):
        q = grp["l_quantity"].to_numpy(dtype="float64")
        m1 = q.mean()
        c = q - m1
        m2 = (c**2).mean()
        g1 = (c**3).mean() / m2**1.5
        g2 = (c**4).mean() / m2**2 - 3.0
        r = out[flag]
        assert r["n"] == len(q)
        assert r["mean_r"] == pytest.approx(m1, abs=1e-5)
        assert r["m2_r"] == pytest.approx(m2, abs=1e-5)
        assert r["skew_r"] == pytest.approx(g1, abs=1e-5)
        assert r["kurtosis_r"] == pytest.approx(g2, abs=1e-5)
    # quantity is ~uniform(1..50): skew ~0, excess kurtosis ~ -1.2
    assert abs(out["N"]["skew_r"]) < 0.1 and out["N"]["kurtosis_r"] < -1.0


# ---------------------------------------------------- k-center greedy


def test_kcenter_matches_numpy_greedy(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = [
        (r["sel_order"], r["vec_id"], r["d2_sel"])
        for r in similarity.kcenter_greedy(
            emb, "vec_id", "embedding", k=5
        ).collect()
    ]
    pdf = emb.toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    Q = np.round(
        np.stack(pdf["embedding"].to_numpy()).astype("float64") * 1e6
    ).astype("int64")
    sel = [0]  # position index of min id (sorted)
    want = [(0, int(ids[0]), 0)]
    mind = ((Q - Q[0]) ** 2).sum(axis=1)
    for r in range(1, 5):
        i = int(np.lexsort((ids, -mind))[0])  # max d2, tie -> min id
        want.append((r, int(ids[i]), int(mind[i])))
        mind = np.minimum(mind, ((Q - Q[i]) ** 2).sum(axis=1))
    assert got == want
    # coverage radius shrinks monotonically after the seed
    radii = [d for _, _, d in got[1:]]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_k1_and_validation(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = similarity.kcenter_greedy(emb, "vec_id", "embedding", k=1).collect()
    assert len(out) == 1 and out[0]["sel_order"] == 0
    with pytest.raises(ValueError):
        similarity.kcenter_greedy(emb, "vec_id", "embedding", k=0)
