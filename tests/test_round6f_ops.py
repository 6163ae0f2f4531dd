"""Round-6 session-7 operators: Poisson bootstrap, McNemar, PR curve.

Each gate query gets an independent re-derivation (pandas/numpy brute
force at sf0.001) so a Spark-side logic bug cannot hide behind an
oracle authored from the same reading of the algorithm.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import mleval2


def _pdf(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet").toPandas()


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# -------------------------------------------------- Poisson bootstrap


def _pois1_weight(u: int) -> int:
    for k, t in enumerate(mleval2._POIS1_CDF_PPM):
        if u < t:
            return k
    return len(mleval2._POIS1_CDF_PPM)


def test_poisson_bootstrap_matches_numpy_rederivation(spark, sf_dir):
    row = mleval2.q_orders_poisson_bootstrap(spark, sf_dir).collect()[0]
    orders = _pdf(spark, sf_dir, "orders")
    cents = np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    keys = orders["o_orderkey"].astype(str).to_numpy()
    means = []
    for r in range(32):
        w = np.array(
            [_pois1_weight(_hash60(f"{k}:{r}") % 1_000_000) for k in keys],
            dtype=np.int64,
        )
        means.append(round(float(w @ cents) / int(w.sum()) / 100.0, 6))
    means = np.array(sorted(means))
    assert row["n_orders"] == len(orders)
    assert row["boot_lo"] == means[1]
    assert row["boot_hi"] == means[30]
    # full-sample mean sits inside the 2.5-97.5% band
    assert row["boot_lo"] <= row["mean_full_r"] <= row["boot_hi"]
    se = np.std(means, ddof=1)
    assert abs(row["boot_se_r"] - se) < 1e-4


def test_poisson_weights_average_near_one(spark, sf_dir):
    # the hash-derived Poisson(1) weights must resample ~n rows per
    # replicate: E[w] = 1 - P(trunc tail) correction ~ 0.99959
    us = np.arange(0, 1_000_000, 997)
    ws = np.array([_pois1_weight(int(u)) for u in us])
    assert 0.97 < ws.mean() < 1.03


# ------------------------------------------------------------ McNemar


def test_mcnemar_cells_from_pandas(spark, sf_dir):
    row = mleval2.q_customers_mcnemar(spark, sf_dir).collect()[0]
    orders = _pdf(spark, sf_dir, "orders")
    y = pd.to_datetime(orders["o_orderdate"]).dt.year
    g = (
        pd.DataFrame(
            {
                "c": orders["o_custkey"],
                "y96": (y == 1996).astype(int),
                "y97": (y == 1997).astype(int),
            }
        )
        .groupby("c")
        .max()
    )
    b = int(((g["y96"] == 1) & (g["y97"] == 0)).sum())
    c = int(((g["y96"] == 0) & (g["y97"] == 1)).sum())
    assert row["n_customers"] == len(g)
    assert row["n_both"] == int(((g["y96"] == 1) & (g["y97"] == 1)).sum())
    assert row["b_only"] == b
    assert row["c_only"] == c
    assert (
        row["n_both"] + row["b_only"] + row["c_only"] + row["neither"]
        == row["n_customers"]
    )
    expected = round((abs(b - c) - 1.0) ** 2 / (b + c), 6)
    assert row["chi2_r"] == expected


# ----------------------------------------------------------- PR curve


def test_pr_curve_counts_and_monotone_recall(spark, sf_dir):
    rows = mleval2.q_events_pr_curve(spark, sf_dir).collect()
    ev = _pdf(spark, sf_dir, "events")
    score = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    y = (ev["event_type"] == "purchase").to_numpy()
    n_pos = int(y.sum())
    assert len(rows) == 19
    prev_recall = 1.1
    for r in rows:
        t = r["threshold"] * 100
        tp = int((y & (score >= t)).sum())
        fp = int((~y & (score >= t)).sum())
        assert r["tp"] == tp
        assert r["fp"] == fp
        assert r["tp"] + r["fn"] == n_pos
        assert r["recall_r"] <= prev_recall + 1e-12
        prev_recall = r["recall_r"]
        if tp + fp:
            assert r["precision_r"] == round(tp / (tp + fp), 6)
        else:
            assert r["precision_r"] is None
