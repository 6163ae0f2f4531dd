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


# ------------------------------------------------- Heaps / Zipf fits


def _trigrams(text: str) -> list[str]:
    toks = [t for t in text.strip().lower().split() if t]
    return [
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    ] if len(toks) >= 3 else []


def test_heaps_law_checkpoints_and_fit(spark, sf_dir):
    rows = mleval2.q_text_heaps_law(spark, sf_dir).collect()
    docs = _pdf(spark, sf_dir, "documents")
    tris = {d: _trigrams(t) for d, t in zip(docs["doc_id"], docs["text"])}
    max_id = int(docs["doc_id"].max())
    assert len(rows) == 10
    xs, ys = [], []
    for r in rows:
        bd = (max_id * r["k"]) // 10
        assert r["boundary_doc"] == bd
        cum = sum(len(v) for d, v in tris.items() if d <= bd)
        vocab = len({t for d, v in tris.items() if d <= bd for t in v})
        assert r["cum_trigrams"] == cum
        assert r["vocab"] == vocab
        xs.append(np.log(cum))
        ys.append(np.log(vocab))
    beta = np.polyfit(xs, ys, 1)[0]
    assert abs(rows[0]["beta_r"] - beta) < 1e-4
    assert 0.0 < rows[0]["beta_r"] < 1.0  # genuinely Heaps-shaped


def test_zipf_fit_matches_numpy(spark, sf_dir):
    row = mleval2.q_text_zipf_fit(spark, sf_dir).collect()[0]
    docs = _pdf(spark, sf_dir, "documents")
    from collections import Counter

    c = Counter()
    for t in docs["text"]:
        c.update(_trigrams(t))
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
    assert row["vocab_size"] == len(c)
    assert row["total_occurrences"] == sum(c.values())
    assert row["top_n"] == min(500, len(c))
    assert row["max_cnt"] == top[0][1]
    assert row["min_cnt"] == top[-1][1]
    x = np.log(np.arange(1, len(top) + 1))
    y = np.log(np.array([v for _, v in top], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(row["zipf_slope_r"] - slope) < 1e-4
    assert row["zipf_slope_r"] < 0  # frequency falls with rank


# ---------------------------------------------------------- WOE / IV


def test_woe_iv_bands_from_pandas(spark, sf_dir):
    rows = mleval2.q_events_woe_iv(spark, sf_dir).collect()
    ev = _pdf(spark, sf_dir, "events")
    cents = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    band = np.minimum(cents // 5000, 9)
    y = (ev["event_type"] == "purchase").to_numpy().astype(int)
    tot_pos, tot_neg = int(y.sum()), int((1 - y).sum())
    seen = set()
    for r in rows:
        b = r["band"]
        seen.add(b)
        pos = int(y[band == b].sum())
        n = int((band == b).sum())
        assert r["n"] == n and r["pos"] == pos
        if pos and n - pos:
            woe = np.log((pos / tot_pos) / ((n - pos) / tot_neg))
            assert abs(r["woe_r"] - woe) < 1e-5
            iv = (pos / tot_pos - (n - pos) / tot_neg) * woe
            assert abs(r["iv_term_r"] - iv) < 1e-5
    assert seen == set(np.unique(band).tolist())
