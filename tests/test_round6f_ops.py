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


# -------------------------------------------------------------- CCF


def test_ccf_matches_numpy(spark, sf_dir):
    rows = {r["lag"]: r["ccf_r"] for r in mleval2.q_events_ccf(spark, sf_dir).collect()}
    ev = _pdf(spark, sf_dir, "events")
    ts = pd.to_datetime(ev["ts"])
    hidx = (ts.dt.floor("h").astype("int64") // 10**9 // 3600).to_numpy()
    h0, h1 = hidx.min(), hidx.max()
    n = h1 - h0 + 1
    x = np.zeros(n)
    y = np.zeros(n)
    for h, t in zip(hidx, ev["event_type"]):
        if t == "view":
            x[h - h0] += 1
        elif t == "purchase":
            y[h - h0] += 1
    dx = x - x.mean()
    dy = y - y.mean()
    den = np.sqrt((dx**2).sum() * (dy**2).sum())
    assert len(rows) == 13
    for lag in range(-6, 7):
        if lag >= 0:
            num = (dx[: n - lag] * dy[lag:]).sum()
        else:
            num = (dx[-lag:] * dy[: n + lag]).sum()
        assert abs(rows[lag] - num / den) < 1e-5
    # symmetry sanity: r(0) is the plain correlation
    assert abs(rows[0] - np.corrcoef(x, y)[0, 1]) < 1e-5


# ---------------------------------------------- clustering coefficient


def test_clustering_coeff_brute_force(spark, sf_dir):
    rows = mleval2.q_graph_clustering_coeff(spark, sf_dir).collect()
    li = _pdf(spark, sf_dir, "lineitem")
    sub = li[li["l_partkey"] % 50 == 0][["l_partkey", "l_suppkey"]].drop_duplicates()
    from collections import defaultdict

    pairs = defaultdict(int)
    for _, grp in sub.groupby("l_partkey"):
        ss = sorted(grp["l_suppkey"])
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                pairs[(ss[i], ss[j])] += 1
    edges = {e for e, c in pairs.items() if c >= 3}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    buckets = defaultdict(int)
    ccs = []
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        t = sum(
            1
            for w in nb
            for u in nb
            if w < u and (min(w, u), max(w, u)) in edges
        )
        buckets[(20 * t) // (d * (d - 1))] += 1
        ccs.append(round(2.0 * t / (d * (d - 1)), 6))
    got = {r["bucket"]: r["n_nodes"] for r in rows}
    assert got == dict(buckets)
    if ccs:
        assert abs(rows[0]["avg_cc_r"] - sum(ccs) / len(ccs)) < 1e-5


# ------------------------------------------------------------ PVM


def test_pvm_bridge_identity_and_pandas(spark, sf_dir):
    rows = mleval2.q_orders_pvm_bridge(spark, sf_dir).collect()
    li = _pdf(spark, sf_dir, "lineitem")
    part = _pdf(spark, sf_dir, "part")
    li = li.merge(part[["p_partkey", "p_brand"]], left_on="l_partkey", right_on="p_partkey")
    li["yr"] = pd.to_datetime(li["l_shipdate"]).dt.year
    for r in rows:
        sub = li[li["p_brand"] == r["brand"]]
        c0 = sub[sub["yr"] == 1996]
        c1 = sub[sub["yr"] == 1997]
        q0, r0 = c0["l_quantity"].sum(), round(c0["l_extendedprice"], 2).sum()
        q1, r1 = c1["l_quantity"].sum(), round(c1["l_extendedprice"], 2).sum()
        assert abs(r["rev_1996_r"] - round(r0, 2)) < 0.02
        assert abs(r["rev_1997_r"] - round(r1, 2)) < 0.02
        p0, p1 = r0 / q0, r1 / q1
        assert abs(r["volume_eff_r"] - p0 * (q1 - q0)) < 0.02
        assert abs(r["price_eff_r"] - q0 * (p1 - p0)) < 0.02
        # the bridge closes: delta revenue = volume + price + joint
        assert abs(
            (r["rev_1997_r"] - r["rev_1996_r"])
            - (r["volume_eff_r"] + r["price_eff_r"] + r["joint_eff_r"])
        ) < 0.05
