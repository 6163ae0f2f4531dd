"""Round-6 continuation-4 operators: distributed tie-aware AUC, linear
gap interpolation, consistent-hash shard rebalancing, integer batch
perceptron, image dHash near-dup.

Each gate query gets an independent re-derivation (pandas/numpy brute
force at sf0.001) so a Spark-side logic bug cannot hide behind an
oracle authored from the same reading of the algorithm.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
    stats,
    timeseries,
)
from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
    mleval,
)


def _pdf(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet").toPandas()


# ------------------------------------------------------------------ AUC


def _auc_bruteforce(scores, labels):
    # Textbook mid-rank Mann-Whitney via pandas average ranks.
    s = pd.DataFrame({"score": scores, "y": labels})
    s["rank"] = s["score"].rank(method="average")
    n_pos = int(s["y"].sum())
    n_neg = len(s) - n_pos
    r_pos = float(s.loc[s["y"] == 1, "rank"].sum())
    return (r_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def test_auc_matches_pandas_rank(spark, sf_dir):
    ev = _pdf(spark, sf_dir, "events")
    scores = (ev["value"] * 100).round().astype("int64")
    labels = (ev["event_type"] == "purchase").astype(int)
    expected = _auc_bruteforce(scores, labels)
    row = mleval.q_events_auc_value(spark, sf_dir).collect()[0]
    assert row["n_pos"] == int(labels.sum())
    assert row["n_neg"] == int((1 - labels).sum())
    # auc_micro is the floor of AUC·1e6 — compare at that grain.
    assert row["auc_micro"] == int(expected * 1_000_000)


def test_auc_perfect_and_random_separation(spark):
    # score == label ordering -> AUC 1.0; constant score -> 0.5 exactly.
    perfect = spark.createDataFrame(
        [(i, 1 if i >= 5 else 0) for i in range(10)], "s long, y int"
    )
    out = stats.auc_rank(perfect, "s", "y").collect()[0]
    assert out["auc_micro"] == 1_000_000
    flat = spark.createDataFrame(
        [(7, i % 2) for i in range(10)], "s long, y int"
    )
    out = stats.auc_rank(flat, "s", "y").collect()[0]
    assert out["auc_micro"] == 500_000


def test_auc_chunking_invariant(spark):
    # The two-phase scan must be bit-identical at any chunk width.
    df = spark.createDataFrame(
        [((i * 37) % 101, 1 if i % 3 == 0 else 0) for i in range(200)],
        "s long, y int",
    )
    rows = {
        c: stats.auc_rank(df, "s", "y", chunk=c).collect()[0]
        for c in (1, 7, 1000)
    }
    assert rows[1] == rows[7] == rows[1000]


# -------------------------------------------------- linear interpolation


def test_interpolate_linear_exact_lerp(spark):
    obs = spark.createDataFrame(
        [("a", 0, 100), ("a", 3, 400), ("a", 5, 1000), ("b", 2, 50)],
        "k string, h long, v long",
    )
    out = {
        (r["k"], r["h"]): (r["v"], r["is_gap"])
        for r in timeseries.interpolate_linear(obs, "k", "h", "v").collect()
    }
    assert out[("a", 0)] == (100, 0)
    assert out[("a", 1)] == (200, 1)
    assert out[("a", 2)] == (300, 1)
    assert out[("a", 3)] == (400, 0)
    assert out[("a", 4)] == (700, 1)
    assert out[("a", 5)] == (1000, 0)
    assert out[("b", 2)] == (50, 0)
    assert len(out) == 7


def test_interpolate_linear_floor_division(spark):
    # (0 -> 10) over 3 steps: exact thirds floor to 3 and 6.
    obs = spark.createDataFrame(
        [("a", 0, 0), ("a", 3, 10)], "k string, h long, v long"
    )
    vals = {
        r["h"]: r["v"]
        for r in timeseries.interpolate_linear(obs, "k", "h", "v").collect()
    }
    assert vals == {0: 0, 1: 3, 2: 6, 3: 10}


def test_interpolate_linear_span_guard(spark):
    obs = spark.createDataFrame(
        [("a", 0, 0), ("a", 10_000_000, 1)], "k string, h long, v long"
    )
    with pytest.raises(Exception, match="max_steps"):
        timeseries.interpolate_linear(
            obs, "k", "h", "v", max_steps=1000
        ).collect()


def test_interpolate_gate_matches_numpy(spark, sf_dir):
    ev = _pdf(spark, sf_dir, "events")
    ev = ev[ev["user_id"] < 12].copy()
    ev["h"] = ev["ts"].astype("int64") // (3600 * 10**9)
    ev["m"] = (ev["value"] * 1000).round().astype("int64")
    hourly = ev.groupby(["user_id", "h"])["m"].agg(
        lambda s: int(s.sum()) // len(s)
    )
    expected = {}
    for uid in sorted(ev["user_id"].unique()):
        series = hourly.loc[uid]
        h0, h1 = int(series.index.min()), int(series.index.max())
        known = dict(series.items())
        ks = sorted(known)
        import bisect

        for h in range(h0, h1 + 1):
            if h in known:
                expected[(uid, h)] = (known[h], 0)
            else:
                i = bisect.bisect_left(ks, h)
                t0, t1 = ks[i - 1], ks[i]
                v0, v1 = known[t0], known[t1]
                lerp = (v0 * (t1 - h) + v1 * (h - t0)) // (t1 - t0)
                expected[(uid, h)] = (lerp, 1)
    got = {
        (r["user_id"], r["hour_idx"]): (r["v_milli"], r["is_gap"])
        for r in mleval.q_events_interpolate_linear(spark, sf_dir).collect()
    }
    assert got == expected


# ----------------------------------------------------------- plan shape


def test_auc_has_no_unsafe_global_window(spark, sf_dir):
    # The strictly-below counts must ride the chunked two-phase scan —
    # never a single-task global rank over the distinct-score table.
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import plans

    df = mleval.q_events_auc_value(spark, sf_dir)
    assert plans.unsafe_global_windows(df) == []


# ------------------------------------------------- consistent-hash shards


def _ring_assign_py(key, ring):
    import hashlib

    h = int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)
    for p, o in ring:  # ring sorted by point
        if p >= h:
            return o
    return ring[0][1]


def test_consistent_assign_matches_python(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
        sampling,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    got = {
        r["doc_id"]: r["node"]
        for r in sampling.consistent_shard_assign(
            docs, "doc_id", 16
        ).collect()
    }
    ring = sampling.consistent_ring(16)
    for doc_id, node in got.items():
        assert node == _ring_assign_py(doc_id, ring)


def test_rebalance_movers_all_land_on_new_node(spark, sf_dir):
    rows = mleval.q_docs_shard_rebalance(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) > 0
    for r in rows:
        # Consistent hashing's minimal-movement contract.
        assert r["n_moved"] == r["n_to_new"]
    moved = sum(r["n_moved"] for r in rows)
    total = sum(r["n_docs"] for r in rows)
    # ~1/17 expected; generous band, but far below mod-N's ~16/17.
    assert moved < total * 0.35


def test_ring_collision_guard():
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
        sampling,
    )

    ring = sampling.consistent_ring(16, 8)
    assert len(ring) == 128
    assert ring == sorted(ring)


# ------------------------------------------------------ batch perceptron


def test_perceptron_matches_numpy(spark, sf_dir):
    import numpy as np

    ev = _pdf(spark, sf_dir, "events")
    y = np.where(ev["event_type"] == "purchase", 1, -1).astype("int64")
    ts_ns = ev["ts"].astype("datetime64[ns]").astype("int64")
    X = np.stack(
        [
            np.ones(len(ev), dtype="int64"),
            (ev["value"] * 100).round().astype("int64"),
            (ts_ns // (3600 * 10**9)) % 24,
            (ts_ns // (86400 * 10**9)) % 7,
        ],
        axis=1,
    )
    w = np.zeros(4, dtype="int64")
    for _ in range(3):
        mis = y * (X @ w) <= 0
        w = w + (X[mis] * y[mis, None]).sum(axis=0)
    n_correct = int((y * (X @ w) > 0).sum())
    row = mleval.q_events_perceptron(spark, sf_dir).collect()[0]
    assert [
        row["w_x_bias"],
        row["w_x_cents"],
        row["w_x_hour"],
        row["w_x_dow"],
    ] == list(w)
    assert row["n_correct"] == n_correct
    assert row["n_total"] == len(ev)


def test_perceptron_separable_and_partitioning_invariant(spark):
    # y = sign(x - 5): linearly separable; the batch variant oscillates
    # early and first hits 100% at epoch 19 (simulated offline).
    data = [(1 if x > 5 else -1, 1, x) for x in range(11) if x != 5]
    df = spark.createDataFrame(data, "y long, b long, x long")
    out1 = stats.perceptron_train(df, ["b", "x"], "y", epochs=19).collect()[0]
    assert out1["n_correct"] == out1["n_total"]
    assert (out1["w_b"], out1["w_x"]) == (-35, 7)
    out32 = stats.perceptron_train(
        df.repartition(32), ["b", "x"], "y", epochs=19
    ).collect()[0]
    assert out1 == out32


# ---------------------------------------------------- image dHash near-dup


def _dhash_py(blob):
    import struct

    import numpy as np

    w, h = struct.unpack_from("<ii", blob, 18)
    h = abs(h)
    if w < 9 or h < 8:
        return None
    stride = (3 * w + 3) // 4 * 4
    data = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=54)
    rgb = data.astype("int64").reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    gray = (rgb.sum(axis=2) // 3)[::-1]
    cy = (np.arange(h) * 8) // h
    cx = (np.arange(w) * 9) // w
    sums = np.zeros((8, 9), dtype="int64")
    cnts = np.zeros((8, 9), dtype="int64")
    np.add.at(sums, (cy[:, None].repeat(w, 1), cx[None, :].repeat(h, 0)), gray)
    np.add.at(cnts, (cy[:, None].repeat(w, 1), cx[None, :].repeat(h, 0)), 1)
    avg = sums // cnts
    bits = (avg[:, :8] > avg[:, 1:]).astype("int64")
    v = 0
    for r in range(8):
        for c in range(8):
            v |= int(bits[r, c]) << (r * 8 + c)
    return v >> 32, v & 0xFFFFFFFF


def test_image_dhash_matches_reference_impl(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
        multimodal,
    )

    media = multimodal.generate_real_media(spark, 60)
    got = {
        r["media_id"]: (r["dhash_hi"], r["dhash_lo"])
        for r in multimodal.image_dhash(
            media.where(F.col("kind") == "image")
        ).collect()
    }
    expected = {}
    for mid in range(0, 60, 3):
        blob = multimodal.bmp_bytes((mid % 31 + 1) * 4, (mid % 23 + 1) * 4)
        hl = _dhash_py(blob)
        if hl is not None:
            expected[mid] = hl
    assert got == expected
    assert len(got) >= 15  # only sub-grid thumbnails were dropped


def test_dhash_banding_has_exact_recall(spark):
    from itertools import combinations

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
        multimodal,
    )

    media = multimodal.generate_real_media(spark, 900)
    hashes = multimodal.image_dhash(media.where(F.col("kind") == "image"))
    rows = hashes.collect()
    brute = set()
    for a, b in combinations(sorted(rows, key=lambda r: r["media_id"]), 2):
        d = bin(
            (a["dhash_hi"] ^ b["dhash_hi"]) << 32
            | (a["dhash_lo"] ^ b["dhash_lo"])
        ).count("1")
        if d <= 3:
            brute.add((a["media_id"], b["media_id"], d))
    banded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in multimodal.dhash_near_pairs(hashes, 3).collect()
    }
    assert banded == brute


def test_dhash_near_pairs_threshold_guard(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
        multimodal,
    )

    media = multimodal.generate_real_media(spark, 30)
    hashes = multimodal.image_dhash(media.where(F.col("kind") == "image"))
    with pytest.raises(ValueError, match="max_hamming"):
        multimodal.dhash_near_pairs(hashes, max_hamming=4)


# --------------------------------------------------- LOO target encoding


def test_target_encode_loo_matches_pandas(spark, sf_dir):
    ev = _pdf(spark, sf_dir, "events")
    y = (ev["event_type"] == "purchase").astype(int)
    f = pd.DataFrame({"u": ev["user_id"], "y": y})
    s_c = f.groupby("u")["y"].sum()
    n_c = f.groupby("u")["y"].count()
    p_num, p_den = int(y.sum()), len(f)
    m = 20
    expected = {}
    for (u, yy), grp in f.groupby(["u", "y"]):
        te = ((int(s_c[u]) - yy) * p_den + m * p_num) * 1_000_000 // (
            (int(n_c[u]) - 1 + m) * p_den
        )
        expected[(u, yy)] = (len(grp), te)
    got = {
        (r["user_id"], r["y"]): (r["n"], r["te_micro"])
        for r in mleval.q_events_target_encode_loo(spark, sf_dir).collect()
    }
    assert got == expected


def test_target_encode_loo_constant_within_group(spark):
    # te depends only on (category, own label): min == max per group.
    df = spark.createDataFrame(
        [("a", 1), ("a", 0), ("a", 1), ("b", 0), ("b", 0), ("c", 1)],
        "cat string, y int",
    )
    enc = stats.target_encode_loo(df, "cat", "y", m=4)
    agg = (
        enc.groupBy("cat", "y")
        .agg(F.min("te_micro").alias("lo"), F.max("te_micro").alias("hi"))
        .collect()
    )
    for r in agg:
        assert r["lo"] == r["hi"]
    # Singleton category: te = m*p / (0 + m) = prior exactly.
    c_row = {r["cat"]: r for r in enc.collect() if r["cat"] == "c"}["c"]
    assert c_row["te_micro"] == (3 * 1_000_000) // 6  # prior 3/6


# ------------------------------------------------------ calibration curve


def test_calibration_matches_pandas(spark, sf_dir):
    ev = _pdf(spark, sf_dir, "events")
    score = (ev["value"] * 100).round().astype("int64")
    y = (ev["event_type"] == "purchase").astype(int)
    g = (
        pd.DataFrame({"s": score, "y": y})
        .groupby("s")["y"]
        .agg(["count", "sum"])
        .sort_index()
    )
    cum = g["count"].cumsum() - g["count"]
    n = int(g["count"].sum())
    g["bucket"] = (cum * 10) // n + 1
    exp = {}
    for b, grp in g.groupby("bucket"):
        nr, npos = int(grp["count"].sum()), int(grp["sum"].sum())
        exp[int(b)] = (
            nr,
            npos,
            int(grp.index.min()),
            int(grp.index.max()),
            npos * 1_000_000 // nr,
        )
    got = {
        r["bucket"]: (
            r["n_rows"],
            r["n_pos"],
            r["min_score"],
            r["max_score"],
            r["pos_rate_micro"],
        )
        for r in mleval.q_events_calibration(spark, sf_dir).collect()
    }
    assert got == exp
    assert sum(v[0] for v in got.values()) == len(ev)


def test_calibration_has_no_unsafe_global_window(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import plans

    df = mleval.q_events_calibration(spark, sf_dir)
    assert plans.unsafe_global_windows(df) == []


# ------------------------------------------------------------- PSI drift


def test_psi_identical_distributions_are_zero(spark):
    a = spark.createDataFrame(
        [(v,) for v in range(100) for _ in range(3)], "score long"
    )
    out = stats.psi_drift(a, a, "score", n_buckets=10).collect()
    assert len(out) == 10
    assert all(r["psi_term_r"] == 0.0 for r in out)
    assert all(r["n_a"] == r["n_b"] == 30 for r in out)


def test_psi_shift_is_positive_and_binned_by_a_edges(spark):
    # B shifted up by 50: mass leaves low bins for high bins; every
    # term is (pA-pB)ln(pA/pB) >= 0, total > 0.
    a = spark.createDataFrame([(v,) for v in range(200)], "score long")
    b = spark.createDataFrame([(v + 50,) for v in range(200)], "score long")
    out = stats.psi_drift(a, b, "score", n_buckets=10).collect()
    assert len(out) == 10
    assert sum(r["n_b"] for r in out) == 200
    total = sum(r["psi_term_r"] for r in out)
    assert total > 0.1
    assert all(r["psi_term_r"] >= 0.0 for r in out)


def test_psi_gate_matches_pandas(spark, sf_dir):
    import math

    ev = _pdf(spark, sf_dir, "events")
    score = (ev["value"] * 100).round().astype("int64")
    cut = pd.Timestamp("2024-01-16")
    in_a = ev["ts"] < cut
    av, bv = score[in_a], score[~in_a]
    ga = av.value_counts().sort_index()
    cum = ga.cumsum() - ga
    n = int(ga.sum())
    bucket = (cum * 10) // n + 1
    edges = (
        pd.DataFrame({"v": ga.index, "b": bucket})
        .groupby("b")["v"]
        .max()
    )
    edges = sorted(edges[edges.index < 10])

    def bin_of(v):
        return 1 + sum(1 for e in edges if e < v)

    na = av.map(bin_of).value_counts()
    nb = bv.map(bin_of).value_counts()
    ta, tb = len(av), len(bv)
    exp = {}
    for b in range(1, 11):
        a_n, b_n = int(na.get(b, 0)), int(nb.get(b, 0))
        pa = (a_n + 1) / (ta + 10)
        pb = (b_n + 1) / (tb + 10)
        exp[b] = (a_n, b_n, round((pa - pb) * math.log(pa / pb), 6))
    got = {
        r["bin"]: (r["n_a"], r["n_b"], r["psi_term_r"])
        for r in mleval.q_events_psi_drift(spark, sf_dir).collect()
    }
    assert got == exp


# ------------------------------------------------------ exact percentiles


def test_exact_percentiles_known_values(spark):
    # 1..1000 once each: p50=500, p90=900, p99=990, p99.9=999 exactly.
    df = spark.createDataFrame([(v,) for v in range(1, 1001)], "v long")
    got = {
        r["permille"]: (r["rank_q"], r["value"])
        for r in stats.exact_percentiles(df, "v").collect()
    }
    assert got == {
        500: (500, 500),
        900: (900, 900),
        990: (990, 990),
        999: (999, 999),
    }


def test_exact_percentiles_match_numpy_lower(spark, sf_dir):
    import numpy as np

    ev = _pdf(spark, sf_dir, "events")
    scores = np.sort((ev["value"] * 100).round().astype("int64").values)
    n = len(scores)
    got = {
        r["permille"]: r["value"]
        for r in mleval.q_events_exact_percentiles(spark, sf_dir).collect()
    }
    for q in (500, 900, 990, 999):
        rank = (q * n + 999) // 1000
        assert got[q] == scores[rank - 1]


def test_exact_percentiles_chunking_invariant(spark):
    df = spark.createDataFrame(
        [((v * 131) % 4003,) for v in range(4000)], "v long"
    )
    a = stats.exact_percentiles(df, "v", chunk=10).collect()
    b = stats.exact_percentiles(df, "v", chunk=100000).collect()
    assert a == b


# ------------------------------------------------------- Theil-Sen trend


def test_theil_sen_ignores_outlier(spark):
    # y = 7x + noiseless, except one wild outlier at x=5: OLS would move,
    # the pairwise-median slope stays exactly 7000 milli-units.
    pts = [(x, 7 * x) for x in range(11) if x != 5] + [(5, 100000)]
    df = spark.createDataFrame(pts, "x long, y long")
    row = stats.theil_sen_slope(df, "x", "y", scale=1000).collect()[0]
    assert row["n_points"] == 11
    assert row["n_pairs"] == 55
    assert row["slope_median"] == 7000


def test_theil_sen_gate_matches_numpy(spark, sf_dir):
    import numpy as np

    orders = _pdf(spark, sf_dir, "orders")
    day = (
        orders["o_orderdate"].astype("datetime64[ns]").astype("int64")
        // (86400 * 10**9)
    )
    cents = (orders["o_totalprice"] * 100).round().astype("int64")
    daily = pd.DataFrame({"d": day, "c": cents}).groupby("d")["c"].sum()
    xs = daily.index.values.astype("int64")
    ys = daily.values.astype("int64")
    slopes = []
    for i in range(len(xs)):
        dy = ys[i + 1 :] - ys[i]
        dx = xs[i + 1 :] - xs[i]
        # numpy // floors; the engines truncate toward zero — emulate.
        q = np.abs(dy) * 1000 // dx
        slopes.extend(np.where(dy < 0, -q, q).tolist())
    slopes.sort()
    n = len(slopes)
    expected = slopes[(500 * n + 999) // 1000 - 1]
    row = mleval.q_orders_theil_sen(spark, sf_dir).collect()[0]
    assert row["n_pairs"] == n
    assert row["slope_median"] == expected


# ------------------------------------------------- hashing-trick features


def test_hashed_features_match_python(spark, sf_dir):
    import hashlib
    import re
    from collections import Counter, defaultdict

    docs = _pdf(spark, sf_dir, "documents")
    nb = mleval._BOW_BUCKETS
    per_bucket = defaultdict(list)  # bucket -> list of (doc_id, count)
    for _, row in docs.iterrows():
        norm = re.sub(r"\s+", " ", row["text"]).strip().lower()
        counts = Counter(
            int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % nb
            for w in norm.split(" ")
            if w
        )
        for b, c in counts.items():
            per_bucket[b].append((int(row["doc_id"]), c))
    expected = {}
    for b, pairs in per_bucket.items():
        m = max(c for _, c in pairs)
        expected[b] = (
            sum(c for _, c in pairs),
            len(pairs),
            m,
            min(d for d, c in pairs if c == m),
        )
    got = {
        r["bucket"]: (r["total"], r["n_docs"], r["max_per_doc"], r["argmax_doc"])
        for r in mleval.q_docs_hashed_features(spark, sf_dir).collect()
    }
    assert got == expected


# ---------------------------------------------------- weighted percentiles


def test_weighted_percentile_toy(spark):
    # v=1 w=1, v=2 w=1, v=100 w=98: weighted median is 100 (unweighted 2).
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (100, 98)], "v long, w long"
    )
    row = stats.exact_percentiles(
        df, "v", permille=(500,), weight_col="w"
    ).collect()[0]
    assert (row["rank_q"], row["value"]) == (50, 100)
    un = stats.exact_percentiles(df, "v", permille=(500,)).collect()[0]
    assert un["value"] == 2


def test_weighted_median_gate_matches_numpy(spark, sf_dir):
    import numpy as np

    li = _pdf(spark, sf_dir, "lineitem")
    v = (li["l_extendedprice"] * 100).round().astype("int64")
    q = li["l_quantity"].round().astype("int64")
    g = pd.DataFrame({"v": v, "q": q}).groupby("v")["q"].sum().sort_index()
    cum = g.cumsum()
    n = int(g.sum())
    got = {
        r["permille"]: (r["rank_q"], r["value"])
        for r in mleval.q_lineitem_weighted_median(spark, sf_dir).collect()
    }
    for p in (500, 900, 990):
        rank = (p * n + 999) // 1000
        value = int(g.index[np.searchsorted(cum.values, rank)])
        assert got[p] == (rank, value)
