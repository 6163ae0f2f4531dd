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


# ------------------------------------------------------- readability


def test_readability_counts_toy(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import text as t

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),
            (2, "Incredible readability example?! Yes."),
            (3, "123 456"),  # no letter words -> 0 words, 1 sentence floor
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: (r["r_words"], r["r_sentences"], r["r_syllables"])
        for r in t.readability(df, "text").collect()
    }
    # "the cat sat." -> the(1) cat(1) sat.(1)  (trailing dot stays on the
    # token after whitespace split; vowel runs only count letters)
    assert rows[1] == (6, 2, 6)
    # incredible(4: i-e-i-e) readability(5: ea-a-i-i-y) example?!(3: e-a-e)
    # yes.(1: e)
    assert rows[2] == (4, 2, 13)
    assert rows[3] == (0, 1, 0)


def test_readability_gate_ranges(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import pipeline as pl

    out = pl.q_text_readability(spark, sf_dir).toPandas()
    assert (out["words"] > 0).all() and (out["sentences"] > 0).all()
    # syllables >= letter-words (every letter word counts at least 1)
    assert (out["syllables"] >= out["words"]).all()
    # FRE for English-ish synthetic text lands in a sane band
    assert out["fre_r"].between(-100, 150).all()


# ------------------------------------------------- label propagation


def test_label_propagation_two_cliques(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import graph

    # two 4-cliques joined by one bridge edge: LPA must find both
    cliq1 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    cliq2 = [(a, b) for a in range(11, 15) for b in range(11, 15) if a < b]
    edges = spark.createDataFrame(
        cliq1 + cliq2 + [(4, 11)], ["sa", "sb"]
    )
    labs = graph.label_propagation(edges, rounds=4)
    comm = {r["n"]: r["label"] for r in labs.collect()}
    assert len(set(comm.values())) == 2
    assert comm[1] == comm[2] == comm[3] == comm[4]
    assert comm[11] == comm[12] == comm[13] == comm[14]
    # min-label convention: community labels are member ids
    assert set(comm.values()) == {1, 11}


def test_label_propagation_validation_and_gate(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import graph
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import relational8

    with pytest.raises(ValueError):
        graph.label_propagation(
            spark.createDataFrame([(1, 2)], ["sa", "sb"]), rounds=0
        )
    # min_shared=5 leaves no edges at sf0.001 — exercise the gate shape
    # at the driver's sf0.01
    out = relational8.q_supplier_communities(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    # census covers every node exactly once
    assert out["n_members"].sum() > 0
    assert (out["min_member"] <= out["max_member"]).all()
    assert out["n_members"].is_monotonic_decreasing


# ---------------------------------------------------- JL projection


def test_jl_sign_matrix_matches_hashlib(spark):
    import hashlib

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import similarity

    one = spark.createDataFrame(
        [(7, [1.0] + [0.0] * 63)], ["vec_id", "embedding"]
    )
    # with a single 1.0 in dim 0, pj equals quant * s(0, j) exactly
    got = {
        r["j"]: r["pj"]
        for r in similarity.jl_project(one, "vec_id", "embedding").collect()
    }
    for j in range(16):
        s = 1 if hashlib.md5(f"0_{j}".encode()).hexdigest()[0] < "8" else -1
        assert got[j] == s * 1_000_000


def test_jl_distortion_concentrates(spark, sf_dir):
    out = mleval.q_sim_jl_distortion(spark, sf_dir).collect()[0]
    assert out["n_pairs"] > 0
    # JL with r=16: ratios concentrate around 1; the sample mean should
    # sit well inside [0.7, 1.3] and catastrophic distortion is rare
    assert 0.7 < out["avg_ratio_r"] < 1.3
    assert out["min_ratio_r"] > 0.0
    assert out["n_outside"] < out["n_pairs"] * 0.2


# ------------------------------------------------- substring dedup


def test_substring_spans_toy_islands(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import dedup

    shared = "A" * 25 + "B" * 25  # 50 chars shared verbatim by docs 1+2
    docs = spark.createDataFrame(
        [
            (1, shared + "x" * 30),
            (2, "y" * 30 + shared),
            (3, "z" * 100),  # unique: no spans
            (4, "w" * 10),  # too short for one window
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["doc_id"], r["span_start"]): (r["span_chars"], r["n_windows"])
        for r in dedup.substring_dup_spans(
            docs, "doc_id", "text", window=40, stride=10
        ).collect()
    }
    # doc 1: shared run starts at 1 -> windows at offsets 1 and 11
    # (both inside the 50-char run) -> one island [1, 51)
    assert out[(1, 1)] == (50, 2)
    # doc 2: run starts at 31 -> windows at 31 and 41 -> island [31, 81)
    assert out[(2, 31)] == (50, 2)
    assert not any(d == 3 or d == 4 for d, _ in out)


def test_substring_spans_gate_and_validation(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import dedup
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import pipeline as pl

    with pytest.raises(ValueError):
        dedup.substring_dup_spans(
            spark.createDataFrame([(1, "x")], ["doc_id", "text"]),
            "doc_id",
            "text",
            stride=0,
        )
    out = pl.q_dedup_substring_spans(spark, sf_dir).toPandas()
    # spans never exceed the text they came from
    assert (out["dup_chars"] >= 40 * 0).all() and (out["n_spans"] > 0).any()
    assert (out["n_docs_affected"] <= out["n_spans"]).all()


# --------------------------------------------- normal-equations OLS


def test_ols_normal_matches_numpy_lstsq(spark, sf_dir):
    out = mleval.q_lineitem_ols_normal(spark, sf_dir).collect()[0]
    li = _pdf(spark, sf_dir, "lineitem")
    y = (
        (li["l_extendedprice"] * (1 - li["l_discount"]))
        .round()
        .to_numpy(dtype="float64")
    )
    X = np.column_stack(
        [
            np.ones(len(li)),
            li["l_extendedprice"].round().to_numpy(dtype="float64"),
            (li["l_discount"] * 100).round().to_numpy(dtype="float64"),
        ]
    )
    w, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ w
    r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert out["n"] == len(li)
    assert out["w0_r"] == pytest.approx(w[0], rel=1e-4, abs=2e-4)
    assert out["w1_r"] == pytest.approx(w[1], rel=1e-4, abs=2e-4)
    assert out["w2_r"] == pytest.approx(w[2], rel=1e-4, abs=2e-4)
    assert out["r2_r"] == pytest.approx(r2, abs=1e-5)
    # revenue = price*(1-d): the plane recovers w1 ~ 1-E[d], R^2 ~ 1
    assert out["r2_r"] > 0.99 and 0.9 < out["w1_r"] < 1.0 and out["w2_r"] < 0


# ---------------------------------------------------- conformal band


def test_conformal_band_coverage_and_numpy(spark, sf_dir):
    out = mleval.q_events_conformal_band(spark, sf_dir).collect()[0]
    ev = _pdf(spark, sf_dir, "events")
    ev["y_c"] = (ev["value"] * 100).round().astype("int64")
    tr = ev[ev["user_id"] % 5 <= 2]
    pred = (
        tr.groupby("event_type")["y_c"]
        .apply(lambda s: (s.sum() * 1_000_000) // len(s))
        .to_dict()
    )
    cal = ev[ev["user_id"] % 5 == 3]
    s = np.sort(
        np.abs(
            cal["y_c"].to_numpy() * 1_000_000
            - cal["event_type"].map(pred).to_numpy()
        )
    )
    n_cal = len(s)
    rank = min(((n_cal + 1) * 900 + 999) // 1000, n_cal)
    assert out["n_cal"] == n_cal and out["rank_q"] == ((n_cal + 1) * 900 + 999) // 1000
    assert out["qhat_micro"] == int(s[rank - 1])
    # conformal guarantee: coverage on exchangeable test data ~>= 90%
    assert out["cover_micro"] >= 850_000
    test = ev[ev["user_id"] % 5 == 4]
    st = np.abs(
        test["y_c"].to_numpy() * 1_000_000
        - test["event_type"].map(pred).to_numpy()
    )
    assert out["n_test"] == len(st)
    assert out["cover_micro"] == (int((st <= out["qhat_micro"]).sum()) * 1_000_000) // len(st)


# ------------------------------------------- grouped exact percentiles


def test_percentiles_by_group_matches_numpy(spark, sf_dir):
    out = {
        (r["event_type"], r["permille"]): (r["rank_q"], r["value"])
        for r in mleval.q_events_percentiles_by_type(spark, sf_dir).collect()
    }
    ev = _pdf(spark, sf_dir, "events")
    ev["score"] = (ev["value"] * 100).round().astype("int64")
    for etype, grp in ev.groupby("event_type"):
        s = np.sort(grp["score"].to_numpy())
        n = len(s)
        for p in (500, 900, 990):
            rank = (p * n + 999) // 1000
            assert out[(etype, p)] == (rank, int(s[rank - 1]))


def test_percentiles_by_group_skewed_group_is_chunk_parallel(spark):
    # one group holds 99% of rows; the partitioned two-phase scan must
    # still produce the exact grouped quantile
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import stats as st

    rows = [("big", v) for v in range(9900)] + [("small", v) for v in range(100)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        (r["g"], r["permille"]): r["value"]
        for r in st.exact_percentiles_by_group(
            df, ["g"], "v", permille=(500,), chunk=100
        ).collect()
    }
    assert out[("big", 500)] == 4949 and out[("small", 500)] == 49


# ------------------------------------------------------- bigram LM


def test_bigram_lm_matches_python(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import text as t

    train = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ran")],
        ["doc_id", "text"],
    )
    test = spark.createDataFrame(
        [(10, "the cat sat"), (11, "dog jumps high")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_r"])
        for r in t.bigram_lm_scores(train, test, "doc_id", "text").collect()
    }
    import math

    c12 = {}
    for s in ["the cat sat on the mat", "the cat ran"]:
        w = s.split()
        for a, b in zip(w, w[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c1 = {}
    for (a, _), c in c12.items():
        c1[a] = c1.get(a, 0) + c
    V = len({w for s in ["the cat sat on the mat", "the cat ran"] for w in s.split()})

    def nll(sentence):
        w = sentence.split()
        terms = [
            round(
                math.log(
                    (c12.get((a, b), 0) + 1) / (c1.get(a, 0) + V)
                ),
                9,
            )
            for a, b in zip(w, w[1:])
        ]
        return len(terms), round(-sum(terms) / len(terms), 6)

    assert got[10] == pytest.approx(nll("the cat sat"))
    assert got[11] == pytest.approx(nll("dog jumps high"))
    # fluent in-domain text scores lower NLL than unseen-vocab text
    assert got[10][1] < got[11][1]


def test_bigram_lm_gate_covers_all_sources(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import pipeline as pl

    out = pl.q_text_bigram_lm(spark, sf_dir).toPandas()
    docs = _pdf(spark, sf_dir, "documents")
    assert len(out) == docs["source"].nunique()
    assert (out["nll_r"] > 0).all()


# --------------------------------------------------------------- DiD


def test_did_matches_numpy(spark, sf_dir):
    out = mleval.q_events_did(spark, sf_dir).collect()[0]
    ev = _pdf(spark, sf_dir, "events")
    ev["y"] = (ev["value"] * 100).round().astype("int64")
    ev["treat"] = (ev["user_id"] % 2 == 0).astype(int)
    ev["post"] = (ev["ts"] >= pd.Timestamp("2024-01-16")).astype(int)
    m = {}
    v = {}
    for (t, p), g in ev.groupby(["treat", "post"]):
        y = g["y"].to_numpy(dtype="float64")
        m[(t, p)] = y.mean()
        v[(t, p)] = y.var() / len(y)
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    se = float(np.sqrt(sum(v.values())))
    assert out["did_r"] == pytest.approx(did, abs=1e-4)
    assert out["se_r"] == pytest.approx(se, abs=1e-4)
    assert out["z_r"] == pytest.approx(did / se, abs=1e-3)
    # parity-based pseudo-treatment on symmetric data: effect ~ 0
    assert abs(out["z_r"]) < 4


# ------------------------------------------------ streaming PIT enrich


def test_stream_pit_enrich_matches_batch_and_splits_segments(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import streaming_ops

    out = streaming_ops.q_stream_pit_enrich(spark, sf_dir).toPandas()
    segs = set(out["segment"])
    # the mid-January segment change must be visible: both pre-change
    # SEG_ and post-change UPG_ rows exist
    assert any(s.startswith("SEG_") for s in segs)
    assert any(s.startswith("UPG_") for s in segs)
    # totals equal the plain (time-blind) enrichment volume: the PIT
    # condition re-labels events, never drops or duplicates them
    ev = _pdf(spark, sf_dir, "events")
    cust = _pdf(spark, sf_dir, "customer")
    joined = ev.merge(
        cust[["c_custkey"]], left_on="user_id", right_on="c_custkey"
    )
    assert int(out["n_events"].sum()) == len(joined)


# --------------------------------------------------- point in polygon


def test_point_in_polygon_matches_matplotlib_free_ray_cast(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import geospatial as geo

    out = {
        r["polygon"]: (r["n_inside"], r["sum_bal_cents"])
        for r in geo.q_geo_point_in_polygon(spark, sf_dir).collect()
    }
    cust = _pdf(spark, sf_dir, "customer")
    k = cust["c_custkey"].to_numpy()
    px = (k * 104729) % 360001 - 180000
    py = (k * 7919) % 120001 - 60000
    bal = (cust["c_acctbal"] * 100).round().astype("int64").to_numpy()

    def inside(verts, x, y):
        n = 0
        for i, (x1, y1) in enumerate(verts):
            x2, y2 = verts[(i + 1) % len(verts)]
            if (y1 > y) != (y2 > y):
                dy = y2 - y1
                lhs = (x - x1) * dy
                rhs = (y - y1) * (x2 - x1)
                if (dy > 0 and lhs < rhs) or (dy < 0 and lhs > rhs):
                    n += 1
        return n % 2 == 1

    for name, verts in geo._POLYGONS:
        mask = np.array(
            [inside(verts, int(x), int(y)) for x, y in zip(px, py)]
        )
        want = (int(mask.sum()), int(bal[mask].sum()))
        got = out.get(name, (0, 0))
        assert got == want and want[0] > 0


def test_point_in_polygon_nonconvex_notch(spark):
    # a point inside the L's notch must be OUTSIDE (bbox would say inside)
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads.geospatial import _POLYGONS

    verts = dict(_POLYGONS)["lshape"]

    def inside(x, y):
        n = 0
        for i, (x1, y1) in enumerate(verts):
            x2, y2 = verts[(i + 1) % len(verts)]
            if (y1 > y) != (y2 > y):
                dy = y2 - y1
                if (dy > 0 and (x - x1) * dy < (y - y1) * (x2 - x1)) or (
                    dy < 0 and (x - x1) * dy > (y - y1) * (x2 - x1)
                ):
                    n += 1
        return n % 2 == 1

    assert inside(-130000, -10000)  # in the L's vertical arm
    assert inside(-90000, -40000)  # in the L's horizontal arm
    assert not inside(-90000, 0)  # in the notch: bbox-inside, polygon-out


# ------------------------------------------------------- audio VAD


def test_audio_frame_energies_match_wave_module(spark):
    import wave as wavmod
    import io

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import multimodal as mm

    media = mm.generate_real_media(spark, 30)
    got = (
        mm.audio_frame_energies(media, frame=80)
        .orderBy("media_id", "frame_idx")
        .toPandas()
    )
    # independently decode one clip with the stdlib wave reader
    row = media.where(F.col("kind") == "audio").orderBy("media_id").first()
    w = wavmod.open(io.BytesIO(bytes(row["content"])))
    raw = w.readframes(w.getnframes())
    s = np.frombuffer(raw, dtype="<i2").astype("int64")
    nf = len(s) // 80
    want = (s[: nf * 80] ** 2).reshape(nf, 80).sum(axis=1)
    mine = got[got["media_id"] == row["media_id"]]["energy"].to_numpy()
    assert (mine == want).all() and nf == len(mine)


def test_audio_vad_gate_invariants(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import pipeline as pl

    out = pl.q_multimodal_audio_vad(spark, sf_dir).toPandas()
    assert len(out) == 100  # every audio clip reports
    assert (out["n_active"] <= out["n_frames"]).all()
    assert (out["longest_run"] <= out["n_active"]).all()
    # strict > median threshold: active strictly fewer than all frames
    # whenever the clip has >1 distinct energy
    assert (out["n_segments"] >= (out["n_active"] > 0).astype(int)).all()


# ------------------------------------------------------ bloom FPR


def test_bloom_fpr_matches_hashlib_simulation(spark, sf_dir):
    import hashlib

    out = mleval.q_sketch_bloom_fpr(spark, sf_dir).collect()[0]
    ev = _pdf(spark, sf_dir, "events")
    jan = sorted(
        set(ev.loc[ev["ts"] < pd.Timestamp("2024-01-16"), "user_id"])
    )

    def bits(u):
        return {
            int(hashlib.md5(f"{u}_{i}".encode()).hexdigest()[:15], 16) % 16384
            for i in range(4)
        }

    filt = set()
    for u in jan:
        filt |= bits(u)
    fp = sum(
        1 for i in range(20000) if bits(1_000_000_000 + i) <= filt
    )
    assert out["n_members"] == len(jan)
    assert out["n_set_bits"] == len(filt)
    assert out["n_fp"] == fp
    # measured FPR should be in the ballpark of (s/m)^4
    assert out["theo_fpr_r"] == pytest.approx(
        (len(filt) / 16384) ** 4, abs=1e-6
    )


# ---------------------------------------------- Mann-Kendall + assort


def test_mann_kendall_matches_direct_python(spark, sf_dir):
    out = mleval.q_orders_mann_kendall(spark, sf_dir).collect()[0]
    od = _pdf(spark, sf_dir, "orders")
    daily = (
        od.groupby(od["o_orderdate"].dt.date)
        .size()
        .sort_index()
        .to_numpy()
    )
    n = len(daily)
    diff = np.sign(daily[None, :] - daily[:, None])
    s = int(np.triu(diff, 1).sum())
    _, t = np.unique(daily, return_counts=True)
    var_num = n * (n - 1) * (2 * n + 5) - int(
        (t * (t - 1) * (2 * t + 5)).sum()
    )
    assert (out["n_days"], out["s_stat"], out["var_num"]) == (n, s, var_num)
    z = (s - np.sign(s)) / np.sqrt(var_num / 18.0) if s != 0 else 0.0
    assert out["z_r"] == pytest.approx(z, abs=1e-5)


def test_assortativity_bounds_and_star_graph(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import mleval as ml

    # a star plus a triangle: hubs don't connect to hubs -> negative r
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (10, 11), (11, 12), (10, 12)],
        ["sa", "sb"],
    )
    from pyspark.sql import functions as FF

    und = edges.select(
        FF.col("sa").alias("n"), FF.col("sb").alias("m")
    ).unionByName(edges.select(FF.col("sb").alias("n"), FF.col("sa").alias("m")))
    deg = und.groupBy("n").agg(FF.count(FF.lit(1)).alias("d"))
    pairs = (
        und.join(deg.select("n", FF.col("d").alias("dj")), "n")
        .join(deg.select(FF.col("n").alias("m"), FF.col("d").alias("dk")), "m")
        .toPandas()
    )
    r = np.corrcoef(pairs["dj"], pairs["dk"])[0, 1]
    assert r < 0  # star drives disassortativity


# ------------------------------------------------------- KS drift


def test_ks_drift_matches_numpy(spark, sf_dir):
    out = mleval.q_events_ks_drift(spark, sf_dir).collect()[0]
    ev = _pdf(spark, sf_dir, "events")
    v = (ev["value"] * 100).round().astype("int64")
    early = ev["ts"] < pd.Timestamp("2024-01-16")
    a = np.sort(v[early].to_numpy())
    b = np.sort(v[~early].to_numpy())
    grid = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(a, grid, side="right")
    f2 = np.searchsorted(b, grid, side="right")
    dn = np.abs(f1 * len(b) - f2 * len(a))
    assert out["n1"] == len(a) and out["n2"] == len(b)
    assert out["d_num"] == int(dn.max())
    k = int(np.lexsort((grid, -dn))[0])
    assert out["argmax_v"] == int(grid[k])
    d = dn.max() / (len(a) * len(b))
    assert out["k_stat_r"] == pytest.approx(
        d * np.sqrt(len(a) * len(b) / (len(a) + len(b))), abs=1e-5
    )


# ------------------------------------------------------- runs test


def test_runs_test_matches_direct_python(spark, sf_dir):
    out = mleval.q_orders_runs_test(spark, sf_dir).collect()[0]
    od = _pdf(spark, sf_dir, "orders")
    rev = (
        od.assign(rev=od["o_totalprice"].round(2))
        .groupby(od["o_orderdate"].dt.date)["rev"]
        .sum()
        .sort_index()
    )
    n = len(rev)
    med = np.sort(rev.to_numpy())[(n + 1) // 2 - 1]
    s = (rev.to_numpy() > med).astype(int)
    runs = 1 + int((s[1:] != s[:-1]).sum())
    n1 = int(s.sum())
    n2 = n - n1
    mu = 2 * n1 * n2 / n + 1
    var = (2 * n1 * n2 * (2 * n1 * n2 - n)) / (n * n * (n - 1))
    assert (out["n_days"], out["n_above"], out["n_runs"]) == (n, n1, runs)
    assert out["mu_r"] == pytest.approx(mu, abs=1e-4)
    assert out["z_r"] == pytest.approx((runs - mu) / np.sqrt(var), abs=1e-4)
