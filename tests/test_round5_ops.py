"""Round-5 tests: the ADVICE-r4 hardening fixes plus the new gate surface.

Covers: the events-ts probe (all-part-files agreement, mtime-keyed cache,
stats-less one-row fallback for the [2000,2100] bounds guard), the
mixture_sample zero-token guard, the dedup_lines_global winner-encoding
range assertion, the double-denominator regression slope, and the new
kmeans_iterate / metadata_scan gate entries."""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row, functions as F
from pyspark.errors import SparkRuntimeException

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import dedup, sampling
from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources import catalog


# ------------------------------------------------- events-ts probe hardening


def _write_ts_parquet(path, ts_values, unit="us", write_statistics=True):
    arr = pa.array(ts_values, type=pa.timestamp(unit))
    tbl = pa.table({"event_id": pa.array(range(len(ts_values)), pa.int64()), "ts": arr})
    pq.write_table(tbl, path, write_statistics=write_statistics)


def test_probe_statsless_file_still_trips_bounds(tmp_path):
    # A re-encoded file written WITHOUT footer stats must not silently
    # skip the [2000, 2100] sanity guard (VERDICT r4 item 8): the probe
    # falls back to reading one row.
    bad = str(tmp_path / "events_bad.parquet")
    _write_ts_parquet(
        bad, [datetime.datetime(1970, 1, 2)], write_statistics=False
    )
    with pytest.raises(ValueError, match="sanity check failed"):
        catalog.probe_events_ts_type(bad)


def test_probe_statsless_file_in_range_passes(tmp_path):
    ok = str(tmp_path / "events_ok.parquet")
    _write_ts_parquet(
        ok, [datetime.datetime(2024, 6, 1)], write_statistics=False
    )
    assert catalog.probe_events_ts_type(ok) == "timestamp[us]"


def test_probe_rejects_mixed_encodings(tmp_path):
    d = tmp_path / "events.parquet"
    d.mkdir()
    _write_ts_parquet(str(d / "part-0.parquet"), [datetime.datetime(2024, 1, 1)], unit="us")
    _write_ts_parquet(str(d / "part-1.parquet"), [datetime.datetime(2024, 1, 1)], unit="ms")
    with pytest.raises(ValueError, match="mixed events.ts encodings"):
        catalog.probe_events_ts_type(str(d))


def test_probe_cache_invalidated_on_rewrite(tmp_path):
    # Regenerating a file in place must re-probe (mtime-keyed cache), not
    # serve the stale vintage.
    f = str(tmp_path / "events.parquet")
    _write_ts_parquet(f, [datetime.datetime(2024, 1, 1)], unit="us")
    assert catalog.probe_events_ts_type(f) == "timestamp[us]"
    _write_ts_parquet(f, [datetime.datetime(2024, 1, 1)], unit="ms")
    os.utime(f, (os.path.getmtime(f) + 5, os.path.getmtime(f) + 5))
    assert catalog.probe_events_ts_type(f) == "timestamp[ms]"


# ------------------------------------------------ mixture zero-token source


def test_mixture_sample_zero_token_source_dropped(spark):
    # A weighted source whose token total is 0 must keep NOTHING (NULL
    # ratio would previously make least() skip it → keep everything).
    rows = [Row(doc_id=i, source="empty", n_tok=0) for i in range(20)]
    rows += [Row(doc_id=100 + i, source="web", n_tok=10) for i in range(20)]
    df = spark.createDataFrame(rows)
    out = sampling.mixture_sample(
        df, "doc_id", "source", F.col("n_tok"),
        weights={"empty": 0.5, "web": 0.5}, budget_frac=0.5,
    )
    srcs = {r["source"] for r in out.collect()}
    assert "empty" not in srcs
    assert "web" in srcs


# ------------------------------------- dedup_lines_global encoding guard


def test_dedup_lines_global_rejects_out_of_range_doc(spark):
    df = spark.createDataFrame(
        [Row(doc_id=-1, text="dup line\ndup line"),
         Row(doc_id=2, text="dup line")]
    )
    with pytest.raises(SparkRuntimeException, match="winner encoding"):
        dedup.dedup_lines_global(df, "doc_id", "text").collect()


def test_dedup_lines_global_in_range_still_correct(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="footer\nbody one"),
         Row(doc_id=2, text="footer\nbody two")]
    )
    out = {r["doc_id"]: r for r in dedup.dedup_lines_global(df, "doc_id", "text").collect()}
    assert out[1]["text_clean"] == "footer\nbody one"
    assert out[2]["text_clean"] == "body two"


# --------------------------------------------- regression slope in double


def test_regression_slope_survives_bigint_overflow_scale(spark):
    # Denominator n*sxx - sx² at int64-wrapping magnitudes: with the
    # double-cast fix the slope comes out finite and correct-signed
    # instead of silently wrapped. x ~ 4e9 so sxx ~ 1.6e19 > int64 max.
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import relational5  # noqa: F401

    rows = [(float(4_000_000_000 + i), 2.0 * (4_000_000_000 + i)) for i in range(3)]
    df = spark.createDataFrame(rows, ["x", "y"])
    m = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("bigint")).alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("double")).alias("sxx_d"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n").cast("double") * F.col("sxx_d")
        - F.col("sx").cast("double") * F.col("sx")
    )
    got = m.select(slope.alias("s")).first()["s"]
    assert got == pytest.approx(2.0, rel=1e-6)


# ----------------------------------------------------------- kmeans_iterate


def test_kmeans_iterate_converges_on_separated_clusters(spark):
    # Two well-separated blobs; bad initial centroids (both inside blob A's
    # half-space ordering). After 2 full Lloyd iterations the centroids
    # must equal the exact blob means — the loop actually closes.
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import similarity

    pts = [
        (1, [0.0, 0.0]), (2, [0.0, 2.0]), (3, [2.0, 0.0]), (4, [2.0, 2.0]),
        (5, [100.0, 100.0]), (6, [100.0, 102.0]),
        (7, [102.0, 100.0]), (8, [102.0, 102.0]),
    ]
    vecs = spark.createDataFrame(pts, ["vec_id", "v"])
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])], ["centroid_id", "v"]
    )
    out = {
        r["cluster_id"]: (r["n"], r["centroid"])
        for r in similarity.kmeans_iterate(
            vecs, cents, "vec_id", "v", iterations=2, dim=2
        ).collect()
    }
    assert out[0] == (4, [1.0, 1.0])
    assert out[1] == (4, [101.0, 101.0])


def test_kmeans_iterate_rejects_zero_iterations(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import similarity

    with pytest.raises(ValueError, match="iterations"):
        similarity.kmeans_iterate(None, None, "a", "b", iterations=0)


# ------------------------------------------------------------ dedup_semantic


def test_dedup_semantic_within_cluster_only(spark):
    # Two tight clusters far apart: near-identical vectors in the same
    # cluster dedup (keep smallest id); cross-cluster similarity is never
    # even computed. Unit-norm 2-d vectors.
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    vecs = spark.createDataFrame(
        [
            (10, unit(0.00)), (11, unit(0.01)), (12, unit(0.02)),
            (20, unit(math.pi / 2)), (21, unit(math.pi / 2 + 0.01)),
        ],
        ["vec_id", "v"],
    )
    cents = spark.createDataFrame(
        [(0, unit(0.0)), (1, unit(math.pi / 2))], ["centroid_id", "v"]
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import dedup

    out = {
        r["vec_id"]: r["dup_of"]
        for r in dedup.dedup_semantic(
            vecs, cents, "vec_id", "v", threshold=0.99
        ).collect()
    }
    # 11 and 12 dup to 10; 21 dups to 20; 10 and 20 survive
    assert out == {11: 10, 12: 10, 21: 20}


# ---------------------------------------------------- timeseries operators


def test_resample_ffill_fills_gaps_and_flags(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import timeseries

    obs = spark.createDataFrame(
        [
            ("a", datetime.datetime(2024, 1, 1, 0), 1.0),
            ("a", datetime.datetime(2024, 1, 1, 3), 4.0),
            ("b", datetime.datetime(2024, 1, 1, 5), 9.0),
        ],
        ["k", "h", "v"],
    )
    out = timeseries.resample_ffill(obs, "k", "h", "v", step="1 hour")
    rows = {(r["k"], r["h"].hour): (r["v"], r["is_gap"]) for r in out.collect()}
    # key a: 4 grid hours 0..3, hours 1-2 are filled gaps carrying 1.0
    assert rows[("a", 0)] == (1.0, 0)
    assert rows[("a", 1)] == (1.0, 1)
    assert rows[("a", 2)] == (1.0, 1)
    assert rows[("a", 3)] == (4.0, 0)
    # key b: single observation => single grid row, no gaps
    assert rows[("b", 5)] == (9.0, 0)
    assert len(rows) == 5


def test_resample_ffill_span_guard_raises(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import timeseries

    obs = spark.createDataFrame(
        [
            ("a", datetime.datetime(1970, 1, 1), 0.0),
            ("a", datetime.datetime(2024, 1, 1), 1.0),
        ],
        ["k", "h", "v"],
    )
    out = timeseries.resample_ffill(obs, "k", "h", "v", step="1 hour", max_steps=100)
    with pytest.raises(Exception, match="max_steps"):
        out.collect()


def test_mad_outliers_flags_only_the_spike(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import timeseries

    vals = [float(x) for x in (10, 11, 12, 13, 14, 1000)]
    df = spark.createDataFrame([("t", v) for v in vals], ["g", "v"])
    stats, flagged = timeseries.mad_outliers(df, "g", "v", k=3.0)
    st = stats.collect()[0]
    assert st["med"] == 12.5  # median of 6 values interpolates
    outliers = {r["v"] for r in flagged.collect() if r["is_outlier"] == 1}
    assert outliers == {1000.0}


def test_winsorize_clamps_to_band(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import timeseries

    df = spark.createDataFrame(
        [("t", float(v)) for v in range(1, 101)], ["g", "v"]
    )
    out = timeseries.winsorize(df, "g", "v", lower_p=0.05, upper_p=0.95)
    rows = out.collect()
    lo, hi = rows[0]["lo"], rows[0]["hi"]
    assert lo < hi
    assert all(lo <= r["winsorized"] <= hi for r in rows)
    # interior values untouched
    assert all(
        r["winsorized"] == r["v"] for r in rows if lo <= r["v"] <= hi
    )


# ------------------------------------------------- text LM / entropy / best


def test_unigram_lm_scores_known_corpus(spark):
    import math

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import text as t

    # corpus: 4 tokens total -> p(a)=3/4, p(b)=1/4
    df = spark.createDataFrame([(1, "a a a"), (2, "b")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in t.unigram_lm_scores(df, "doc_id", "text").collect()}
    assert out[1]["n_tokens"] == 3
    assert out[1]["nll_r"] == pytest.approx(-math.log(0.75), abs=1e-6)
    assert out[2]["nll_r"] == pytest.approx(-math.log(0.25), abs=1e-6)


def test_token_entropy_uniform_vs_repetitive(spark):
    import math

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import text as t

    df = spark.createDataFrame(
        [(1, "x x x x"), (2, "a b c d")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in t.token_entropy(df, "doc_id", "text").collect()}
    assert out[1]["entropy_r"] == 0.0  # all-same tokens: zero entropy
    assert out[2]["entropy_r"] == pytest.approx(math.log(4), abs=1e-6)
    assert out[2]["n_tokens"] == 4


def test_keep_best_per_cluster_prefers_score_then_id(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import dedup as d

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], ["node", "label"]
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (7, 0.5), (8, 0.5)],
        ["doc_id", "q"],
    )
    out = {
        r["label"]: (r["keeper_id"], r["n_members"], r["best_score"])
        for r in d.keep_best_per_cluster(clusters, scores, "doc_id", "q").collect()
    }
    assert out[1] == (2, 3, 0.9)  # highest score wins; tie broken by id
    assert out[7] == (7, 2, 0.5)


# --- round-5b: stats / fuzzy linkage / int8 ANN -------------------------


def test_pareto_frontier_standard_dominance(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import stats as st

    # (x, y): (3,10) frontier; (2,10) dominated by (3,10) [x', y equal];
    # (3,5) dominated same-x by (3,10); (1,20) frontier (best y);
    # (3,10) duplicate survives too (ties in both dims never dominate).
    df = spark.createDataFrame(
        [(1, 1, 20), (2, 2, 10), (3, 3, 10), (4, 3, 5), (5, 3, 10)],
        ["id", "x", "y"],
    )
    kept = sorted(
        r["id"]
        for r in st.pareto_frontier(df, "x", "y", ["id"]).collect()
    )
    assert kept == [1, 3, 5]


def test_correlation_matrix_matches_numpy(spark):
    import numpy as np

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import stats as st

    rng = np.random.RandomState(7)
    a = rng.rand(200)
    b = 2.0 * a + rng.rand(200) * 0.1
    c = rng.rand(200)
    df = spark.createDataFrame(
        [(float(x), float(y), float(z)) for x, y, z in zip(a, b, c)],
        ["a", "b", "c"],
    )
    out = {
        (r["col_a"], r["col_b"]): (r["n"], r["corr_r"])
        for r in st.correlation_matrix(df, ["a", "b", "c"]).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")][0] == 200
    assert out[("a", "b")][1] == pytest.approx(
        float(np.corrcoef(a, b)[0, 1]), abs=1e-6
    )
    assert out[("b", "c")][1] == pytest.approx(
        float(np.corrcoef(b, c)[0, 1]), abs=1e-6
    )


def test_fuzzy_best_match_blocking_and_threshold(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import joins as j

    left = spark.createDataFrame(
        [(1, "red widget"), (2, "blue bolt"), (3, "gold ring")],
        ["id", "name"],
    )
    right = spark.createDataFrame(
        [
            (10, "red widget"),   # exact dup of 1
            (11, "rad widget"),   # dist 1 from 1 — loses to exact
            (20, "blue volt"),    # dist 1 from "blue bolt"? b->v: 1
            (30, "gold sprocket"),  # different block noun — never paired
        ],
        ["id", "name"],
    )
    out = {
        r["left_id"]: (r["right_id"], r["dist"])
        for r in j.fuzzy_best_match(
            left, right, "id", "id", "name", max_dist=3
        ).collect()
    }
    assert out[1] == (10, 0)  # exact beats dist-1
    assert 2 not in out  # "volt" vs "bolt" is a different block noun
    assert 3 not in out  # no "ring"-block candidate within threshold


def test_fuzzy_best_match_block_cap_drops_hot_block(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import joins as j

    # r11 distinct-name collapse: the cap now guards DISTINCT-NAME
    # blocks (identical names collapse to one entry and are never a
    # quadratic risk), so the hot block must carry 6 DISTINCT names
    # sharing the (tail-token, length-bucket) key
    left = spark.createDataFrame([(1, "aa widget")], ["id", "name"])
    right = spark.createDataFrame(
        [(10 + i, f"a{c} widget") for i, c in enumerate("bcdefg")],
        ["id", "name"],
    )
    capped = j.fuzzy_best_match(
        left, right, "id", "id", "name", max_dist=3, block_cap=3
    ).collect()
    assert capped == []  # 6-name block > cap of 3 → dropped, not scored
    uncapped = j.fuzzy_best_match(
        left, right, "id", "id", "name", max_dist=3
    ).collect()
    assert uncapped[0]["right_id"] == 10
    # identical-name fan-in collapses instead of tripping the cap: ONE
    # distinct right name never exceeds any cap, every left row matches
    fanin = spark.createDataFrame(
        [(i, "a widget") for i in range(10, 16)], ["id", "name"]
    )
    out = j.fuzzy_best_match(
        left, fanin, "id", "id", "name", max_dist=3, block_cap=3
    ).collect()
    assert len(out) == 1 and out[0]["right_id"] == 10


def test_sq_int8_codes_bounded_and_extremes(spark):
    from pyspark.sql import functions as F

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import similarity as s

    df = spark.createDataFrame(
        [(0, [0.0, -1.0]), (1, [10.0, 1.0]), (2, [5.0, 0.0]), (3, [2.5, 1.0])],
        ["vec_id", "embedding"],
    )
    stats = s.sq_int8_stats(df, "embedding", dim=2)
    assert stats.collect()[0]["gmax"] == 10.0  # global max |component|
    q = {
        r["vec_id"]: r["qvec"]
        for r in s.sq_int8_quantize(df, "embedding", stats).collect()
    }
    # symmetric codes: q = round(v * 127 / gmax); sign preserved, the
    # largest-magnitude component maps to +/-127
    assert q[0] == [0, -13]
    assert q[1] == [127, 13]
    assert q[2] == [64, 0]  # 63.5 rounds half-away-from-zero to 64
    assert q[3][0] == 32  # round(31.75)
    # codes always within [-127, 127]
    assert all(-127 <= v <= 127 for qv in q.values() for v in qv)


def test_sq_int8_topk_agrees_with_exact_on_separated_corpus(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import similarity as s

    # Well-separated unit-ish vectors: quantized ranking == exact ranking.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = df.where("vec_id = 0")
    got = [
        r["corpus_id"]
        for r in s.sq_int8_topk(
            df, queries, "vec_id", "embedding", k=4, dim=4
        ).orderBy("rnk").collect()
    ]
    exact = [
        r["corpus_id"]
        for r in s.cosine_topk_exact_baseline(
            df, queries, "vec_id", "embedding", k=4
        ).orderBy("rnk").collect()
    ]
    assert got == exact == [1, 2, 3, 4]


def test_equidepth_histogram_ties_and_depth(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import stats as st

    # 12 rows over 4 distinct values; 4 appears 6x and must stay in ONE
    # bucket even though a row-equal split would straddle.
    rows = [(1,)] * 2 + [(2,)] * 2 + [(3,)] * 2 + [(4,)] * 6
    df = spark.createDataFrame(rows, ["v"])
    out = {
        r["bucket"]: (r["n_rows"], r["min_v"], r["max_v"])
        for r in st.equidepth_histogram(df, "v", n_buckets=3).collect()
    }
    # cb: 1->0, 2->2, 3->4, 4->6 ; bucket = cb*3 div 12 + 1 = 1,1,2,2
    assert out == {1: (4, 1, 2), 2: (8, 3, 4)}
    total = sum(v[0] for v in out.values())
    assert total == 12


def test_snapshot_diff_classifies_and_prunes_shared_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.snapshots import (
        SnapshotTable,
        diff_pruned_files,
        snapshot_diff,
    )

    t = SnapshotTable(str(tmp_path / "cdc"))
    base = spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(100)], ["k", "s", "x"]
    )
    t.append(base.repartition(8))
    src = spark.createDataFrame(
        [
            (3, "v3", 99.0, False),   # update (x changes)
            (7, "v7", 7.0, True),     # delete
            (200, "v200", 200.0, False),  # insert
            (11, "v11", 11.0, False),  # upsert with identical values
        ],
        ["k", "s", "x", "__del"],
    )
    t.merge(spark, src, keys=["k"], delete_col="__del")

    only_f, only_t, shared = diff_pruned_files(t, 0, 1)
    assert shared, "merge must carry untouched files by reference"
    assert only_f and only_t, "merge must rewrite the touched files"

    d = {
        r["k"]: r["change_op"]
        for r in snapshot_diff(t, spark, 0, 1, keys=["k"]).collect()
    }
    # 11's rewrite produced identical values -> not a change; neighbors in
    # rewritten files cancel via the null-safe struct equality.
    assert d == {3: "update", 7: "delete", 200: "insert"}
    upd = (
        snapshot_diff(t, spark, 0, 1, keys=["k"])
        .where(F.col("k") == 3)
        .select("old_values.x", "new_values.x")
        .collect()[0]
    )
    assert upd[0] == 3.0 and upd[1] == 99.0


def test_snapshot_diff_reverse_direction(spark, tmp_path):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.snapshots import (
        SnapshotTable,
        snapshot_diff,
    )

    t = SnapshotTable(str(tmp_path / "cdc2"))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "s"]))
    t.overwrite(spark.createDataFrame([(2, "B"), (3, "c")], ["k", "s"]))
    fwd = {
        r["k"]: r["change_op"]
        for r in snapshot_diff(t, spark, 0, 1, keys=["k"]).collect()
    }
    rev = {
        r["k"]: r["change_op"]
        for r in snapshot_diff(t, spark, 1, 0, keys=["k"]).collect()
    }
    assert fwd == {1: "delete", 2: "update", 3: "insert"}
    assert rev == {1: "insert", 2: "update", 3: "delete"}


def test_bpe_train_merges_known_corpus(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import text as tx

    # Hand-computed: counts low:3 lower:1 newest:2.
    # Round 1 pairs: (l,o):4 (o,w):4 (w,e):3 (n,e):2 (e,w):2 (e,s):2
    # (s,t):2 (e,r):1 -> tie at 4 broken by pair asc -> (l,o).
    # Round 2: (lo,w):4 wins. Round 3: five pairs tie at 2 -> (e,s).
    docs = spark.createDataFrame(
        [(1, "low low low lower"), (2, "newest newest")],
        ["doc_id", "text"],
    )
    out = [
        (r["step"], r["pair_a"], r["pair_b"], r["merged"], r["weight"])
        for r in tx.bpe_train_merges(docs, "text", n_merges=3).collect()
    ]
    assert out == [
        (1, "l", "o", "lo", 4),
        (2, "lo", "w", "low", 4),
        (3, "e", "s", "es", 2),
    ]


def test_bpe_train_merges_rejects_zero(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import text as tx

    with pytest.raises(ValueError, match="n_merges"):
        tx.bpe_train_merges(None, "text", n_merges=0)


def test_recall_report_counts_hits_and_misses(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import similarity as s

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21), (2, 22)],
        ["query_id", "corpus_id"],
    )
    approx = spark.createDataFrame(
        # query 1: 2/3 hits; query 2: 0/3 (approx found only strangers)
        [(1, 10), (1, 12), (1, 99), (2, 98), (2, 97), (2, 96)],
        ["query_id", "corpus_id"],
    )
    out = {
        r["query_id"]: (r["hits"], r["k"], r["recall_r"])
        for r in s.recall_report(approx, exact).collect()
    }
    assert out[1] == (2, 3, pytest.approx(2 / 3, abs=1e-6))
    assert out[2] == (0, 3, 0.0)


def test_ivf_sq_matches_int8_within_bucket_and_prunes(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import plans
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import similarity as s
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    path = str(tmp_path / "ivfsq")
    got = s.ivf_sq_topk(
        spark, path, emb, queries, "vec_id", "embedding", k=3, dim=64
    )
    # Composition contract: identical to the full int8 ranking restricted
    # to same-bucket candidates.
    stats = s.sq_int8_stats(emb, "embedding", dim=64)
    bq = s.sq_int8_quantize(
        emb.select("vec_id", "embedding", s.bucket_id("embedding").alias("b")),
        "embedding",
        stats,
        "qv",
    )
    c = bq.select(
        F.col("vec_id").alias("corpus_id"), F.col("qv").alias("cq"), "b"
    )
    q = bq.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq"),
        F.col("b").alias("bq_"),
    )
    from pyspark.sql import Window

    j = c.join(q, (F.col("b") == F.col("bq_")) & (F.col("query_id") != F.col("corpus_id")))
    dot = F.aggregate(
        F.zip_with("qq", "cq", lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qdot").desc(), F.col("corpus_id").asc()
    )
    want = (
        j.withColumn("qdot", dot)
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("query_id", "corpus_id", "qdot", "rnk")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # The probe must partition-prune to the query buckets.
    plan = plans.formatted_plan(got)
    assert "PartitionFilters: [" in plan and "bucket" in plan


def test_bpe_encode_counts_known_corpus(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import text as tx

    docs = spark.createDataFrame(
        [(1, "low low low lower"), (2, "newest newest")],
        ["doc_id", "text"],
    )
    merges = tx.bpe_train_merges(docs, "text", n_merges=3)
    # merges: (l,o) -> (lo,w) -> (e,s). Encodings: low -> [low] (1 tok);
    # lower -> [low, e, r] (3); newest -> [n, e, w, es, t] (5).
    out = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in tx.bpe_encode_counts(docs, "doc_id", "text", merges).collect()
    }
    assert out[1] == (4, 3 * 1 + 3)
    assert out[2] == (2, 2 * 5)


def test_basket_rules_measures_and_cap(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import stats as st

    # 4 baskets: {a,b} x3, {a,c} x1 -> pair (a,b) co=3; confidence
    # a->b = 3/4, b->a = 3/3; lift(a,b) = (3*4)/(4*3) = 1.0,
    # lift(b,a) = (3*4)/(3*4) = 1.0.
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "a"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = {
        (r["item_a"], r["item_b"]): (r["co"], r["confidence_r"], r["lift_r"])
        for r in st.basket_rules(
            df, "basket", "item", min_support_count=2
        ).collect()
    }
    assert out[("a", "b")] == (3, 0.75, 1.0)
    assert out[("b", "a")] == (3, 1.0, 1.0)
    assert ("a", "c") not in out  # below min support

    # mega-basket cap: a 3-item basket dropped with cap=2 removes pairs
    capped = st.basket_rules(
        spark.createDataFrame(
            [(1, "x"), (1, "y"), (1, "z"), (2, "x"), (2, "y")],
            ["basket", "item"],
        ),
        "basket",
        "item",
        min_support_count=2,
        max_basket_size=2,
    ).collect()
    assert capped == []  # only basket 2 survives; co=1 < min_support


def test_normalize_scores_per_group_percentiles(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import stats as st

    df = spark.createDataFrame(
        [
            (1, "web", 0.1), (2, "web", 0.5), (3, "web", 0.9),
            (4, "book", 0.5),  # singleton group -> 0.0
            (5, "wiki", 0.3), (6, "wiki", 0.3),  # tie -> id breaks
        ],
        ["doc_id", "src", "score"],
    )
    out = {
        r["doc_id"]: r["pct_r"]
        for r in st.normalize_scores_per_group(
            df, "src", "score", "doc_id"
        ).collect()
    }
    assert out[1] == 0.0 and out[2] == 0.5 and out[3] == 1.0
    assert out[4] == 0.0
    assert out[5] == 0.0 and out[6] == 1.0


def test_ewma_half_recurrence_and_singleton(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import timeseries as ts

    df = spark.createDataFrame(
        # series 8, 4, 2: ewma = ((8/2 + 4/2)=6 -> 6/2 + 2/2 = 4.0
        [(1, 1, 8.0), (1, 2, 4.0), (1, 3, 2.0), (2, 1, 7.5)],
        ["k", "t", "v"],
    )
    out = {
        r["k"]: (r["n_points"], r["last_r"], r["ewma_r"])
        for r in ts.ewma_half(df, "k", "t", "v").collect()
    }
    assert out[1] == (3, 2.0, 4.0)
    assert out[2] == (1, 7.5, 7.5)  # ewma of a singleton is the value


def test_negative_pairs_deterministic_no_self(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import sampling as sp

    ids = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
    a = sp.negative_pairs(ids, "doc_id", k=3).collect()
    b = sp.negative_pairs(ids, "doc_id", k=3).collect()
    assert a == b  # reproducible
    assert len(a) == 150  # dense ids: exactly k per anchor
    assert all(r["neg_id"] != r["doc_id"] for r in a)  # no self-pairs
    assert all(0 <= r["neg_id"] < 50 for r in a)


def test_top_paths_sessionizes_and_truncates(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import analytics

    out = analytics.q_events_top_paths(spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    # paths are at most 5 steps and counts are descending
    assert all(len(r["path"].split(">")) <= 5 for r in out)
    counts = [r["n_sessions"] for r in out]
    assert counts == sorted(counts, reverse=True)


def test_join_plan_advisor_recommendations(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import joins as j

    fact = spark.createDataFrame(
        [(i % 100, i) for i in range(5000)], ["k", "v"]
    )
    dim = spark.createDataFrame([(i, i) for i in range(100)], ["k", "d"])
    # small right side -> broadcast
    r = j.join_plan_advisor(fact, dim, "k", "k", broadcast_row_limit=1000)
    row = r.collect()[0]
    assert row["recommendation"] == "broadcast_right"
    assert row["out_rows"] == 5000  # each fact row matches exactly one dim

    # skewed self-join, broadcast budget exhausted -> salt
    skewed = spark.createDataFrame(
        [(0, i) for i in range(900)] + [(i, i) for i in range(1, 101)],
        ["k", "v"],
    )
    row = j.join_plan_advisor(
        skewed, skewed, "k", "k", broadcast_row_limit=10
    ).collect()[0]
    assert row["recommendation"] == "salt"
    assert row["out_rows"] == 900 * 900 + 100  # hot key square + singletons
    assert row["l_hot_x_mean_r"] > 10

    # balanced fact-fact, nothing broadcastable -> shuffle
    row = j.join_plan_advisor(
        fact, fact, "k", "k", broadcast_row_limit=10
    ).collect()[0]
    assert row["recommendation"] == "shuffle"


def test_maintain_agg_view_matches_recompute(spark, tmp_path):
    from pyspark.sql import functions as F

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import views
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.snapshots import (
        SnapshotTable,
        snapshot_diff,
    )

    t = SnapshotTable(str(tmp_path / "ivm"))
    base = spark.createDataFrame(
        [(i, "g" + str(i % 3), float(i)) for i in range(30)],
        ["k", "g", "x"],
    )
    t.append(base.repartition(4))
    # update k=3 (+100), delete k=7, insert k=100 into g1, and delete the
    # ONLY member of a brand-new group to test group drop-out: first add
    # k=200 in its own group, then remove it in the same merge? -> two
    # merges: add, then remove.
    t.merge(
        spark,
        spark.createDataFrame(
            [(3, "g0", 103.0, False), (7, "g1", 7.0, True),
             (100, "g1", 100.0, False), (200, "gz", 1.0, False)],
            ["k", "g", "x", "d"],
        ),
        keys=["k"],
        delete_col="d",
    )
    t.merge(
        spark,
        spark.createDataFrame([(200, "gz", 1.0, True)], ["k", "g", "x", "d"]),
        keys=["k"],
        delete_col="d",
    )
    view0 = views.agg_view(t.read(spark, 0), "g", "x")
    d01 = snapshot_diff(t, spark, 0, 1, keys=["k"])
    v1_maint = views.maintain_agg_view(view0, d01, "g", "x")
    d12 = snapshot_diff(t, spark, 1, 2, keys=["k"])
    v2_maint = views.maintain_agg_view(v1_maint, d12, "g", "x")

    v2_true = views.agg_view(t.read(spark, 2), "g", "x")
    got = {
        r["g"]: (r["n_rows"], float(r["__sum_dec"]))
        for r in v2_maint.collect()
    }
    want = {
        r["g"]: (r["n_rows"], float(r["__sum_dec"]))
        for r in v2_true.collect()
    }
    assert got == want
    assert "gz" not in got  # zero-count group dropped out exactly


def test_customers_abc_partitions_and_shares(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import analytics

    out = {r["cls"]: r for r in analytics.q_customers_abc(spark, sf_dir).collect()}
    assert set(out) == {"A", "B", "C"}
    # shares sum to 1 and each class sits inside its band
    total = sum(r["rev_share_r"] for r in out.values())
    assert total == pytest.approx(1.0, abs=1e-5)
    assert out["A"]["rev_share_r"] <= 0.5 + 1e-6
    # every distinct paying customer lands in exactly one class
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import load_table

    n_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in out.values()) == n_cust
    # A members average more revenue per head than C members (the ranking
    # worked), even on near-uniform synthetic data
    per_head = {
        c: out[c]["rev_share_r"] / out[c]["n_customers"] for c in out
    }
    assert per_head["A"] > per_head["C"]


def test_events_markov_rows_are_probabilities(spark, sf_dir):
    from collections import defaultdict

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import analytics

    rows = analytics.q_events_markov(spark, sf_dir).collect()
    by_from = defaultdict(float)
    for r in rows:
        assert 0.0 < r["p_r"] <= 1.0
        by_from[r["t_from"]] += r["p_r"]
    # each source state's outgoing probabilities sum to ~1
    for s, tot in by_from.items():
        assert tot == pytest.approx(1.0, abs=1e-4), s


def test_benford_shares_and_chi2(spark, sf_dir):
    import math

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import analytics

    rows = analytics.q_orders_benford(spark, sf_dir).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert sum(r["obs_share_r"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    for r in rows:
        assert r["benford_r"] == pytest.approx(
            math.log10(1 + 1 / r["digit"]), abs=1e-6
        )
        assert r["chi2_part_r"] >= 0


def test_ab_test_counts_and_z_sign(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import analytics

    r = analytics.q_events_ab_test(spark, sf_dir).collect()[0]
    assert 0 < r["ca"] < r["na"] and 0 < r["cb"] < r["nb"]
    # z sign agrees with the rate difference
    diff = r["rate_a_r"] - r["rate_b_r"]
    assert (r["z_r"] > 0) == (diff > 0) or diff == 0


def test_link_prediction_jaccard_square_graph(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import graph as g

    # Square 1-2-3-4-1: each diagonal pair (1,3) and (2,4) shares BOTH
    # neighbors -> common=2, deg 2+2 - 2 = 2 -> jaccard 1.0; adjacent
    # pairs are excluded (they are edges).
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], ["src", "dst"]
    )
    out = {
        (r["a"], r["b"]): (r["common"], r["jaccard_r"])
        for r in g.link_prediction_jaccard(edges).collect()
    }
    assert out == {(1, 3): (2, 1.0), (2, 4): (2, 1.0)}

    # hub cap: star center 0 connected to 1..5 — every leaf pair is a
    # candidate through the hub; capping max_degree below 5 removes the
    # hub from the wedge middle and leaves no candidates.
    star = spark.createDataFrame([(0, i) for i in range(1, 6)], ["src", "dst"])
    assert g.link_prediction_jaccard(star, max_degree=4).collect() == []
    assert len(g.link_prediction_jaccard(star).collect()) == 10


def test_price_index_base_month_is_one(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import analytics

    rows = analytics.q_price_index_laspeyres(spark, sf_dir).collect()
    assert rows[0]["index_r"] == pytest.approx(1.0, abs=1e-6)  # base month
    assert all(r["index_r"] > 0 for r in rows)
    months = [r["m"] for r in rows]
    assert months == sorted(months)


def test_gini_known_distributions(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import stats as _  # noqa: F401
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads.analytics import (
        q_supplier_gini,  # noqa: F401  (formula exercised via direct frames)
    )
    from pyspark.sql import Window, functions as F

    def gini(vals):
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], ["k", "rev"]
        )
        w = Window.orderBy(F.col("rev").asc(), F.col("k").asc())
        r = df.withColumn("i", F.row_number().over(w))
        row = r.agg(
            (
                F.lit(2.0) * F.sum(F.col("i") * F.col("rev"))
                / (F.count(F.lit(1)) * F.sum("rev"))
                - (F.count(F.lit(1)) + F.lit(1))
                / F.count(F.lit(1)).cast("double")
            ).alias("g")
        ).collect()[0]
        return row["g"]

    assert gini([5.0] * 10) == pytest.approx(0.0, abs=1e-9)  # equality
    # one supplier owns everything: G -> (n-1)/n
    assert gini([0.0] * 9 + [100.0]) == pytest.approx(0.9, abs=1e-9)


def test_scd2_pit_join_resolves_correct_interval(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import scd

    hist = spark.createDataFrame(
        [
            (1, "bronze", "2024-01-01", "2024-06-01"),
            (1, "gold", "2024-06-01", None),
            (2, "silver", "2024-01-01", None),
        ],
        ["k", "tier", "valid_from", "valid_to"],
    )
    probes = spark.createDataFrame(
        [
            (1, "2024-03-15"),  # inside the closed interval -> bronze
            (1, "2024-06-01"),  # boundary: valid_from inclusive -> gold
            (1, "2023-12-31"),  # before any history -> no row (inner)
            (2, "2025-01-01"),  # open row -> silver
        ],
        ["k", "probe"],
    )
    out = {
        (r["k"], r["probe"]): r["tier"]
        for r in scd.scd2_point_in_time_join(
            probes, hist, ["k"], "probe"
        ).collect()
    }
    assert out == {
        (1, "2024-03-15"): "bronze",
        (1, "2024-06-01"): "gold",
        (2, "2025-01-01"): "silver",
    }
    with pytest.raises(ValueError, match="inner"):
        scd.scd2_point_in_time_join(probes, hist, ["k"], "probe", how="left")


def test_hierarchy_closure_chain_and_depth_guard(spark):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import graph as g

    # chain 1 <- 2 <- 3 <- 4 : ancestors of 4 are 3 (d1), 2 (d2), 1 (d3)
    edges = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3)], ["child", "parent"]
    )
    out = {
        (r["node"], r["anc"]): r["dist"]
        for r in g.hierarchy_closure(edges, max_depth=6).collect()
    }
    assert out == {
        (2, 1): 1, (3, 2): 1, (4, 3): 1,
        (3, 1): 2, (4, 2): 2,
        (4, 1): 3,
    }
    # max_depth truncates silently (documented) — depth 1 keeps direct only
    shallow = g.hierarchy_closure(edges, max_depth=1).collect()
    assert all(r["dist"] == 1 for r in shallow) and len(shallow) == 3
    import pytest as _pt

    with _pt.raises(ValueError, match="max_depth"):
        g.hierarchy_closure(edges, max_depth=0)


def test_rfm_scores_cover_customers_and_quintile_range(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import load_table
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import analytics

    rows = analytics.q_customers_rfm(spark, sf_dir).collect()
    assert all(1 <= r["r"] <= 5 and 1 <= r["f"] <= 5 and 1 <= r["m"] <= 5 for r in rows)
    n_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust


def test_source_vocab_overlap_bounds(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import analytics

    rows = analytics.q_source_vocab_overlap(spark, sf_dir).collect()
    assert rows, "documents table has multiple sources"
    for r in rows:
        assert 0 < r["n_common"] <= min(r["n_a"], r["n_b"])
        assert 0.0 < r["jaccard_r"] <= 1.0
        assert r["src_a"] < r["src_b"]  # canonical pairs, no duplicates
