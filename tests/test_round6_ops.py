"""Round-6 tests: the ADVICE-r5 hardening fixes plus the round's new
scale work.

Covers: maintain_agg_view's group-moving-update split (delete+insert
contributions, no stale old-group aggregates), the ivf_sq corpus
fingerprint (stale index rebuilt when the corpus behind the same path
changes), the snapdiff fixture's crash-safe guard (v0 partial state
self-heals; deeper corruption raises), and negative_pairs k>=1
validation (sequence(1,0) counts DOWN, so k=0 must raise, not emit
bogus slots)."""

from __future__ import annotations

import hashlib
import shutil

import pytest
from pyspark.sql import Row, functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
    sampling,
    views,
)


# ----------------------------------------------- maintain_agg_view moves


def test_maintain_agg_view_splits_group_moving_update(spark):
    # v0 -> v1: key 1 MOVES from group A to group B (same primary key,
    # group column changed — snapshot_diff reports change_op='update'),
    # key 2 is a stable in-group update, key 3 deleted, key 4 inserted.
    df0 = spark.createDataFrame(
        [(1, "A", 3.0), (2, "A", 2.0), (3, "B", 1.0)], ["k", "g", "x"]
    )
    view0 = views.agg_view(df0, "g", "x")
    diff = spark.createDataFrame(
        [
            Row(
                change_op="update",
                new_values=Row(g="B", x=5.0),
                old_values=Row(g="A", x=3.0),
            ),
            Row(
                change_op="update",
                new_values=Row(g="A", x=4.0),
                old_values=Row(g="A", x=2.0),
            ),
            Row(
                change_op="delete",
                new_values=None,
                old_values=Row(g="B", x=1.0),
            ),
            Row(
                change_op="insert",
                new_values=Row(g="C", x=7.0),
                old_values=None,
            ),
        ]
    )
    got = {
        r["g"]: (r["n_rows"], float(r["__sum_dec"]))
        for r in views.maintain_agg_view(view0, diff, "g", "x").collect()
    }
    # v1 truth: A = {key2: 4}, B = {key1: 5}, C = {key4: 7}.
    assert got == {"A": (1, 4.0), "B": (1, 5.0), "C": (1, 7.0)}


def test_maintain_agg_view_move_drains_old_group(spark):
    # The old group must DROP OUT when its last row moves away — the
    # pre-fix code left it with a stale (n=1, sum=3) forever.
    df0 = spark.createDataFrame([(1, "A", 3.0), (2, "B", 9.0)], ["k", "g", "x"])
    view0 = views.agg_view(df0, "g", "x")
    diff = spark.createDataFrame(
        [
            Row(
                change_op="update",
                new_values=Row(g="B", x=3.0),
                old_values=Row(g="A", x=3.0),
            )
        ]
    )
    got = {
        r["g"]: (r["n_rows"], float(r["__sum_dec"]))
        for r in views.maintain_agg_view(view0, diff, "g", "x").collect()
    }
    assert got == {"B": (2, 12.0)}


# -------------------------------------------------- negative_pairs guard


def test_negative_pairs_rejects_k_below_one(spark):
    ids = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="k >= 1"):
        sampling.negative_pairs(ids, "doc_id", k=0)


# ---------------------------------------------- ivf_sq cache fingerprint


def test_ivf_sq_rebuilds_when_corpus_changes(spark, sf_dir, tmp_path):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.operators import (
        similarity as s,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.catalog import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    small = emb.where(F.col("vec_id") < 40)
    path = str(tmp_path / "ivfsq_fp")
    first = s.ivf_sq_topk(
        spark, path, small, queries, "vec_id", "embedding", k=3, dim=64
    ).collect()
    # Same path, different corpus: the fingerprint (count + max id) must
    # invalidate the cached codes/codebook — results equal a fresh build.
    reused = s.ivf_sq_topk(
        spark, path, emb, queries, "vec_id", "embedding", k=3, dim=64
    ).collect()
    fresh = s.ivf_sq_topk(
        spark,
        str(tmp_path / "ivfsq_fresh"),
        emb,
        queries,
        "vec_id",
        "embedding",
        k=3,
        dim=64,
    ).collect()
    assert sorted(map(tuple, reused)) == sorted(map(tuple, fresh))
    assert sorted(map(tuple, reused)) != sorted(map(tuple, first))
    # Unchanged corpus: second call must reuse (results stable).
    again = s.ivf_sq_topk(
        spark, path, emb, queries, "vec_id", "embedding", k=3, dim=64
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, reused))


# ------------------------------------------- snapdiff fixture crash-safety


def _snapdiff_path(sf_dir: str) -> str:
    return f"/tmp/snapdiff_{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}"


def test_snapdiff_fixture_self_heals_from_v0(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.snapshots import (
        SnapshotTable,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
        analytics,
    )

    path = _snapdiff_path(sf_dir)
    want = sorted(
        map(tuple, analytics.q_table_snapshot_diff(spark, sf_dir).collect())
    )
    # Simulate a crash between append and merge: v0-only partial state
    # (with WRONG content, so silent reuse would be visible).
    shutil.rmtree(path, ignore_errors=True)
    t = SnapshotTable(path)
    t.append(
        spark.createDataFrame(
            [(99999991, "F", 1.23)], "o_orderkey bigint, o_orderstatus string, price_r double"
        )
    )
    assert t.latest_version() == 0
    got = sorted(
        map(tuple, analytics.q_table_snapshot_diff(spark, sf_dir).collect())
    )
    assert got == want
    assert SnapshotTable(path).latest_version() == 1


def test_snapdiff_fixture_raises_on_deep_corruption(spark, sf_dir):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.snapshots import (
        SnapshotTable,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.workloads import (
        analytics,
    )

    path = _snapdiff_path(sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    t = SnapshotTable(path)
    one = spark.createDataFrame(
        [(99999991, "F", 1.23)], "o_orderkey bigint, o_orderstatus string, price_r double"
    )
    t.append(one)
    t.append(one)
    t.append(one)
    with pytest.raises(RuntimeError, match="unexpected version"):
        analytics.q_table_snapshot_diff(spark, sf_dir)
    # Restore the shared fixture for other tests / the gate.
    shutil.rmtree(path, ignore_errors=True)
    analytics.q_table_snapshot_diff(spark, sf_dir).limit(1).collect()
