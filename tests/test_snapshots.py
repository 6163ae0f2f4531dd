"""Snapshot-table layer: versioned commits, time travel, schema pinning."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.snapshots import (
    SnapshotTable,
)


def test_append_overwrite_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    assert t.latest_version() is None

    v0 = t.append(spark.range(0, 10).select(F.col("id")))
    v1 = t.append(spark.range(10, 15).select(F.col("id")))
    assert (v0, v1) == (0, 1)
    assert t.read(spark, version=0).count() == 10
    assert t.read(spark).count() == 15  # latest = v1

    v2 = t.overwrite(spark.range(100, 103).select(F.col("id")))
    assert v2 == 2
    assert sorted(r["id"] for r in t.read(spark).collect()) == [100, 101, 102]
    # time travel: v0/v1 still fully readable after the overwrite
    assert t.read(spark, version=1).count() == 15
    assert t.read(spark, version=0).count() == 10
    assert [m["version"] for m in t.history()] == [0, 1, 2]
    assert [m["parent"] for m in t.history()] == [None, 0, 1]


def test_append_rejects_schema_drift(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark.range(5).select(F.col("id")))
    bad = spark.range(5).select(F.col("id").cast("int").alias("id"))
    with pytest.raises(ValueError, match="schema"):
        t.append(bad)


def test_read_plans_from_manifest_not_listing(spark, tmp_path):
    """A data file not referenced by the manifest (e.g. an uncommitted
    writer's leftovers) must be invisible to reads."""
    import shutil, os

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark.range(0, 10).select(F.col("id")))
    # simulate an orphaned (never-committed) data dir
    src = os.path.join(t.data_dir, os.listdir(t.data_dir)[0])
    shutil.copytree(src, os.path.join(t.data_dir, "orphan"))
    assert t.read(spark).count() == 10


def test_compact_and_vacuum(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    for lo in range(0, 50, 10):  # 5 tiny appends → many small files
        t.append(spark.range(lo, lo + 10).select(F.col("id")))
    assert t.latest_version() == 4
    n_files_before = len(t._read_manifest(4)["files"])

    v5 = t.compact(spark, target_files=1)
    assert v5 == 5
    assert len(t._read_manifest(5)["files"]) == 1
    assert sorted(r["id"] for r in t.read(spark).collect()) == list(range(50))
    # time travel intact after compaction
    assert t.read(spark, version=2).count() == 30

    stats = t.vacuum(keep_versions=1)
    assert stats["dropped_versions"] == [0, 1, 2, 3, 4]
    assert stats["removed_files"] >= n_files_before - 1
    # latest still reads; history is gone
    assert t.read(spark).count() == 50
    assert t._versions() == [5]
    with pytest.raises(FileNotFoundError):
        t._read_manifest(0)


def test_schema_evolution_add_column(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark.range(3).select(F.col("id")))
    widened = spark.range(3, 6).select(
        F.col("id"), (F.col("id") * 10).alias("score")
    )
    # refused without the flag, accepted with it
    with pytest.raises(ValueError, match="allow_evolution"):
        t.append(widened)
    v1 = t.append(widened, allow_evolution=True)
    assert v1 == 1

    out = {r["id"]: r["score"] for r in t.read(spark).collect()}
    assert out == {0: None, 1: None, 2: None, 3: 30, 4: 40, 5: 50}
    # old version still reads with its own (narrow) schema
    assert t.read(spark, version=0).columns == ["id"]

    # the recorded table schema marks the added column nullable even though
    # the writer's column was not (old files read as NULL there)
    import json as _json

    assert '"score"' in t._read_manifest(v1)["schema"]

    # destructive changes stay forbidden
    with pytest.raises(ValueError, match="ADD columns"):
        t.append(
            spark.range(2).select(F.col("id").cast("int").alias("id")),
            allow_evolution=True,
        )


def test_merge_copy_on_write(spark, tmp_path):
    """MERGE rewrites ONLY files containing matched keys; untouched files
    carry into the new manifest by reference; deletes and inserts apply;
    the parent version still reads its pre-merge content."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    # two appends -> two separate data files with disjoint key ranges
    t.append(
        spark.range(0, 10)
        .select(F.col("id"), (F.col("id") * 10).alias("v"))
        .coalesce(1)
    )
    t.append(
        spark.range(10, 20)
        .select(F.col("id"), (F.col("id") * 10).alias("v"))
        .coalesce(1)
    )
    files_before = t._read_manifest(1)["files"]

    # source touches only keys 0..4 (first file), deletes key 3,
    # inserts new key 100
    src = spark.createDataFrame(
        [(0, 999, False), (3, 0, True), (4, 444, False), (100, 1000, False)],
        "id long, v long, is_del boolean",
    )
    v2 = t.merge(spark, src, keys=["id"], delete_col="is_del")
    assert v2 == 2
    files_after = t._read_manifest(2)["files"]

    # the second append's file(s) must survive by reference
    second_commit_files = [f for f in files_before if "/c1_" in f or "c1_" in f]
    assert second_commit_files
    assert all(f in files_after for f in second_commit_files)
    # the first file was rewritten: its name must NOT appear in v2
    first_commit_files = [f for f in files_before if "c0_" in f]
    assert all(f not in files_after for f in first_commit_files)

    got = {r["id"]: r["v"] for r in t.read(spark).collect()}
    expect = {i: i * 10 for i in range(20)}
    expect[0] = 999
    expect[4] = 444
    del expect[3]
    expect[100] = 1000
    assert got == expect
    # time travel: parent still reads pre-merge rows
    old = {r["id"]: r["v"] for r in t.read(spark, version=1).collect()}
    assert old == {i: i * 10 for i in range(20)}


def test_merge_many_files_rewrites_only_touched(spark, tmp_path):
    """Driver-footprint contract at scale: with MANY data files, a merge
    touching a handful of keys rewrites only the files containing them —
    every other file carries into the new manifest by reference. The
    touched-file discovery runs in manifest-relative name space (a
    distributed semi join + a collect bounded by the manifest the driver
    already holds), never a collect of full file URIs."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    # one commit, 32 files, keys range-partitioned so each key lives in
    # exactly one file
    t.append(
        spark.range(0, 3200)
        .select(F.col("id"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(32, "id")
    )
    files_before = t._read_manifest(0)["files"]
    assert len(files_before) == 32

    src = spark.createDataFrame([(5, 999, False)], "id long, v long, is_del boolean")
    v1 = t.merge(spark, src, keys=["id"], delete_col="is_del")
    files_after = t._read_manifest(v1)["files"]

    carried = set(files_before) & set(files_after)
    # exactly one file contained key 5 → 31 carried by reference
    assert len(carried) == 31
    got = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert got[5] == 999 and got[6] == 12 and len(got) == 3200


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark.range(0, 5).select(F.col("id"), F.col("id").alias("v")))
    src = spark.createDataFrame([(1, 7), (1, 8)], "id long, v long")
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge(spark, src, keys=["id"])


def test_compact_zorder_clusters_both_dims(spark, tmp_path):
    """compact(zorder_cols=...) = OPTIMIZE ZORDER BY: the rewritten
    version is clustered on both listed columns (file-level min/max
    coverage shrinks on a non-leading dimension), content unchanged,
    history intact."""
    import glob

    import pyarrow.parquet as pq

    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.range(32_000).selectExpr(
        "CAST(id % 64 AS LONG) AS x",
        "CAST(id / 64 AS LONG) AS y",
        "id AS payload",
    )
    t.append(df)
    v = t.compact(spark, target_files=8, zorder_cols=["x", "y"])
    assert v == 1

    files = [
        str(tmp_path / "tbl" / f)
        for f in t._read_manifest(1)["files"]
    ]

    def coverage(col, point):
        total = hit = 0
        for fp in files:
            md = pq.ParquetFile(fp).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                total += 1
                if st.min <= point <= st.max:
                    hit += 1
        return hit / total

    assert coverage("x", 10) < 1.0
    assert coverage("y", 10) < 1.0
    # content identical to v0; v0 still readable
    assert t.read(spark, 1).orderBy("payload").collect() == t.read(
        spark, 0
    ).orderBy("payload").collect()


def test_concurrent_commit_conflict_detected(spark, tmp_path):
    """Optimistic concurrency: a second writer racing for the same
    version gets ConcurrentCommitError, never a silent overwrite."""
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.snapshots import (
        ConcurrentCommitError,
    )

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(spark.range(3).select(F.col("id")))
    # simulate the other writer winning the race for v1
    other = SnapshotTable(str(tmp_path / "tbl"))
    other.append(spark.range(3, 6).select(F.col("id")))
    # this writer still believes the parent is v0 -> its commit of v1
    # must fail loudly
    files = t._read_manifest(0)["files"]
    with pytest.raises(ConcurrentCommitError, match="version 1"):
        t._commit(files, t._read_manifest(0)["schema"], parent=0)
    # the winner's manifest is intact
    assert other.read(spark, 1).count() == 6


# ------------------------------------------------------- branches / tags


def _k(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def test_branch_isolation_and_shared_history(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "br"))
    t.append(_k(spark, 0, 10))
    t.append(_k(spark, 10, 20))
    exp = t.create_branch("exp")
    exp.append(_k(spark, 100, 105))
    t.append(_k(spark, 20, 25))
    # branch sees fork-point history + its own rows, never main's later
    assert sorted(r.k for r in exp.read(spark).collect()) == list(
        range(20)
    ) + list(range(100, 105))
    # main never sees the branch's rows
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(25))
    # branch v0 IS the fork-point snapshot (time travel on the branch)
    assert sorted(r.k for r in exp.read(spark, 0).collect()) == list(range(20))
    assert t.branches() == ["exp"]
    # branching is one manifest, data shared: the branch's v0 file list
    # equals main v1's
    assert exp._read_manifest(0)["files"] == t._read_manifest(1)["files"]
    assert exp._read_manifest(0)["branched_from"] == {
        "ref": "main",
        "version": 1,
    }


def test_branch_mor_delete_stays_on_branch(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "brd"))
    t.append(_k(spark, 0, 10))
    exp = t.create_branch("exp")
    exp.delete_where(spark, ["k"], F.col("k") < 4)
    assert sorted(r.k for r in exp.read(spark).collect()) == list(range(4, 10))
    assert t.read(spark).count() == 10


def test_branch_validation_and_duplicates(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "brv"))
    with pytest.raises(FileNotFoundError):
        t.create_branch("exp")  # nothing committed yet
    t.append(_k(spark, 0, 3))
    with pytest.raises(ValueError):
        t.create_branch("main")
    with pytest.raises(ValueError):
        t.create_branch("bad name")
    with pytest.raises(ValueError):
        SnapshotTable(str(tmp_path / "brv"), ref="bad/../name")
    t.create_branch("exp")
    with pytest.raises(ValueError):
        t.create_branch("exp")


def test_tags_are_immutable_pointers(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tg"))
    t.append(_k(spark, 0, 5))
    t.append(_k(spark, 5, 9))
    t.tag_version("rel", 0)
    t.append(_k(spark, 9, 12))
    assert sorted(r.k for r in t.read_tag(spark, "rel").collect()) == list(
        range(5)
    )
    with pytest.raises(ValueError):
        t.tag_version("rel", 2)  # tags never move
    with pytest.raises(FileNotFoundError):
        t.read_tag(spark, "nope")
    # a tag taken ON a branch resolves through the branch's line
    exp = t.create_branch("exp")
    exp.append(_k(spark, 50, 52))
    exp.tag_version("exp-head")
    got = sorted(r.k for r in t.read_tag(spark, "exp-head").collect())
    assert got == list(range(12)) + [50, 51]


def test_promote_branch_applies_net_delta(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "pr"))
    t.append(
        _k(spark, 0, 10).withColumn("v", F.col("k") * 2)
    )
    br = t.create_branch("fix")
    br.append(_k(spark, 100, 103).withColumn("v", F.col("k") * 2))
    br.delete_where(spark, ["k"], F.col("k") < 3)
    v = t.promote_branch(spark, "fix", keys=["k"])
    assert v == 1
    got = sorted(r.k for r in t.read(spark).collect())
    assert got == list(range(3, 10)) + [100, 101, 102]
    # time travel on main survives the promotion
    assert t.read(spark, 0).count() == 10
    # the branch itself is untouched by its own promotion
    assert SnapshotTable(str(tmp_path / "pr"), ref="fix").latest_version() == 2


def test_promote_branch_validation(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "prv"))
    t.append(_k(spark, 0, 3))
    with pytest.raises(FileNotFoundError):
        t.promote_branch(spark, "nope", keys=["k"])
    t.create_branch("empty")
    with pytest.raises(ValueError):
        t.promote_branch(spark, "empty", keys=["k"])  # nothing to promote


def test_vacuum_preserves_files_shared_with_branches(spark, tmp_path):
    # branching shares data parts; vacuuming ONE ref must not delete
    # files any other ref's surviving manifests still list
    path = str(tmp_path / "vb")
    t = SnapshotTable(path)
    t.append(_k(spark, 0, 10))                       # main v0: files F0
    exp = t.create_branch("exp")                     # exp v0 lists F0
    exp.append(_k(spark, 100, 103))                  # exp v1
    # branch rewrites everything, then vacuums its own history
    exp.compact(spark)
    exp.vacuum(keep_versions=1)
    # main's only version still lists F0 — must read intact
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(10))
    # mirror direction: main compacts + vacuums; branch still reads
    t.append(_k(spark, 10, 12))
    t.compact(spark)
    t.vacuum(keep_versions=1)
    assert sorted(r.k for r in exp.read(spark).collect()) == list(
        range(10)
    ) + [100, 101, 102]


def test_vacuum_never_drops_tag_pinned_versions(spark, tmp_path):
    path = str(tmp_path / "vt")
    t = SnapshotTable(path)
    t.append(_k(spark, 0, 5))
    t.tag_version("rel", 0)
    t.overwrite(_k(spark, 50, 53))
    res = t.vacuum(keep_versions=1)
    assert 0 not in res["dropped_versions"]
    # the tag still resolves after retention
    assert sorted(r.k for r in t.read_tag(spark, "rel").collect()) == list(
        range(5)
    )
