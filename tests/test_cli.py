"""CLI surface tests (in-process main(), shared session)."""

from __future__ import annotations

import json

import pytest

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import cli


@pytest.fixture(scope="module")
def written(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "t.parquet")
    assert cli.main(["write", out, "2000", "42"]) == 0
    return out


def test_write_scan(written, capsys):
    assert cli.main(["scan", written]) == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["total_rows"] == 2000
    assert [c["name"] for c in meta["schema"]] == [
        "id", "value", "category", "region", "status",
    ]


def test_query_groupby(written, capsys):
    rc = cli.main(
        ["query", written, "--where", "value", "gt", "5000",
         "--agg", "sum", "value", "--groupby", "region"]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 4  # north/south/east/west
    assert all("count=" in line and "sum=" in line for line in out)


def test_query_aggregate(written, capsys):
    rc = cli.main(["query", written, "--agg", "count", "id"])
    assert rc == 0
    assert "count=2000" in capsys.readouterr().out


def test_query_select_where(written, capsys):
    rc = cli.main(
        ["query", written, "--select", "id,value", "--where", "value", "le", "100",
         "--limit", "5"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "id" in out and "value" in out


def test_error_paths(written, capsys):
    assert cli.main(["query", written, "--where", "value", "zz", "1"]) == 1
    assert "unknown compare op" in capsys.readouterr().err
    assert cli.main(["query", written, "--where", "nope", "gt", "1"]) == 1
    assert "column not found" in capsys.readouterr().err
    assert cli.main(["query", written, "--groupby", "region"]) == 2
    assert "--groupby requires --agg" in capsys.readouterr().err


def test_col_format_end_to_end(spark, tmp_path_factory, capsys):
    """The reference CLI workflow on a .col file: write → scan → query."""
    out = str(tmp_path_factory.mktemp("colcli") / "t.col")
    assert cli.main(["write", out, "500", "42"]) == 0
    capsys.readouterr()
    assert cli.main(["scan", out]) == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["format"] == "col" and meta["total_rows"] == 500
    assert [c["name"] for c in meta["schema"]] == [
        "id", "value", "category", "region", "status",
    ]
    rc = cli.main(
        ["query", out, "--where", "value", "gt", "5000",
         "--agg", "count", "id", "--groupby", "region"]
    )
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 4


def test_query_explain_shows_pushdown(tmp_path, capsys):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import cli

    out = str(tmp_path / "e.parquet")
    assert cli.main(["write", out, "1000", "3"]) == 0
    capsys.readouterr()
    rc = cli.main(
        ["query", out, "--select", "id,value", "--where", "value", "gt", "500", "--explain"]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    assert "GreaterThan(value,500)" in captured
    assert "id:bigint,value:bigint" in captured
    assert "Physical Plan" in captured


def test_sql_verb(written, capsys):
    rc = cli.main(
        [
            "sql",
            "SELECT region, count(*) AS n FROM t GROUP BY region ORDER BY region",
            "--table",
            f"t={written}",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    for region in ("east", "north", "south", "west"):
        assert region in out


def test_sql_verb_data_dir(capsys):
    rc = cli.main(
        [
            "sql",
            "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey",
            "--data-dir",
            "/root/testdata/sf0.001",
        ]
    )
    assert rc == 0
    assert "6000" in capsys.readouterr().out


def test_sql_verb_errors(written, capsys):
    assert cli.main(["sql", "SELECT * FROM missing_view"]) == 1
    assert "error:" in capsys.readouterr().err
    assert cli.main(["sql", "SELEC nope"]) == 1
    assert "error:" in capsys.readouterr().err
    assert cli.main(["sql", "SELECT 1", "--table", "bad-spec"]) == 1
    assert "name=path" in capsys.readouterr().err


def test_snapshot_verb(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.snapshots import (
        SnapshotTable,
    )

    path = str(tmp_path / "snap")
    t = SnapshotTable(path)
    t.append(spark.range(5).select(F.col("id")))
    t.append(spark.range(5, 9).select(F.col("id")))

    assert cli.main(["snapshot", "history", path]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[1])["version"] == 1

    assert cli.main(["snapshot", "read", path, "--version", "0"]) == 0
    assert "rows=5" in capsys.readouterr().out

    assert cli.main(["snapshot", "compact", path]) == 0
    assert "version 2" in capsys.readouterr().out

    assert cli.main(["snapshot", "vacuum", path, "--keep-versions", "1"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["dropped_versions"] == [0, 1]

    assert cli.main(["snapshot", "read", path]) == 0
    assert "rows=9" in capsys.readouterr().out


def test_snapshot_delete_verb(spark, tmp_path, capsys):
    # merge-on-read DELETE from the CLI: equality-delete commit, no data
    # rewrite; errors cleanly without --keys/--where.
    from pyspark.sql import functions as F

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.snapshots import (
        SnapshotTable,
    )

    path = str(tmp_path / "snapdel")
    t = SnapshotTable(path)
    t.append(spark.range(10).select(F.col("id")))
    rc = cli.main(
        ["snapshot", "delete", path, "--keys", "id", "--where", "id", "ge", "7"]
    )
    assert rc == 0
    assert "version 1" in capsys.readouterr().out
    assert t._read_manifest(1)["files"] == t._read_manifest(0)["files"]
    assert sorted(r["id"] for r in t.read(spark).collect()) == list(range(7))
    rc = cli.main(["snapshot", "delete", path, "--keys", "id"])
    assert rc == 1
    assert "error:" in capsys.readouterr().err


def test_sql_verb_col_views(spark, tmp_path, capsys):
    """--table accepts single .col files AND directories of them (stream
    sink output), read through the row-group-parallel data source."""
    from pyspark.sql import functions as F

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources import (
        colfile,
    )
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.writer import (
        generate_synthetic,
    )

    df = generate_synthetic(spark, 3_000, seed=13)
    one = str(tmp_path / "one.col")
    colfile.write_col(df, one, rows_per_group=1_000)
    d = tmp_path / "many"
    d.mkdir()
    for i in range(2):
        part = df.where((F.col("id") >= i * 1_500) & (F.col("id") < (i + 1) * 1_500))
        colfile.write_col(part, str(d / f"p_{i}.col"), rows_per_group=500)

    rc = cli.main(
        ["sql", "SELECT count(*) AS n FROM t", "--table", f"t={one}"]
    )
    assert rc == 0 and "3000" in capsys.readouterr().out
    rc = cli.main(
        ["sql", "SELECT count(*) AS n FROM t", "--table", f"t={d}"]
    )
    assert rc == 0 and "3000" in capsys.readouterr().out


def test_cli_snapshot_diff(spark, tmp_path, capsys):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.snapshots import (
        SnapshotTable,
    )

    path = str(tmp_path / "snap_cli_diff")
    t = SnapshotTable(path)
    t.append(
        spark.createDataFrame(
            [(i, float(i)) for i in range(20)], ["k", "x"]
        ).repartition(4)
    )
    t.merge(
        spark,
        spark.createDataFrame(
            [(3, 99.0, False), (50, 50.0, False), (7, 7.0, True)],
            ["k", "x", "d"],
        ),
        keys=["k"],
        delete_col="d",
    )
    rc = cli.main(
        ["snapshot", "diff", path, "--version", "0", "--to-version", "1",
         "--keys", "k"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "shared (pruned from the scan)" in out
    assert '"update": 1' in out and '"insert": 1' in out and '"delete": 1' in out
    # error paths: missing versions / missing keys
    assert cli.main(["snapshot", "diff", path, "--version", "0"]) == 1
    assert (
        cli.main(
            ["snapshot", "diff", path, "--version", "0", "--to-version", "1"]
        )
        == 1
    )


def test_cli_snapshot_branch_and_tag_verbs(spark, tmp_path, capsys):
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import cli
    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.snapshots import (
        SnapshotTable,
    )

    path = str(tmp_path / "brt")
    t = SnapshotTable(path)
    t.append(spark.range(0, 5).withColumnRenamed("id", "k"))
    t.append(spark.range(5, 8).withColumnRenamed("id", "k"))

    assert cli.main(["snapshot", "branch", path, "--name", "exp"]) == 0
    assert "created branch 'exp' from main@1" in capsys.readouterr().out
    assert cli.main(["snapshot", "tag", path, "--name", "rel", "--version", "0"]) == 0
    assert "tagged main@0 as 'rel'" in capsys.readouterr().out
    assert cli.main(["snapshot", "branches", path]) == 0
    assert '"branch": "exp"' in capsys.readouterr().out
    # history routed through --ref reads the branch's line
    assert cli.main(["snapshot", "history", path, "--ref", "exp"]) == 0
    out = capsys.readouterr().out
    assert '"version": 0' in out
    # error surfaces: duplicate branch exits nonzero via main()'s handler
    assert cli.main(["snapshot", "branch", path, "--name", "exp"]) == 1


def test_snapshot_rollback_verb(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.snapshots import (
        SnapshotTable,
    )

    path = str(tmp_path / "snap_rb")
    t = SnapshotTable(path)
    t.append(spark.range(0, 5).select(F.col("id")))
    t.append(spark.range(5, 9).select(F.col("id")))
    assert cli.main(["snapshot", "rollback", path, "--version", "0"]) == 0
    assert "as version 2" in capsys.readouterr().out
    assert t.latest_version() == 2
    assert t.read(spark).count() == 5
    assert t.read(spark, 1).count() == 9
    # missing --version is a usage error
    assert cli.main(["snapshot", "rollback", path]) == 1
    assert "rollback needs --version" in capsys.readouterr().err
