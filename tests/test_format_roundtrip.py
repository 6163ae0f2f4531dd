"""Round-trip + stats tests mirroring the reference's test_format.cpp
(SURVEY.md §5 item 2), with Parquet as the storage format."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.schema import (
    ColumnSchema,
    ColumnType,
    EncodingType,
    Schema,
)
from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources import (
    generate_synthetic,
    scan_metadata,
    write_parquet,
)


def test_basic_roundtrip(spark, tmp_path):
    # cae/tests/test_format.cpp:21-57 — write/read two-column file
    path = str(tmp_path / "basic.parquet")
    schema = Schema().add("id", ColumnType.INT64).add("value", ColumnType.INT32)
    df = spark.createDataFrame(
        [(i + 1, (i + 1) * 10) for i in range(5)], schema.to_spark()
    )
    write_parquet(df, path, schema_hint=schema)
    back = spark.read.parquet(path)
    assert back.count() == 5
    got = {r["id"]: r["value"] for r in back.collect()}
    assert got == {1: 10, 2: 20, 3: 30, 4: 40, 5: 50}


def test_min_max_stats(spark, tmp_path):
    # cae/tests/test_format.cpp:203-232 — values {10,5,30,15,25} ⇒ min 5 max 30
    path = str(tmp_path / "stats.parquet")
    df = spark.createDataFrame(
        [(v,) for v in (10, 5, 30, 15, 25)],
        T.StructType([T.StructField("value", T.LongType(), False)]),
    ).coalesce(1)
    write_parquet(df, path)
    meta = scan_metadata(path)
    chunk = meta["files"][0]["row_groups"][0]["columns"][0]
    assert chunk["column"] == "value"
    assert chunk["min"] == 5
    assert chunk["max"] == 30
    assert chunk["null_count"] == 0


def test_multi_row_group(spark, tmp_path):
    # cae/tests/test_format.cpp:166-201 — rows split across row groups
    path = str(tmp_path / "multirg.parquet")
    df = spark.range(0, 6, 1, 2).selectExpr("cast(id as int) as value")
    write_parquet(df, path)
    meta = scan_metadata(path)
    assert meta["total_rows"] == 6
    back = spark.read.parquet(path)
    assert sorted(r["value"] for r in back.collect()) == [0, 1, 2, 3, 4, 5]


def test_string_dictionary_roundtrip(spark, tmp_path):
    # cae/tests/test_format.cpp:114-119 dict_col fixture
    path = str(tmp_path / "dict.parquet")
    vals = ["north", "south", "north", "east", "south", "north"]
    schema = Schema().add("region", ColumnType.STRING, EncodingType.DICTIONARY)
    df = spark.createDataFrame([(v,) for v in vals], schema.to_spark()).coalesce(1)
    write_parquet(df, path, schema_hint=schema)
    back = [r["region"] for r in spark.read.parquet(path).collect()]
    assert sorted(back) == sorted(vals)
    meta = scan_metadata(path)
    encs = meta["files"][0]["row_groups"][0]["columns"][0]["encodings"]
    assert any("DICT" in e for e in encs), encs


def test_illegal_encoding_rejected():
    # cae/src/format.cpp:271-374 writer validation
    with pytest.raises(ValueError):
        ColumnSchema("x", ColumnType.STRING, EncodingType.DELTA)
    with pytest.raises(ValueError):
        ColumnSchema("x", ColumnType.INT64, EncodingType.DICTIONARY)


def test_schema_lookup_raises():
    # cae/src/format.cpp:17-29 — lookup throws on miss
    s = Schema().add("a", ColumnType.INT32)
    with pytest.raises(KeyError):
        s.column("b")
    assert s.index_of("a") == 0


def test_corrupt_file_clean_error(spark, tmp_path):
    # Contract from cae/tests/test_corruption.cpp: corrupt input ⇒ clean
    # error, not UB. Parquet library enforces; we assert the behavior.
    bad = tmp_path / "bad.parquet"
    bad.write_bytes(b"PAR1garbage-not-a-footer")
    with pytest.raises(Exception) as ei:
        spark.read.parquet(str(bad)).collect()
    assert "parquet" in str(ei.value).lower() or "footer" in str(ei.value).lower()


def test_synthetic_generator_deterministic(spark):
    # Parity with the seeded reference generator (cae/src/cli.cpp:64-118):
    # same seed ⇒ identical table, different seed ⇒ different table.
    a = generate_synthetic(spark, 500, seed=42, variant="cli")
    b = generate_synthetic(spark, 500, seed=42, variant="cli")
    c = generate_synthetic(spark, 500, seed=7, variant="cli")
    assert a.exceptAll(b).count() == 0
    assert a.exceptAll(c).count() > 0
    assert a.columns == ["id", "value", "category", "region", "status"]
    # distributions respect declared bounds
    row = a.selectExpr(
        "min(value) as lo", "max(value) as hi", "min(category) as clo",
        "max(category) as chi"
    ).collect()[0]
    assert 0 <= row["lo"] and row["hi"] <= 10000
    assert 1 <= row["clo"] and row["chi"] <= 5


def test_truncated_file_clean_error(spark, tmp_path):
    # cae/tests/test_corruption.cpp:146-182 analogue: a valid file cut short
    # (footer offset beyond EOF) must raise a clean error, not garbage data.
    import glob
    import shutil

    good = str(tmp_path / "good.parquet")
    spark.range(1000).coalesce(1).write.mode("overwrite").parquet(good)
    part = glob.glob(good + "/part-*.parquet")[0]
    bad_dir = tmp_path / "trunc.parquet"
    bad_dir.mkdir()
    bad = str(bad_dir / "part-00000.parquet")
    shutil.copy(part, bad)
    with open(bad, "r+b") as f:
        f.truncate(100)  # cut mid-file: footer gone
    import pytest

    with pytest.raises(Exception):
        spark.read.parquet(str(bad_dir)).collect()
