"""CSV/JSON round-trips + partitioned-layout pruning behavior."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import plans
from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources import formats


def _schema():
    return T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("region", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )


def _df(spark):
    rows = [(i, ["north", "south", "east"][i % 3], i * 1.5) for i in range(300)]
    return spark.createDataFrame(rows, _schema())


def test_csv_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    df = _df(spark)
    formats.write_csv(df, p)
    back = formats.read_csv(spark, p, _schema())
    assert back.count() == 300
    assert back.exceptAll(df).count() == 0


def test_json_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.json")
    df = _df(spark)
    formats.write_json(df, p)
    back = formats.read_json(spark, p, _schema())
    assert back.exceptAll(df).count() == 0


def test_partitioned_write_prunes(spark, tmp_path):
    p = str(tmp_path / "part.parquet")
    formats.write_partitioned(_df(spark), p, ["region"])
    back = formats.read_partitioned(spark, p)
    assert back.count() == 300
    pruned = back.where(F.col("region") == "north")
    # partition filter must show up in the scan, not as a post-filter
    plan = plans.formatted_plan(pruned)
    assert "PartitionFilters" in plan and "region" in plan.split("PartitionFilters")[1][:200]
    assert pruned.count() == 100

def test_orc_roundtrip(spark, tmp_path):
    df = _df(spark)
    p = str(tmp_path / "t.orc")
    formats.write_orc(df, p)
    back = formats.read_orc(spark, p, schema=_schema())
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # predicate filtering works on ORC scans too
    assert back.filter(F.col("value") > 300.0).count() == 99
