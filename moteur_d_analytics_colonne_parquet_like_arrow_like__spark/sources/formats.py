"""Extra source/sink formats beyond parquet: CSV, JSON (lines), ORC, and
partitioned parquet layouts.

The reference supports exactly one format (its ``.col`` container,
SURVEY.md §2.2); these come free with the platform but are part of a
complete engine surface. Schemas are declared, not inferred, mirroring the
reference's writer-declared model (``cae/include/format.h:49-61``) — schema
inference on a 100 TB input is a full extra scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    reader = spark.read.schema(schema).option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType, **options: str
) -> DataFrame:
    reader = spark.read.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType, **options: str
) -> DataFrame:
    """ORC: the other columnar container (stripes ≙ row groups, same
    min/max-stats pushdown model)."""
    reader = spark.read.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    row_tag: str = "row",
    **options: str,
) -> DataFrame:
    """XML via Spark 4's built-in source (SPARK-44265 folded the
    spark-xml package into core): one element per ``row_tag``, explicit
    schema — the schema-on-read contract every text format here uses.
    XML is the interchange format of the enterprise-feed world; at
    100 TB it is an INGEST format (parse once, land columnar), never a
    working format — same economics as CSV/JSONL."""
    reader = spark.read.schema(schema).option("rowTag", row_tag)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format("xml").load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    df.write.mode(mode).option("rowTag", row_tag).format("xml").save(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet layout: queries filtering on the
    partition columns prune whole directories before any I/O (the
    coarse-grained sibling of row-group min/max skipping). The 100 TB
    default for time/tenant-partitioned facts.

    Keep partition cardinality moderate (≤ ~10k dirs); high-cardinality
    keys belong in bucketing (joins.bucketed_write) or sort order instead.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
