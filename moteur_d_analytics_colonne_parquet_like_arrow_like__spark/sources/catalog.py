"""Table catalog over the driver testdata (TESTDATA.md).

The reference addresses exactly one file per query (``cae/README.md:137``);
multi-table is our extension surface. The catalog maps logical table names to
parquet paths under a scale-factor directory and registers temp views so the
same queries run via DataFrame or ``spark.sql``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Logical tables shipped by the driver (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor; fact tables
# are the scan-heavy side. Used by operators to pick broadcast joins.
DIM_TABLES: frozenset[str] = frozenset(
    {"region", "nation", "supplier", "part", "customer"}
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return os.path.join(sf_dir, f"{name}.parquet")


# Session-level table-handle cache: re-resolving a path (file listing +
# footer schema read + analysis) costs ~100 ms per call, which a real
# deployment amortizes through its metastore. Keyed by session so a stopped
# session's handles are never reused.
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Timestamps in the testdata are timezone-less instants; the engine
    # renders them in UTC regardless of which session runs the query (a
    # session inheriting a non-UTC JVM default would silently shift every
    # formatted timestamp). Same runtime-conf rule as nanosAsLong below —
    # never depend on the session factory for correctness — and set even
    # on cache hits: rendering picks up the conf at EXECUTION time.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = (id(spark), sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects outright
        # unless nanosAsLong is on. The conf must be set on WHATEVER session
        # runs the query — callers (e.g. a verification harness) may hand us a
        # session our own factory never configured — so set it at runtime here,
        # not only in session.py. It is a runtime-settable SQL conf.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # With nanosAsLong the ts column arrives as long nanos. Convert to a
        # microsecond timestamp with integer division — (ts / 1000) via `/`
        # would round-trip through double and lose precision at 2^53.
        from pyspark.sql import functions as F  # local: avoid cycle at import

        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    _TABLE_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | list[str] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | list[str] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view for spark.sql use."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs
