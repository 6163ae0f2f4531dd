"""Parquet sink + seeded synthetic generator.

Mirrors the reference write path (``cae/src/format.cpp:130-441`` FileWriter;
CLI ``write`` verb ``cae/src/cli.cpp:64-118``; bench generator
``cae/benches/benchmark.cpp:42-95``) on Spark:

- row-group sizing: the reference flushes fixed-size row groups (10k CLI /
  50k bench); Parquet's ``parquet.block.size`` plus ``maxRecordsPerFile``
  give the same layout control,
- per-column encodings: delegated to the Parquet writer (dictionary etc.),
  with the schema's encoding *hints* controlling dictionary on/off,
- synthetic data: seeded and distributed — generated with ``spark.range``
  partition-parallel so a 10^9-row table never materializes on the driver,
  unlike the reference's in-memory vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schema import EncodingType, Schema


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    rows_per_row_group: int | None = None,
    schema_hint: Schema | None = None,
    compression: str = "snappy",
) -> None:
    """Write a DataFrame as Parquet with reference-like layout control.

    ``rows_per_row_group`` approximates the reference's fixed row-group
    flushing (cae/src/format.cpp:380-420) via ``maxRecordsPerFile`` — at
    cluster scale prefer the default (128 MB row groups) and partition count
    sized so each task writes ~1 file.
    """
    writer = df.write.mode(mode).option("compression", compression)
    if schema_hint is not None:
        use_dict = any(
            c.encoding is EncodingType.DICTIONARY for c in schema_hint.columns
        )
        writer = writer.option("parquet.enable.dictionary", str(use_dict).lower())
    if rows_per_row_group:
        writer = writer.option("maxRecordsPerFile", rows_per_row_group)
        writer = writer.option("parquet.block.size", 8 * 1024 * 1024)
    writer.parquet(path)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partition + sort by ``sort_cols`` before writing: row-group
    min/max ranges become disjoint on the sort key, so predicate pushdown
    skips all but the matching files/row groups (the layout-side half of
    zone-map skipping — the reference computes stats at write time the same
    way, cae/src/format.cpp:153-181, but cannot choose layout).

    The 100 TB default for time-series facts: sort by (day, key) so both
    partition pruning and row-group skipping engage.
    """
    out = df.repartitionByRange(*sort_cols) if num_files is None else (
        df.repartitionByRange(num_files, *sort_cols)
    )
    out.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def upsert_partitioned(
    updates: DataFrame,
    path: str,
    partition_cols: list[str],
    key_cols: list[str],
) -> None:
    """Upsert into a hive-partitioned parquet table: rows in ``updates``
    replace existing rows with the same key; other rows are kept.

    Implementation is partition-scoped read-merge-rewrite with dynamic
    partition overwrite — only the partitions present in ``updates`` are
    touched, so cost scales with the update footprint, not the table. This
    is the parquet-native shape of MERGE; table formats (Delta/Iceberg) add
    transactionality on the same plan.
    """
    import os

    from pyspark.sql import functions as F

    spark = updates.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        if os.path.exists(path):
            existing = spark.read.parquet(path)
            touched = updates.select(*partition_cols).distinct()
            # keep only non-updated rows of touched partitions; left_anti on
            # the full key removes rows being replaced
            keep = existing.join(
                F.broadcast(touched), partition_cols, "left_semi"
            ).join(updates.select(*key_cols), key_cols, "left_anti")
            merged = keep.unionByName(updates)
        else:
            merged = updates
        merged.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def zorder_key(cols: list, bits: int = 16):
    """Z-order (Morton) interleaving of N non-negative int columns into one
    sort key: sorting by it clusters data in ALL dimensions at once, so
    row-group min/max ranges stay tight on every participating column —
    multi-dimensional data skipping, where a plain sort only helps its
    leading column. Pure bit-shift expression tree (codegen'd).

    Columns must be pre-normalized to [0, 2^bits) (e.g. via ntile or
    range-scaling); at 16 bits × 4 columns the key fits a bigint.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n * bits > 63:
        raise ValueError("interleaved key must fit in a signed 64-bit int")
    cexprs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cexprs):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * n + i)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
    normalize: bool = False,
) -> None:
    """Write clustered by the Morton key of ``zorder_cols`` (each must be a
    non-negative int column that fits ``bits`` bits). The multi-dim sibling
    of write_sorted: predicates on ANY z-ordered column skip row groups.

    ``normalize=True`` accepts arbitrary numeric/timestamp columns: each is
    min/max-scaled into [0, 2^bits) buckets first (one tiny broadcast-joined
    aggregate — Delta's OPTIMIZE ZORDER BY does the same with range ids).
    Rank-free scaling means value skew degrades clustering gracefully
    instead of requiring a global window pass at write time."""
    from pyspark.sql import types as T

    if normalize:
        top = (1 << bits) - 1

        def as_num(c: str) -> F.Column:
            if isinstance(df.schema[c].dataType, T.TimestampType):
                return F.col(c).cast("long").cast("double")
            return F.col(c).cast("double")

        stats = df.agg(
            *[
                e
                for c in zorder_cols
                for e in (
                    F.min(as_num(c)).alias(f"__min_{c}"),
                    F.max(as_num(c)).alias(f"__max_{c}"),
                )
            ]
        )
        tagged = df.join(F.broadcast(stats))
        buckets = [
            F.least(
                F.lit(top),
                F.floor(
                    (as_num(c) - F.col(f"__min_{c}"))
                    / (F.col(f"__max_{c}") - F.col(f"__min_{c}") + F.lit(1e-9))
                    * (top + 1)
                ),
            ).cast("long")
            for c in zorder_cols
        ]
        tagged = tagged.select(
            *df.columns, zorder_key(buckets, bits).alias("__zkey")
        )
    else:
        tagged = df.withColumn("__zkey", zorder_key(zorder_cols, bits))
    out = (
        tagged.repartitionByRange("__zkey")
        if num_files is None
        else tagged.repartitionByRange(num_files, "__zkey")
    )
    out.sortWithinPartitions("__zkey").drop("__zkey").write.mode(mode).parquet(path)


def generate_synthetic(
    spark: SparkSession,
    num_rows: int,
    seed: int = 42,
    variant: str = "cli",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic seeded synthetic table, distributed.

    Variants mirror the reference generators (FIXTURES.md F3/F4):

    - ``cli`` (cae/src/cli.cpp:29-62): id, value U[0,10000], category U[1,5],
      region {north,south,east,west}, status {active,pending,closed}
    - ``bench`` (cae/benches/benchmark.cpp:55-61): id, value U[0,100000],
      score U[1,10], region 8 compass values

    Determinism comes from hashing the row id with the seed (xxhash64) rather
    than a stateful RNG, so generation parallelizes with no cross-partition
    coordination — the 100 TB-friendly version of the reference's mt19937 loop.
    """
    base = spark.range(0, num_rows, 1, partitions or spark.sparkContext.defaultParallelism)

    def u(col_salt: int, bound: int):
        # Deterministic uniform in [0, bound): 64-bit hash of (id, seed, salt).
        h = F.xxhash64(F.col("id"), F.lit(seed), F.lit(col_salt))
        return F.pmod(h, F.lit(bound))

    if variant == "cli":
        regions = F.array(*[F.lit(s) for s in ("north", "south", "east", "west")])
        statuses = F.array(*[F.lit(s) for s in ("active", "pending", "closed")])
        return base.select(
            F.col("id").cast("long").alias("id"),
            u(1, 10001).cast("long").alias("value"),
            (u(2, 5) + 1).cast("int").alias("category"),
            regions[u(3, 4).cast("int")].alias("region"),
            statuses[u(4, 3).cast("int")].alias("status"),
        )
    if variant == "bench":
        regions = F.array(
            *[
                F.lit(s)
                for s in (
                    "north",
                    "south",
                    "east",
                    "west",
                    "northeast",
                    "northwest",
                    "southeast",
                    "southwest",
                )
            ]
        )
        return base.select(
            F.col("id").cast("long").alias("id"),
            u(1, 100001).cast("long").alias("value"),
            (u(2, 10) + 1).cast("int").alias("score"),
            regions[u(3, 8).cast("int")].alias("region"),
        )
    raise ValueError(f"unknown variant {variant!r}; expected 'cli' or 'bench'")
