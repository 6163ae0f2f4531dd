"""`.col` as a first-class Spark data source: ``spark.read.format("col")``.

Built on Spark 4's Python DataSource API (SPARK-44076). Where
``colfile.read_col`` decodes the whole file on the driver (fine for the
single-node interchange contract it documents), this source hands Spark
ONE InputPartition PER ROW GROUP: each executor seeks straight to its row
group's column chunks and decodes only those — the reference's row-group
parallelism (cae/src/execution.cpp scan loop), but scheduled by Spark, so
a 10k-row-group file fans out across the cluster. Requirements:

- the path must be visible to executors (local FS here, shared storage on
  a real cluster — same contract as every file source),
- optional ``columns`` option ("a,b,c") prunes column chunks at decode
  time (Catalyst still prunes its own projection above),
- optional ``predicate`` option ("col op int", op ∈ eq/ne/lt/le/gt/ge)
  applies the reference's zone-map skipping per row group BEFORE any
  decode, and the exact residual filter is applied to surviving rows.

Register once per session::

    from moteur_d_analytics_colonne_parquet_like_arrow_like__spark.sources.col_datasource import (
        register_col_datasource,
    )
    register_col_datasource(spark)
    df = spark.read.format("col").load("/path/data.col")
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _parse_predicate(spec: str | None):
    if not spec:
        return None
    col, op, lit = spec.split()
    return (col, op, int(lit))


class _RowGroupPartition(InputPartition):
    def __init__(self, index: int):
        self.index = index


class ColDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("format('col') needs .load(<path>)")
        cols = options.get("columns")
        self.columns = [c.strip() for c in cols.split(",")] if cols else None
        self.predicate = _parse_predicate(options.get("predicate"))

    def partitions(self):
        from .colfile import _skippable_row_groups, read_col_metadata

        schema, row_groups, _ = read_col_metadata(self.path)
        skips = _skippable_row_groups(row_groups, schema, self.predicate)
        return [
            _RowGroupPartition(i)
            for i, skip in enumerate(skips)
            if not skip
        ]

    def read(self, partition: _RowGroupPartition):
        # Runs on the executor: open the file, seek to THIS row group's
        # chunks, decode only the projected columns.
        from .colfile import _decode_chunk, read_col_metadata

        schema, row_groups, _ = read_col_metadata(self.path)
        rg = row_groups[partition.index]
        proj = self.columns or schema.names
        if self.predicate is not None and self.predicate[0] not in proj:
            proj = list(proj) + [self.predicate[0]]
        idxs = [schema.index_of(c) for c in proj]
        data = []
        with open(self.path, "rb") as f:
            for ci in idxs:
                ch = rg.chunks[ci]
                f.seek(ch.file_offset)
                raw = f.read(ch.total_size)
                data.append(_decode_chunk(raw, schema.columns[ci], ch))
        rows = zip(*data)
        if self.predicate is not None:
            col, op, value = self.predicate
            pi = proj.index(col)
            import operator as _op

            cmp = {
                "eq": _op.eq,
                "ne": _op.ne,
                "lt": _op.lt,
                "le": _op.le,
                "gt": _op.gt,
                "ge": _op.ge,
            }[op]
            keep_pred = len(self.columns or schema.names)
            rows = (
                r[:keep_pred] if pi >= keep_pred else r
                for r in rows
                if cmp(r[pi], value)
            )
        yield from rows


class ColDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "col"

    def schema(self):
        from pyspark.sql import types as T

        from .colfile import read_col_metadata

        cols = self.options.get("columns")
        proj = [c.strip() for c in cols.split(",")] if cols else None
        schema, _, _ = read_col_metadata(self.options["path"])
        names = proj or schema.names
        return T.StructType(
            [
                schema.columns[schema.index_of(c)].to_spark_field(nullable=False)
                for c in names
            ]
        )

    def reader(self, schema) -> ColDataSourceReader:
        return ColDataSourceReader(dict(self.options))


def register_col_datasource(spark) -> None:
    """Idempotent per-session registration of the ``col`` format."""
    spark.dataSource.register(ColDataSource)
