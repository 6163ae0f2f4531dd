"""Scan path: projected/filtered parquet reads + metadata inspection.

``read_with_projection`` is the declarative twin of the reference Scanner
(``cae/src/execution.cpp:74-229``): column pruning and predicate pushdown are
expressed on the DataFrame and land in the physical scan (verify via
``plans.scan_info``) — Parquet row-group min/max pruning replaces the
reference's ``canSkipPage`` zone maps (``cae/src/execution.cpp:48-71``).

``scan_metadata`` is the ``scan`` CLI verb (``cae/src/cli.cpp:120-170``):
schema + row-group/column-chunk layout + min/max statistics, read via
PyArrow's parquet metadata (footer-first, exactly like the reference reader,
``cae/src/format.cpp:455-491``).
"""

from __future__ import annotations

import os
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import Column, DataFrame, SparkSession


def read_with_projection(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    predicate: Column | None = None,
) -> DataFrame:
    """Projected + filtered scan; Catalyst pushes both into the reader."""
    df = spark.read.parquet(path)
    if predicate is not None:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    return df


def _parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return out


def scan_metadata(path: str, max_files: int = 16) -> dict[str, Any]:
    """Schema + row-group/chunk/page-stats dump (reference `scan` verb).

    Returns a plain dict so the CLI can render it and tests can assert on it.
    """
    files = _parquet_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    first = pq.ParquetFile(files[0])
    result: dict[str, Any] = {
        "path": path,
        "num_files": len(files),
        "schema": [
            {"name": first.schema_arrow.field(i).name,
             "type": str(first.schema_arrow.field(i).type)}
            for i in range(len(first.schema_arrow))
        ],
        "total_rows": 0,
        "total_bytes": 0,
        "files": [],
    }
    for fp in files:
        pf = pq.ParquetFile(fp)
        md = pf.metadata
        result["total_rows"] += md.num_rows
        result["total_bytes"] += os.path.getsize(fp)
        if len(result["files"]) >= max_files:
            continue
        finfo: dict[str, Any] = {
            "file": fp,
            "num_rows": md.num_rows,
            "num_row_groups": md.num_row_groups,
            "row_groups": [],
        }
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            chunks = []
            for ci in range(rgm.num_columns):
                col = rgm.column(ci)
                stats = col.statistics
                chunks.append(
                    {
                        "column": col.path_in_schema,
                        "encodings": list(col.encodings),
                        "compressed_bytes": col.total_compressed_size,
                        "uncompressed_bytes": col.total_uncompressed_size,
                        "min": (stats.min if stats and stats.has_min_max else None),
                        "max": (stats.max if stats and stats.has_min_max else None),
                        "null_count": (stats.null_count if stats else None),
                    }
                )
            finfo["row_groups"].append(
                {"num_rows": rgm.num_rows, "columns": chunks}
            )
        result["files"].append(finfo)
    return result
