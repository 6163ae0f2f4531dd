"""Sources & sinks: Parquet reader/writer, table catalog, metadata scan.

The reference supports exactly one source (its ``.col`` reader) and one sink
(its ``.col`` writer) — SURVEY.md §2.2. Here Parquet is the native twin, with
CSV/JSON as platform bonuses, and the catalog loads the driver's TPC-H-ish
testdata as a dict of DataFrames / temp views.
"""

from .catalog import TABLES, load_table, load_tables, register_views
from .writer import write_parquet, generate_synthetic
from .scanner import scan_metadata, read_with_projection

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "write_parquet",
    "generate_synthetic",
    "scan_metadata",
    "read_with_projection",
]
