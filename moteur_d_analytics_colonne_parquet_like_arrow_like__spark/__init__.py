"""PySpark-native columnar analytics engine.

A from-scratch re-expression of the capabilities of the reference
``Veezogri/moteur-d-analytics-colonne-Parquet-like-Arrow-like-`` engine
(a single-node C++ columnar format + vectorized executor; see SURVEY.md)
on top of Apache Spark's DataFrame/SQL stack:

- storage: Parquet (row groups / column chunks / pages / min-max stats —
  the production-grade twin of the reference's ``.col`` format,
  reference ``cae/docs/FORMAT.md``),
- execution: Catalyst + Tungsten (column pruning, predicate pushdown,
  row-group skipping, whole-stage codegen replace the reference's
  hand-rolled Scanner/QueryExecutor, reference ``cae/src/execution.cpp``),
- extension surface: joins, windows, set ops, scalar functions,
  structured streaming, and large-scale training-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal columns).

Everything here is DataFrame-first; Python UDFs appear only where the
built-in operators genuinely cannot express the semantics, and then as
Arrow-batched pandas UDFs.
"""

from .session import get_spark, stop_spark
from .schema import ColumnType, EncodingType, ColumnSchema, Schema
from .query import QueryExecutor, Predicate, CompareOp, AggFunc

__all__ = [
    "get_spark",
    "stop_spark",
    "ColumnType",
    "EncodingType",
    "ColumnSchema",
    "Schema",
    "QueryExecutor",
    "Predicate",
    "CompareOp",
    "AggFunc",
]

__version__ = "0.1.0"
