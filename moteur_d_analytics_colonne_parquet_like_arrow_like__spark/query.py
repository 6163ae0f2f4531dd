"""QueryExecutor: the reference's query-builder surface, compiled to DataFrames.

The reference's "plan" is four mutable fields — projection, filters,
aggregation, group-by — dispatched by three execute methods
(reference ``cae/include/execution.h:114-119``, ``cae/src/execution.cpp:
251-401``). This module re-expresses that surface declaratively: every
setting becomes a lazy DataFrame transformation, so Catalyst performs the
column pruning / predicate pushdown / zone-map skipping the reference
hand-rolls (``cae/src/execution.cpp:48-71,102-129,159-223``), and Tungsten
executes it vectorized across the cluster.

Semantic parity notes (SURVEY.md §2.1 fine print):

- Predicates are conjunctive (AND) — repeated ``add_filter`` calls, matching
  ``cae/src/execution.cpp:163-188``. Six compare ops (EQ NE LT LE GT GE,
  ``cae/include/execution.h:39-46``). We additionally accept float/string/
  date literals (the reference is int64-only, ``cae/include/execution.h:52``).
- A predicate on a non-comparable column raises a clear error instead of the
  reference's silent pass-through on string columns
  (``cae/src/execution.cpp:170-182`` — documented decision in SURVEY §2.1).
- ``execute_aggregate`` returns count+sum+min+max in a single pass regardless
  of which was requested (``cae/src/execution.cpp:296-334``); min/max are
  None on empty input (``cae/include/execution.h:73-74``).
- ``execute_group_by`` sorts ascending by group key (``cae/src/execution.cpp:
  396-398``) — made explicit with orderBy since Spark shuffles are unordered.
- A fully-filtered query returns 0 rows (the reference throws
  "No more batches after skipping", ``cae/src/execution.cpp:118-124`` — a
  known bug we deliberately do not replicate).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Any, Optional

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


class CompareOp(Enum):
    """cae/include/execution.h:39-46."""

    EQ = "="
    NE = "!="
    LT = "<"
    LE = "<="
    GT = ">"
    GE = ">="


# CLI op tokens (cae/src/cli.cpp:172-180).
_OP_TOKENS = {
    "eq": CompareOp.EQ,
    "ne": CompareOp.NE,
    "lt": CompareOp.LT,
    "le": CompareOp.LE,
    "gt": CompareOp.GT,
    "ge": CompareOp.GE,
}


class AggFunc(Enum):
    """cae/include/execution.h:62-67 (CLI tokens cae/src/cli.cpp:182-188)."""

    COUNT = "count"
    SUM = "sum"
    MIN = "min"
    MAX = "max"


@dataclass(frozen=True)
class Predicate:
    """Mirror of reference Predicate{column, op, value}
    (cae/include/execution.h:48-59), widened beyond int64 literals."""

    column: str
    op: CompareOp
    value: Any

    @classmethod
    def parse(cls, column: str, op_token: str, literal: str) -> "Predicate":
        op = _OP_TOKENS.get(op_token.lower())
        if op is None:
            raise ValueError(
                f"unknown compare op {op_token!r}; expected one of {sorted(_OP_TOKENS)}"
            )
        value: Any = literal
        try:
            value = int(literal)
        except ValueError:
            try:
                value = float(literal)
            except ValueError:
                pass  # keep string literal (extension beyond the reference)
        return cls(column, op, value)

    def to_column(self) -> Column:
        c = F.col(self.column)
        v = F.lit(self.value)
        return {
            CompareOp.EQ: c == v,
            CompareOp.NE: c != v,
            CompareOp.LT: c < v,
            CompareOp.LE: c <= v,
            CompareOp.GT: c > v,
            CompareOp.GE: c >= v,
        }[self.op]


@dataclass
class AggResult:
    """Mirror of reference AggResult (cae/include/execution.h:69-75)."""

    count: int
    sum: Optional[float]
    min: Optional[Any]
    max: Optional[Any]


_FILTERABLE = {
    "integer",
    "long",
    "short",
    "byte",
    "double",
    "float",
    "decimal",
    "string",
    "date",
    "timestamp",
    "boolean",
}


class QueryExecutor:
    """Builder with the reference's four plan fields, compiled lazily.

    Usage mirrors cae/examples/basic_usage.cpp:49-98::

        qe = QueryExecutor(spark, path)
        qe.set_projection(["id", "value"])
        qe.add_filter(Predicate("value", CompareOp.GT, 150))
        df = qe.execute_query()            # scan/filter/project
        qe.set_aggregation(AggFunc.SUM, "value")
        res = qe.execute_aggregate()       # AggResult(count, sum, min, max)
        qe.set_group_by("category")
        df = qe.execute_group_by()         # sorted by key
    """

    def __init__(self, spark: SparkSession, source: str | DataFrame):
        self._spark = spark
        self._df = (
            source if isinstance(source, DataFrame) else spark.read.parquet(source)
        )
        self._projection: list[str] = []
        self._filters: list[Predicate] = []
        self._agg: Optional[tuple[AggFunc, str]] = None
        self._group_by: Optional[str] = None
        # One py4j schema fetch per executor, not one per _require_column
        # call — plan-build latency is driver-side overhead worth trimming.
        self._types: dict[str, str] = {
            f.name: f.dataType.typeName() for f in self._df.schema.fields
        }
        # Derived small-scan slice count, computed lazily ONCE per executor:
        # inputFiles() is a driver-side file listing, and the file set is a
        # property of the source relation, not of the filters — re-listing
        # on every execute call would add per-query latency on large file
        # counts for an answer that cannot change.
        self._small_scan: int | None | bool = False  # False = not yet derived

    # --- plan-field setters (cae/include/execution.h:103-111) ---

    def set_projection(self, columns: list[str]) -> "QueryExecutor":
        for c in columns:
            self._require_column(c)
        self._projection = list(columns)
        return self

    def add_filter(self, pred: Predicate) -> "QueryExecutor":
        dt = self._require_column(pred.column)
        base = dt.split("(")[0]
        if base not in _FILTERABLE:
            # Documented divergence: the reference silently ignores filters on
            # string columns (cae/src/execution.cpp:170-182); we error clearly
            # on genuinely non-comparable types and ACCEPT strings/dates.
            raise TypeError(
                f"column {pred.column!r} of type {dt} is not filterable"
            )
        self._filters.append(pred)
        return self

    def set_aggregation(self, func: AggFunc, column: str) -> "QueryExecutor":
        if func is not AggFunc.COUNT:
            self._require_column(column)
        self._agg = (func, column)
        return self

    def set_group_by(self, column: str) -> "QueryExecutor":
        self._require_column(column)
        self._group_by = column
        return self

    # --- execution (cae/src/execution.cpp:251-401) ---

    def _scan(self) -> DataFrame:
        df = self._df
        for p in self._filters:
            df = df.filter(p.to_column())
        return df

    def execute_query(self) -> DataFrame:
        """Scan + filter + project (cae/src/execution.cpp:251-273)."""
        df = self._scan()
        if self._projection:
            df = df.select(*self._projection)
        return df

    def execute_aggregate(self) -> AggResult:
        """Single-pass count/sum/min/max of the agg column
        (cae/src/execution.cpp:275-337 populates all four regardless of the
        requested function — one HashAggregateExec does the same here)."""
        if self._agg is None:
            raise ValueError("no aggregation set")
        _, col = self._agg
        df = self._scan()
        if col:
            row = df.agg(
                F.count(F.lit(1)).alias("count"),
                F.sum(col).alias("sum"),
                F.min(col).alias("min"),
                F.max(col).alias("max"),
            ).collect()[0]
            return AggResult(row["count"], row["sum"], row["min"], row["max"])
        row = df.agg(F.count(F.lit(1)).alias("count")).collect()[0]
        return AggResult(row["count"], None, None, None)

    def aggregate_df(self) -> DataFrame:
        """DataFrame form of execute_aggregate (for composition / oracle)."""
        if self._agg is None:
            raise ValueError("no aggregation set")
        _, col = self._agg
        return self._scan().agg(
            F.count(F.lit(1)).alias("count"),
            F.sum(col).alias("sum"),
            F.min(col).alias("min"),
            F.max(col).alias("max"),
        )

    def execute_group_by(self, low_cardinality: bool = False) -> DataFrame:
        """Hash group-by on one key column with count/sum/min/max of the agg
        column, output sorted ascending by key (cae/src/execution.cpp:339-401;
        sort at :396-398). Spark runs this as partial+final hash aggregation —
        a strict upgrade over the reference's single-process hash map.

        ``low_cardinality=True`` declares that the key has few distinct
        values (the reference benchmark's group key has 4): the final sort
        then runs as coalesce(1) + partition-local sort instead of a global
        range exchange — one whole stage fewer, and the right plan whenever
        post-aggregation output is small no matter how big the input was.
        """
        if self._group_by is None:
            raise ValueError("no group-by column set")
        if self._agg is None:
            # cae/src/execution.cpp:344-346 requires an aggregation first.
            raise ValueError("group-by requires an aggregation to be set")
        from .session import small_scan_slices

        _, col = self._agg
        # Aggregate-shaped output (rows ≈ groups ≪ input): the same
        # derived small-scan policy as the ungrouped aggregate — per-task
        # scheduling dominates a provably-tiny scan, and the policy
        # self-deactivates on large or non-local inputs (session.py).
        if self._small_scan is False:
            self._small_scan = small_scan_slices(self._df)
        scan = self._scan()
        if self._small_scan:
            scan = scan.coalesce(self._small_scan)
        agg = (
            scan.groupBy(self._group_by)
            .agg(
                F.count(F.lit(1)).alias("count"),
                F.sum(col).alias("sum"),
                F.min(col).alias("min"),
                F.max(col).alias("max"),
            )
        )
        if low_cardinality:
            return agg.coalesce(1).sortWithinPartitions(self._group_by)
        return agg.orderBy(self._group_by)

    # --- helpers ---

    def _require_column(self, name: str) -> str:
        try:
            return self._types[name]
        except KeyError:
            raise KeyError(f"column not found: {name!r}") from None
