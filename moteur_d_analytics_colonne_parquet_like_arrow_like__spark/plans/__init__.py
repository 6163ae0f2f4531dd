"""Physical-plan inspection: verify pushdown, pruning, and join strategies.

The reference hand-implements its optimizations (zone-map skipping, column
pruning, predicate-in-scan — SURVEY.md §4.1); on Spark they are Catalyst
rules whose presence we *verify* rather than implement. These helpers parse
``explain("formatted")`` output so tests can assert that:

- filters reached the parquet scan (``PushedFilters``),
- only needed columns are read (``ReadSchema``),
- a join is broadcast when a side is small,
- whole-stage codegen covers the hot path.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def scan_info(df: DataFrame) -> dict:
    """Extract PushedFilters / ReadSchema from each parquet scan node."""
    plan = formatted_plan(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "pushed_filters": [p.strip() for p in pushed],
        "read_schemas": [s.strip() for s in schemas],
        "plan": plan,
    }


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    info = scan_info(df)
    return any(fragment in p for p in info["pushed_filters"])


def read_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each scan (column-pruning check)."""
    out = []
    for s in scan_info(df)["read_schemas"]:
        cols = set()
        depth = 0
        name = ""
        for ch in s:
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            elif depth == 0 and ch == ",":
                name = ""
                continue
            if depth == 0 and ch == ":" and name:
                cols.add(name.strip())
                name = "\0"  # sentinel: skip until next comma
            elif depth == 0 and name != "\0":
                name += ch
        out.append({c for c in cols if c})
    return out


def join_strategies(df: DataFrame) -> list[str]:
    """Join exec node names in the physical plan (BroadcastHashJoin etc.)."""
    plan = formatted_plan(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in join_strategies(df)


def codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider is better for the hot path)."""
    plan = formatted_plan(df)
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
