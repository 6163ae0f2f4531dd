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


def _walk_logical(jnode):
    yield jnode
    ch = jnode.children()
    for i in range(ch.size()):
        yield from _walk_logical(ch.apply(i))


def unsafe_global_windows(
    df: DataFrame,
    low_card_cols: tuple[str, ...] = (),
    chunk_marker: str = "__chunk",
) -> list[str]:
    """Window nodes in the optimized logical plan that would collapse a
    data-proportional relation into one task at scale: an (effectively)
    global window — empty partition spec, or (when ``low_card_cols``
    names known fixed-cardinality keys like a document ``source``)
    partitioned only by those — whose input subtree contains NO
    Aggregate, i.e. it sorts raw data-proportional rows.

    Two shapes are scale-safe and therefore excluded:
    - a partition spec referencing a ``__chunk`` key (phase 1 of the
      two-phase prefix scan, operators/stats.two_phase_rank_cumsum —
      every task bounded by chunk occupancy);
    - a window whose subtree contains an Aggregate (it runs over a
      reduced relation: distinct values, chunk totals, group counts —
      the documented equidepth/pareto precondition).

    Per-key windows over keys whose cardinality GROWS with the data
    (user_id, part key...) keep bounded group sizes and are not
    candidates — only list a key in ``low_card_cols`` when its
    cardinality is fixed while its groups grow.

    Returns the offending Window nodes' partition specs (empty list ==
    safe), so tests can assert ``== []`` and failures name the node.
    """
    root = df._jdf.queryExecution().optimizedPlan()
    bad = []
    for n in _walk_logical(root):
        if n.nodeName() != "Window":
            continue
        spec = n.partitionSpec()
        exprs = [spec.apply(i).toString() for i in range(spec.size())]
        if any(chunk_marker in e for e in exprs):
            continue
        effectively_global = not exprs or all(
            any(c in e for c in low_card_cols) for e in exprs
        )
        if not effectively_global:
            continue
        subtree = list(_walk_logical(n))[1:]
        if any(m.nodeName() == "Aggregate" for m in subtree):
            continue
        bad.append(f"Window(partitionBy=[{' '.join(exprs)}])")
    return bad
