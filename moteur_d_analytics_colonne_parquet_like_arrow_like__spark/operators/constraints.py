"""Data-quality constraint checks: declarative expectations evaluated as
one aggregated pass (plus one extra pass per uniqueness/referential rule).

The contract every production pipeline puts in front of a table (the
Deequ / dbt-test shape, re-expressed as plain DataFrame algebra):

- ``not_null(col)``            — count of NULLs
- ``in_range(col, lo, hi)``    — count of non-null values outside [lo, hi]
- ``accepted_values(col, vs)`` — count of non-null values not in ``vs``
- ``matches(col, regex)``      — count of non-null values not matching
- ``unique(cols)``             — count of rows carrying a duplicated key
- ``references(col, dim, dim_col)`` — count of FK values missing from dim

Row-predicate rules compile to conditional ``sum``s in ONE aggregation —
a single scan whatever the rule count, the way you'd run it nightly over
100 TB. ``unique`` adds one self-groupBy; ``references`` adds one
broadcast anti-join count per rule. The report is a single long-format
DataFrame (rule, violations) so it can gate a pipeline (``violations >
0`` → fail) or land in a metrics table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str
    col: str | None = None
    cols: tuple[str, ...] = ()
    lo: object = None
    hi: object = None
    values: tuple = ()
    regex: str | None = None
    dim: DataFrame | None = field(default=None, compare=False)
    dim_col: str | None = None


def not_null(col: str) -> Rule:
    return Rule(name=f"not_null({col})", kind="not_null", col=col)


def in_range(col: str, lo, hi) -> Rule:
    return Rule(name=f"in_range({col},{lo},{hi})", kind="in_range", col=col, lo=lo, hi=hi)


def accepted_values(col: str, values) -> Rule:
    return Rule(
        name=f"accepted_values({col})",
        kind="accepted_values",
        col=col,
        values=tuple(values),
    )


def matches(col: str, regex: str) -> Rule:
    return Rule(name=f"matches({col})", kind="matches", col=col, regex=regex)


def unique(*cols: str) -> Rule:
    return Rule(name=f"unique({','.join(cols)})", kind="unique", cols=tuple(cols))


def references(col: str, dim: DataFrame, dim_col: str) -> Rule:
    return Rule(
        name=f"references({col})",
        kind="references",
        col=col,
        dim=dim,
        dim_col=dim_col,
    )


def _violation_expr(r: Rule) -> Column:
    c = F.col(r.col)
    if r.kind == "not_null":
        pred = c.isNull()
    elif r.kind == "in_range":
        pred = c.isNotNull() & ~c.between(r.lo, r.hi)
    elif r.kind == "accepted_values":
        pred = c.isNotNull() & ~c.isin(*r.values)
    elif r.kind == "matches":
        pred = c.isNotNull() & ~c.rlike(r.regex)
    else:  # pragma: no cover - dispatch guarded by caller
        raise ValueError(f"not a row-predicate rule: {r.kind}")
    return F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(r.name)


def check_constraints(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule and return (rule, violations) — long format,
    ordered by rule name. All row-predicate rules share one aggregation
    pass; each unique/references rule contributes one extra counted
    plan unioned in (still one Spark action for the whole report)."""
    row_rules = [r for r in rules if r.kind not in ("unique", "references")]
    legs: list[DataFrame] = []
    if row_rules:
        agg = df.agg(*[_violation_expr(r) for r in row_rules])
        stack_args: list[Column] = []
        for r in row_rules:
            stack_args.append(F.lit(r.name))
            stack_args.append(F.col(r.name))
        n = len(row_rules)
        legs.append(
            agg.select(
                F.stack(F.lit(n), *stack_args).alias("rule", "violations")
            )
        )
    for r in rules:
        if r.kind == "unique":
            dup_rows = (
                df.groupBy(*r.cols)
                .agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > 1)
                .agg(
                    F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias(
                        "violations"
                    )
                )
            )
            legs.append(dup_rows.select(F.lit(r.name).alias("rule"), "violations"))
        elif r.kind == "references":
            missing = (
                df.where(F.col(r.col).isNotNull())
                .join(
                    F.broadcast(
                        r.dim.select(F.col(r.dim_col).alias(r.col)).distinct()
                    ),
                    r.col,
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
            )
            legs.append(missing.select(F.lit(r.name).alias("rule"), "violations"))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("rule")


def observed_quality(df: DataFrame, cols: list[str], name: str = "quality"):
    """Attach zero-cost quality metrics to a plan: row count plus per-column
    null counts ride the NEXT action on the returned DataFrame via
    ``df.observe`` (Spark's Observation API) — collected DURING the real
    job, no second scan. Returns ``(df, observation)``; read
    ``observation.get`` after any action.

    The observability half of check_constraints: run the report nightly,
    but observe every production write for free."""
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"nulls_{c}")
        )
    return df.observe(obs, *metrics), obs
