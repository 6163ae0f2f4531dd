"""Incremental materialized-view maintenance driven by snapshot CDC
(reference: ABSENT — SURVEY.md §2 extension surface; composes
``sources.snapshots.snapshot_diff`` with aggregate algebra).

The lakehouse question this answers: a per-group aggregate view over a
100 TB table changed by a merge touching 0.1% of keys — refresh it by
rescanning 100 TB, or by processing the 0.1%? Distributive aggregates
(count, sum) admit exact delta maintenance: every CDC row contributes
``new - old`` to its group, and the view absorbs the per-group deltas in
one small outer join. Cost is O(changes), the only form that survives a
big table; the same algebra is what Materialize/Delta Live Tables run
continuously.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def agg_view(df: DataFrame, group_col: str, value_col: Column | str) -> DataFrame:
    """The materialized shape this module maintains: per-group row count
    and DECIMAL-routed value sum (order-independent, so the maintained
    and recomputed views are bit-comparable)."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("__sum_dec"),
    )


def maintain_agg_view(
    view: DataFrame,
    diff: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Apply a ``snapshot_diff`` change set to an ``agg_view``
    materialization: inserts contribute (+1, +new value), deletes
    (-1, -old value), group-stable updates (0, new - old). An update
    whose GROUP column changed (same primary key, row moved between
    groups — ``snapshot_diff`` classifies it as change_op='update'
    because it full-outer-joins on the key) is split into its two group
    contributions: (-1, -old value) to the old group and (+1, +new
    value) to the new group, so neither group's count or sum goes
    stale. Groups whose count reaches zero drop out of the view (their
    sum is exactly zero too — decimal algebra, no float residue).

    Plan shape: one per-row explode of at most 2 contribution structs,
    one groupBy over the (small) diff, one outer join against the view
    keyed on the group — never a scan of the base table. At 100 TB the
    view refresh touches only changed groups.
    """
    g_new = F.col("new_values").getField(group_col)
    g_old = F.col("old_values").getField(group_col)
    v_new = F.col("new_values").getField(value_col).cast("decimal(18,2)")
    v_old = F.col("old_values").getField(value_col).cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    is_ins = F.col("change_op") == "insert"
    is_del = F.col("change_op") == "delete"
    is_upd = F.col("change_op") == "update"
    moved = is_upd & ~g_new.eqNullSafe(g_old)
    # NEW-side contribution (inserts, updates; absent for deletes):
    # a moved update adds a full (+1, +new) to the new group, a stable
    # update contributes (0, new - old) to its single group.
    new_side = F.when(
        is_ins | is_upd,
        F.struct(
            g_new.alias("g"),
            F.when(is_ins | moved, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("dn"),
            (
                F.coalesce(v_new, zero)
                - F.when(is_upd & ~moved, F.coalesce(v_old, zero)).otherwise(
                    zero
                )
            ).alias("dv"),
        ),
    )
    # OLD-side contribution (deletes, moved updates): (-1, -old).
    old_side = F.when(
        is_del | moved,
        F.struct(
            g_old.alias("g"),
            F.lit(-1).cast("bigint").alias("dn"),
            (zero - F.coalesce(v_old, zero)).alias("dv"),
        ),
    )
    contrib = diff.select(
        F.explode(
            F.filter(
                F.array(new_side, old_side), lambda c: c.isNotNull()
            )
        ).alias("__c")
    ).select(
        F.col("__c.g").alias(group_col),
        F.col("__c.dn").alias("__dn"),
        F.col("__c.dv").alias("__dv"),
    )
    deltas = contrib.groupBy(group_col).agg(
        F.sum("__dn").cast("bigint").alias("__dn"),
        F.sum("__dv").cast("decimal(18,2)").alias("__dv"),
    )
    merged = view.join(deltas, group_col, "full_outer").select(
        F.col(group_col),
        (F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0)))
        .cast("bigint")
        .alias("n_rows"),
        (
            F.coalesce(F.col("__sum_dec"), zero)
            + F.coalesce(F.col("__dv"), zero)
        )
        .cast("decimal(18,2)")
        .alias("__sum_dec"),
    )
    return merged.where(F.col("n_rows") > 0)
