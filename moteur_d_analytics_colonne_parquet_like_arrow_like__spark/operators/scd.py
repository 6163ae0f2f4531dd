"""Slowly-changing-dimension (type 2) history maintenance.

The reference engine has no mutation surface at all (append-only single
tables, ``cae/README.md:131-138``); the repo's snapshot tables add
copy-on-write MERGE. This completes the warehouse-dimension story: SCD2
keeps EVERY historical attribute value as a validity-interval row instead
of overwriting — the standard shape for dimensions joined to facts
"as of" the fact's timestamp (``operators/joins.py::asof_join`` is the
read-side twin).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    eff_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Apply one batch of dimension updates as SCD type-2 history.

    ``current`` holds the dimension with validity columns (``valid_to``
    NULL = open row); ``updates`` holds at most ONE new attribute tuple
    per key with its effective time ``eff_col``. Result:

    - closed history rows pass through untouched,
    - an open row whose attributes CHANGED is closed at the update's
      effective time and a new open row with the new attributes begins
      there,
    - an open row with no update, or an update carrying identical
      attributes (null-safe comparison), passes through unchanged,
    - a key with no current row at all inserts as a brand-new open row.

    Scale shape: every join/anti-join keys on the dimension key — one
    co-partitioned shuffle family; the updates side is typically small
    and broadcasts. No window functions, no driver-side state; applying
    a day's updates to a billion-row dimension is two keyed joins and a
    union.
    """
    keys = list(key_cols)
    open_rows = current.where(F.col(valid_to_col).isNull())
    closed_rows = current.where(F.col(valid_to_col).isNotNull())
    out_cols = [*keys, *attr_cols, valid_from_col, valid_to_col]

    u = updates.select(
        *keys,
        *[F.col(a).alias(f"__u_{a}") for a in attr_cols],
        F.col(eff_col).alias("__u_eff"),
    )
    j = open_rows.join(u, keys, "left")
    has_update = F.col("__u_eff").isNotNull()
    attrs_differ = reduce(
        lambda a, b: a | b,
        [~F.col(a).eqNullSafe(F.col(f"__u_{a}")) for a in attr_cols],
    )
    changed = has_update & attrs_differ

    closed_now = j.where(changed).select(
        *keys,
        *attr_cols,
        F.col(valid_from_col),
        F.col("__u_eff").alias(valid_to_col),
    )
    unchanged_open = j.where(~changed).select(*out_cols)
    new_open = j.where(changed).select(
        *keys,
        *[F.col(f"__u_{a}").alias(a) for a in attr_cols],
        F.col("__u_eff").alias(valid_from_col),
        F.lit(None).cast(dict(current.dtypes)[valid_to_col]).alias(valid_to_col),
    )
    brand_new = (
        u.join(current.select(*keys).distinct(), keys, "left_anti")
        .select(
            *keys,
            *[F.col(f"__u_{a}").alias(a) for a in attr_cols],
            F.col("__u_eff").alias(valid_from_col),
            F.lit(None)
            .cast(dict(current.dtypes)[valid_to_col])
            .alias(valid_to_col),
        )
    )
    return (
        closed_rows.select(*out_cols)
        .unionByName(unchanged_open)
        .unionByName(closed_now)
        .unionByName(new_open)
        .unionByName(brand_new)
    )


def scd2_point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key_cols: list[str],
    fact_ts_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time (PIT) join — the read side of SCD2: each fact joins
    the dimension row that was valid AT the fact's timestamp
    (``valid_from <= ts < valid_to``, open rows unbounded above). The
    warehouse staple for "what segment was this customer in when they
    ordered".

    Because SCD2 intervals are DISJOINT per key by construction
    (``scd2_apply`` closes a row exactly where the next begins), at most
    one dimension row matches each fact — so this is a plain keyed
    equi-join with a residual interval predicate, no dedup window, no
    as-of ranking. Catalyst shuffles on the dimension key only; the
    co-partitioned family every other keyed read shares. Column names
    must be disjoint apart from the keys (rename upstream). Only the
    inner form is provided: a facts-preserving variant needs the
    interval predicate INSIDE a left join's condition (see
    ``joins.asof_join`` for that composition) — an after-filter would
    silently drop facts whose key has history but no covering interval.
    """
    if how != "inner":
        raise ValueError(
            "scd2_point_in_time_join supports how='inner'; for a "
            "facts-preserving lookup use joins.asof_join against "
            "valid_from with the interval as a residual"
        )
    cond = (F.col(valid_from_col) <= F.col(fact_ts_col)) & (
        F.col(valid_to_col).isNull()
        | (F.col(fact_ts_col) < F.col(valid_to_col))
    )
    return facts.join(history, on=key_cols, how="inner").where(cond)
