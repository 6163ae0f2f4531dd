"""Set operations (reference: ABSENT — SURVEY.md §2.8 extension surface).

Thin, explicit wrappers over the built-ins so the engine's API names the
semantics (bag vs set): union keeps duplicates, union_distinct /
intersect / except_ are set-semantics (each implies a shuffle-based
dedup — at scale prefer the *_all forms when the input is already unique).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION ALL by column name (order-robust)."""
    return a.unionByName(b)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersectAll(b)


def except_(a: DataFrame, b: DataFrame) -> DataFrame:
    """SQL EXCEPT (set semantics): distinct rows of a not present in b."""
    return a.subtract(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)
