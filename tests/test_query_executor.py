"""Operator tests replicating every golden assert from the reference's
test_execution.cpp (SURVEY.md §5 item 3) on the same 5-row fixture."""

from __future__ import annotations

import pytest

from moteur_d_analytics_colonne_parquet_like_arrow_like__spark import (
    AggFunc,
    CompareOp,
    Predicate,
    QueryExecutor,
)


def test_full_scan(spark, exec_basic_path):
    # cae/tests/test_execution.cpp:69-91
    df = QueryExecutor(spark, exec_basic_path).execute_query()
    assert df.count() == 5
    assert set(df.columns) == {"id", "value", "category"}


def test_filtered_scan_gt150(spark, exec_basic_path):
    # cae/tests/test_execution.cpp:93-114 — 3 rows, all values > 150
    qe = QueryExecutor(spark, exec_basic_path)
    qe.add_filter(Predicate("value", CompareOp.GT, 150))
    rows = qe.execute_query().collect()
    assert len(rows) == 3
    assert all(r["value"] > 150 for r in rows)


def test_projection(spark, exec_basic_path):
    # cae/tests/test_execution.cpp:116-133
    qe = QueryExecutor(spark, exec_basic_path)
    qe.set_projection(["id", "value"])
    df = qe.execute_query()
    assert df.columns == ["id", "value"]
    assert df.count() == 5


def test_count(spark, exec_basic_path):
    # cae/tests/test_execution.cpp:135-149 — COUNT = 5
    qe = QueryExecutor(spark, exec_basic_path)
    qe.set_aggregation(AggFunc.COUNT, "id")
    assert qe.execute_aggregate().count == 5


def test_sum(spark, exec_basic_path):
    # cae/tests/test_execution.cpp:151-166 — SUM(value) = 1000; single pass
    # returns all four (execution.cpp:296-334)
    qe = QueryExecutor(spark, exec_basic_path)
    qe.set_aggregation(AggFunc.SUM, "value")
    res = qe.execute_aggregate()
    assert res.count == 5
    assert res.sum == 1000
    assert res.min == 100
    assert res.max == 300


def test_filtered_count(spark, exec_basic_path):
    # cae/tests/test_execution.cpp:168-183 — COUNT after value>150 = 3
    qe = QueryExecutor(spark, exec_basic_path)
    qe.add_filter(Predicate("value", CompareOp.GT, 150))
    qe.set_aggregation(AggFunc.COUNT, "id")
    assert qe.execute_aggregate().count == 3


def test_group_by_counts_and_sums(spark, exec_basic_path):
    # cae/tests/test_execution.cpp:185-237 — A=2/B=2/C=1; sums 250/450/300;
    # sorted ascending by key (execution.cpp:396-398)
    qe = QueryExecutor(spark, exec_basic_path)
    qe.set_aggregation(AggFunc.SUM, "value")
    qe.set_group_by("category")
    rows = qe.execute_group_by().collect()
    assert [r["category"] for r in rows] == ["A", "B", "C"]
    assert [r["count"] for r in rows] == [2, 2, 1]
    assert [r["sum"] for r in rows] == [250, 450, 300]


def test_fully_filtered_returns_empty_not_crash(spark, exec_basic_path):
    # SURVEY §2.1: reference throws "No more batches after skipping"
    # (execution.cpp:118-124) when every row group is skippable — we return 0.
    qe = QueryExecutor(spark, exec_basic_path)
    qe.add_filter(Predicate("value", CompareOp.GT, 10_000))
    assert qe.execute_query().count() == 0
    qe.set_aggregation(AggFunc.SUM, "value")
    res = qe.execute_aggregate()
    assert res.count == 0
    assert res.min is None and res.max is None  # execution.h:73-74 optionals


def test_conjunctive_filters(spark, exec_basic_path):
    # Multiple add_filter calls AND together (execution.cpp:163-188).
    qe = QueryExecutor(spark, exec_basic_path)
    qe.add_filter(Predicate("value", CompareOp.GE, 150))
    qe.add_filter(Predicate("value", CompareOp.LE, 250))
    assert qe.execute_query().count() == 3


def test_all_compare_ops(spark, exec_basic_path):
    expected = {
        CompareOp.EQ: 1,  # value == 200
        CompareOp.NE: 4,
        CompareOp.LT: 2,
        CompareOp.LE: 3,
        CompareOp.GT: 2,
        CompareOp.GE: 3,
    }
    for op, n in expected.items():
        qe = QueryExecutor(spark, exec_basic_path)
        qe.add_filter(Predicate("value", op, 200))
        assert qe.execute_query().count() == n, op


def test_string_filter_supported(spark, exec_basic_path):
    # Documented divergence: reference silently ignores string filters
    # (execution.cpp:170-182); we evaluate them.
    qe = QueryExecutor(spark, exec_basic_path)
    qe.add_filter(Predicate("category", CompareOp.EQ, "A"))
    assert qe.execute_query().count() == 2


def test_unknown_column_raises(spark, exec_basic_path):
    qe = QueryExecutor(spark, exec_basic_path)
    with pytest.raises(KeyError):
        qe.add_filter(Predicate("nope", CompareOp.EQ, 1))
    with pytest.raises(KeyError):
        qe.set_projection(["nope"])
    with pytest.raises(KeyError):
        qe.set_group_by("nope")


def test_group_by_requires_aggregation(spark, exec_basic_path):
    # cae/src/execution.cpp:344-346
    qe = QueryExecutor(spark, exec_basic_path)
    qe.set_group_by("category")
    with pytest.raises(ValueError):
        qe.execute_group_by()


def test_predicate_parse():
    p = Predicate.parse("value", "gt", "150")
    assert p.op is CompareOp.GT and p.value == 150
    p = Predicate.parse("value", "le", "1.5")
    assert p.value == 1.5
    p = Predicate.parse("region", "eq", "north")
    assert p.value == "north"
    with pytest.raises(ValueError):
        Predicate.parse("value", "zz", "1")
