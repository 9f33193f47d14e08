"""Tests for the hierarchical-dictionary operators (operators/dicts.py):
closure correctness against a pure-Python walk, absent-key null_value
behavior, cycle detection, and the one-broadcast-join resolution shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.operators.dicts import (
    dict_get_hierarchy,
    dict_is_in,
    flatten_hierarchy,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["id", "parent"])


class TestFlatten:
    def test_matches_python_walk(self, spark):
        #   1 -> 10 -> 100 (root), 2 -> 10, 3 -> 20 -> 200 (root), 4 root
        pairs = [
            (1, 10), (2, 10), (3, 20), (10, 100), (20, 200),
            (100, None), (200, None), (4, None),
        ]
        flat = {
            r.id: r.path for r in flatten_hierarchy(_edges(spark, pairs)).collect()
        }
        parent = dict(pairs)

        def walk(i):
            path, cur = [i], parent.get(i)
            while cur is not None:
                path.append(cur)
                cur = parent.get(cur)
            return path

        assert set(flat) == {p[0] for p in pairs}
        for i in flat:
            assert flat[i] == walk(i), i

    def test_parent_absent_from_dict_terminates(self, spark):
        pairs = [(1, 99), (2, 1)]  # 99 is not a dictionary id
        flat = {
            r.id: r.path for r in flatten_hierarchy(_edges(spark, pairs)).collect()
        }
        assert flat[1] == [1, 99]
        assert flat[2] == [2, 1, 99]

    def test_cycle_raises(self, spark):
        pairs = [(1, 2), (2, 1)]
        with pytest.raises(ValueError, match="max_depth"):
            flatten_hierarchy(_edges(spark, pairs), max_depth=5)

    def test_deep_chain(self, spark):
        pairs = [(i, i + 1) for i in range(10)] + [(10, None)]
        flat = {
            r.id: r.path for r in flatten_hierarchy(_edges(spark, pairs)).collect()
        }
        assert flat[0] == list(range(11))


class TestDictGetHierarchy:
    def test_keys_resolve_and_absent_keys_self_path(self, spark):
        pairs = [(1, 10), (10, None)]
        keys = spark.createDataFrame([(1,), (10,), (42,)], ["k"])
        got = {
            r.k: r.path
            for r in dict_get_hierarchy(keys, _edges(spark, pairs), "k").collect()
        }
        assert got[1] == [1, 10]
        assert got[10] == [10]
        assert got[42] == [42]  # absent key -> null_value behavior

    def test_dict_is_in(self, spark):
        pairs = [(1, 10), (10, 100), (100, None)]
        keys = spark.createDataFrame([(1,)], ["k"])
        h = dict_get_hierarchy(keys, _edges(spark, pairs), "k")
        r = h.select(
            dict_is_in(F.lit(100)).alias("a"),
            dict_is_in(F.lit(999)).alias("b"),
        ).collect()[0]
        assert r.a is True and r.b is False

    def test_single_broadcast_join_no_fact_shuffle(self, spark):
        pairs = [(1, 10), (10, None)]
        keys = spark.range(1000).select((F.col("id") % 20).alias("k"))
        plan = (
            dict_get_hierarchy(keys, _edges(spark, pairs), "k")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # zero fact shuffle


class TestDictGetRange:
    def _dim(self, spark, rows):
        return spark.createDataFrame(
            rows, "k int, r_start int, r_end int, rate int"
        )

    def test_inclusive_bounds_and_default(self, spark):
        from kubenetmon_spark.operators.dicts import dict_get_range

        dim = self._dim(spark, [(1, 10, 19, 100), (1, 20, 29, 200)])
        facts = spark.createDataFrame(
            [(1, 9), (1, 10), (1, 19), (1, 20), (1, 30), (2, 15)],
            "k int, ts int",
        )
        got = {
            (r.k, r.ts): r.rate
            for r in dict_get_range(
                facts, dim, ["k"], "ts", "r_start", "r_end"
            ).collect()
        }
        # both ends inclusive (the ClickHouse range_hashed rule)
        assert got == {(1, 9): None, (1, 10): 100, (1, 19): 100,
                       (1, 20): 200, (1, 30): None, (2, 15): None}

    def test_strict_refuses_overlap(self, spark):
        from kubenetmon_spark.operators.dicts import dict_get_range

        dim = self._dim(spark, [(1, 10, 25, 100), (1, 20, 29, 200)])
        facts = spark.createDataFrame([(1, 22)], "k int, ts int")
        with pytest.raises(ValueError, match="overlapping"):
            dict_get_range(
                facts, dim, ["k"], "ts", "r_start", "r_end", strict=True
            )
        # overlap on DIFFERENT keys is fine
        ok = self._dim(spark, [(1, 10, 25, 100), (2, 20, 29, 200)])
        assert (
            dict_get_range(
                facts, ok, ["k"], "ts", "r_start", "r_end", strict=True
            ).collect()[0].rate
            == 100
        )

    def test_strict_refuses_equal_start_overlap(self, spark):
        # Regression: the self-join probe needs a.start < b.start, so
        # two ranges sharing a START (incl. exact duplicate rows) used
        # to slip past strict=True and silently duplicate facts.
        from kubenetmon_spark.operators.dicts import dict_get_range

        facts = spark.createDataFrame([(1, 22)], "k int, ts int")
        same_start = self._dim(spark, [(1, 20, 25, 100), (1, 20, 29, 200)])
        with pytest.raises(ValueError, match="equal-start"):
            dict_get_range(
                facts, same_start, ["k"], "ts", "r_start", "r_end", strict=True
            )
        dup_rows = self._dim(spark, [(1, 20, 29, 200), (1, 20, 29, 200)])
        with pytest.raises(ValueError, match="equal-start"):
            dict_get_range(
                facts, dup_rows, ["k"], "ts", "r_start", "r_end", strict=True
            )

    def test_broadcast_plan_no_fact_shuffle(self, spark):
        from kubenetmon_spark.operators.dicts import dict_get_range

        dim = self._dim(spark, [(1, 0, 100, 7)])
        facts = spark.createDataFrame([(1, 5)], "k int, ts int")
        plan = dict_get_range(
            facts, dim, ["k"], "ts", "r_start", "r_end"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
