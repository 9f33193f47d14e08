"""Tests for ClickHouse join-strictness analogues (operators/joins.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kubenetmon_spark.operators.joins import any_left_join


def test_at_most_one_match_and_deterministic_pick(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    right = spark.createDataFrame(
        [(1, "b", 20), (1, "a", 10), (2, "c", 30)], ["k", "val", "ord"]
    )
    out = any_left_join(
        left, right, ["k"], F.col("ord")
    ).orderBy("k").collect()
    assert len(out) == 3  # never explodes
    assert (out[0].k, out[0].val) == (1, "a")  # min ord wins
    assert (out[1].k, out[1].val) == (2, "c")
    assert out[2].k == 3 and out[2].val is None  # left row kept


def test_matches_repeat_runs(spark):
    import random

    rng = random.Random(5)
    left = spark.createDataFrame([(i,) for i in range(50)], ["k"])
    rows = [
        (rng.randrange(50), f"v{i}", i) for i in range(500)
    ]
    right = spark.createDataFrame(rows, ["k", "val", "ord"])
    a = sorted(
        (r.k, r.val)
        for r in any_left_join(left, right, ["k"], F.col("ord")).collect()
    )
    b = sorted(
        (r.k, r.val)
        for r in any_left_join(
            left, right, ["k"], F.col("ord"), broadcast_right=False
        ).collect()
    )
    assert a == b  # broadcast and shuffle paths agree
    # python reference: min ord per key
    best = {}
    for k, v, o in rows:
        if k not in best or o < best[k][1]:
            best[k] = (v, o)
    exp = sorted((k, best[k][0] if k in best else None) for k in range(50))
    assert a == exp


def test_empty_right_keeps_left(spark):
    left = spark.createDataFrame([(1,), (2,)], ["k"])
    right = spark.createDataFrame([], "k long, val string, ord long")
    out = any_left_join(left, right, ["k"], F.col("ord")).collect()
    assert len(out) == 2 and all(r.val is None for r in out)


class TestPasteJoin:
    def test_zips_rows_by_rank(self, spark):
        from kubenetmon_spark.operators.joins import paste_join

        a = spark.createDataFrame(
            [(x,) for x in [30, 10, 20, 40]], ["l"]
        )
        b = spark.createDataFrame(
            [(x,) for x in ["c", "a", "d", "b"]], ["r"]
        )
        got = sorted(
            (r.pos, r.l, r.r)
            for r in paste_join(a, b, ["l"], ["r"]).collect()
        )
        assert got == [(0, 10, "a"), (1, 20, "b"), (2, 30, "c"),
                       (3, 40, "d")]

    def test_shorter_side_truncates(self, spark):
        from kubenetmon_spark.operators.joins import paste_join

        a = spark.createDataFrame([(1,), (2,), (3,)], ["l"])
        b = spark.createDataFrame([(9,), (8,)], ["r"])
        assert paste_join(a, b, ["l"], ["r"]).count() == 2

    def test_overlapping_columns_rejected(self, spark):
        import pytest

        from kubenetmon_spark.operators.joins import paste_join

        a = spark.createDataFrame([(1,)], ["x"])
        with pytest.raises(ValueError):
            paste_join(a, a, ["x"], ["x"])
