"""Tests for incremental materialized-aggregate maintenance (operators/mv.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.operators.mv import (
    aggregate_delta,
    merge_rollup,
    refresh_rollup,
)


def _facts(spark, rows):
    return spark.createDataFrame(rows, "date string, k string, v long")


def _sum_exprs():
    # built lazily: Column construction needs an active SparkContext
    return {"n": F.lit(1), "v": F.col("v")}


KEYS = ["date", "k"]


def _read_rollup(spark, path):
    return {
        (r.date, r.k): (r.n, r.v) for r in spark.read.parquet(path).collect()
    }


class TestMergeRollup:
    def test_batch_order_independence(self, spark):
        rows = [("d1", "a", 10), ("d1", "a", 5), ("d1", "b", 1), ("d2", "a", 7)]
        full = aggregate_delta(_facts(spark, rows), KEYS, _sum_exprs())
        b1 = aggregate_delta(_facts(spark, rows[:2]), KEYS, _sum_exprs())
        b2 = aggregate_delta(_facts(spark, rows[2:]), KEYS, _sum_exprs())
        merged_ab = merge_rollup([b1, b2], KEYS, ["n", "v"])
        merged_ba = merge_rollup([b2, b1], KEYS, ["n", "v"])
        want = {(r.date, r.k): (r.n, r.v) for r in full.collect()}
        assert {(r.date, r.k): (r.n, r.v) for r in merged_ab.collect()} == want
        assert {(r.date, r.k): (r.n, r.v) for r in merged_ba.collect()} == want


class TestRefreshRollup:
    def test_partition_incremental_refresh(self, spark, tmp_path):
        fact_path = str(tmp_path / "fact")
        rollup_path = str(tmp_path / "rollup")
        w = lambda df: df.write.mode("append").partitionBy("date").parquet(fact_path)

        w(_facts(spark, [("d1", "a", 10), ("d1", "a", 5), ("d2", "b", 3)]))
        changed = refresh_rollup(
            spark, fact_path, rollup_path, KEYS, _sum_exprs()
        )
        assert changed == ["d1", "d2"]
        assert _read_rollup(spark, rollup_path) == {
            ("d1", "a"): (2, 15),
            ("d2", "b"): (1, 3),
        }

        # no fact changes -> refresh is a no-op
        assert refresh_rollup(spark, fact_path, rollup_path, KEYS, _sum_exprs()) == []

        # append to d1 only; d2's rollup partition must not be rewritten
        w(_facts(spark, [("d1", "b", 100)]))
        changed = refresh_rollup(spark, fact_path, rollup_path, KEYS, _sum_exprs())
        assert changed == ["d1"]
        assert _read_rollup(spark, rollup_path) == {
            ("d1", "a"): (2, 15),
            ("d1", "b"): (1, 100),
            ("d2", "b"): (1, 3),
        }

    def test_dropped_fact_partition_mirrored(self, spark, tmp_path):
        import shutil

        fact_path = str(tmp_path / "fact")
        rollup_path = str(tmp_path / "rollup")
        (
            _facts(spark, [("d1", "a", 1), ("d2", "a", 2)])
            .write.mode("append")
            .partitionBy("date")
            .parquet(fact_path)
        )
        refresh_rollup(spark, fact_path, rollup_path, KEYS, _sum_exprs())
        # retention drops a whole fact partition (sink.apply_retention shape)
        shutil.rmtree(tmp_path / "fact" / "date=d1")
        changed = refresh_rollup(spark, fact_path, rollup_path, KEYS, _sum_exprs())
        assert changed == ["d1"]
        assert _read_rollup(spark, rollup_path) == {("d2", "a"): (1, 2)}

    def test_refresh_matches_full_aggregation_randomized(self, spark, tmp_path):
        """Whatever the append pattern, the incrementally-maintained rollup
        must equal one full aggregation over everything appended so far."""
        import random

        rng = random.Random(7)
        fact_path = str(tmp_path / "fact")
        rollup_path = str(tmp_path / "rollup")
        all_rows: list[tuple[str, str, int]] = []
        for _ in range(4):
            batch = [
                (f"d{rng.randint(1, 3)}", rng.choice("ab"), rng.randint(1, 100))
                for _ in range(rng.randint(1, 6))
            ]
            all_rows += batch
            _facts(spark, batch).write.mode("append").partitionBy("date").parquet(
                fact_path
            )
            refresh_rollup(spark, fact_path, rollup_path, KEYS, _sum_exprs())
            want = {
                (r.date, r.k): (r.n, r.v)
                for r in aggregate_delta(
                    _facts(spark, all_rows), KEYS, _sum_exprs()
                ).collect()
            }
            assert _read_rollup(spark, rollup_path) == want

    def test_partition_col_must_be_key(self, spark, tmp_path):
        with pytest.raises(ValueError):
            refresh_rollup(
                spark, str(tmp_path), str(tmp_path / "r"), ["k"], _sum_exprs()
            )


class TestAnswerFromRollup:
    def _setup(self, spark, tmp_path):
        from kubenetmon_spark.operators.mv import refresh_rollup

        rows = [
            ("2024-01-01", "a", 1), ("2024-01-01", "a", 2),
            ("2024-01-01", "b", 10), ("2024-01-02", "a", 5),
            ("2024-01-02", "b", 20), ("2024-01-02", "b", 30),
        ]
        base = str(tmp_path / "base")
        _facts(spark, rows).write.partitionBy("date").parquet(base)
        fine = str(tmp_path / "roll_fine")    # by (date, k)
        coarse = str(tmp_path / "roll_date")  # by (date)
        refresh_rollup(spark, base, fine, ["date", "k"], _sum_exprs())
        refresh_rollup(spark, base, coarse, ["date"], _sum_exprs())
        return base, {fine: ["date", "k"], coarse: ["date"]}

    def test_routes_to_smallest_capable_rollup(self, spark, tmp_path):
        from kubenetmon_spark.operators.mv import answer_from_rollup

        base, rollups = self._setup(spark, tmp_path)
        # group by date: the coarse (date) rollup suffices and wins
        got = answer_from_rollup(spark, base, rollups, ["date"], ["v"])
        files = got.inputFiles()
        assert all("roll_date" in f for f in files)
        vals = {str(r.date): r.v for r in got.collect()}
        assert vals == {"2024-01-01": 13, "2024-01-02": 55}
        # group by (date, k): only the fine rollup qualifies
        got2 = answer_from_rollup(
            spark, base, rollups, ["date", "k"], ["v"]
        )
        assert all("roll_fine" in f for f in got2.inputFiles())
        assert {(str(r.date), r.k): r.v for r in got2.collect()}[
            ("2024-01-02", "b")
        ] == 50

    def test_falls_back_to_base(self, spark, tmp_path):
        from kubenetmon_spark.operators.mv import answer_from_rollup

        base, rollups = self._setup(spark, tmp_path)
        got = answer_from_rollup(spark, base, rollups, ["k"], ["v"])
        assert all("base" in f for f in got.inputFiles())
        assert {r.k: r.v for r in got.collect()} == {"a": 8, "b": 60}
