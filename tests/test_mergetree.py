"""Tests for the Replacing/Collapsing MergeTree aggregation contracts."""

from __future__ import annotations

from kubenetmon_spark.operators.mergetree import (
    collapsing_aggregate,
    replacing_aggregate,
)


class TestReplacing:
    def test_highest_version_wins(self, spark):
        df = spark.createDataFrame(
            [
                ("a", 1, 10),
                ("a", 3, 30),
                ("a", 2, 20),
                ("b", 1, 99),
            ],
            "k string, ver long, val long",
        )
        got = {
            r["k"]: (r["ver"], r["val"])
            for r in replacing_aggregate(df, ["k"], "ver").collect()
        }
        assert got == {"a": (3, 30), "b": (1, 99)}

    def test_version_tie_pins_greatest_payload(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 10), ("a", 1, 20)], "k string, ver long, val long"
        )
        got = replacing_aggregate(df, ["k"], "ver").collect()
        assert got[0]["val"] == 20

    def test_idempotent(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 10), ("a", 2, 20), ("b", 5, 50)],
            "k string, ver long, val long",
        )
        once = replacing_aggregate(df, ["k"], "ver")
        twice = replacing_aggregate(once, ["k"], "ver")
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


class TestCollapsing:
    def test_cancelled_keys_vanish(self, spark):
        df = spark.createDataFrame(
            [
                ("a", 1, 10),   # insert
                ("a", -1, 10),  # cancel -> key a nets to zero
                ("b", 1, 5),
                ("b", 1, 7),
            ],
            "k string, sign int, val long",
        )
        got = {
            r["k"]: (r["net_val"], r["n_rows"])
            for r in collapsing_aggregate(df, ["k"], "sign", ["val"]).collect()
        }
        assert got == {"b": (12, 2)}

    def test_update_via_cancel_insert(self, spark):
        # the ClickHouse update idiom: cancel the old state, insert new
        df = spark.createDataFrame(
            [("a", 1, 10), ("a", -1, 10), ("a", 1, 25)],
            "k string, sign int, val long",
        )
        got = collapsing_aggregate(df, ["k"], "sign", ["val"]).collect()
        assert got[0]["net_val"] == 25

    def test_partial_then_final_fold_associative(self, spark):
        """Sign-weighted sums are associative: folding two halves with
        the sign kept, then folding the union, equals one global fold."""
        from pyspark.sql import functions as F

        rows = [("a", 1, 10), ("a", 1, 3), ("a", -1, 10), ("b", 1, 4)]
        df = spark.createDataFrame(rows, "k string, sign int, val long")
        direct = collapsing_aggregate(df, ["k"], "sign", ["val"])

        h1 = df.filter(F.col("val") >= 5)
        h2 = df.filter(F.col("val") < 5)
        merged = h1.unionByName(h2)
        refolded = collapsing_aggregate(merged, ["k"], "sign", ["val"])
        assert sorted((r["k"], r["net_val"]) for r in direct.collect()) == sorted(
            (r["k"], r["net_val"]) for r in refolded.collect()
        )


class TestVersionedCollapsing:
    def test_cancel_must_match_version(self, spark):
        from kubenetmon_spark.operators.mergetree import (
            versioned_collapsing_latest,
        )

        rows = [
            # key A: v1 inserted, v2 inserted then cancelled -> survives v1
            ("A", 1, 10, 1), ("A", 2, 20, 1), ("A", 2, 20, -1),
            # key B: cancel arrives BEFORE its insert (out of order) and
            # a plain-collapsing engine would net it against v1 — here it
            # only kills v2; v3 survives
            ("B", 2, 99, -1), ("B", 1, 11, 1), ("B", 2, 99, 1),
            ("B", 3, 33, 1),
            # key C: everything cancelled -> key disappears
            ("C", 1, 5, 1), ("C", 1, 5, -1),
        ]
        df = spark.createDataFrame(rows, ["k", "version", "v", "sign"])
        got = {
            r.k: (r.version, r.v)
            for r in versioned_collapsing_latest(
                df, ["k"], "version", "sign", ["v"]
            ).collect()
        }
        assert got == {"A": (1, 10), "B": (3, 33)}
        assert "C" not in got
