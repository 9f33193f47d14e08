"""Unit tests for the core-surface extension operators: sessionization,
time-series densification, connected components, deterministic sampling."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.operators.graph import connected_components, duplicate_clusters
from kubenetmon_spark.operators.sampling import deterministic_sample
from kubenetmon_spark.operators.sessions import session_stats, sessionize
from kubenetmon_spark.operators.timeseries import densify


def _ts(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        # user 1: events at 10:00, 10:10, 11:00 (gap 50 min > 30 min) -> 2 sessions
        df = spark.createDataFrame(
            [(1, 1, _ts(10, 0)), (1, 2, _ts(10, 10)), (1, 3, _ts(11, 0))],
            "user_id long, event_id long, ts timestamp",
        )
        out = sessionize(df, ["user_id"], gap_seconds=1800, order_cols=["event_id"])
        got = {r.event_id: r.session_id for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 2}

    def test_exact_gap_stays_in_session(self, spark):
        # gap of exactly gap_seconds does NOT split (strict > comparison)
        df = spark.createDataFrame(
            [(1, 1, _ts(10, 0)), (1, 2, _ts(10, 30))],
            "user_id long, event_id long, ts timestamp",
        )
        out = sessionize(df, ["user_id"], gap_seconds=1800, order_cols=["event_id"])
        assert {r.session_id for r in out.collect()} == {1}

    def test_keys_are_independent(self, spark):
        df = spark.createDataFrame(
            [(1, 1, _ts(10)), (2, 2, _ts(10)), (2, 3, _ts(12))],
            "user_id long, event_id long, ts timestamp",
        )
        stats = session_stats(df, ["user_id"], gap_seconds=1800, order_cols=["event_id"])
        per_user = {(r.user_id, r.session_id): r.n_events for r in stats.collect()}
        assert per_user == {(1, 1): 1, (2, 1): 1, (2, 2): 1}

    def test_duration(self, spark):
        df = spark.createDataFrame(
            [(1, 1, _ts(10, 0)), (1, 2, _ts(10, 20, 30))],
            "user_id long, event_id long, ts timestamp",
        )
        stats = session_stats(df, ["user_id"], gap_seconds=1800, order_cols=["event_id"])
        assert stats.collect()[0].duration_s == 20 * 60 + 30


class TestDensify:
    def test_fills_missing_buckets_with_zero(self, spark):
        observed = spark.createDataFrame(
            [("a", _ts(10), 5), ("a", _ts(13), 2)],
            "k string, bucket timestamp, n long",
        )
        keys = spark.createDataFrame([("a",), ("b",)], "k string")
        bounds = spark.createDataFrame(
            [(_ts(10), _ts(13))], "start timestamp, end timestamp"
        )
        out = densify(observed, keys, bounds, "bucket", step="1 hour")
        rows = {(r.k, r.bucket.hour): r.n for r in out.collect()}
        # full 2-key x 4-bucket grid, zeros where unobserved
        assert len(rows) == 8
        assert rows[("a", 10)] == 5 and rows[("a", 13)] == 2
        assert rows[("a", 11)] == 0 and rows[("b", 12)] == 0


class TestConnectedComponents:
    def test_two_components(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "src long, dst long"
        )
        comp = {r.node: r.comp for r in connected_components(edges).collect()}
        assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_chain_converges(self, spark):
        # a path graph needs diameter rounds — worst case for label propagation
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(8)], "src long, dst long"
        )
        comp = {r.node: r.comp for r in connected_components(edges).collect()}
        assert set(comp.values()) == {0} and len(comp) == 9

    def test_duplicate_clusters_column_names(self, spark):
        pairs = spark.createDataFrame([(5, 9)], "id_1 long, id_2 long")
        out = duplicate_clusters(pairs)
        assert set(out.columns) == {"node", "cluster_rep"}
        assert {(r.node, r.cluster_rep) for r in out.collect()} == {(5, 5), (9, 5)}


class TestDeterministicSample:
    def test_reproducible_and_partition_independent(self, spark):
        df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
        a = sorted(r.id for r in deterministic_sample(df, "id", 2500).collect())
        b = sorted(
            r.id
            for r in deterministic_sample(df.repartition(13), "id", 2500).collect()
        )
        assert a == b and len(a) > 0

    def test_rate_close_to_requested(self, spark):
        df = spark.createDataFrame([(i,) for i in range(4000)], "id long")
        n = deterministic_sample(df, "id", 2500).count()
        assert 0.2 < n / 4000 < 0.3

    def test_no_shuffle_in_plan(self, spark):
        df = spark.createDataFrame([(i,) for i in range(100)], "id long")
        plan = deterministic_sample(df, "id", 2500)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
