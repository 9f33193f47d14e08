from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.guards import (
    QueryLimitExceeded,
    check_scan_limits,
    estimate_scan,
    limited_collect,
)


@pytest.fixture(scope="module")
def flow_table(spark, tmp_path_factory):
    """Three date partitions with known row counts (10/20/30)."""
    path = str(tmp_path_factory.mktemp("guards") / "flows")
    rows = []
    for i, (d, n) in enumerate(
        [("2024-01-01", 10), ("2024-01-02", 20), ("2024-01-03", 30)]
    ):
        rows += [(d, f"pod{j % 4}", j + 100 * i) for j in range(n)]
    df = spark.createDataFrame(rows, "date string, pod string, bytes long")
    df.repartition(2).write.partitionBy("date").parquet(path)
    return path


class TestEstimateScan:
    def test_full_scan_matches_actual_counts(self, spark, flow_table):
        est = estimate_scan(flow_table)
        assert est.rows == 60
        assert est.n_partitions_total == 3
        assert est.n_partitions_scanned == 3
        assert est.n_files >= 3
        assert est.bytes_on_disk > 0

    def test_range_pruning_matches_filtered_count(self, spark, flow_table):
        est = estimate_scan(
            flow_table, min_value="2024-01-02", max_value="2024-01-03"
        )
        assert est.rows == 50 and est.n_partitions_scanned == 2
        actual = (
            spark.read.parquet(flow_table)
            .filter(F.col("date") >= "2024-01-02")
            .count()
        )
        assert est.rows == actual

    def test_value_list_pruning(self, flow_table):
        est = estimate_scan(flow_table, values=["2024-01-01"])
        assert est.rows == 10 and est.n_partitions_scanned == 1

    def test_unpartitioned_layout_is_one_pseudo_partition(
        self, spark, tmp_path
    ):
        p = str(tmp_path / "flat")
        spark.range(7).write.parquet(p)
        est = estimate_scan(p)
        assert est.rows == 7
        assert est.n_partitions_total == 1 and est.n_partitions_scanned == 1


class TestCheckScanLimits:
    def test_rows_limit_trips_and_boundary_passes(self, flow_table):
        with pytest.raises(QueryLimitExceeded, match="max_rows_to_read"):
            check_scan_limits(flow_table, max_rows_to_read=59)
        est = check_scan_limits(flow_table, max_rows_to_read=60)
        assert est.rows == 60

    def test_pruned_query_passes_where_full_scan_refused(self, flow_table):
        with pytest.raises(QueryLimitExceeded):
            check_scan_limits(flow_table, max_rows_to_read=30)
        est = check_scan_limits(
            flow_table,
            max_rows_to_read=30,
            min_value="2024-01-03",
        )
        assert est.rows == 30

    def test_bytes_limit_trips(self, flow_table):
        with pytest.raises(QueryLimitExceeded, match="max_bytes_to_read"):
            check_scan_limits(flow_table, max_bytes_to_read=10)


class TestLimitedCollect:
    def test_within_limit_returns_all(self, spark):
        rows = limited_collect(spark.range(5), max_result_rows=10)
        assert len(rows) == 5

    def test_overflow_throw(self, spark):
        with pytest.raises(QueryLimitExceeded, match="max_result_rows"):
            limited_collect(spark.range(100), max_result_rows=10)

    def test_overflow_break_truncates(self, spark):
        rows = limited_collect(
            spark.range(100),
            max_result_rows=10,
            result_overflow_mode="break",
        )
        assert len(rows) == 10

    def test_bad_mode_rejected(self, spark):
        with pytest.raises(ValueError):
            limited_collect(spark.range(1), result_overflow_mode="drop")

    def test_fast_query_passes_under_deadline(self, spark):
        rows = limited_collect(
            spark.range(10), max_execution_time_s=60, max_result_rows=20
        )
        assert len(rows) == 10

    def test_deadline_cancels_slow_query_and_session_survives(self, spark):
        def sleepy(it):
            for pdf in it:
                time.sleep(25)
                yield pdf

        slow = spark.range(4, numPartitions=4).mapInPandas(
            sleepy, "id long"
        )
        t0 = time.monotonic()
        with pytest.raises(QueryLimitExceeded, match="max_execution_time_s"):
            limited_collect(slow, max_execution_time_s=3)
        assert time.monotonic() - t0 < 20
        # the cancel must not poison the session
        assert spark.range(3).count() == 3


class TestReadFlowsGuarded:
    def test_refuses_full_scan_allows_pruned(self, spark, flow_table):
        from kubenetmon_spark.sink import read_flows_guarded

        with pytest.raises(QueryLimitExceeded):
            read_flows_guarded(spark, flow_table, max_rows_to_read=30)
        df = read_flows_guarded(
            spark,
            flow_table,
            date_min="2024-01-03",
            max_rows_to_read=30,
        )
        assert df.count() == 30
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "2024-01-03" in plan

    def test_estimate_equals_scan_rows_under_same_pruning(
        self, spark, flow_table
    ):
        from kubenetmon_spark.sink import read_flows_guarded

        df = read_flows_guarded(
            spark, flow_table, date_min="2024-01-02", date_max="2024-01-02"
        )
        est = estimate_scan(
            flow_table, min_value="2024-01-02", max_value="2024-01-02"
        )
        assert df.count() == est.rows == 20


class TestQuota:
    def test_quota_counts_window_and_trips(self, spark, tmp_path):
        from kubenetmon_spark.guards import check_quota
        from kubenetmon_spark.querylog import run_logged

        log = str(tmp_path / "qlog")
        # empty log: zero usage
        usage = check_quota(spark, log, "panel_a", max_queries=2)
        assert usage == {"queries": 0, "result_rows": 0}
        run_logged(spark, "panel_a", spark.range(5), log_path=log)
        run_logged(spark, "panel_a", spark.range(7), log_path=log)
        run_logged(spark, "panel_b", spark.range(3), log_path=log)
        # panel_a at its 2-query quota -> a third is refused
        with pytest.raises(QueryLimitExceeded, match="max_queries"):
            check_quota(spark, log, "panel_a", max_queries=2)
        # other principals unaffected; higher quota passes with usage
        assert check_quota(spark, log, "panel_b", max_queries=2) == {
            "queries": 1,
            "result_rows": 3,
        }
        usage = check_quota(spark, log, "panel_a", max_queries=10)
        assert usage == {"queries": 2, "result_rows": 12}
        # result-row quota trips too
        with pytest.raises(QueryLimitExceeded, match="result rows"):
            check_quota(spark, log, "panel_a", max_result_rows=12)

    def test_window_excludes_old_entries(self, spark, tmp_path):
        from kubenetmon_spark.guards import check_quota
        from kubenetmon_spark.querylog import run_logged

        log = str(tmp_path / "qlog2")
        run_logged(spark, "p", spark.range(4), log_path=log)
        # a "now" far in the future puts the entry outside the window
        usage = check_quota(
            spark, log, "p", window_s=60, max_queries=1,
            now=time.time() + 3600,
        )
        assert usage == {"queries": 0, "result_rows": 0}


class TestRowPolicies:
    def test_permissive_or_restrictive_and_default_deny(self, spark):
        from kubenetmon_spark.guards import RowPolicies

        df = spark.createDataFrame(
            [("teamA", "prod", 1), ("teamA", "dev", 2),
             ("teamB", "prod", 3), ("teamB", "dev", 4)],
            "team string, env string, v long",
        )
        pol = (
            RowPolicies()
            .add("flows", "alice", "team = 'teamA'")
            .add("flows", "alice", "env = 'prod'")  # OR: A-rows or prod-rows
            .add("flows", "bob", "team = 'teamB'")
            .add("flows", "bob", "env = 'prod'", restrictive=True)  # AND
        )
        alice = {r.v for r in pol.apply(df, "flows", "alice").collect()}
        assert alice == {1, 2, 3}
        bob = {r.v for r in pol.apply(df, "flows", "bob").collect()}
        assert bob == {3}
        # principal with no policy on a policied table sees nothing
        assert pol.apply(df, "flows", "mallory").count() == 0
        # unrestricted table passes through untouched
        assert pol.apply(df, "other_table", "mallory").count() == 4

    def test_policy_filter_reaches_the_scan(self, spark, tmp_path):
        from kubenetmon_spark.guards import RowPolicies

        p = str(tmp_path / "t")
        spark.createDataFrame(
            [("teamA", 1), ("teamB", 2)], "team string, v long"
        ).write.parquet(p)
        pol = RowPolicies().add("t", "alice", "team = 'teamA'")
        out = pol.apply(spark.read.parquet(p), "t", "alice")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "team" in plan
        assert [r.v for r in out.collect()] == [1]


class TestColumnPolicies:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, "alice", 100), (2, "bob", 200)],
            "id long, user string, amount int",
        )

    def test_grant_projects_and_prunes(self, spark, tmp_path):
        from kubenetmon_spark.guards import ColumnPolicies

        path = str(tmp_path / "cp_tbl")
        self._df(spark).write.parquet(path)
        p = ColumnPolicies().grant("t", "analyst", ["id", "amount"])
        out = p.apply(spark.read.parquet(path), "t", "analyst")
        assert out.columns == ["id", "amount"]
        # pruning reaches the SCAN: the ungranted column is never read
        plan = out._jdf.queryExecution().executedPlan().toString()
        read_schema = [
            ln for ln in plan.splitlines() if "ReadSchema" in ln
        ]
        assert read_schema and all("user" not in ln for ln in read_schema)

    def test_mask_hash_is_deterministic_and_joinable(self, spark):
        from kubenetmon_spark.guards import ColumnPolicies

        p = (
            ColumnPolicies()
            .grant("t", "auditor", ["id"])
            .mask("t", "auditor", "user", "hash")
        )
        a = p.apply(self._df(spark), "t", "auditor")
        b = p.apply(self._df(spark), "t", "auditor")
        assert a.join(b, ["id", "user"]).count() == 2  # same hashes
        vals = {r.user for r in a.collect()}
        assert "alice" not in vals and all(len(v) == 32 for v in vals)

    def test_mask_null_keeps_type(self, spark):
        from kubenetmon_spark.guards import ColumnPolicies

        p = (
            ColumnPolicies()
            .grant("t", "x", ["id"])
            .mask("t", "x", "amount", "null")
        )
        out = p.apply(self._df(spark), "t", "x")
        assert dict(out.dtypes)["amount"] == "int"
        assert all(r.amount is None for r in out.collect())

    def test_default_deny_and_unprotected_tables(self, spark):
        from kubenetmon_spark.guards import ColumnPolicies

        p = ColumnPolicies().grant("t", "analyst", ["id"])
        with pytest.raises(ValueError):
            p.apply(self._df(spark), "t", "stranger")
        # other tables unrestricted
        assert p.apply(self._df(spark), "other", "stranger").columns == [
            "id", "user", "amount",
        ]

    def test_bad_mask_mode(self, spark):
        from kubenetmon_spark.guards import ColumnPolicies

        with pytest.raises(ValueError):
            ColumnPolicies().mask("t", "x", "c", "rot13")
