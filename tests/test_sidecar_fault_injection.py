"""Fault-injection: every JSON-sidecar consumer fails LOUD on a
truncated read, never open.

fs.py's ``write_text_atomic`` documents that on HDFS a reader racing
the writer's close can observe a short read (object stores PUT whole,
local disk rename-publishes — HDFS is the one store with the window).
The module's safety claim is that a short read "surfaces as a loud
parse error in every caller, never as silently-empty state". This file
PROVES that claim: for each sidecar consumer, set up valid state,
truncate the sidecar THROUGH THE ADAPTER to a prefix of its real
bytes, invoke the consumer, and assert it raises — and specifically
does not return the empty/default value that would read as fail-open.

Consumers covered (all `fs.read_json` call sites in the engine):
- evolve: schema log (`schema_log`, `read_evolved`)
- sink: backup manifest (`restore_table`, incremental `backup_table`)
- skipindex: index spec (`list_indexes`)
- mv: rollup refresh state (`refresh_rollup`)
- cache: entry meta (`cached`, `cache_entries`)
- streaming rates buffer: versioned parquet, truncated data file
  (parquet footer validation is the loud failure there)

Not covered, by design: streaming batch markers (streaming/job.py) and
the rates buffer's _SUCCESS files are EXISTENCE-ONLY — their content is
never parsed, an empty file is their complete value, so there is no
short-read window to inject (write_bytes_atomic of b"" has nothing to
truncate).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kubenetmon_spark import fs as _fsm


def _truncate_sidecar(path: str) -> None:
    """Replace a sidecar with a strict prefix of its bytes (mid-JSON),
    through the adapter — the HDFS short-read shape."""
    fs = _fsm.get_fs(path)
    data = fs.read_bytes(path)
    assert len(data) > 4, "sidecar too small to truncate meaningfully"
    fs.write_bytes_atomic(path, data[: len(data) // 2])


LOUD = (json.JSONDecodeError, ValueError, KeyError)


class TestSidecarTruncation:
    def test_evolve_schema_log(self, spark, tmp_path):
        from kubenetmon_spark.evolve import add_column, read_evolved, schema_log

        tbl = str(tmp_path / "t")
        spark.range(10).selectExpr("id", "id*2 AS v").write.parquet(tbl)
        add_column(tbl, "c", "int")
        assert len(schema_log(tbl)) == 1
        _truncate_sidecar(tbl + "/_schema_log.json")
        with pytest.raises(LOUD):
            schema_log(tbl)  # must NOT come back as [] (no-ops)
        with pytest.raises(LOUD):
            read_evolved(spark, tbl).columns

    def test_backup_manifest_restore(self, spark, tmp_path):
        from kubenetmon_spark.sink import backup_table, restore_table

        tbl = str(tmp_path / "t")
        spark.range(10).selectExpr("id").write.parquet(tbl)
        backup = str(tmp_path / "b")
        backup_table(tbl, backup)
        _truncate_sidecar(backup + "/_manifest.json")
        with pytest.raises(LOUD):
            restore_table(backup, str(tmp_path / "restored"))
        assert not (tmp_path / "restored" / "_SUCCESS").exists()

    def test_backup_manifest_incremental_base(self, spark, tmp_path):
        from kubenetmon_spark.sink import backup_table

        tbl = str(tmp_path / "t")
        spark.range(10).selectExpr("id").write.parquet(tbl)
        base = str(tmp_path / "base")
        backup_table(tbl, base)
        _truncate_sidecar(base + "/_manifest.json")
        with pytest.raises(LOUD):
            # incremental backup reads the BASE manifest; a truncated
            # base must refuse, not silently take a full backup
            backup_table(tbl, str(tmp_path / "incr"), base_backup=base)

    def test_skipindex_spec(self, spark, tmp_path):
        from kubenetmon_spark.operators.skipindex import (
            IndexSpec,
            build_skip_index,
            list_indexes,
        )

        tbl = str(tmp_path / "t")
        spark.range(100).selectExpr(
            "id", "concat('u', id % 10) AS user_id"
        ).write.parquet(tbl)
        idx_dir = str(tmp_path / "idx")
        build_skip_index(spark, tbl, [IndexSpec("user_id", "minmax")], idx_dir)
        specs = list_indexes(idx_dir)
        assert len(specs) == 1
        name = next(iter(specs))
        _truncate_sidecar(f"{idx_dir}/{name}/_spec.json")
        with pytest.raises(LOUD):
            list_indexes(idx_dir)  # must NOT skip the entry / return {}

    def test_mv_refresh_state(self, spark, tmp_path):
        from kubenetmon_spark.operators.mv import refresh_rollup

        fact = str(tmp_path / "fact")
        spark.range(100).selectExpr(
            "CAST(date_add('2024-01-01', CAST(id % 3 AS INT)) AS STRING) AS date",
            "id % 5 AS k",
            "id AS v",
        ).write.partitionBy("date").parquet(fact)
        rollup = str(tmp_path / "rollup")
        args = (spark, fact, rollup, ["date", "k"], {"v_sum": F.col("v")})
        refresh_rollup(*args)
        _truncate_sidecar(rollup + "/_refresh_state.json")
        with pytest.raises(LOUD):
            # must NOT silently treat corrupt state as "first refresh"
            # (a full rebuild would mask the corruption)
            refresh_rollup(*args)

    def test_cache_meta(self, spark, tmp_path):
        from kubenetmon_spark.cache import cache_entries, cached

        cache_dir = str(tmp_path / "cache")
        df = spark.range(10).selectExpr("id", "id * 2 AS v")
        cached(spark, df, cache_dir).count()
        entries = cache_entries(cache_dir)
        assert len(entries) == 1
        key = entries[0]["key"]
        _truncate_sidecar(f"{cache_dir}/{key}/_meta.json")
        with pytest.raises(LOUD):
            cache_entries(cache_dir)
        with pytest.raises(LOUD):
            # a TTL'd lookup must not silently serve or silently
            # recompute over a corrupt meta
            cached(spark, df, cache_dir, ttl_s=3600).count()

    def test_rates_buffer_truncated_parquet(self, spark, tmp_path):
        from kubenetmon_spark.streaming.rates import read_buffer

        buf = str(tmp_path / "buf")
        spark.createDataFrame(
            [("k1", 100, 5)], "k string, ts_s long, v long"
        ).write.parquet(buf + "/v=1")
        assert read_buffer(spark, buf).count() == 1
        fs = _fsm.get_fs(buf)
        pq = [p for p in fs.glob_parquet(buf + "/v=1")][0]
        fs.write_bytes_atomic(pq, fs.read_bytes(pq)[:64])
        with pytest.raises(Exception) as exc_info:
            read_buffer(spark, buf).count()
        # loud parquet/footer error, not an empty DataFrame
        assert "parquet" in str(exc_info.value).lower() or "footer" in str(
            exc_info.value
        ).lower() or "Py4JJavaError" in type(exc_info.value).__name__
