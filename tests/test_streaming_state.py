"""read_state_or_none: missing vs crashed-first-write vs real state vs
broken state — the four cases whose conflation corrupts streams."""

from __future__ import annotations

import os

import pytest

from kubenetmon_spark.streaming.state import read_state_or_none


def test_missing_path_is_none(spark, tmp_path):
    assert read_state_or_none(spark, str(tmp_path / "nope")) is None


def test_crashed_first_write_is_none(spark, tmp_path):
    # a crashed FIRST write leaves only _temporary debris; Spark's
    # reader ignores underscore dirs, so counting them as "state
    # exists" would brick every subsequent batch with 'unable to
    # infer schema'. It must read as the documented no-state case.
    d = tmp_path / "state"
    (d / "_temporary" / "0" / "task").mkdir(parents=True)
    (d / "_temporary" / "0" / "task" / "part-0.parquet").write_bytes(
        b"not really parquet"
    )
    (d / ".hidden").mkdir()
    (d / ".hidden" / "part-1.parquet").write_bytes(b"x")
    assert read_state_or_none(spark, str(d)) is None


def test_committed_state_reads(spark, tmp_path):
    d = str(tmp_path / "state")
    spark.range(5).write.parquet(d)
    got = read_state_or_none(spark, d)
    assert got is not None and got.count() == 5


def test_corrupt_committed_state_fails_loud(spark, tmp_path):
    # a VISIBLE data file that cannot be read must raise, not reset
    d = tmp_path / "state"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"garbage, not parquet")
    with pytest.raises(Exception):
        df = read_state_or_none(spark, str(d))
        assert df is not None
        df.collect()


def test_uri_form_state_path(spark, tmp_path):
    d = str(tmp_path / "ustate")
    spark.range(7).write.parquet(d)
    got = read_state_or_none(spark, "file:" + d)
    assert got is not None and got.count() == 7
    assert read_state_or_none(spark, "file:" + str(tmp_path / "no")) is None
