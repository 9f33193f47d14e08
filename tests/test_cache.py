from __future__ import annotations

import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.cache import (
    NondeterministicQueryError,
    cache_entries,
    cached,
    drop_cache,
)


@pytest.fixture()
def source(spark, tmp_path):
    p = str(tmp_path / "src")
    spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, v long"
    ).write.parquet(p)
    return p


def _marked_query(spark, source, marker_file):
    """A query whose execution leaves a side-effect trace, so hits
    (no execution) are distinguishable from misses."""

    def trace(it):
        with open(marker_file, "a") as f:
            f.write("x\n")
        for pdf in it:
            yield pdf

    return (
        spark.read.parquet(source)
        .mapInPandas(trace, "k string, v long")
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )


def _executions(marker_file):
    p = Path(marker_file)
    return len(p.read_text().splitlines()) if p.exists() else 0


class TestCached:
    def test_miss_then_hit(self, spark, source, tmp_path):
        cdir, marker = str(tmp_path / "cache"), str(tmp_path / "m1")
        q = _marked_query(spark, source, marker)
        first = sorted(map(tuple, cached(spark, q, cdir).collect()))
        n_after_first = _executions(marker)
        assert n_after_first >= 1
        second = sorted(map(tuple, cached(spark, q, cdir).collect()))
        assert second == first == [("a", 3), ("b", 3)]
        # hit: no new executions of the traced stage
        assert _executions(marker) == n_after_first

    def test_data_change_invalidates(self, spark, source, tmp_path):
        cdir = str(tmp_path / "cache2")
        q = spark.read.parquet(source).groupBy("k").agg(
            F.sum("v").alias("s")
        )
        assert sorted(map(tuple, cached(spark, q, cdir).collect())) == [
            ("a", 3),
            ("b", 3),
        ]
        # append to the source: same plan, new input signature -> miss
        spark.createDataFrame([("b", 10)], "k string, v long").write.mode(
            "append"
        ).parquet(source)
        q2 = spark.read.parquet(source).groupBy("k").agg(
            F.sum("v").alias("s")
        )
        assert sorted(map(tuple, cached(spark, q2, cdir).collect())) == [
            ("a", 3),
            ("b", 13),
        ]
        assert len(cache_entries(cdir)) == 2

    def test_ttl_expiry_recomputes(self, spark, source, tmp_path):
        cdir, marker = str(tmp_path / "cache3"), str(tmp_path / "m3")
        q = _marked_query(spark, source, marker)
        cached(spark, q, cdir).collect()
        n1 = _executions(marker)
        time.sleep(0.05)
        cached(spark, q, cdir, ttl_s=0.01).collect()
        assert _executions(marker) > n1

    def test_refresh_forces_recompute(self, spark, source, tmp_path):
        cdir, marker = str(tmp_path / "cache4"), str(tmp_path / "m4")
        q = _marked_query(spark, source, marker)
        cached(spark, q, cdir).collect()
        n1 = _executions(marker)
        cached(spark, q, cdir, refresh=True).collect()
        assert _executions(marker) > n1

    def test_nondeterministic_refused(self, spark, source, tmp_path):
        q = spark.read.parquet(source).withColumn("r", F.rand())
        with pytest.raises(NondeterministicQueryError):
            cached(spark, q, str(tmp_path / "cache5"))
        # explicit override caches it
        out = cached(
            spark,
            q,
            str(tmp_path / "cache5"),
            allow_nondeterministic=True,
        )
        assert out.count() == 3

    def test_drop_and_entries(self, spark, source, tmp_path):
        cdir = str(tmp_path / "cache6")
        q = spark.read.parquet(source).select("k")
        cached(spark, q, cdir).collect()
        entries = cache_entries(cdir)
        assert len(entries) == 1 and entries[0]["bytes_on_disk"] > 0
        assert drop_cache(cdir, key=entries[0]["key"]) == 1
        assert cache_entries(cdir) == []
        assert drop_cache(cdir) == 0


def test_cache_on_hadoop_uri_dir(spark, tmp_path):
    # the whole hit/miss/drop lifecycle against a URI-form cache dir
    from kubenetmon_spark.cache import cache_entries, cached, drop_cache

    tbl = str(tmp_path / "t")
    spark.range(20).write.parquet(tbl)
    base = spark.read.parquet(tbl)
    df = base.groupBy((base.id % 3).alias("g")).count()
    cache_dir = "file:" + str(tmp_path / "cache")
    first = cached(spark, df, cache_dir)
    assert first.count() == 3
    entries = cache_entries(cache_dir)
    assert len(entries) == 1 and entries[0]["bytes_on_disk"] > 0
    # hit: served from the entry (no recompute path assertion needed —
    # the read is against the cache dir)
    again = cached(spark, df, cache_dir)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, first.collect())
    )
    assert drop_cache(cache_dir) == 1
    assert cache_entries(cache_dir) == []
