"""Streaming windowed top-k vs the batch answer, across multiple
micro-batches (maxFilesPerTrigger=1 so the upsert-merge path with
monotone counts is genuinely exercised)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from kubenetmon_spark.streaming.topk import (
    read_topk,
    start_topk_stream,
    windowed_counts,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _write_files(spark, d, rows_by_file):
    for i, rows in enumerate(rows_by_file):
        spark.createDataFrame(rows, ["key", "ts"]).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
    return str(d)


def test_topk_matches_batch(spark, tmp_path):
    # three files -> three micro-batches; key 'c' only overtakes 'b' in
    # window 0 after the LAST batch, so the stored-top-k merge matters
    rows_by_file = [
        [("a", T0), ("a", T0), ("b", T0 + timedelta(seconds=5)),
         ("c", T0 + timedelta(seconds=9))],
        [("a", T0 + timedelta(minutes=1)), ("b", T0 + timedelta(seconds=20)),
         ("d", T0 + timedelta(seconds=30))],
        [("c", T0 + timedelta(seconds=40)), ("c", T0 + timedelta(seconds=50)),
         ("e", T0 + timedelta(minutes=1, seconds=10))],
    ]
    src = _write_files(spark, tmp_path / "src", rows_by_file)
    stream = (
        spark.readStream.schema("key string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    counts = windowed_counts(stream, "key", window="1 minute")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = start_topk_stream(counts, out, ckpt, k=2)
    q.awaitTermination(300)

    got = sorted(
        (str(r.window_start), r.key, r.val, r.rk)
        for r in read_topk(spark, out).collect()
    )
    # batch reference over all rows
    allrows = [r for f in rows_by_file for r in f]
    batch = (
        spark.createDataFrame(allrows, ["key", "ts"])
        .groupBy(F.window("ts", "1 minute").alias("w"), "key")
        .agg(F.count(F.lit(1)).alias("val"))
        .select(F.col("w.start").alias("window_start"), "key", "val")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("window_start").orderBy(F.desc("val"), "key")
    exp = sorted(
        (str(r.window_start), r.key, r.val, r.rk)
        for r in batch.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .collect()
    )
    assert got == exp


def test_topk_restart_is_idempotent(spark, tmp_path):
    rows = [[("a", T0), ("b", T0), ("a", T0 + timedelta(seconds=3))]]
    src = _write_files(spark, tmp_path / "src2", rows)
    stream = (
        spark.readStream.schema("key string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    q = start_topk_stream(windowed_counts(stream, "key"), out, ckpt, k=1)
    q.awaitTermination(300)
    first = sorted((r.key, r.val) for r in read_topk(spark, out).collect())
    # restart with the same checkpoint: no new data -> no change
    stream2 = (
        spark.readStream.schema("key string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = start_topk_stream(windowed_counts(stream2, "key"), out, ckpt, k=1)
    q2.awaitTermination(300)
    second = sorted((r.key, r.val) for r in read_topk(spark, out).collect())
    assert first == second == [("a", 2)]


def test_sliding_topk_matches_batch(spark, tmp_path):
    # 2-minute window hopping every minute: every event lands in TWO
    # windows, and ranks differ between the overlapping windows
    rows_by_file = [
        [("a", T0), ("a", T0 + timedelta(seconds=10)),
         ("b", T0 + timedelta(seconds=20))],
        [("b", T0 + timedelta(minutes=1, seconds=5)),
         ("b", T0 + timedelta(minutes=1, seconds=15)),
         ("c", T0 + timedelta(minutes=1, seconds=25))],
        [("c", T0 + timedelta(minutes=2, seconds=5)),
         ("c", T0 + timedelta(minutes=2, seconds=10)),
         ("a", T0 + timedelta(minutes=2, seconds=30))],
    ]
    src = _write_files(spark, tmp_path / "src3", rows_by_file)
    stream = (
        spark.readStream.schema("key string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    counts = windowed_counts(
        stream, "key", window="2 minutes", slide="1 minute"
    )
    out, ckpt = str(tmp_path / "out3"), str(tmp_path / "ckpt3")
    q = start_topk_stream(counts, out, ckpt, k=2)
    q.awaitTermination(300)

    got = sorted(
        (str(r.window_start), r.key, r.val, r.rk)
        for r in read_topk(spark, out).collect()
    )
    allrows = [r for f in rows_by_file for r in f]
    batch = (
        spark.createDataFrame(allrows, ["key", "ts"])
        .groupBy(F.window("ts", "2 minutes", "1 minute").alias("w"), "key")
        .agg(F.count(F.lit(1)).alias("val"))
        .select(F.col("w.start").alias("window_start"), "key", "val")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("window_start").orderBy(F.desc("val"), "key")
    exp = sorted(
        (str(r.window_start), r.key, r.val, r.rk)
        for r in batch.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .collect()
    )
    assert got == exp
    # every event covers exactly 2 windows: 4 distinct window starts
    assert len({g[0] for g in got}) == 4
