"""Streaming mean/variance vs the batch exact-sums answer, across
multiple micro-batches, plus restart-resume."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from kubenetmon_spark.streaming.moments import (
    read_moments,
    start_moment_stream,
    windowed_moment_sums,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _files():
    w0 = [(10, 0), (20, 5), (30, 9)]
    w1 = [(100, 70), (50, 75)]
    later = [(40, 20), (200, 80), (7, 40)]  # revisits BOTH windows
    f = lambda pairs: [  # noqa: E731
        (v, T0 + timedelta(seconds=s)) for v, s in pairs
    ]
    return [f(w0), f(w1), f(later)]


def _write(spark, d, files):
    for rows in files:
        spark.createDataFrame(rows, "v bigint, ts timestamp").coalesce(
            1
        ).write.mode("append").parquet(str(d))
    return str(d)


def _batch_expected(spark, files):
    allrows = [r for f in files for r in f]
    b = spark.createDataFrame(allrows, "v bigint, ts timestamp").select(
        F.window("ts", "1 minute").start.alias("window_start"), "v"
    )
    agg = b.groupBy("window_start").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sx"),
        F.sum(F.col("v") * F.col("v")).alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    return {
        str(r.window_start): (r.n, r.mean, r.var_pop)
        for r in agg.select(
            "window_start",
            "n",
            F.round(sx.cast("double") / n, 6).alias("mean"),
            F.round(
                (n * sxx - sx * sx).cast("double")
                / (n * n).cast("double"),
                6,
            ).alias("var_pop"),
        ).collect()
    }


def test_streaming_moments_match_batch(spark, tmp_path):
    files = _files()
    src = _write(spark, tmp_path / "src", files)
    stream = (
        spark.readStream.schema("v bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = start_moment_stream(windowed_moment_sums(stream, "v"), out, ckpt)
    q.awaitTermination(300)
    got = {
        str(r.window_start): (r.n, r.mean, r.var_pop)
        for r in read_moments(spark, out).collect()
    }
    assert got == _batch_expected(spark, files)
    assert len(got) == 2


def test_restart_resumes(spark, tmp_path):
    files = _files()
    src = _write(spark, tmp_path / "src", files[:2])
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema("v bigint, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        start_moment_stream(
            windowed_moment_sums(stream, "v"), out, ckpt
        ).awaitTermination(300)

    run()
    _write(spark, tmp_path / "src", files[2:])
    run()
    got = {
        str(r.window_start): (r.n, r.mean, r.var_pop)
        for r in read_moments(spark, out).collect()
    }
    assert got == _batch_expected(spark, files)
