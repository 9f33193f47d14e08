"""Streaming quantileTiming vs the batch operator, across multiple
micro-batches (maxFilesPerTrigger=1 exercises the histogram upsert-merge
path), plus a restart-resume check."""

from __future__ import annotations

from datetime import datetime, timedelta

from kubenetmon_spark.operators.agg import quantile_timing
from kubenetmon_spark.streaming.timing import (
    read_timing_quantiles,
    start_timing_histogram_stream,
    windowed_timing_histogram,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _write_files(spark, d, rows_by_file):
    for rows in rows_by_file:
        spark.createDataFrame(rows, "v bigint, ts timestamp").coalesce(
            1
        ).write.mode("append").parquet(str(d))
    return str(d)


def _rows():
    # two 1-minute windows; values span all three timing bands and the
    # same (window, bucket) pair is hit from DIFFERENT files, so the
    # stored-histogram merge path matters
    w0 = [(5, 0), (700, 5), (700, 9), (1030, 20), (1500, 30), (40000, 50)]
    w1 = [(100, 70), (100, 75), (2000, 80), (29999, 110)]
    later = [(700, 12), (1030, 25), (100, 95), (31000, 115), (7, 40)]
    f = lambda pairs: [  # noqa: E731
        (v, T0 + timedelta(seconds=s)) for v, s in pairs
    ]
    return [f(w0), f(w1), f(later)]


def test_streaming_quantiles_match_batch(spark, tmp_path):
    rows_by_file = _rows()
    src = _write_files(spark, tmp_path / "src", rows_by_file)
    stream = (
        spark.readStream.schema("v bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    hist = windowed_timing_histogram(stream, "v")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = start_timing_histogram_stream(hist, out, ckpt)
    q.awaitTermination(300)

    got = {
        str(r.window_start): (r.p50, r.p90, r.p99)
        for r in read_timing_quantiles(spark, out, [50, 90, 99]).collect()
    }

    from pyspark.sql import functions as F

    allrows = [r for f in rows_by_file for r in f]
    batch = spark.createDataFrame(allrows, "v bigint, ts timestamp").select(
        F.window("ts", "1 minute").start.alias("window_start"), "v"
    )
    want = {
        str(r.window_start): (r.p50, r.p90, r.p99)
        for r in quantile_timing(
            batch, ["window_start"], "v", [50, 90, 99]
        ).collect()
    }
    assert got == want
    assert len(got) == 2


def test_restart_resumes_from_checkpoint(spark, tmp_path):
    rows_by_file = _rows()
    src = _write_files(spark, tmp_path / "src", rows_by_file[:2])
    schema = "v bigint, ts timestamp"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_timing_histogram_stream(
            windowed_timing_histogram(stream, "v"), out, ckpt
        )
        q.awaitTermination(300)

    run()
    _write_files(spark, tmp_path / "src", rows_by_file[2:])
    run()  # second run must pick up ONLY the new file

    from pyspark.sql import functions as F

    allrows = [r for f in rows_by_file for r in f]
    batch = spark.createDataFrame(allrows, schema).select(
        F.window("ts", "1 minute").start.alias("window_start"), "v"
    )
    got = {
        str(r.window_start): (r.p50, r.p90, r.p99)
        for r in read_timing_quantiles(spark, out, [50, 90, 99]).collect()
    }
    want = {
        str(r.window_start): (r.p50, r.p90, r.p99)
        for r in quantile_timing(
            batch, ["window_start"], "v", [50, 90, 99]
        ).collect()
    }
    assert got == want
