"""Streaming PromQL rates vs the batch promql_to_grid answer, across
multiple micro-batches (maxFilesPerTrigger=1), plus restart and
late-drop semantics."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from kubenetmon_spark.streaming.rates import read_rates, start_rates_stream

SCHEMA = "k string, ts_s long, v long"


def _write_files(spark, d, rows_by_file):
    for rows in rows_by_file:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
    return str(d)


def _run_stream(spark, tmp_path, rows_by_file, name, **kw):
    src = _write_files(spark, tmp_path / f"{name}_src", rows_by_file)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / f"{name}_out")
    q = start_rates_stream(
        stream,
        out,
        str(tmp_path / f"{name}_buf"),
        str(tmp_path / f"{name}_ckpt"),
        ["k"],
        step_s=10,
        window_s=25,
        **kw,
    )
    q.awaitTermination(300)
    return out


def _batch_reference(spark, rows, step=10, win=25):
    from kubenetmon_spark.operators.timeseries import promql_to_grid

    df = spark.createDataFrame(rows, SCHEMA)
    lo = min(r[1] for r in rows)
    hi = max(r[1] for r in rows)
    t_lo = -(-lo // step) * step
    t_hi = ((hi + win - 1) // step) * step
    return promql_to_grid(
        df.groupBy("k", "ts_s").agg(F.max("v").alias("v")),
        ["k"],
        "ts_s",
        "v",
        start_s=t_lo,
        n_buckets=(t_hi - t_lo) // step + 1,
        step_s=step,
        window_s=win,
    )


def _snap(df):
    return sorted(
        (
            r.k, r.bucket_ts, r.n_samples, r.last_v, r.delta,
            r.increase, r.rate_bp, r.irate_bp,
        )
        for r in df.collect()
    )


def test_stream_matches_batch_across_batches(spark, tmp_path):
    rng = random.Random(11)
    series = []
    for k in ("a", "b"):
        cum, ts = 0, 0
        for _ in range(30):
            ts += rng.randint(3, 12)
            cum = (cum + rng.randint(0, 40)) % 200  # forced resets
            series.append((k, ts, cum))
    series.sort(key=lambda r: r[1])  # chronological arrival
    thirds = [series[:20], series[20:40], series[40:]]
    out = _run_stream(spark, tmp_path, thirds, "m")
    got = _snap(read_rates(spark, out))
    exp = _snap(_batch_reference(spark, series))
    assert got == exp


def test_restart_is_idempotent_and_appends_continue(spark, tmp_path):
    first = [[("a", 10, 5), ("a", 20, 8)]]
    src = _write_files(spark, tmp_path / "r_src", first)
    args = dict(
        out_path=str(tmp_path / "r_out"),
        buffer_path=str(tmp_path / "r_buf"),
        checkpoint=str(tmp_path / "r_ckpt"),
        key_cols=["k"],
        step_s=10,
        window_s=25,
    )

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_rates_stream(stream, **args)
        q.awaitTermination(300)

    run()
    snap1 = _snap(read_rates(spark, args["out_path"]))
    run()  # restart with no new data: nothing changes
    assert _snap(read_rates(spark, args["out_path"])) == snap1
    # append a later sample; only its touched buckets change
    _write_files(spark, tmp_path / "r_src", [[("a", 30, 2)]])
    run()
    exp = _snap(
        _batch_reference(spark, [("a", 10, 5), ("a", 20, 8), ("a", 30, 2)])
    )
    assert _snap(read_rates(spark, args["out_path"])) == exp


def test_too_late_samples_are_dropped(spark, tmp_path):
    # lateness 20s: the 2nd batch's ts=5 sample arrives 95s after
    # max_seen=100 and must be ignored
    batches = [
        [("a", 90, 50), ("a", 100, 60)],
        [("a", 5, 1), ("a", 110, 70)],
    ]
    out = _run_stream(spark, tmp_path, batches, "late", lateness_s=20)
    kept = [("a", 90, 50), ("a", 100, 60), ("a", 110, 70)]
    exp = _snap(_batch_reference(spark, kept))
    assert _snap(read_rates(spark, out)) == exp


def test_buffer_retains_one_superseded_version(spark, tmp_path):
    # the prune keeps v=latest AND v=latest-1: a monitoring read that
    # resolved the previous version just before a commit must not have
    # its files deleted mid-scan; only older versions are removed
    import os

    from kubenetmon_spark.streaming.rates import (
        _latest_buffer_version,
        read_buffer,
    )

    rows_by_file = [
        [("a", 100, 10)],
        [("a", 110, 20)],
        [("a", 120, 35)],
    ]
    _run_stream(spark, tmp_path, rows_by_file, "retain")
    buf = str(tmp_path / "retain_buf")
    latest = _latest_buffer_version(buf)
    assert latest >= 2  # one version per non-empty batch
    versions = sorted(
        int(n[2:]) for n in os.listdir(buf) if n.startswith("v=")
    )
    assert versions == [latest - 1, latest]
    # both retained versions are committed and readable
    assert read_buffer(spark, buf).count() > 0
    assert (
        spark.read.parquet(os.path.join(buf, f"v={latest - 1}")).count() > 0
    )


def test_buffer_meta_sidecar_and_agg_fallback(spark, tmp_path):
    # r7: the buffer version carries a _meta.json sidecar with its exact
    # max event time (saves a scan+agg job per batch). A version WITHOUT
    # the sidecar (pre-r7 buffer, or a lost write) must fall back to the
    # agg and produce the same stream results — here the sidecar is
    # deleted between batches and late-drop semantics must still hold.
    import json
    import os

    from kubenetmon_spark.streaming.rates import _latest_buffer_version

    first = [[("a", 90, 50), ("a", 100, 60)]]
    src = _write_files(spark, tmp_path / "meta_src", first)
    args = dict(
        out_path=str(tmp_path / "meta_out"),
        buffer_path=str(tmp_path / "meta_buf"),
        checkpoint=str(tmp_path / "meta_ckpt"),
        key_cols=["k"],
        step_s=10,
        window_s=25,
        lateness_s=20,
    )

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_rates_stream(stream, **args)
        q.awaitTermination(300)

    run()
    buf = args["buffer_path"]
    v = _latest_buffer_version(buf)
    meta = os.path.join(buf, f"v={v}", "_meta.json")
    assert json.load(open(meta))["max_ts"] == 100
    os.remove(meta)  # simulate a pre-sidecar buffer
    # 2nd batch: ts=5 is 95s late vs max_seen=100 (recovered via the
    # agg fallback) and must be dropped; ts=110 lands
    _write_files(spark, tmp_path / "meta_src", [[("a", 5, 1), ("a", 110, 70)]])
    run()
    kept = [("a", 90, 50), ("a", 100, 60), ("a", 110, 70)]
    exp = _snap(_batch_reference(spark, kept))
    assert _snap(read_rates(spark, args["out_path"])) == exp
    # the new latest version re-carries the sidecar
    v2 = _latest_buffer_version(buf)
    meta2 = os.path.join(buf, f"v={v2}", "_meta.json")
    assert json.load(open(meta2))["max_ts"] == 110


def test_rates_stream_on_hadoop_uri_paths(spark, tmp_path):
    # the whole buffer-commit lifecycle against URI-form (file:)
    # roots through the Hadoop FS adapter
    rows_by_file = [
        [("a", 100, 10), ("a", 110, 25)],
        [("a", 120, 45)],
    ]
    src = _write_files(spark, tmp_path / "uri_src", rows_by_file)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = "file:" + str(tmp_path / "uri_out")
    q = start_rates_stream(
        stream,
        out,
        "file:" + str(tmp_path / "uri_buf"),
        str(tmp_path / "uri_ckpt"),
        ["k"],
        step_s=10,
        window_s=25,
    )
    q.awaitTermination(300)
    ref = _batch_reference(spark, [r for f in rows_by_file for r in f])
    got = read_rates(spark, out).select(*ref.columns)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_crashed_overwrite_recovers_keep_old_from_stage(spark, tmp_path):
    """ADVICE r07: a crash DURING the dynamic partition overwrite
    (after partition delete, before publish) must not lose historical
    buckets whose source samples aged out of the buffer. Forced-crash
    pattern: batch 2's grid overwrite is made to delete the touched
    day dirs and raise (the worst point of the commit window); the
    restarted stream's replay must rebuild the day INCLUDING batch 1's
    keep_old buckets, from the durable _keep_stage written before the
    overwrite."""
    import pyspark.sql.readwriter as rw

    series = [
        [("a", 10, 5), ("a", 20, 8)],
        [("a", 200, 11)],  # far-enough samples: batch-1 buckets leave
        # the recompute range but stay within the same UTC day
    ]
    src = _write_files(spark, tmp_path / "crash_src", series)
    out = str(tmp_path / "crash_out")
    buf = str(tmp_path / "crash_buf")
    ckpt = str(tmp_path / "crash_ckpt")

    def run(**kw):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = start_rates_stream(
            stream, out, buf, ckpt, ["k"], step_s=10, window_s=25,
            lateness_s=1000, trigger={"availableNow": True},
        )
        return q

    calls = {"n": 0}
    real_parquet = rw.DataFrameWriter.parquet

    def crashing_parquet(self, path, **kw):
        if path == out:
            calls["n"] += 1
            if calls["n"] == 2:  # batch 2's grid commit
                # simulate the commit window's worst point: matched
                # partitions deleted, new data never published
                import shutil as _sh

                real_parquet(self, str(tmp_path / "discard"), **kw)
                for name in list(__import__("os").listdir(out)):
                    if name.startswith("bucket_day="):
                        _sh.rmtree(f"{out}/{name}")
                raise RuntimeError("injected crash mid-overwrite")
        return real_parquet(self, path, **kw)

    rw.DataFrameWriter.parquet = crashing_parquet
    try:
        q = run()
        try:
            q.awaitTermination(300)
        except Exception:
            pass  # stream dies on the injected crash
        spark.streams.resetTerminated()
    finally:
        rw.DataFrameWriter.parquet = real_parquet

    # the stage survived the crash, ready for replay
    import os

    assert os.path.isdir(f"{out}/_keep_stage")
    # restart WITHOUT the fault: checkpoint replays batch 2
    q = run()
    q.awaitTermination(300)
    got = _snap(read_rates(spark, out))
    exp = _snap(_batch_reference(spark, [r for f in series for r in f]))
    assert got == exp
    # stages are transient: cleaned after the successful commit
    assert not os.path.isdir(f"{out}/_keep_stage")
