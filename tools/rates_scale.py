#!/usr/bin/env python
"""Per-batch cadence of the streaming PromQL rates (q315's form) at
scale — evidence that each micro-batch costs O(batch + touched
buckets), not O(history).

Usage: python tools/rates_scale.py [SF_DIR] [N_BATCHES]

Builds the q307/q315 counter samples from SF_DIR/events.parquet
(user_id%4 cohorts, cumulative cents mod 1e5), splits them into
N chronological batch files (mtimes pinned — the file source orders
by modification time), streams them through start_rates_stream with
an hourly step / 2h window, and prints per-batch trigger durations.
Pass condition: flat-ish per-batch cost while the output grid table
grows — a cost tracking total history would mean the recompute is not
bounded to touched buckets.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from kubenetmon_spark.session import get_spark
    from kubenetmon_spark.streaming.rates import read_buffer, start_rates_stream

    spark = get_spark("rates_scale")
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = ev.select(
        (F.col("user_id") % 4).alias("k"),
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("ts_s"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    s0 = base.groupBy("k", "ts_s").agg(F.sum("cents").alias("inc"))
    cum = Window.partitionBy("k").orderBy("ts_s")
    samples = s0.select(
        "k", "ts_s", (F.sum("inc").over(cum) % 100000).alias("v")
    )
    n_samples = samples.count()

    work = tempfile.mkdtemp(prefix="rates_scale_")
    src, out, buf, ckpt = (
        os.path.join(work, d) for d in ("src", "out", "buf", "ckpt")
    )
    samples.repartitionByRange(n_batches, "ts_s").write.mode(
        "overwrite"
    ).parquet(src)
    files = sorted(Path(src).glob("part-*.parquet"), key=lambda p: p.name)
    t_base = time.time() - 60 * (len(files) + 1)
    for i, p in enumerate(files):
        os.utime(p, (t_base + 60 * i, t_base + 60 * i))

    stream = (
        spark.readStream.schema("k bigint, ts_s bigint, v bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    t0 = time.perf_counter()
    q = start_rates_stream(
        stream, out, buf, ckpt, ["k"],
        step_s=3600, window_s=7200,
        trigger={"availableNow": True},
    )
    q.awaitTermination(1800)
    wall = time.perf_counter() - t0

    per_batch = [
        (p["batchId"], p["durationMs"].get("triggerExecution"))
        for p in (q.recentProgress or [])
        if p.get("numInputRows", 0) > 0
        or p["durationMs"].get("triggerExecution", 0) > 0
    ]
    grid_rows = spark.read.parquet(out).count()
    buf_rows = read_buffer(spark, buf).count()
    print(
        f"samples={n_samples} batches={len(files)} grid_rows={grid_rows} "
        f"buffer_rows={buf_rows} wall={wall:.1f}s"
    )
    for bid, ms in per_batch:
        print(f"  batch {bid}: {ms/1000:.1f}s" if ms else f"  batch {bid}: ?")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
