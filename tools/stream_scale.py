#!/usr/bin/env python
"""Streaming-at-scale study (VERDICT r02 #4): drive the q34-shape flow
stream over a large SF in MULTIPLE micro-batches (``maxFilesPerTrigger``)
instead of one availableNow gulp, record per-batch latency from the
streaming-query progress feed, and check every batch against the
ingest-to-queryable target (< 60 s, BASELINE.md): the reference's workers
flush batches every ~30 s and rows must be queryable in ClickHouse within
the next merge cycle, so a micro-batch that takes longer than its
accumulation interval means the stream falls behind forever.

Usage: python tools/stream_scale.py [sf_dir] [n_files] [files_per_trigger]
Defaults: .scale/sf1, 12 input files, 2 files per trigger -> 6 batches.

Prints one JSON line: per-batch rows + trigger latency, the max batch
latency vs target, and the exactness check (streamed+compacted table sums
== one-shot batch pipeline sums over the same observations).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    args = sys.argv[1:]
    sf_dir = args[0] if args else str(
        Path(__file__).resolve().parent.parent / ".scale/sf1"
    )
    n_files = int(args[1]) if len(args) > 1 else 12
    fpt = int(args[2]) if len(args) > 2 else 2

    from pyspark.sql import functions as F

    from kubenetmon_spark.demo import DEMO_CFG, build_flow_inputs
    from kubenetmon_spark.operators.flows import summing_aggregate, to_flow_rows
    from kubenetmon_spark.operators.label import label_flows, split_rejected
    from kubenetmon_spark.operators.lpm import disjoint_prefixes
    from kubenetmon_spark.session import get_spark
    from kubenetmon_spark.sink import compact, read_flows
    from kubenetmon_spark.streaming import read_observations, start_flow_stream

    spark = get_spark("stream_scale")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="stream_scale_")
    obs, pods, nodes, prefixes = build_flow_inputs(spark, sf_dir)
    obs.repartition(n_files).write.mode("overwrite").parquet(f"{tmp}/obs")
    n_obs = spark.read.parquet(f"{tmp}/obs").count()

    t0 = time.perf_counter()
    q = start_flow_stream(
        read_observations(spark, f"{tmp}/obs", max_files_per_trigger=fpt),
        f"{tmp}/flows",
        f"{tmp}/ckpt",
        pods,
        nodes,
        prefixes,
        DEMO_CFG,
        trigger={"availableNow": True},
    )
    q.awaitTermination(3600)
    stream_wall = round(time.perf_counter() - t0, 1)

    batches = [
        {
            "batch": p["batchId"],
            "rows": p["numInputRows"],
            "trigger_s": round(p["durationMs"]["triggerExecution"] / 1000, 2),
        }
        for p in q.recentProgress
        if p["numInputRows"] > 0
    ]
    t0 = time.perf_counter()
    compact(spark, f"{tmp}/flows")
    compact_s = round(time.perf_counter() - t0, 1)

    # Exactness: the streamed-and-compacted table must carry the same
    # class/direction sums as the one-shot batch pipeline over the same
    # observations (arbitrary batch boundaries never change the answer).
    streamed = {
        (r.connectionClass, r.direction): (r.bytes, r.packets)
        for r in read_flows(spark, f"{tmp}/flows")
        .groupBy("connectionClass", "direction")
        .agg(F.sum("bytes").alias("bytes"), F.sum("packets").alias("packets"))
        .collect()
    }
    dim = disjoint_prefixes(prefixes)
    accepted, _ = split_rejected(
        label_flows(obs, pods, nodes, dim, DEMO_CFG, prefixes_are_disjoint=True)
    )
    batch_ans = {
        (r.connectionClass, r.direction): (r.bytes, r.packets)
        for r in summing_aggregate(to_flow_rows(accepted))
        .groupBy("connectionClass", "direction")
        .agg(F.sum("bytes").alias("bytes"), F.sum("packets").alias("packets"))
        .collect()
    }

    max_batch_s = max((b["trigger_s"] for b in batches), default=0.0)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_obs": n_obs,
                "n_files": n_files,
                "files_per_trigger": fpt,
                "n_batches": len(batches),
                "batches": batches,
                "stream_wall_s": stream_wall,
                "compact_s": compact_s,
                "max_batch_trigger_s": max_batch_s,
                "target_s": 60,
                "within_target": max_batch_s < 60,
                "exact_match": streamed == batch_ans,
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return 0 if (max_batch_s < 60 and streamed == batch_ans) else 1


if __name__ == "__main__":
    raise SystemExit(main())
