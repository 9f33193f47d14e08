#!/usr/bin/env python
"""Measured skew study: the flagship summing aggregation over sf1-scale
fact rows, uniform vs 90%-one-key (the single-chatty-pod shape,
SURVEY.md §4.5). The unit kill-test (tests/test_plans.py) proves the
plan shape and exactness; this records the RUNTIME evidence that
map-side partial aggregation makes the skewed case cost the same as the
uniform one.

Usage: python tools/skew_scale.py [sf_dir]   (default .scale/sf1)
Prints one JSON line with best-of-3 timings for both distributions.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    args = sys.argv[1:]
    sf_dir = args[0] if args else str(
        Path(__file__).resolve().parent.parent / ".scale/sf1"
    )

    from pyspark.sql import functions as F

    from kubenetmon_spark.demo import DEMO_CFG, build_flow_inputs
    from kubenetmon_spark.operators.flows import summing_aggregate, to_flow_rows
    from kubenetmon_spark.operators.label import label_flows, split_rejected
    from kubenetmon_spark.operators.lpm import disjoint_prefixes
    from kubenetmon_spark.session import get_spark

    spark = get_spark("skew_scale")
    spark.sparkContext.setLogLevel("ERROR")

    obs, pods, nodes, prefixes = build_flow_inputs(spark, sf_dir)
    dim = disjoint_prefixes(prefixes).persist()
    dim.count()
    accepted, _ = split_rejected(
        label_flows(obs, pods, nodes, dim, DEMO_CFG, prefixes_are_disjoint=True)
    )
    uniform = to_flow_rows(accepted).persist()
    n = uniform.count()

    # 90%-one-key: overwrite the high-cardinality dims of 90% of rows
    # with one hot pod's values (keep date/minute so partition pruning
    # and key count stay realistic)
    hot_cols = [
        "localPod", "localIPv4", "localPort", "remotePod", "remoteIPv4",
        "remotePort", "localApp", "remoteApp",
    ]
    is_hot = F.pmod(F.xxhash64("localPort", "remotePort"), F.lit(10)) < 9
    skewed = uniform
    for c in hot_cols:
        val = F.lit(0) if c.endswith("Port") else F.lit("hotpod")
        skewed = skewed.withColumn(
            c, F.when(is_hot, val).otherwise(F.col(c))
        )
    skewed = skewed.persist()
    skewed.count()

    def best3(df):
        best = None
        summing_aggregate(df).write.format("noop").mode("overwrite").save()
        for _ in range(3):
            t0 = time.perf_counter()
            summing_aggregate(df).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    t_uniform = best3(uniform)
    t_skewed = best3(skewed)
    n_hot = skewed.filter(F.col("localPod") == "hotpod").count()

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_fact_rows": n,
                "hot_key_rows": n_hot,
                "hot_fraction": round(n_hot / n, 3),
                "uniform_s": t_uniform,
                "skewed_s": t_skewed,
                "ratio": round(t_skewed / t_uniform, 2),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
