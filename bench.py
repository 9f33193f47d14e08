#!/usr/bin/env python
"""Benchmark harness: times every gate query (the SURVEY.md §2 surface +
LLM-pipeline extensions) at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Each query is materialized through Spark's no-op sink so the full plan
executes (scan -> shuffle -> agg) without driver-collect overhead skewing
the numbers. Prints exactly ONE JSON line:

  {"metric": "gate_suite_seconds", "value": <total>, "unit": "sec",
   "queries": {"q01_pricing_summary": <sec>, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from kubenetmon_spark.gate import gate_queries
    from kubenetmon_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # plans, not first-touch class loading.
    from kubenetmon_spark.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.limit(1).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, fn in gate_queries().items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "gate_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
